"""Hardware experiment: chunked unroll of the kp=512 quantize loop.

kp > UNROLL_KP_MAX (only 512 — kp is a power of two) cannot fully unroll
(the straight-line program crashes the remote compiler; tools/
exp_unroll2.py), but the centroid loop can run as a fori_loop over
fully-unrolled UNROLL_CHUNK-trip chunks: program size bounded at one
chunk, loop-carried VMEM cost amortized over the chunk. This sweeps the
chunk size on the 4K fused_assign_packed k=512 shapes (exact + fast,
replace) and asserts on-device bit-equality of the packed words across
settings (chunk=1 is trip-for-trip the round-1 rolled loop). Run ON TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 3840, 2160
LOOP = 12


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.ops import kernels
    from kmeans_tpu.ops.colorspace import srgb8_to_lab_np
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (HEIGHT, WIDTH, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    img = jnp.asarray(rgba)
    np.asarray(img[0, 0])  # settle the upload

    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    K = 512
    pal = rng.integers(0, 256, (K, 3), dtype=np.uint8)
    cents = jnp.asarray(srgb8_to_lab_np(pal))

    results = []
    baselines = {}
    for chunk in (1, 64, 128, 256):
        kernels.set_loop_knobs(chunk=chunk)  # sets + clears jit caches
        for fast in (False, True):
            label = f"k512-{'fast' if fast else 'exact'}"

            @jax.jit
            def loop(img, cents, fast=fast):
                def body(i, acc):
                    words = kernels.fused_assign_packed(
                        img, cents, jnp.float32(0.0) + acc * 0.0,
                        mode="replace", fast=fast,
                    )
                    return acc + words[0, 0].astype(jnp.float32)

                return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

            try:
                compile_s = _timed(lambda: np.asarray(loop(img, cents)))
            except Exception as e:
                r = {"chunk": chunk, "case": label, "error": repr(e)[:200]}
                results.append(r)
                print(json.dumps(r), flush=True)
                continue
            t = min(_timed(lambda: np.asarray(loop(img, cents))) for _ in range(3))
            per_call = max((t - lat) / LOOP, 1e-9)

            words = np.asarray(
                kernels.fused_assign_packed(
                    img, cents, jnp.float32(0.0), mode="replace", fast=fast
                )
            )
            if label not in baselines:
                baselines[label] = words
                equal = True
            else:
                equal = bool(np.array_equal(words, baselines[label]))

            r = {
                "chunk": chunk,
                "case": label,
                "ms": round(per_call * 1e3, 3),
                "gpix_s": round(WIDTH * HEIGHT / per_call / 1e9, 2),
                "compile_s": round(compile_s, 1),
                "bit_equal_vs_chunk1": equal,
            }
            results.append(r)
            print(json.dumps(r), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
