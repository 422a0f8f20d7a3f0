"""Hardware experiment: full-unroll cutoff of the quantize centroid loop.

The fused quantize/assign kernels unroll palettes of kp <= UNROLL_KP_MAX
(default 16, chosen in round 1) to straight-line VPU code and keep a
`fori_loop` above that. Mosaic's loop lowering supports ONLY unroll=1 or
full unroll (partial `unroll=` raises NotImplementedError — measured),
so the only lever is raising the cutoff. This measures the flagship
rolled shapes (4K fused_assign_packed, replace)

    k=64 exact    k=64 factorized-fast    k=256 exact

with the loop rolled (cutoff 16) vs fully unrolled (cutoff >= kp), and
asserts on-device bit-equality of the packed words across settings
(trip order and per-trip arithmetic are identical, so any difference is
a harness bug). Prints a JSON line per measurement. Run ON TPU; budget
~10-40 min of remote compiles on first run (the k=256 straight-line
program is large — its compile may dominate).
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

    cases = []
    for k, fast in ((64, False), (64, True), (256, False)):
        pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        cents = jnp.asarray(srgb8_to_lab_np(pal))
        cases.append((k, fast, cents))

    results = []
    baselines = {}
    for cutoff in (16, 64, 256):
        kernels.set_loop_knobs(kp_max=cutoff)  # sets + clears jit caches
        for k, fast, cents in cases:
            if cutoff > 16 and k > cutoff:
                continue  # same program as the rolled baseline
            label = f"k{k}-{'fast' if fast else 'exact'}"

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
                np.asarray(loop(img, cents))  # compile
            except Exception as e:
                r = {"cutoff": cutoff, "case": label, "error": repr(e)[:200]}
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
                "cutoff": cutoff,
                "case": label,
                "unrolled": k <= cutoff,
                "ms": round(per_call * 1e3, 3),
                "gpix_s": round(WIDTH * HEIGHT / per_call / 1e9, 2),
                "bit_equal_vs_rolled": equal,
            }
            results.append(r)
            print(json.dumps(r), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
