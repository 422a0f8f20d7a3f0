"""Hardware experiment: unroll policy for the HEAVY kernel bodies.

tools/exp_unroll*.py validated the raised full-unroll cutoff
(UNROLL_KP_MAX=256) on the cie94 replace/dither bodies only. The
CIEDE2000 body is ~an order of magnitude more arithmetic per trip
(G factor, polynomial atan2, sin/cos/exp rotation term) and meld
carries 8 loop buffers — a 256-trip straight-line program of either
might hit the same remote-compiler crash the 512-trip cie94 program
does, and CPU interpret tests cannot catch a TPU program-size failure.

This measures, on the 4K shapes (12-call in-jit loop, min of 3,
in-run-measured call latency subtracted):

    cie2000 replace k=64 / k=256   (fused_assign_packed)
    meld cie94 exact k=64 / k=256  (fused_quantize)

under three settings — rolled (cutoff 16, chunk 1), chunked (cutoff 16,
chunk 64), fully unrolled (cutoff 256) — asserting on-device
bit-equality across settings (identical trip order/arithmetic). Compile
seconds are part of the decision. Run ON TPU.
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

    def cents_for(k):
        pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        return jnp.asarray(srgb8_to_lab_np(pal))

    # (label, k, metric, mode)
    cases = [
        ("cie2000-replace-k64", 64, "cie2000", "replace"),
        ("cie2000-replace-k256", 256, "cie2000", "replace"),
        ("meld-cie94-k64", 64, "cie94", "meld"),
        ("meld-cie94-k256", 256, "cie94", "meld"),
    ]
    # (setting, UNROLL_KP_MAX, UNROLL_CHUNK)
    settings = [("rolled", 16, 1), ("chunk64", 16, 64), ("full", 256, 128)]

    results = []
    baselines = {}
    for sname, kp_max, chunk in settings:
        # cie2000 is pinned rolled in production (UNROLL_*_2000); sweep
        # its loop form too so this script stays reproducible. The helper
        # clears the jit caches (the knobs are not in any cache key).
        kernels.set_loop_knobs(
            kp_max=kp_max, chunk=chunk, kp_max_2000=kp_max, chunk_2000=chunk
        )
        for label, k, metric, mode in cases:
            cents = cents_for(k)

            def call(img, cents, acc, metric=metric, mode=mode):
                if mode == "meld":
                    out = kernels.fused_quantize(
                        img, cents, jnp.float32(4.0) + acc * 0.0,
                        mode=mode, metric=metric,
                    )
                    return out, out[0, 0, 0].astype(jnp.float32)
                words = kernels.fused_assign_packed(
                    img, cents, jnp.float32(0.0) + acc * 0.0,
                    mode=mode, metric=metric,
                )
                return words, words[0, 0].astype(jnp.float32)

            @jax.jit
            def loop(img, cents, call=call):
                def body(i, acc):
                    _, tag = call(img, cents, acc)
                    return acc + tag

                return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

            try:
                compile_s = _timed(lambda: np.asarray(loop(img, cents)))
            except Exception as e:
                r = {"setting": sname, "case": label, "error": repr(e)[:200]}
                results.append(r)
                print(json.dumps(r), flush=True)
                continue
            t = min(_timed(lambda: np.asarray(loop(img, cents))) for _ in range(3))
            per_call = max((t - lat) / LOOP, 1e-9)

            out, _ = call(img, cents, jnp.float32(0.0))
            out = np.asarray(out)
            if label not in baselines:
                baselines[label] = out
                equal = True
            else:
                equal = bool(np.array_equal(out, baselines[label]))

            r = {
                "setting": sname,
                "case": label,
                "ms": round(per_call * 1e3, 3),
                "gpix_s": round(WIDTH * HEIGHT / per_call / 1e9, 2),
                "compile_s": round(compile_s, 1),
                "bit_equal_vs_rolled": equal,
            }
            results.append(r)
            print(json.dumps(r), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
