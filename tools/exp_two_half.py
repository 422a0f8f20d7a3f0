"""k > 512 two-half fused quantize vs the single rolled kernel (TPU).

tools/exp_k1024.py measured the single rolled kernel trip-bound at 4K
k=1024: 89.2 ms exact AND fast (the rolled loop dominates; the
chunked-unroll form at kp=1024 crashes the remote compiler). The
two-half decomposition (fused_quantize_two_half: two <= 512-half
launches in the chunked-unroll form + XLA argmin merge, one executable)
should land near 2 x the k=512 half cost (22.1 ms exact / 13.7 ms fast
measured round 2) plus a bandwidth-class merge.

Measures per (tier): single-kernel ms, two-half ms, speedup, and output
agreement (pixel mismatch fraction — the exact tiers are expected
bit-equal per the round-2 form-equality measurements; knife-edge
deviations are reported, not hidden).

Run on the TPU host: python tools/exp_two_half.py [reps=5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 3840, 2160


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax.numpy as jnp

    from kmeans_tpu.ops import kernels
    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.quantize import dither_threshold
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(99)
    img = jnp.asarray(
        rng.integers(0, 256, (HEIGHT, WIDTH, 4), dtype=np.uint8)
    )
    k = 1024
    pal = srgb8_to_lab(
        jnp.asarray(rng.integers(0, 256, (k, 3), dtype=np.uint8))
    )
    thr = dither_threshold(pal)

    import jax

    # Device-side per-call time via the repo's in-jit fori pattern
    # (exp_k1024): LOOP data-dependent calls per dispatch, one scalar
    # readback — the ~30 ms tunnel call latency amortizes away. The
    # carry threads into the threshold operand so the loop body cannot
    # be hoisted (measurement lesson in docs/STATUS.md).
    LOOP = 10

    def timed_device(fn):
        @jax.jit
        def loop(img, pal, thr):
            def body(i, acc):
                out = fn(img, pal, thr + acc * 0.0)
                return acc + out[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        t_compile = time.perf_counter()
        np.asarray(loop(img, pal, thr))
        compile_s = time.perf_counter() - t_compile
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(img, pal, thr))
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        return best / LOOP, compile_s

    results = []
    for fast in (False, True):
        for mode in ("replace", "dither"):
            t_single, c_single = timed_device(
                lambda i, p, t, m=mode, f=fast: kernels.fused_quantize(
                    i, p, t, mode=m, fast=f
                )
            )
            t_two, c_two = timed_device(
                lambda i, p, t, m=mode, f=fast: (
                    kernels.fused_quantize_two_half(i, p, t, mode=m, fast=f)
                )
            )
            single = np.asarray(
                kernels.fused_quantize(img, pal, thr, mode=mode, fast=fast)
            )
            two = np.asarray(
                kernels.fused_quantize_two_half(
                    img, pal, thr, mode=mode, fast=fast
                )
            )
            mism = float((single != two).any(axis=-1).mean())
            row = {
                "case": f"k1024-{mode}" + ("-fast" if fast else "-exact"),
                "single_ms": round(t_single * 1e3, 2),
                "two_half_ms": round(t_two * 1e3, 2),
                "speedup": round(t_single / t_two, 2),
                "mismatch_frac": mism,
                "compile_s": [round(c_single, 1), round(c_two, 1)],
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    with open("/tmp/exp_two_half.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/exp_two_half.json", file=sys.stderr)


if __name__ == "__main__":
    main()
