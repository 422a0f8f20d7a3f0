"""Hardware experiment, phase 2: full-unroll at the 512-color cap + tile
re-sweep.

Phase 1 (tools/exp_unroll.py) measured full unroll winning 2.2-2.4x on
the exact rolled shapes at k=64/256. This phase completes the decision
matrix for UNROLL_KP_MAX = 512 (the reference's palette cap):

    k=256 fast            k=512 exact (16-bit pack tier)
    k=64 exact dither     k=256 exact, 256-row tile (re-sweep)

Each prints a JSON line with compile seconds (straight-line programs at
kp=512 are large — compile cost is part of the decision). Run ON TPU.
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
    np.asarray(img[0, 0])

    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    def cents_for(k):
        pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        return jnp.asarray(srgb8_to_lab_np(pal))

    # (label, k, fast, mode, cutoff, tile_rows_override)
    runs = [
        ("k256-fast-unrolled", 256, True, "replace", 512, None),
        ("k512-exact-rolled", 512, False, "replace", 16, None),
        ("k512-exact-unrolled", 512, False, "replace", 512, None),
        ("k64-exact-dither-rolled", 64, False, "dither", 16, None),
        ("k64-exact-dither-unrolled", 64, False, "dither", 512, None),
        ("k256-exact-unrolled-tile256", 256, False, "replace", 512, 256),
        ("k64-exact-unrolled-tile256", 64, False, "replace", 512, 256),
    ]

    results = []
    for label, k, fast, mode, cutoff, tile in runs:
        old_tile = kernels.QUANT_TILE_ROWS_ROLLED
        if tile is not None:
            kernels.QUANT_TILE_ROWS_ROLLED = tile
        kernels.set_loop_knobs(kp_max=cutoff)  # sets + clears jit caches
        cents = cents_for(k)

        @jax.jit
        def loop(img, cents, fast=fast, mode=mode):
            def body(i, acc):
                words = kernels.fused_assign_packed(
                    img, cents, jnp.float32(4.0) + acc * 0.0,
                    mode=mode, fast=fast,
                )
                return acc + words[0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        try:
            compile_s = _timed(lambda: np.asarray(loop(img, cents)))
            t = min(_timed(lambda: np.asarray(loop(img, cents))) for _ in range(3))
            per_call = max((t - lat) / LOOP, 1e-9)
            r = {
                "case": label,
                "ms": round(per_call * 1e3, 3),
                "gpix_s": round(WIDTH * HEIGHT / per_call / 1e9, 2),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            r = {"case": label, "error": repr(e)[:300]}
        finally:
            kernels.QUANT_TILE_ROWS_ROLLED = old_tile
        results.append(r)
        print(json.dumps(r), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
