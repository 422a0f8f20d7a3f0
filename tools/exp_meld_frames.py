"""Hardware decision: frames-mode meld (per-frame palettes, one launch)
vs per-frame meld launches — VERDICT round-2 task 5's batching half.

Round 2 excluded meld from the frame-batch kernel mode because the frame
kernel's dynamic centroid indexing contracts FMAs differently and the
2-closest blend can flip on 1-ulp ties. The round-2 policy for meld's
loop forms was the GOLDEN-QUALITY bar, not bit-form purity (meld matches
no XLA twin bit-exactly on hardware anyway, docs/perf.md) — this
measures what the frame kernel actually changes on real silicon:

    B=8 frames 768x640, k in {8, 64}: fraction of pixels differing from
    per-frame fused_meld_packed, max |u8 channel delta|, and the launch
    timing (one frames launch vs B solo launches, in-jit, latency-
    subtracted).

Run ON TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, H, W = 8, 768, 640
LOOP = 8


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
    from kmeans_tpu.utils.packing import unpack_rgb24_tile_words

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (B, H, W, 4), dtype=np.uint8)
    frames[..., 3] = 255
    frames_j = jnp.asarray(frames)
    np.asarray(frames_j[0, 0, 0])

    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    results = []
    for k in (8, 64):
        pals = np.stack(
            [srgb8_to_lab_np(rng.integers(0, 256, (k, 3), dtype=np.uint8))
             for _ in range(B)]
        ).astype(np.float32)
        pals_j = jnp.asarray(pals)
        tr = kernels.quant_tile_rows(k)

        batch_words = np.asarray(
            kernels.fused_meld_frames_packed(frames_j, pals_j)
        )
        solo = [
            unpack_rgb24_tile_words(
                np.asarray(
                    kernels.fused_meld_packed(frames_j[f], pals_j[f])
                ),
                H, W, tile_rows=tr,
            )
            for f in range(B)
        ]
        batch = [
            unpack_rgb24_tile_words(batch_words[f], H, W, tile_rows=tr)
            for f in range(B)
        ]
        diff_frac = float(
            np.mean([
                (batch[f] != solo[f]).any(axis=-1).mean() for f in range(B)
            ])
        )
        max_delta = int(
            max(
                np.abs(
                    batch[f].astype(np.int16) - solo[f].astype(np.int16)
                ).max()
                for f in range(B)
            )
        )

        # Timing: one frames launch vs B solo launches, both in one jit.
        # Thread acc into the palette operand (p + acc * 0.0) so the
        # kernel call is loop-carried — a loop-invariant body gets
        # hoisted out of the fori_loop and measures ONE call, not LOOP
        # (caught in the first run of this experiment: 0.01 ms "solo").
        @jax.jit
        def loop_batch(fr, p):
            def body(i, acc):
                wds = kernels.fused_meld_frames_packed(fr, p + acc * 0.0)
                return acc + wds[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        @jax.jit
        def loop_solo(fr, p):
            def body(i, acc):
                for f in range(B):
                    wds = kernels.fused_meld_packed(fr[f], p[f] + acc * 0.0)
                    acc = acc + wds[0, 0].astype(jnp.float32)
                return acc

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        cb = _timed(lambda: np.asarray(loop_batch(frames_j, pals_j)))
        tb = min(
            _timed(lambda: np.asarray(loop_batch(frames_j, pals_j)))
            for _ in range(3)
        )
        cs = _timed(lambda: np.asarray(loop_solo(frames_j, pals_j)))
        ts = min(
            _timed(lambda: np.asarray(loop_solo(frames_j, pals_j)))
            for _ in range(3)
        )
        r = {
            "k": k, "b": B,
            "diff_pixel_frac_vs_solo": diff_frac,
            "max_u8_channel_delta": max_delta,
            "batch_ms": round((tb - lat) / LOOP * 1e3, 2),
            "solo_sum_ms": round((ts - lat) / LOOP * 1e3, 2),
            "speedup": round(ts / tb, 2),
            "compile_s_batch": round(cb, 1),
            "compile_s_solo": round(cs, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    with open("/tmp/exp_meld_frames.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/exp_meld_frames.json", file=sys.stderr)


if __name__ == "__main__":
    main()
