"""Heavy-bucket coalescing A/B: is `palette_many` itself slower than
solo `palette`, or is the closed-loop load-test loss batcher dynamics?

Round-4 healthy-tunnel load rows (docs/serving.md) measured the heavy
/palette bucket at 0.59x rps under micro-batching. This isolates the
executable from the HTTP/batcher dynamics: same shapes, no server —
7 solo bucketed full-res `palette` calls vs one `palette_many[7]`
(the exact heavy `lax.map` executable the batcher launches).

Interleaved repetitions with medians: single-shot captures through the
dev tunnel swing with ambient wire rate, so each variant runs `reps`
times alternating S,M,S,M and the MEDIANS are the result. Measured
across three sessions (TPU v5e, 1280x960, `train_max_size=None`, k=8):
ratio many/solo = 0.95 (895 vs 849 ms, healthy wire), 1.21 (908 vs
1102 ms), 1.11 median-of-3 on a degraded session whose per-frame times
tripled (313 ms/frame solo) — i.e. PARITY within transport noise, and
nowhere near the ~1.7x the closed-loop rps gap would require if the
executable were the cause. The load-test loss is client-lockstep idle
time plus ambient wire, as docs/serving.md's multi-session ledger
shows (heavy direction 0.59-1.53x across sessions and generators —
transport weather, not the batcher).

Run on the TPU host: python tools/exp_heavy_ab.py [reps=3]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from load_serve import test_image  # the load test's exact workload image

from kmeans_tpu.api import ImageProcessor


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    img = test_image(1280, 960)

    p = ImageProcessor(bucketing=True, train_max_size=None)
    # Warm both executables (the same ones the serve daemon launches).
    p.palette(8, img)
    p.palette_many([img] * 7, 8)

    solos, manys = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(7):
            p.palette(8, img)
        solos.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        p.palette_many([img] * 7, 8)
        manys.append(time.perf_counter() - t0)
    solo = statistics.median(solos)
    many = statistics.median(manys)
    print(f"solo x7 (median of {reps}): {solo * 1e3:.0f} ms "
          f"({solo / 7 * 1e3:.0f} ms/frame; all {[round(s*1e3) for s in solos]})")
    print(f"palette_many[7] (median of {reps}): {many * 1e3:.0f} ms "
          f"({many / 7 * 1e3:.0f} ms/frame; all {[round(s*1e3) for s in manys]})")
    print(f"ratio many/solo: {many / solo:.2f}")


if __name__ == "__main__":
    main()
