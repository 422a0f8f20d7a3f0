"""Heavy-bucket coalescing A/B: is `palette_many` itself slower than
solo `palette`, or is the closed-loop load-test loss batcher dynamics?

Round-4 healthy-tunnel load rows (docs/serving.md) measured the heavy
/palette bucket at 0.59x rps under micro-batching. This isolates the
executable from the HTTP/batcher dynamics: same shapes, no server —
7 solo bucketed full-res `palette` calls vs one `palette_many[7]`
(the exact heavy `lax.map` executable the batcher launches).

Measured (TPU v5e, 1280x960, `train_max_size=None`, k=8):
solo x7 = 895 ms (128 ms/frame); palette_many[7] = 849 ms
(121 ms/frame) — the coalesced executable is 0.95x (5% FASTER). The
closed-loop loss is therefore entirely client-lockstep idle time, as
docs/serving.md's arithmetic shows; the open-loop generator
(tools/load_serve.py `open_rate`) confirms batching wins 1.53x under
Poisson arrivals.

Run on the TPU host: python tools/exp_heavy_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from kmeans_tpu.api import ImageProcessor
from kmeans_tpu.image import Image


def main() -> None:
    rng = np.random.default_rng(7)
    base = np.array([[220, 50, 40], [40, 200, 70], [60, 70, 220]], np.int32)
    h, w = 960, 1280
    idx = rng.integers(0, 3, (h, w))
    rgb = np.clip(base[idx] + rng.integers(-8, 9, (h, w, 3)), 0, 255)
    rgba = np.concatenate(
        [rgb.astype(np.uint8), np.full((h, w, 1), 255, np.uint8)], -1
    )
    img = Image((w, h), rgba)

    p = ImageProcessor(bucketing=True, train_max_size=None)
    # Warm both executables (the same ones the serve daemon launches).
    p.palette(8, img)
    p.palette_many([img] * 7, 8)

    t0 = time.perf_counter()
    for _ in range(7):
        p.palette(8, img)
    solo = time.perf_counter() - t0
    t0 = time.perf_counter()
    p.palette_many([img] * 7, 8)
    many = time.perf_counter() - t0
    print(f"solo x7: {solo * 1e3:.0f} ms ({solo / 7 * 1e3:.0f} ms/frame)")
    print(f"palette_many[7]: {many * 1e3:.0f} ms ({many / 7 * 1e3:.0f} ms/frame)")
    print(f"ratio many/solo: {many / solo:.2f}")


if __name__ == "__main__":
    main()
