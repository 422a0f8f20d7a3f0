"""Serving example: handle arbitrary image sizes without per-shape compiles.

The TPU analogue of a quantization web service: images of many different
sizes arrive; the exact-shape path would trigger an XLA compile (minutes on
remote-compile deployments) for every unseen size. With
`ImageProcessor(bucketing=True)`, sizes round up to the {4,5,6,7}*2^k
ladder and each bucket's executable is compiled once — at warmup, not on a
user's request.

Run: python examples/serving.py  (CPU works; on TPU the warmup savings are
minutes per novel size instead of milliseconds.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from kmeans_tpu.api import ImageProcessor
from kmeans_tpu.image import Image
from kmeans_tpu.utils.bucketing import bucket_shape


def random_image(w: int, h: int, seed: int) -> Image:
    rng = np.random.default_rng(seed)
    base = np.array([[220, 50, 40], [40, 200, 70], [60, 70, 220], [235, 220, 90]])
    idx = rng.integers(0, 4, (h, w))
    rgb = np.clip(base[idx] + rng.integers(-12, 13, (h, w, 3)), 0, 255)
    rgba = np.concatenate(
        [rgb.astype(np.uint8), np.full((h, w, 1), 255, np.uint8)], -1
    )
    return Image((w, h), rgba)


def main() -> None:
    p = ImageProcessor(bucketing=True)

    # Deploy-time: precompile the buckets your traffic actually hits.
    expected_sizes = [(640, 480), (800, 600)]
    t0 = time.time()
    n = p.warmup(expected_sizes, color_counts=[8])
    print(f"warmup: {n} bucket executable(s) in {time.time() - t0:.1f}s")

    # Request-time: every size below reuses a warmed bucket executable.
    requests = [(640, 480), (600, 450), (620, 500), (800, 600), (860, 640)]
    for i, (w, h) in enumerate(requests):
        img = random_image(w, h, seed=i)
        t0 = time.time()
        out = p.reduce(8, img)
        k = len(np.unique(out.pixels.reshape(-1, 4), axis=0))
        bh, bw = bucket_shape(h, w)
        print(
            f"request {w}x{h} (bucket {bw}x{bh}): {time.time() - t0:.3f}s, "
            f"{k} colors"
        )

    # Concurrent serving: the HTTP daemon (python -m kmeans_tpu.serve)
    # coalesces same-parameter /reduce, /find, and /palette requests into
    # ONE batched launch per collection window. The library primitives it
    # uses work standalone too — mixed sizes, one launch per shape bucket:
    frames = [
        random_image(w, h, seed=10 + i) for i, (w, h) in enumerate(requests)
    ]
    t0 = time.time()
    outs = p.reduce_many(frames, 8)
    print(f"reduce_many: {len(outs)} mixed-size images, {time.time() - t0:.3f}s")
    t0 = time.time()
    pals = p.palette_many(frames, 8)
    hexes = ",".join(f"#{r:02X}{g:02X}{b:02X}" for r, g, b, _ in pals[0])
    print(f"palette_many: {len(pals)} palettes in {time.time() - t0:.3f}s, "
          f"first: {hexes}")


if __name__ == "__main__":
    main()
