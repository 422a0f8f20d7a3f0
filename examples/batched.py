"""Batched GIF example: all k=2..15 frames in ONE compiled executable.

TPU-native replacement of the reference's `core/examples/parallel.rs:7-65`,
which spawns one host thread per k over a shared GPU queue. Here the k axis
is a vmapped batch dimension with per-frame cluster masking — a single
device launch trains all 14 palettes and quantizes all 14 frames.

Usage: python examples/batched.py [input.png] [output.gif]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmeans_tpu.api import ImageProcessor, ReduceMode
from kmeans_tpu.utils.imageio import load_image, save_gif


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/gfx/turtles.png"
    dst = sys.argv[2] if len(sys.argv) > 2 else "turtles.gif"

    start = time.time()
    image = load_image(src)
    processor = ImageProcessor()

    frames = processor.reduce_batch(image, list(range(2, 16)), ReduceMode.REPLACE)
    save_gif(frames, dst, delay_cs=100, loop=True)
    print(f"Time elapsed in creating gif is: {time.time() - start:.2f}s")


if __name__ == "__main__":
    main()
