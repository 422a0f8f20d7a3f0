"""Sequential GIF example: reduce one image at k=2..15, one frame per k.

Equivalent of the reference's `core/examples/gif.rs:7-47` (sequential
one-reduce-per-frame loop). See `examples/batched.py` for the TPU-native
replacement of `parallel.rs` that runs all frames in one executable.

Usage: python examples/gif.py [input.png] [output.gif]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmeans_tpu.api import Algorithm, ImageProcessor, ReduceMode
from kmeans_tpu.utils.imageio import load_image, save_gif


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/gfx/turtles.png"
    dst = sys.argv[2] if len(sys.argv) > 2 else "turtles.gif"

    start = time.time()
    image = load_image(src)
    processor = ImageProcessor()

    frames = [
        processor.reduce(c, image, Algorithm.KMEANS, ReduceMode.REPLACE)
        for c in range(2, 16)
    ]
    save_gif(frames, dst, delay_cs=100, loop=True)
    print(f"Time elapsed in creating gif is: {time.time() - start:.2f}s")


if __name__ == "__main__":
    main()
