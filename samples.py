"""Regenerate all reference sample outputs (the analogue of `samples.sh:3-8`).

    python samples.py [--gfx /root/reference/gfx] [--out ./gfx_out]

Produces the same set of images the reference's README links, using this
framework: reduce (replace + dither), palette swatch, find with hex palette
(replace + dither), find with the apollo palette image.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--gfx", default="/root/reference/gfx")
    parser.add_argument("--out", default="./gfx_out")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from kmeans_tpu import cli
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    tokyo = os.path.join(args.gfx, "tokyo.png")
    apollo = os.path.join(args.gfx, "apollo-1x.png")

    runs = [
        ["reduce", "-i", tokyo, "-c", "8",
         "-o", f"{args.out}/tokyo-reduce-c8-kmeans-replace.png"],
        ["reduce", "-i", tokyo, "-c", "8", "-m", "dither",
         "-o", f"{args.out}/tokyo-reduce-c8-kmeans-dither.png"],
        ["palette", "-i", tokyo, "-c", "8", "-s", "40",
         "-o", f"{args.out}/tokyo-palette-c8-kmeans-s40.png"],
        ["find", "-i", tokyo, "-p", "#050505,#ffffff,#ff0000",
         "-o", f"{args.out}/tokyo-find-replace-dark-white-red.png"],
        ["find", "-i", tokyo, "-p", "#050505,#ffffff,#ff0000", "-m", "dither",
         "-o", f"{args.out}/tokyo-find-dither-dark-white-red.png"],
        ["find", "-i", tokyo, "-p", apollo, "-m", "dither",
         "-o", f"{args.out}/tokyo-find-dither-apollo.png"],
    ]
    for argv in runs:
        print("kmeans-tpu", " ".join(argv))
        cli.main(argv)


if __name__ == "__main__":
    main()
