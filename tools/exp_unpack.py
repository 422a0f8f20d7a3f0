"""Measure the host readback-unpack tiers: numpy spec vs native C twins
(runtime/_imagio.c). Backs the "Native readback unpack" table in
docs/perf.md; host-only (no device), so it runs anywhere.

Usage: python tools/exp_unpack.py [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from kmeans_tpu.ops.kernels import quant_tile_rows  # noqa: E402
from kmeans_tpu.utils import packing  # noqa: E402


def best_of(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    h, w = 2160, 3840  # 4K, 8.3 Mpix
    n = h * w
    rows = -(-n // 128)
    rng = np.random.default_rng(0)

    print(f"4K {h}x{w} ({n/1e6:.1f} Mpix), best of {reps}")
    for k in (8, 256, 512):
        bits = packing.pack_bits(k)
        tile = quant_tile_rows(k)
        ppw = 32 // bits
        m = -(-rows // tile) * (tile // ppw)
        words = rng.integers(0, 2**31 - 1, size=(m, 128), dtype=np.int32)
        # clamp packed indices below k so the gather never rejects
        lim = 1 << (k - 1).bit_length() >> 1 or 1
        mask = int(
            sum((lim - 1) << (bits * j) for j in range(ppw)) & 0xFFFFFFFF
        )
        words &= np.int32(mask)
        pal = rng.integers(0, 255, size=(k, 4), dtype=np.uint8)

        t_np = best_of(
            lambda: pal[
                packing.unpack_tile_words(words, h, w, bits, tile_rows=tile)
            ],
            reps,
        )
        t_c = best_of(
            lambda: packing.unpack_tile_words_gather(
                words, h, w, bits, pal, tile_rows=tile
            ),
            reps,
        )
        print(
            f"idx+gather k={k:>3} ({bits:>2}-bit): numpy {t_np*1e3:7.1f} ms"
            f"  C {t_c*1e3:6.1f} ms  ({t_np/t_c:.1f}x, {n/t_c/1e6:.0f} Mpix/s)"
        )

    tile = quant_tile_rows(8)
    m = -(-rows // tile) * (3 * tile // 4)
    words = rng.integers(-(2**31), 2**31 - 1, size=(m, 128), dtype=np.int32)
    t_np = best_of(
        lambda: packing._unpack_rgb24_np(words, h, w, tile), reps
    )
    t_c = best_of(
        lambda: packing.unpack_rgb24_tile_words(words, h, w, tile), reps
    )
    print(
        f"meld RGB24 -> RGBA:        numpy {t_np*1e3:7.1f} ms"
        f"  C {t_c*1e3:6.1f} ms  ({t_np/t_c:.1f}x, {n/t_c/1e6:.0f} Mpix/s)"
    )


if __name__ == "__main__":
    main()
