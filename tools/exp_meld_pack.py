"""Hardware measurement: meld's in-kernel RGB24 pack (3 B/px readback)
vs the full-RGBA meld kernel — bit-identity + end-to-end readback times
at 4K k=8 (VERDICT round-2 task 5). Run on the real TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from kmeans_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from kmeans_tpu.ops.colorspace import srgb8_to_lab
from kmeans_tpu.ops.kernels import (
    fused_meld_packed,
    fused_quantize,
    quant_tile_rows,
)
from kmeans_tpu.utils.imageio import load_image
from kmeans_tpu.utils.packing import unpack_rgb24_tile_words


def main():
    img = load_image("/tmp/drive/tokyo.png").pixels
    big = np.tile(img, (4, 5, 1))[:2052, :3840]
    h, w = big.shape[:2]
    print("shape", big.shape)
    pal_rgb = np.array(
        [
            [10, 10, 10], [240, 240, 240], [200, 30, 30], [30, 200, 30],
            [30, 30, 200], [200, 200, 30], [30, 200, 200], [200, 30, 200],
        ],
        np.uint8,
    )
    pal_lab = srgb8_to_lab(jnp.asarray(pal_rgb.reshape(-1, 3)))
    dev = jnp.asarray(big)

    rgba = fused_quantize(dev, pal_lab, jnp.float32(0.0), mode="meld")
    rgba_np = np.asarray(rgba)  # [H, W, 4] uint8 RGBA
    words = fused_meld_packed(dev, pal_lab)
    words_np = np.asarray(words)
    got = unpack_rgb24_tile_words(words_np, h, w, tile_rows=quant_tile_rows(8))
    print("bit-identical:", np.array_equal(got, rgba_np))
    print(
        "bytes rgba:", rgba_np.nbytes, "packed:", words_np.nbytes,
        "ratio:", round(rgba_np.nbytes / words_np.nbytes, 3),
    )

    # Fresh derived arrays each rep (JAX caches the host copy otherwise).
    mk_rgba = jax.jit(
        lambda x, s: fused_quantize(x + s, pal_lab, jnp.float32(0.0), mode="meld")
    )
    mk_pack = jax.jit(lambda x, s: fused_meld_packed(x + s, pal_lab))

    def rt(fn):
        best = 1e9
        for i in range(1, 6):
            r = fn(jnp.uint8(i))
            t0 = time.perf_counter()
            np.asarray(r)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    print("readback rgba ms:", round(rt(lambda s: mk_rgba(dev, s)), 1))
    print("readback packed ms:", round(rt(lambda s: mk_pack(dev, s)), 1))
    # Host unpack cost (numpy byte shuffles) for the packed tier.
    t0 = time.perf_counter()
    unpack_rgb24_tile_words(words_np, h, w, tile_rows=quant_tile_rows(8))
    print("host unpack ms:", round((time.perf_counter() - t0) * 1e3, 1))


if __name__ == "__main__":
    main()
