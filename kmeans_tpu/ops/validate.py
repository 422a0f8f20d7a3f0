"""Kernel validation utility.

The TPU analogue of the reference's optional naga shader validation
(`preprocessor/src/validate.rs:13-68`, a standalone binary that parses and
validates every WGSL kernel): run every Pallas kernel in interpreter mode
against the pure-XLA formulas and report per-mode bit-equality. Usable as a
library function or `python -m kmeans_tpu.ops.validate`.
"""

from __future__ import annotations

import sys

import numpy as np


def validate_kernels(verbose: bool = True) -> bool:
    import jax.numpy as jnp

    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.kernels import fused_quantize
    from kmeans_tpu.ops.quantize import dither_threshold, quantize_image

    rng = np.random.default_rng(0)
    ok = True
    for mode in ("replace", "dither", "meld"):
        for k in (1, 3, 8):
            img = jnp.asarray(rng.integers(0, 256, (31, 45, 4), dtype=np.uint8))
            pal = srgb8_to_lab(
                jnp.asarray(rng.integers(0, 256, (k, 3), dtype=np.uint8))
            )
            thr = dither_threshold(pal)
            want = np.asarray(quantize_image(img, pal, mode=mode))
            got = np.asarray(
                fused_quantize(img, pal, thr, mode=mode, interpret=True)
            )
            match = bool((want == got).all())
            ok &= match
            if verbose:
                print(f"fused_quantize mode={mode:7s} k={k}: "
                      f"{'OK' if match else 'MISMATCH'}")
    return ok


if __name__ == "__main__":
    sys.exit(0 if validate_kernels() else 1)
