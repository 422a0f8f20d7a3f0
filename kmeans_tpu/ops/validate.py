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

    from kmeans_tpu.models.kmeans import _update_centroids, assign_clusters
    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.kernels import (
        fused_assign,
        fused_quantize,
        lloyd_accumulate,
        pack_lab_planes,
        pack_plane,
    )
    from kmeans_tpu.ops.quantize import dither_threshold, quantize_image

    rng = np.random.default_rng(0)
    ok = True

    def report(name: str, match: bool) -> None:
        nonlocal ok
        ok &= match
        if verbose:
            print(f"{name}: {'OK' if match else 'MISMATCH'}")

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
            if mode == "meld":
                diff = np.abs(got.astype(int) - want.astype(int))
                match = bool(
                    diff.max() <= 1 and (diff.max(axis=-1) > 0).mean() <= 1e-3
                )
            else:
                match = bool((want == got).all())
            report(f"fused_quantize mode={mode:7s} k={k}", match)
            if mode != "meld":
                idx = np.asarray(
                    fused_assign(img, pal, thr, mode=mode, interpret=True)
                )
                report(
                    f"fused_assign   mode={mode:7s} k={k}",
                    bool((idx < max(k, 1)).all()),
                )
                # In-kernel sublane pack must invert exactly (round 2).
                from kmeans_tpu.ops.kernels import (
                    fused_assign_packed,
                    quant_tile_rows,
                )
                from kmeans_tpu.utils.packing import (
                    pack_bits,
                    unpack_tile_words,
                )

                words = np.asarray(
                    fused_assign_packed(
                        img, pal, thr, mode=mode, interpret=True
                    )
                )
                got_idx = unpack_tile_words(
                    words, 31, 45, pack_bits(k),
                    tile_rows=quant_tile_rows(k),
                )
                report(
                    f"assign_packed  mode={mode:7s} k={k}",
                    bool(np.array_equal(got_idx, idx)),
                )

    # 16-bit packed tier (256 < k <= 512, the large-`find` palettes):
    # unpack must invert the kernel layout and match the XLA argmin.
    from kmeans_tpu.ops.kernels import fused_assign_packed, quant_tile_rows
    from kmeans_tpu.ops.quantize import assign_index
    from kmeans_tpu.utils.packing import pack_bits, unpack_tile_words

    img16 = jnp.asarray(rng.integers(0, 256, (26, 37, 4), dtype=np.uint8))
    pal16 = srgb8_to_lab(
        jnp.asarray(rng.integers(0, 256, (300, 3), dtype=np.uint8))
    )
    thr16 = dither_threshold(pal16)
    words16 = np.asarray(
        fused_assign_packed(img16, pal16, thr16, mode="dither", interpret=True)
    )
    got16 = unpack_tile_words(
        words16, 26, 37, pack_bits(300), tile_rows=quant_tile_rows(300)
    )
    want16 = np.asarray(
        assign_index(srgb8_to_lab(img16[..., :3]), pal16, mode="dither")
    )
    report(
        "assign_packed  16-bit tier k=300",
        bool(got16.dtype == np.uint16 and np.array_equal(got16, want16)),
    )

    # CIEDE2000 kernels (polynomial atan2): knife-edge flips only.
    for mode in ("replace", "dither", "meld"):
        img = jnp.asarray(rng.integers(0, 256, (29, 41, 4), dtype=np.uint8))
        pal = srgb8_to_lab(
            jnp.asarray(rng.integers(0, 256, (6, 3), dtype=np.uint8))
        )
        thr = dither_threshold(pal, metric="cie2000")
        want = np.asarray(quantize_image(img, pal, mode=mode, metric="cie2000"))
        got = np.asarray(
            fused_quantize(
                img, pal, thr, mode=mode, interpret=True, metric="cie2000"
            )
        )
        flips = (want != got).any(axis=-1).mean()
        report(f"fused_quantize cie2000 mode={mode:7s}", bool(flips < 2e-3))

    cents2 = srgb8_to_lab(
        jnp.asarray(rng.integers(0, 256, (4, 3), dtype=np.uint8))
    )
    pix2 = jnp.asarray(rng.normal(50, 20, (3000, 3)).astype(np.float32))
    planes2, n2 = pack_lab_planes(pix2)
    totals2 = np.asarray(
        lloyd_accumulate(planes2, cents2, n2, interpret=True, metric="cie2000")
    )
    sums2, counts2 = _update_centroids(
        pix2, assign_clusters(pix2, cents2, metric="cie2000"), 4
    )
    report(
        "lloyd_accumulate cie2000 k=4",
        bool(
            np.allclose(totals2[:, :3], np.asarray(sums2), rtol=1e-3, atol=0.1)
            and np.abs(totals2[:, 3] - np.asarray(counts2)).max() <= 2
        ),
    )

    # Training accumulator vs the one-hot matmul ground truth.
    pix = jnp.asarray(rng.normal(50, 25, (5000, 3)).astype(np.float32))
    cents = jnp.asarray(rng.normal(50, 25, (6, 3)).astype(np.float32))
    planes, n = pack_lab_planes(pix)
    totals = np.asarray(lloyd_accumulate(planes, cents, n, interpret=True))
    sums, counts = _update_centroids(pix, assign_clusters(pix, cents), 6)
    match = bool(
        np.allclose(totals[:, :3], np.asarray(sums), rtol=1e-4, atol=1e-2)
        and (totals[:, 3] == np.asarray(counts)).all()
    )
    report("lloyd_accumulate k=6", match)

    # Weighted variant (shape-bucketing path): weight-0 pixels vanish.
    weight = jnp.asarray((rng.uniform(size=5000) > 0.4).astype(np.float32))
    totals_w = np.asarray(
        lloyd_accumulate(
            planes, cents, n, weight_planes=pack_plane(weight), interpret=True
        )
    )
    sums_w, counts_w = _update_centroids(
        pix, assign_clusters(pix, cents), 6, weight
    )
    match = bool(
        np.allclose(totals_w[:, :3], np.asarray(sums_w), rtol=1e-4, atol=1e-2)
        and (totals_w[:, 3] == np.asarray(counts_w)).all()
    )
    report("lloyd_accumulate k=6 weighted", match)
    return ok


if __name__ == "__main__":
    sys.exit(0 if validate_kernels() else 1)
