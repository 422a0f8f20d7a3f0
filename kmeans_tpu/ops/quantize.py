"""Output-mode ops: replace, ordered dither, meld.

TPU-native reimplementation of the reference's output pipelines
(`core/src/operations.rs:99-271`), which each run convert -> (assign) ->
mix/swap -> revert as separate GPU dispatches over intermediate Rgba32Float
textures. Here each mode is a pure function over Lab pixels which XLA fuses
with the surrounding color conversions into a single HBM pass; see
`ops/kernels.py` for the hand-fused Pallas versions of the same math.

Formulas (all distances CIE94, pixel/candidate first — see ops/delta_e.py):

- replace (`swap.wgsl:10-25` after `find_centroid.wgsl:15-44`): each pixel
  becomes its nearest centroid's color.
- dither (`mix_colors.wgsl:50-82`): classic 4x4 Bayer ordered dithering in
  Lab space. The threshold is a greedy approximation of the max pairwise
  centroid distance, divided by sqrt(k) (mix_colors.wgsl:52-68);
  adjusted = color + threshold * (bayer(x, y) - 0.5); the output is the
  centroid nearest to the adjusted color.
- meld (`mix_colors.wgsl:85-90`): blend of the two closest centroids
  weighted by relative distance:
  factor = d(color, second) / d(closest, second);
  out = factor * closest + (1 - factor) * second.
- k == 1 short-circuits to the single palette color
  (mix_colors.wgsl:104-108,127-131).

Outputs carry alpha = 255, matching the reference's Rgba8Unorm writes (the
revert shader stores alpha 1.0 unconditionally, lab_to_rgb.wgsl:36,80).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from kmeans_tpu.ops.colorspace import lab_to_srgb8, srgb8_to_lab
from kmeans_tpu.ops.delta_e import metric_fns

# 4x4 Bayer/index matrix (mix_colors.wgsl:14-17), row-major.
BAYER_4X4 = (
    (0, 8, 2, 10),
    (12, 4, 14, 6),
    (3, 11, 1, 9),
    (15, 7, 13, 5),
)

_BIG = 3.4e38  # larger than any CIE94^2; plain float so import stays device-free


def _valid_mask(k: int, k_active) -> jnp.ndarray:
    if k_active is None:
        return jnp.ones((k,), dtype=bool)
    return jnp.arange(k) < jnp.asarray(k_active, jnp.int32)


def _d2_matrix(
    lab: jnp.ndarray, palette: jnp.ndarray, valid: jnp.ndarray,
    metric: str = "cie94",
):
    _, dist_sq = metric_fns(metric)
    d2 = dist_sq(lab[..., None, :], palette)  # [..., K]
    return jnp.where(valid, d2, _BIG)


def nearest_color(
    lab: jnp.ndarray, palette: jnp.ndarray, k_active=None, metric: str = "cie94"
) -> jnp.ndarray:
    """Replace each Lab pixel with its nearest palette entry (swap.wgsl)."""
    valid = _valid_mask(palette.shape[0], k_active)
    idx = jnp.argmin(_d2_matrix(lab, palette, valid, metric), axis=-1)
    return palette[idx]


def nearest_index(
    lab: jnp.ndarray, palette: jnp.ndarray, k_active=None, metric: str = "cie94"
) -> jnp.ndarray:
    """Index of each Lab pixel's nearest palette entry (uint8 for
    k <= 256, uint16 for the large-`find` tier up to 512) — the XLA
    counterpart of the fused kernel's `emit_index` output, used by
    indexed readback paths where the host reconstructs `palette[idx]`."""
    valid = _valid_mask(palette.shape[0], k_active)
    dtype = jnp.uint8 if palette.shape[0] <= 256 else jnp.uint16
    return jnp.argmin(_d2_matrix(lab, palette, valid, metric), axis=-1).astype(
        dtype
    )


def assign_index(
    lab: jnp.ndarray,
    palette: jnp.ndarray,
    mode: str = "replace",
    k_active=None,
    row_offset=0,
    metric: str = "cie94",
) -> jnp.ndarray:
    """Per-pixel palette index `[H, W]` uint8 for replace/dither (meld
    blends colors, so it has no index representation). Selecting
    `palette[idx]` is exactly `nearest_color`/`dither`'s output: dither's
    k == 1 short-circuit emits palette[0], which IS index 0's color (the
    only valid argmin when one entry is active)."""
    if mode == "replace":
        return nearest_index(lab, palette, k_active, metric)
    if mode == "dither":
        h, w = lab.shape[0], lab.shape[1]
        threshold = dither_threshold(palette, k_active, metric)
        adjusted = lab + (threshold * bayer_values(h, w, row_offset))[..., None]
        return nearest_index(adjusted, palette, k_active, metric)
    raise ValueError("assign_index supports replace/dither only")


def dither_threshold(
    palette: jnp.ndarray, k_active=None, metric: str = "cie94"
) -> jnp.ndarray:
    """Greedy approximate max pairwise centroid delta-E distance / sqrt(k).

    Mirrors mix_colors.wgsl:52-68 exactly, including the asymmetric distance
    orientation (candidate centroid first) and the greedy update order.
    """
    dist, _ = metric_fns(metric)
    k = palette.shape[0]
    k_active = jnp.asarray(k if k_active is None else k_active, jnp.int32)

    a0 = palette[0]
    b0 = palette[jnp.minimum(1, k - 1)]
    dab0 = dist(a0, b0)

    def body(i, carry):
        a, b, dab = carry
        ci = palette[i]
        da = dist(ci, a)
        db = dist(ci, b)
        first = jnp.logical_and(da > db, da > dab)
        second = jnp.logical_and(jnp.logical_not(first), db > dab)
        active = i < k_active
        b = jnp.where(active & first, ci, b)
        a = jnp.where(active & second, ci, a)
        dab = jnp.where(
            active, jnp.where(first, da, jnp.where(second, db, dab)), dab
        )
        return a, b, dab

    if k > 2:
        _, _, dab = jax.lax.fori_loop(2, k, body, (a0, b0, dab0))
    else:
        dab = dab0
    return dab / jnp.sqrt(k_active.astype(jnp.float32))


def bayer_values(height: int, width: int, row_offset=0) -> jnp.ndarray:
    """`index_value(coords) - 0.5` for every pixel (mix_colors.wgsl:21-27,70).

    `row_offset` (traced ok) shifts the y coordinate — used by streamed
    row-band processing so a band's dither pattern matches its absolute
    position in the full image."""
    m = jnp.asarray(BAYER_4X4, jnp.float32) / 16.0 - 0.5
    ys = (jnp.arange(height) + row_offset) % 4
    xs = jnp.arange(width) % 4
    return m[ys[:, None], xs[None, :]]  # [H, W]


def dither(
    lab: jnp.ndarray, palette: jnp.ndarray, k_active=None, row_offset=0,
    metric: str = "cie94",
) -> jnp.ndarray:
    """Ordered dithering over Lab pixels `[H, W, 3]` (mix_colors.wgsl:50-82)."""
    h, w = lab.shape[0], lab.shape[1]
    threshold = dither_threshold(palette, k_active, metric)
    adjusted = lab + (threshold * bayer_values(h, w, row_offset))[..., None]
    out = nearest_color(adjusted, palette, k_active, metric)
    # k == 1: output the palette color directly (mix_colors.wgsl:104-108).
    k_act = jnp.asarray(palette.shape[0] if k_active is None else k_active, jnp.int32)
    return jnp.where(k_act == 1, palette[0], out)


def meld(
    lab: jnp.ndarray, palette: jnp.ndarray, k_active=None, metric: str = "cie94"
) -> jnp.ndarray:
    """Blend of the two closest centroids (mix_colors.wgsl:29-47,85-90).

    Large palettes chunk the pixel rows so the `[pixels, K]` top-k
    intermediate stays bounded (a 4K image with a 512-color palette would
    otherwise materialize ~17 GB)."""
    if palette.shape[0] == 1:
        # Static k == 1: nothing to meld (mix_colors.wgsl:127-131).
        return jnp.broadcast_to(palette[0], lab.shape)
    if palette.shape[0] > 64 and lab.ndim == 3:
        return _meld_chunked(lab, palette, k_active, metric)
    return _meld_block(lab, palette, k_active, metric)


def _meld_block(lab, palette, k_active=None, metric="cie94"):
    dist, _ = metric_fns(metric)
    valid = _valid_mask(palette.shape[0], k_active)
    d2 = _d2_matrix(lab, palette, valid, metric)  # [..., K]
    _, idx2 = jax.lax.top_k(-d2, 2)  # two smallest, first-index tie-break
    closest = palette[idx2[..., 0]]
    second = palette[idx2[..., 1]]
    num = dist(lab, second)
    den = dist(closest, second)
    factor = (num / den)[..., None]
    out = factor * closest + (1.0 - factor) * second
    k_act = jnp.asarray(palette.shape[0] if k_active is None else k_active, jnp.int32)
    return jnp.where(k_act == 1, palette[0], out)


def _meld_chunked(lab, palette, k_active=None, metric="cie94"):
    """Row-chunked meld: lax.map over row blocks bounds the per-step
    [rows, W, K] intermediate to ~256 MB."""
    h, w = lab.shape[0], lab.shape[1]
    rows = max(1, (1 << 26) // max(w * palette.shape[0], 1))
    n_chunks = (h + rows - 1) // rows
    h_pad = n_chunks * rows
    padded = jnp.pad(lab, ((0, h_pad - h), (0, 0), (0, 0)))
    chunks = padded.reshape(n_chunks, rows, w, 3)
    out = jax.lax.map(
        lambda c: _meld_block(c, palette, k_active, metric), chunks
    )
    return out.reshape(h_pad, w, 3)[:h]


@partial(jax.jit, static_argnames=("mode", "metric"))
@jax.named_scope("quantize.xla")
def quantize_image(
    rgba_u8: jnp.ndarray,
    palette_lab: jnp.ndarray,
    mode: str = "replace",
    k_active=None,
    row_offset=0,
    metric: str = "cie94",
) -> jnp.ndarray:
    """Full-resolution output pass: uint8 RGBA `[H, W, 4]` -> uint8 RGBA.

    Equivalent to the reference pipelines `find_colors` (replace,
    `core/src/operations.rs:215-271`), `dither_colors` (:99-155) and
    `meld_colors` (:157-213): sRGB -> Lab -> mode -> Lab -> sRGB, with
    alpha forced to 255. XLA fuses the whole chain into one pass over HBM.
    """
    lab = srgb8_to_lab(rgba_u8[..., :3])
    if mode == "replace":
        out_lab = nearest_color(lab, palette_lab, k_active, metric)
    elif mode == "dither":
        out_lab = dither(lab, palette_lab, k_active, row_offset, metric)
    elif mode == "meld":
        out_lab = meld(lab, palette_lab, k_active, metric)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    rgb8 = lab_to_srgb8(out_lab)
    alpha = jnp.full(rgb8.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb8, alpha], axis=-1)
