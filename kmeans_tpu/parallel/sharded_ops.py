"""Sharded full-resolution ops: quantize across the mesh's pixel axis.

The output pass is embarrassingly parallel over pixels, so no collectives
are needed — rows are placed across devices with a `NamedSharding` and XLA
partitions the jitted quantize automatically. This lifts the single-chip
HBM bound on image size (the reference is capped at 8192x8192 by GPU
texture limits, `README.md:9-11`; a v5e pod slice can hold arbitrarily
large pixel buffers sharded row-wise).

Transfer parity with the single-chip paths (round 2): callers upload
RGB-only `[H, W, 3]` (alpha never participates; the executable appends
alpha on device) and, for replace/dither with k <= 512, read back an
index map via `assign_indexed_sharded` — 2/4/8 bits per pixel
width-axis-packed for k <= 256, raw uint16 (16 bits) for the large-find
tier 256 < k <= 512 — with the host reconstructing `palette[idx]`. The
pack runs along the width axis, so the row-sharded layout packs
shard-locally with no collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from kmeans_tpu.ops.colorspace import srgb8_to_lab
from kmeans_tpu.ops.quantize import assign_index, quantize_image
from kmeans_tpu.parallel.mesh import PIXEL_AXIS
from kmeans_tpu.utils.packing import nibble_packed, pack_bits, pack_nibbles


def _row_sharded(mesh, rgb_u8):
    """Pad rows to the shard count and place the array row-sharded."""
    rgb_u8 = jnp.asarray(rgb_u8)
    h = rgb_u8.shape[0]
    d = mesh.shape[PIXEL_AXIS]
    h_pad = (h + d - 1) // d * d
    padded = (
        jnp.pad(rgb_u8, ((0, h_pad - h), (0, 0), (0, 0)))
        if h_pad != h
        else rgb_u8
    )
    return (
        jax.device_put(padded, NamedSharding(mesh, P(PIXEL_AXIS, None, None))),
        h,
    )


def quantize_image_sharded(
    mesh,
    rgba_u8,
    palette_lab,
    mode: str = "replace",
    k_active=None,
    metric: str = "cie94",
):
    """Quantize `[H, W, 3|4]` uint8 with rows sharded over the mesh's pixel
    axis (RGB-only input saves 25% upload; alpha is appended on device).
    Rows are padded up to the shard count and sliced back, so any height
    works. Returns the output array (gather with np.asarray)."""
    sharded, h = _row_sharded(mesh, rgba_u8)
    out = quantize_image(
        sharded, jnp.asarray(palette_lab), mode=mode, k_active=k_active,
        metric=metric,
    )
    return out[:h]


@partial(jax.jit, static_argnames=("mode", "metric", "bits"))
def _assign_pack_jit(rgb_u8, palette_lab, mode, k_active, metric, bits):
    """Row-sharded index assignment + width-axis bit pack (one executable;
    XLA partitions it over the input's row sharding)."""
    lab = srgb8_to_lab(rgb_u8[..., :3])
    idx = assign_index(lab, palette_lab, mode=mode, k_active=k_active,
                       metric=metric)
    if bits < 8:
        idx = pack_nibbles(idx, bits)
    return idx


def assign_indexed_sharded(
    mesh,
    rgb_u8,
    palette_lab,
    mode: str = "replace",
    k_active=None,
    metric: str = "cie94",
):
    """Multi-chip indexed readback: rows sharded over the pixel axis, each
    shard assigns + packs locally; returns `(packed, bits)` where `packed`
    is the device array (`[H, ceil(W * bits / 8)]` uint8 for bits <= 8,
    `[H, W]` uint16 for the 16-bit tier) and the host unpacks with
    `utils.packing.unpack_nibbles` (bits < 8) or indexes directly, then
    gathers `palette[idx]`. Valid for replace/dither with k <= 512."""
    palette_lab = jnp.asarray(palette_lab)
    kp = palette_lab.shape[0]
    if kp > 512:
        raise ValueError("indexed readback requires k <= 512")
    # 2/4 -> width-axis byte pack; 8 -> raw u8; 16 -> raw u16 (2 B/px,
    # still half the RGBA readback) — `assign_index` picks the dtype.
    bits = pack_bits(kp) if nibble_packed(kp) else (8 if kp <= 256 else 16)
    sharded, h = _row_sharded(mesh, rgb_u8)
    packed = _assign_pack_jit(
        sharded, palette_lab, mode, k_active, metric, bits
    )
    return packed[:h], bits
