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
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from kmeans_tpu.ops.colorspace import srgb8_to_lab
from kmeans_tpu.ops.kernels import INDEXED_MAX_K
from kmeans_tpu.ops.quantize import assign_index, dither_threshold, quantize_image
from kmeans_tpu.parallel.mesh import PIXEL_AXIS
from kmeans_tpu.utils.packing import nibble_packed, pack_bits, pack_nibbles


def _row_sharded(mesh, rgb_u8):
    """Pad rows to the shard count and place the array row-sharded. Host
    (numpy) inputs pad on the host — an eager device pad would cost a
    full dispatch round trip on remote transports before the real
    upload."""
    if not isinstance(rgb_u8, (np.ndarray, jax.Array)):
        # Array-likes (nested lists, memoryviews) coerce up front so the
        # host-pad fast path below still sees a numpy array.
        rgb_u8 = np.asarray(rgb_u8)
    h = rgb_u8.shape[0]
    d = mesh.shape[PIXEL_AXIS]
    h_pad = (h + d - 1) // d * d
    if h_pad != h:
        pad = ((0, h_pad - h), (0, 0), (0, 0))
        rgb_u8 = (
            np.pad(rgb_u8, pad)
            if isinstance(rgb_u8, np.ndarray)
            else jnp.pad(rgb_u8, pad)
        )
    return (
        jax.device_put(rgb_u8, NamedSharding(mesh, P(PIXEL_AXIS, None, None))),
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
    if kp > INDEXED_MAX_K:
        raise ValueError(f"indexed readback requires k <= {INDEXED_MAX_K}")
    # 2/4 -> width-axis byte pack; 8 -> raw u8; 16 -> raw u16 (2 B/px,
    # still half the RGBA readback) — `assign_index` picks the dtype.
    bits = pack_bits(kp) if nibble_packed(kp) else (8 if kp <= 256 else 16)
    sharded, h = _row_sharded(mesh, rgb_u8)
    packed = _assign_pack_jit(
        sharded, palette_lab, mode, k_active, metric, bits
    )
    return packed[:h], bits


def assign_fused_sharded(
    mesh,
    rgb_u8,
    palette_lab,
    mode: str = "replace",
    k_active=None,
    metric: str = "cie94",
    fast: bool = False,
    interpret: bool = False,
):
    """Multi-chip indexed readback at single-chip KERNEL speed: every
    shard runs the fused Pallas quantize/assign kernel
    (`ops/kernels.py::fused_assign_packed` — gamma LUT, in-kernel sublane
    index pack) on its local row block under `shard_map`. No collectives:
    the output pass is embarrassingly parallel over pixels, and the pack
    is tile-local. The per-shard `row_offset = shard * local_h` keeps the
    4x4 Bayer dither phase GLOBAL, so outputs are independent of the
    shard count.

    On a production multi-chip slice this replaces the XLA quantizer in
    `assign_indexed_sharded` with the hand-fused kernel measured 10-40x
    faster per chip (docs/perf.md; e.g. 4K k=8: 0.65 ms fused vs ~26 ms
    XLA). Returns `(words, bits)` where `words` is the `[D * M, 128]`
    int32 packed-word readback (D = pixel-axis shards) that
    `unpack_fused_sharded` inverts on the host. Replace/dither, k <= 512.
    """
    palette_lab = jnp.asarray(palette_lab, jnp.float32)
    kp = palette_lab.shape[0]
    if kp > INDEXED_MAX_K:
        raise ValueError(
            f"packed indexed readback requires k <= {INDEXED_MAX_K}"
        )
    if mode not in ("replace", "dither"):
        raise ValueError("assign_fused_sharded supports replace/dither only")
    sharded, h = _row_sharded(mesh, rgb_u8)
    d = mesh.shape[PIXEL_AXIS]
    local_h = sharded.shape[0] // d
    k_act = jnp.asarray(kp if k_active is None else k_active, jnp.int32)
    words = _assign_fused_jit(
        sharded, palette_lab, k_act, mesh=mesh, mode=mode, metric=metric,
        fast=fast, interpret=interpret, local_h=local_h,
    )
    return words, pack_bits(kp)


@partial(
    jax.jit,
    static_argnames=("mesh", "mode", "metric", "fast", "interpret", "local_h"),
)
def _assign_fused_jit(
    rgb_sharded, palette_lab, k_act, mesh, mode, metric, fast, interpret,
    local_h,
):
    """One executable for the whole fused sharded assign (threshold,
    alpha append, per-shard kernel): eager ops on a remote-dispatch TPU
    transport pay a full round trip each, so everything stays inside one
    jit (the same rule as every single-chip entry point)."""
    from kmeans_tpu.ops.kernels import fused_assign_packed

    threshold = (
        dither_threshold(palette_lab, k_active=k_act, metric=metric)
        if mode == "dither"
        else jnp.float32(0.0)
    )

    def local(rgb_local, cents, thr, ka):
        shard = jax.lax.axis_index(PIXEL_AXIS)
        alpha = jnp.full(rgb_local.shape[:2] + (1,), 255, jnp.uint8)
        rgba = jnp.concatenate([rgb_local[..., :3], alpha], axis=-1)
        return fused_assign_packed(
            rgba, cents, thr, k_active=ka, mode=mode, interpret=interpret,
            row_offset=shard * local_h, fast=fast, metric=metric,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(PIXEL_AXIS, None, None), P(), P(), P()),
        out_specs=P(PIXEL_AXIS, None),
        check_vma=False,
    )
    return fn(rgb_sharded, palette_lab, threshold, k_act)


def meld_fused_sharded(
    mesh,
    rgb_u8,
    palette_lab,
    k_active=None,
    metric: str = "cie94",
    fast: bool = False,
    interpret: bool = False,
):
    """Multi-chip meld at single-chip kernel speed with the RGB24-packed
    (3 B/px) readback: every shard runs the fused meld kernel
    (`ops/kernels.py::fused_meld_packed` — in-kernel RGB byte pack) on
    its local row block under `shard_map`. Meld is purely per-pixel
    (`mix_colors.wgsl:85-90` blends each pixel's own two closest
    centroids), so no collectives and — unlike dither — no cross-shard
    phase to thread: each shard's block is BIT-IDENTICAL to the same
    rows through single-chip `fused_meld_packed`. Returns the
    `[D * M, 128]` int32 word readback that `unpack_meld_sharded`
    inverts on the host. Any k (meld has no index-width cap)."""
    palette_lab = jnp.asarray(palette_lab, jnp.float32)
    kp = palette_lab.shape[0]
    sharded, h = _row_sharded(mesh, rgb_u8)
    k_act = jnp.asarray(kp if k_active is None else k_active, jnp.int32)
    return _meld_fused_jit(
        sharded, palette_lab, k_act, mesh=mesh, metric=metric, fast=fast,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("mesh", "metric", "fast", "interpret"))
def _meld_fused_jit(rgb_sharded, palette_lab, k_act, mesh, metric, fast,
                    interpret):
    """One executable for the fused sharded meld (alpha append + per-shard
    kernel) — same single-jit rule as `_assign_fused_jit`."""
    from kmeans_tpu.ops.kernels import fused_meld_packed

    def local(rgb_local, cents, ka):
        alpha = jnp.full(rgb_local.shape[:2] + (1,), 255, jnp.uint8)
        rgba = jnp.concatenate([rgb_local[..., :3], alpha], axis=-1)
        return fused_meld_packed(
            rgba, cents, k_active=ka, interpret=interpret, fast=fast,
            metric=metric,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(PIXEL_AXIS, None, None), P(), P()),
        out_specs=P(PIXEL_AXIS, None),
        check_vma=False,
    )
    return fn(rgb_sharded, palette_lab, k_act)


def unpack_meld_sharded(
    words: np.ndarray, h: int, w: int, kp: int, n_shards: int
) -> np.ndarray:
    """Host inverse of `meld_fused_sharded`: split the concatenated word
    readback into its D equal shard blocks, invert each shard's in-kernel
    RGB24 pack (`utils.packing.unpack_rgb24_tile_words` with the SAME
    kp-keyed tile height the kernel used), and crop the row padding.
    Returns `[h, w, 4]` uint8 RGBA (alpha 255)."""
    from kmeans_tpu.ops.kernels import quant_tile_rows
    from kmeans_tpu.utils.packing import unpack_rgb24_tile_words

    tile_rows = quant_tile_rows(kp)
    h_pad = (h + n_shards - 1) // n_shards * n_shards
    local_h = h_pad // n_shards
    out = np.concatenate(
        [
            unpack_rgb24_tile_words(chunk, local_h, w, tile_rows=tile_rows)
            for chunk in np.split(np.asarray(words), n_shards, axis=0)
        ],
        axis=0,
    )
    return out[:h]


def unpack_fused_sharded(
    words: np.ndarray, h: int, w: int, kp: int, n_shards: int
) -> np.ndarray:
    """Host inverse of `assign_fused_sharded`: split the concatenated
    word readback into its D equal shard blocks, invert each shard's
    in-kernel tile pack (`utils.packing.unpack_tile_words` with the SAME
    kp-keyed tile height the kernel used), and crop the row padding.
    Returns the `[h, w]` index map (uint8, or uint16 for the 16-bit
    tier)."""
    from kmeans_tpu.ops.kernels import quant_tile_rows
    from kmeans_tpu.utils.packing import unpack_tile_words

    bits = pack_bits(kp)
    tile_rows = quant_tile_rows(kp)
    h_pad = (h + n_shards - 1) // n_shards * n_shards
    local_h = h_pad // n_shards
    idx = np.concatenate(
        [
            unpack_tile_words(chunk, local_h, w, bits, tile_rows=tile_rows)
            for chunk in np.split(np.asarray(words), n_shards, axis=0)
        ],
        axis=0,
    )
    return idx[:h]
