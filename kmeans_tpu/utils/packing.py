"""Device-side index-map bit packing keyed by palette size.

Palettes pack pixel indices at the narrowest width that holds them
before readback (2 bits/px for k <= 4, 4 for k <= 16, 8 for k <= 256,
16 for the reference's large fixed `find` palettes up to 512 colors —
half the traffic of the full-RGBA readback those previously took).
Every device-side pack and host-side unpack MUST consult `pack_bits`
(they sit in different executables/processes and drift here means
silently garbled pixels).

Used by the single-chip indexed paths (`api.py`) and the sharded
(multi-chip) indexed readback (`parallel/sharded_ops.py`); the pack runs
along the width axis so row-sharded layouts pack shard-locally with no
collectives.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

try:  # native unpack fast paths (runtime/_imagio.c); numpy twins below
    from kmeans_tpu.runtime import _imagio as _native
except ImportError:  # pragma: no cover - source tree without build_ext
    _native = None

NIBBLE_PACK_MAX_K = 16
CRUMB_PACK_MAX_K = 4


def pack_bits(k: int) -> int:
    """Bits per packed index for a (static) palette size. The 16-bit tier
    serves 256 < k <= 65536 (in practice the <= 512-color `find`
    palettes); width-axis byte packing (`pack_nibbles`) and the u8
    sharded readback stay gated at k <= 256 by their callers."""
    if k <= CRUMB_PACK_MAX_K:
        return 2
    if k <= NIBBLE_PACK_MAX_K:
        return 4
    if k <= 256:
        return 8
    return 16


def nibble_packed(k: int) -> bool:
    return pack_bits(k) < 8


def pack_nibbles(idx: jnp.ndarray, bits: int = 4) -> jnp.ndarray:
    """Device-side pack of an index map: `bits` in {2, 4} packs 4 or 2
    pixels per byte (every index must be < 2**bits; widths pad to the
    pack factor, cropped on unpack). Cuts the index readback to
    0.25/0.5 B/px."""
    per = 8 // bits
    if idx.shape[1] % per:
        idx = jnp.pad(idx, ((0, 0), (0, per - idx.shape[1] % per)))
    out = idx[:, 0::per] << (8 - bits)
    for j in range(1, per):
        shift = 8 - bits * (j + 1)
        term = idx[:, j::per]
        # skip <<0 so the bits=4 expression (and its compiled-cache hash)
        # stays identical to the original two-term nibble pack
        out = out | (term << shift if shift else term)
    return out


def unpack_tile_words(
    words: np.ndarray,
    h: int,
    w: int,
    bits: int,
    tile_rows: int | None = None,
    lanes: int = 128,
) -> np.ndarray:
    """Invert the fused kernel's IN-KERNEL index pack
    (`ops/kernels.py::fused_assign_packed`): each i32 word holds
    `32 // bits` pixel indices taken from equally-spaced sublane blocks of
    one kernel tile. `words` is the `[M, lanes]` int32 readback; returns
    the `[h, w]` index map (uint8, or uint16 for the 16-bit tier). The
    layout constants MUST match the kernel: pass
    `tile_rows=ops.kernels.quant_tile_rows(kp)` (the tile is a function
    of the palette size)."""
    if tile_rows is None:
        raise ValueError(
            "tile_rows must come from ops.kernels.quant_tile_rows(kp) — "
            "it is a function of the palette size"
        )
    ppw = 32 // bits
    blk = tile_rows // ppw
    mask = (1 << bits) - 1
    wk = np.ascontiguousarray(words).view(np.uint32)  # logical shifts
    n_tiles = wk.shape[0] // blk
    wk = wk.reshape(n_tiles, blk, lanes)
    idx = np.empty(
        (n_tiles, tile_rows, lanes), np.uint8 if bits <= 8 else np.uint16
    )
    for j in range(ppw):
        idx[:, blk * j : blk * (j + 1), :] = (wk >> (bits * j)) & mask
    return idx.reshape(-1)[: h * w].reshape(h, w)


def unpack_tile_words_gather(
    words: np.ndarray,
    h: int,
    w: int,
    bits: int,
    palette_rgba: np.ndarray,
    tile_rows: int | None = None,
    lanes: int = 128,
) -> np.ndarray:
    """`palette_rgba[unpack_tile_words(...)]` in one native pass: unpack
    the in-kernel index words AND gather the RGBA8 palette row per pixel
    (runtime/_imagio.c; the numpy twin is the fallback and the layout
    spec). For the indexed readback paths that want pixels, not the
    index map — saves materializing the [h, w] intermediate and the
    separate numpy gather. `palette_rgba` is `[K, 4]` uint8."""
    if tile_rows is None:
        raise ValueError(
            "tile_rows must come from ops.kernels.quant_tile_rows(kp) — "
            "it is a function of the palette size"
        )
    if _native is not None and hasattr(_native, "unpack_indices_gather"):
        pal = np.ascontiguousarray(palette_rgba, dtype=np.uint8)
        # zero-copy handoff: y* accepts the arrays' C buffers directly,
        # and the returned bytearray backs a WRITABLE np.frombuffer view
        # (parity with the numpy fancy-indexing fallback)
        raw = _native.unpack_indices_gather(
            np.ascontiguousarray(words), h, w, bits, tile_rows, lanes, pal,
        )
        return np.frombuffer(raw, np.uint8).reshape(h, w, 4)
    idx = unpack_tile_words(words, h, w, bits, tile_rows, lanes)
    return np.asarray(palette_rgba, dtype=np.uint8)[idx]


def unpack_rgb24_tile_words(
    words: np.ndarray,
    h: int,
    w: int,
    tile_rows: int,
    lanes: int = 128,
) -> np.ndarray:
    """Invert the fused meld kernel's IN-KERNEL RGB byte pack
    (`ops/kernels.py::fused_meld_packed`): each kernel tile's 4 sublane
    blocks of RGB fold into 3 word rows (word row j of block group g
    carries the bytes laid out in the kernel's emit_rgb24 branch).
    `words` is the `[M, lanes]` int32 readback; returns `[h, w, 4]`
    uint8 RGBA with alpha 255 (bit-identical to the unpacked kernel
    output). Pass `tile_rows=ops.kernels.quant_tile_rows(kp)`.

    Dispatches to the native single-pass walk (runtime/_imagio.c,
    measured ~10x the numpy byte shuffles at 4K) when the extension is
    built; the numpy twin below is the layout's executable spec and the
    fallback (tests pin C == numpy)."""
    if _native is not None and hasattr(_native, "unpack_rgb24"):
        raw = _native.unpack_rgb24(
            np.ascontiguousarray(words), h, w, tile_rows, lanes,
        )
        return np.frombuffer(raw, np.uint8).reshape(h, w, 4)
    return _unpack_rgb24_np(words, h, w, tile_rows, lanes)


def _unpack_rgb24_np(
    words: np.ndarray,
    h: int,
    w: int,
    tile_rows: int,
    lanes: int = 128,
) -> np.ndarray:
    """Numpy spec/fallback for `unpack_rgb24_tile_words`."""
    blk = tile_rows // 4
    wb = (
        np.ascontiguousarray(words)
        .view(np.uint32)
        .astype("<u4")
        .view(np.uint8)
        .reshape(words.shape[0], lanes, 4)
    )
    n_tiles = words.shape[0] // (3 * blk)
    wb = wb.reshape(n_tiles, 3 * blk, lanes, 4)
    w0, w1, w2 = wb[:, :blk], wb[:, blk : 2 * blk], wb[:, 2 * blk :]
    rgb = np.empty((n_tiles, tile_rows, lanes, 3), np.uint8)
    rgb[:, 0:blk] = w0[..., 0:3]
    rgb[:, blk : 2 * blk, :, 0] = w0[..., 3]
    rgb[:, blk : 2 * blk, :, 1:3] = w1[..., 0:2]
    rgb[:, 2 * blk : 3 * blk, :, 0:2] = w1[..., 2:4]
    rgb[:, 2 * blk : 3 * blk, :, 2] = w2[..., 0]
    rgb[:, 3 * blk :] = w2[..., 1:4]
    flat = rgb.reshape(-1, 3)[: h * w]
    out = np.empty((h * w, 4), np.uint8)
    out[:, :3] = flat
    out[:, 3] = 255
    return out.reshape(h, w, 4)


def unpack_nibbles(packed: np.ndarray, w: int, bits: int = 4) -> np.ndarray:
    """Invert `pack_nibbles`: `[H, ceil(w/per)]` uint8 -> `[H, w]` uint8
    index map (`per = 8 // bits`)."""
    per = 8 // bits
    mask = (1 << bits) - 1
    h = packed.shape[0]
    idx = np.empty((h, packed.shape[1] * per), np.uint8)
    for j in range(per):
        idx[:, j::per] = (packed >> (8 - bits * (j + 1))) & mask
    return idx[:, :w]
