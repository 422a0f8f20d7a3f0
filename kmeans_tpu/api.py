"""Public API: `ImageProcessor` with `palette` / `find` / `reduce`.

Python analogue of the reference's `core/src/lib.rs:24-331`. Where the
reference's constructor acquires a wgpu adapter/device/queue
(`core/src/lib.rs:38-65`), JAX owns the TPU runtime — the constructor just
pins the target device(s). The three entry points match the reference's
signatures and behavior:

- `palette(color_count, image, algo)` -> k RGBA8 colors sorted by Lab L*
  ascending (`core/src/lib.rs:255-331`).
- `find(image, colors, reduce_mode)` -> recolored Image using a fixed
  palette, no training (`core/src/lib.rs:79-114`).
- `reduce(color_count, image, algo, reduce_mode)` -> recolored Image from a
  trained palette (`core/src/lib.rs:116-164`).

Like the reference, `find`/`reduce` always work in CIELAB
(`core/src/lib.rs:87,94,131` hardcode `ColorSpace::Lab`); the Rgb working
space (convergence 0.01, no color conversion) is reachable through the
internal `extract_palette_kmeans`, mirroring the reference internals.

TPU-first extensions beyond the reference:
- `reduce_batch`: one compiled executable quantizing a batch of frames /
  k-values in parallel (replaces the reference's one-thread-per-k
  `core/examples/parallel.rs`).
- no 8192x8192 size cap (the reference inherits it from GPU texture
  limits, `README.md:9-11`); pixel counts are bounded only by HBM.
"""

from __future__ import annotations

import logging
from enum import Enum
from functools import partial, wraps

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("kmeans_tpu")

try:  # native host fast paths (runtime/_imagio.c); numpy fallbacks below
    from kmeans_tpu.runtime import _imagio as _native
except ImportError:  # pragma: no cover - source tree without build_ext
    _native = None

from kmeans_tpu.image import Image
from kmeans_tpu.models import kmeans as kmeans_model
from kmeans_tpu.models.mediancut import extract_palette_mediancut
from kmeans_tpu.models.octree import extract_palette_octree
from kmeans_tpu.models.wu import extract_palette_wu
from kmeans_tpu.ops.colorspace import lab_to_srgb8, srgb8_to_lab, srgb8_to_lab_np
from kmeans_tpu.ops.kernels import (
    INDEXED_MAX_K,
    QUANT_MAX_KP,
    FRAMES_MAX_BK,
    fused_assign_frames_packed,
    fused_assign_packed,
    fused_meld_frames_packed,
    fused_meld_packed,
    fused_quantize,
)
from kmeans_tpu.ops.quantize import dither_threshold, quantize_image
from kmeans_tpu.utils.profiling import phase as _phase
from kmeans_tpu.utils.profiling import phase_sync as _phase_sync
from kmeans_tpu.ops.resize import (
    resize_to_canvas,
    resize_uint8,
    resize_uint8_np,
    shrunk_dimensions,
)
from kmeans_tpu.utils.bucketing import (
    bucket_frames,
    bucket_k,
    next_bucket,
    pad_palette_k,
    pad_to_bucket,
)

# Training-image shrink cap (`core/src/structures.rs:23`).
MAX_IMAGE_DIMENSION = 256
# Octree sampling cap (`core/src/lib.rs:293`).
OCTREE_MAX_SIZE = 128
# Pipelined (banded) reduce: rows per band, and the minimum band count at
# which the pipeline engages (ImageProcessor(pipeline=True), opt-in). The
# host<->device transport measured ~63% overlap between an in-flight
# upload and a readback (tools/exp_duplex.py) — but through this
# harness's high-latency tunnel the per-band call overheads outweigh the
# hidden readback (~2x slower in an interleaved A/B; docs/perf.md), so
# the monolithic single-dispatch path stays the default.
PIPELINE_BAND_ROWS = 512
PIPELINE_MIN_BANDS = 4


class ColorSpace(Enum):
    """Working color space (`core/src/lib.rs:166-212`)."""

    LAB = "lab"
    RGB = "rgb"

    @property
    def convergence(self) -> float:
        return {ColorSpace.LAB: 1.0, ColorSpace.RGB: 0.01}[self]


class Algorithm(Enum):
    """Palette algorithm (`core/src/lib.rs:216-233`), plus the additive
    MEDIANCUT and WU families (not in the reference)."""

    KMEANS = "kmeans"
    OCTREE = "octree"
    MEDIANCUT = "mediancut"
    WU = "wu"


class ReduceMode(Enum):
    """Output mode (`core/src/lib.rs:235-256`)."""

    REPLACE = "replace"
    DITHER = "dither"
    MELD = "meld"


@partial(
    jax.jit,
    static_argnames=(
        "k", "train_shape", "lab", "use_pallas", "metric", "restarts",
        "fast", "train_dtype",
    ),
)
def _train_jit(
    pixels_u8: jnp.ndarray,
    k: int,
    train_shape: tuple[int, int],
    first_index: int,
    convergence: float,
    lab: bool = True,
    use_pallas: bool = False,
    metric: str = "cie94",
    restarts: int = 1,
    fast: bool = False,
    train_dtype: str | None = None,
):
    """Single-executable training path: shrink -> colorspace -> seed ->
    Lloyd. One XLA compilation per (image shape, k) — critical on TPU,
    where every eagerly-dispatched op would pay compile/launch overhead."""
    sh, sw = train_shape
    if (pixels_u8.shape[0], pixels_u8.shape[1]) != (sh, sw):
        pixels_u8 = resize_uint8(pixels_u8, sh, sw)
    rgb = pixels_u8[..., :3].reshape(-1, 3)
    work = srgb8_to_lab(rgb) if lab else jnp.asarray(rgb, jnp.float32) / 255.0
    centroids, iters = _fit_auto(
        work, k, first_index, convergence, use_pallas, metric=metric,
        restarts=restarts, fast=fast, plane_dtype=train_dtype,
    )
    return centroids, iters


# Above this many training pixels, the matmul update's [N, K] one-hot
# intermediate dominates HBM; switch to the Pallas tile accumulator.
_LARGE_TRAIN_PIXELS = 1 << 20
# For k > 64, leave the bit-exact unchunked XLA protocol only when N*K
# crosses this element budget (~768 MB per f32 [N, K] intermediate) —
# where that path was OOM-class anyway. Past it, the Pallas tile
# accumulator takes over (k <= ACCUM_MAX_K, 1.5-5.2x/iter on hardware);
# the row-chunked XLA trainer is the CPU/unsupported-metric/k>512
# fallback (see _fit_auto).
_CHUNKED_TRAIN_ELEMS = 192 * (1 << 20)


def _ensure_rgba(pixels_u8: jnp.ndarray) -> jnp.ndarray:
    """Accept `[H, W, 3]` or `[H, W, 4]` uint8; return RGBA with alpha 255.

    Input alpha is ignored by the whole pipeline (training reads RGB and
    every output stage forces alpha 255, like the reference's revert shader
    `lab_to_rgb.wgsl:36,80`), so the host can upload RGB-only — 25% less
    host->device traffic on the dominant transfer. The append runs
    on-device inside the jitted executable (one cheap HBM pass)."""
    if pixels_u8.shape[-1] == 3:
        alpha = jnp.full(pixels_u8.shape[:-1] + (1,), 255, jnp.uint8)
        return jnp.concatenate([pixels_u8, alpha], axis=-1)
    return pixels_u8


def _host_rgb(pixels: np.ndarray) -> np.ndarray:
    """Host-side `[..., :3]` slice (contiguous) — the upload-side half of
    the RGB-only transfer optimization (see `_ensure_rgba`). Contiguous
    RGBA8 input takes the native single-pass strip (`_imagio.strip_alpha`,
    several GB/s); numpy's strided copy (~0.6 GB/s, 52 ms on a 4K frame —
    the round-5 phase attribution's largest host_prep term) remains the
    spec and the fallback. Byte-equal by construction (a pure byte strip);
    pinned by tests/test_packing.py."""
    arr = np.asarray(pixels)
    if (
        _native is not None
        and arr.dtype == np.uint8
        and arr.ndim >= 1
        and arr.shape[-1] == 4
        and arr.flags.c_contiguous
    ):
        out = _native.strip_alpha(arr)
        return np.frombuffer(out, np.uint8).reshape(arr.shape[:-1] + (3,))
    return np.ascontiguousarray(arr[..., :3])


def _fit_auto(
    work, k, first_index, convergence, use_pallas=None, weight=None,
    k_active=None, metric="cie94", restarts=1, fast=False,
    plane_dtype=None,
):
    # The Pallas trainer unrolls its centroid loops and supports
    # k <= ACCUM_MAX_K (512); k <= 64 routes to it for any large-N
    # training, 65..512 only past the chunked-trainer budget (below it
    # the unchunked XLA protocol stays, bit-exact). Only kernel-supported
    # metrics may route to it. Multi-restart training routes to
    # fit_large_restarts (sequential Pallas runs + accumulator inertia)
    # so full-resolution restarts never materialize the XLA path's
    # [N, K] one-hot.
    from kmeans_tpu.ops.kernels import ACCUM_MAX_K, PALLAS_METRICS

    if use_pallas is None:
        use_pallas = _pallas_available()
    pallas_ok = use_pallas and metric in PALLAS_METRICS

    def fit_pallas():
        # fast only changes the Pallas trainer for k > 16 (the gate sits
        # in lloyd_pallas, matching the quantize kernels' policy).
        if restarts > 1:
            return kmeans_model.fit_large_restarts(
                work, k, first_index, restarts=restarts,
                convergence=convergence, weight=weight, k_active=k_active,
                metric=metric, fast=fast, plane_dtype=plane_dtype,
            )
        return kmeans_model.fit_large(
            work, k, first_index, convergence=convergence, weight=weight,
            k_active=k_active, metric=metric, fast=fast,
            plane_dtype=plane_dtype,
        )

    if k > 64 and work.shape[0] * k > _CHUNKED_TRAIN_ELEMS:
        # Past the memory budget where the plain trainer's [N, K]
        # one-hot/distance intermediates turn into multi-GB allocations
        # (full-resolution training at k = 256 previously OOM-class).
        # Both replacements reorder f32 additions relative to the plain
        # protocol, so this kicks in ONLY where the bit-exact path was
        # never viable — smaller trainings keep the unchunked protocol.
        # The Pallas tile accumulator covers k <= ACCUM_MAX_K (512) and
        # beats the row-chunked XLA trainer 1.3-5.2x/iter on hardware
        # (tools/exp_accum2.py, docs/perf.md). CIE94 above 64 always;
        # CIEDE2000 above 64 in both tiers since round 4: fast=True
        # rides the pruned two-pass tier (factorized-CIE94 screen, exact
        # trig on PRUNE_M survivors — 4.4x/iter at k=128) and fast=False
        # the chunked-loop EXACT form (fori over rolled trig bodies +
        # dynamic-store reduction, 1.3x/iter over the row-chunked XLA
        # trainer at k=128/256 with 5.1/7.6 s compiles vs the 130/351 s
        # fully-unrolled program round 2 rejected —
        # tools/exp_accum_2000.py). The row-chunked XLA trainer remains
        # the CPU and k > ACCUM_MAX_K fallback.
        if pallas_ok and k <= ACCUM_MAX_K:
            return fit_pallas()
        return kmeans_model.fit_chunked(
            work, k, first_index, restarts=restarts, convergence=convergence,
            weight=weight, k_active=k_active, metric=metric,
        )
    if pallas_ok and k <= 64 and work.shape[0] > _LARGE_TRAIN_PIXELS:
        return fit_pallas()
    return kmeans_model.fit_restarts(
        work, k, first_index, restarts=restarts, convergence=convergence,
        weight=weight, k_active=k_active, metric=metric,
    )


def _plain_fit_route(n_px: int, kp: int, use_pallas: bool, metric: str) -> bool:
    """True when `_fit_auto` would take the plain `fit_restarts` protocol
    for a training of `n_px` pixels at `kp` (padded) clusters — the only
    route the vmapped micro-batch trainers (`_reduce_many_bucketed_*`,
    `_palette_many_bucketed_jit`) replicate (vmap of the Pallas / chunked
    large-N trainers either cannot lower on Mosaic or would defeat their
    memory bound). `reduce_many`/`palette_many` gate coalescing on this so
    a coalesced request keeps solo semantics AND solo memory behavior:
    e.g. train_max_size=None on a 1080p bucket at k=128 must fall back to
    per-image processing rather than materialize B stacked [N, K]
    intermediates the solo routing exists to avoid. Mirror of the
    branches in `_fit_auto` — keep in sync."""
    from kmeans_tpu.ops.kernels import PALLAS_METRICS

    pallas_ok = use_pallas and metric in PALLAS_METRICS
    if kp > 64 and n_px * kp > _CHUNKED_TRAIN_ELEMS:
        return False
    if pallas_ok and kp <= 64 and n_px > _LARGE_TRAIN_PIXELS:
        return False
    return True


def _sharded_trainer_route(
    n_px: int, kp: int, use_pallas: bool, metric: str, fast: bool = False
) -> str:
    """`fit_sharded` trainer for a training of `n_px` (global, pre-pad)
    pixels at `kp` (padded) clusters — the sharded mirror of `_fit_auto`'s
    branches, so multi-chip honors the same large-N/metric routing as
    single-chip (VERDICT round-2 task 6): full-res sharded -> the per-shard
    Pallas accumulator (psum of [K, 4] totals; since round 4 this covers
    EXACT cie2000 k > 64 too via the chunked-loop accumulator form),
    k > ACCUM_MAX_K past the element budget -> the row-chunked psum
    trainer, small (shrunk) trainings -> the bit-compatible one-hot
    protocol. Keep in sync with `_fit_auto`."""
    from kmeans_tpu.ops.kernels import ACCUM_MAX_K, PALLAS_METRICS

    pallas_ok = use_pallas and metric in PALLAS_METRICS
    if kp > 64 and n_px * kp > _CHUNKED_TRAIN_ELEMS:
        if pallas_ok and kp <= ACCUM_MAX_K:
            return "pallas"
        return "chunked"
    if pallas_ok and kp <= 64 and n_px > _LARGE_TRAIN_PIXELS:
        return "pallas"
    return "onehot"


@partial(
    jax.jit,
    static_argnames=(
        "k", "train_shape", "mode", "use_pallas", "fast", "metric",
        "restarts", "train_dtype",
    ),
)
def _reduce_jit(
    pixels_u8: jnp.ndarray,
    k: int,
    train_shape: tuple[int, int],
    first_index: int,
    convergence: float,
    mode: str,
    use_pallas: bool,
    fast: bool = False,
    metric: str = "cie94",
    restarts: int = 1,
    train_dtype: str | None = None,
):
    """The flagship path as ONE executable: shrink -> Lab -> seed -> Lloyd ->
    full-res quantize. A single host->device transfer of the uint8 image and
    a single device->host transfer of the result — vs the reference's
    per-iteration host syncs and multi-pass texture pipeline
    (`core/src/modules.rs:790-791`, `core/src/operations.rs:215-271`).
    Accepts `[H, W, 3]` input (RGB-only upload; see `_ensure_rgba`)."""
    pixels_u8 = _ensure_rgba(pixels_u8)
    sh, sw = train_shape
    train_u8 = (
        resize_uint8(pixels_u8, sh, sw)
        if (pixels_u8.shape[0], pixels_u8.shape[1]) != (sh, sw)
        else pixels_u8
    )
    work = srgb8_to_lab(train_u8[..., :3].reshape(-1, 3))
    centroids, _ = _fit_auto(
        work, k, first_index, convergence, use_pallas, metric=metric,
        restarts=restarts, fast=fast, plane_dtype=train_dtype,
    )
    # Meld above QUANT_MAX_KP has no kernel program (the kp=2048 compile
    # crashes Mosaic; replace/dither decompose into halves inside
    # fused_quantize, meld's 2-closest blend does not) — its output pass
    # takes the row-chunked XLA meld in the same executable.
    if use_pallas and not (mode == "meld" and k > QUANT_MAX_KP):
        threshold = (
            dither_threshold(centroids, metric=metric)
            if mode == "dither"
            else jnp.float32(0.0)
        )
        out = fused_quantize(
            pixels_u8, centroids, threshold, mode=mode, fast=fast,
            metric=metric,
        )
    else:
        out = quantize_image(pixels_u8, centroids, mode=mode, metric=metric)
    return out, centroids


@partial(
    jax.jit,
    static_argnames=(
        "k", "train_shape", "mode", "fast", "restarts", "metric",
        "train_dtype",
    ),
)
def _reduce_indexed_jit(
    pixels_u8: jnp.ndarray,
    k: int,
    train_shape: tuple[int, int],
    first_index: int,
    convergence: float,
    mode: str,
    fast: bool = False,
    restarts: int = 1,
    metric: str = "cie94",
    train_dtype: str | None = None,
):
    """Reduce with indexed readback: train, then return the per-pixel
    palette index map as in-kernel-packed i32 words (2/4/8/16 bits per
    pixel by palette size — `utils.packing.pack_bits`; k <= INDEXED_MAX_K = 1024) + the
    RGBA8 palette. The host unpacks and reconstructs `palette[idx]` —
    2-16x less device->host traffic than raw RGBA, exact for
    replace/dither (every output pixel IS a palette color). Accepts
    `[H, W, 3]` input (RGB-only upload; see `_ensure_rgba`)."""
    pixels_u8 = _ensure_rgba(pixels_u8)
    sh, sw = train_shape
    train_u8 = (
        resize_uint8(pixels_u8, sh, sw)
        if (pixels_u8.shape[0], pixels_u8.shape[1]) != (sh, sw)
        else pixels_u8
    )
    work = srgb8_to_lab(train_u8[..., :3].reshape(-1, 3))
    # This executable is only built on the fused (TPU) path, so the Pallas
    # trainer is valid here (multi-restart large trainings route to
    # fit_large_restarts inside _fit_auto; both metrics have kernel
    # lowerings).
    centroids, _ = _fit_auto(
        work, k, first_index, convergence, use_pallas=True, restarts=restarts,
        metric=metric, fast=fast, plane_dtype=train_dtype,
    )
    threshold = (
        dither_threshold(centroids, metric=metric)
        if mode == "dither"
        else jnp.float32(0.0)
    )
    words = fused_assign_packed(
        pixels_u8, centroids, threshold, mode=mode, fast=fast, metric=metric
    )
    palette_rgba, _ = _lab_palette_to_u8(centroids)
    return words, palette_rgba


@partial(
    jax.jit,
    static_argnames=("k", "train_shape", "fast", "restarts", "metric",
                     "train_dtype"),
)
def _reduce_meld_packed_jit(
    pixels_u8: jnp.ndarray,
    k: int,
    train_shape: tuple[int, int],
    first_index: int,
    convergence: float,
    fast: bool = False,
    restarts: int = 1,
    metric: str = "cie94",
    train_dtype: str | None = None,
):
    """Meld reduce with the RGB-packed readback: train, then return the
    blended output as in-kernel RGB byte-packed words (3 B/px instead of
    4 B/px RGBA, bit-identical colors — meld has no index map, so this is
    its compact tier; `ops.kernels.fused_meld_packed`). Accepts
    `[H, W, 3]` input (RGB-only upload)."""
    pixels_u8 = _ensure_rgba(pixels_u8)
    sh, sw = train_shape
    train_u8 = (
        resize_uint8(pixels_u8, sh, sw)
        if (pixels_u8.shape[0], pixels_u8.shape[1]) != (sh, sw)
        else pixels_u8
    )
    work = srgb8_to_lab(train_u8[..., :3].reshape(-1, 3))
    centroids, _ = _fit_auto(
        work, k, first_index, convergence, use_pallas=True, restarts=restarts,
        metric=metric, fast=fast, plane_dtype=train_dtype,
    )
    return fused_meld_packed(
        pixels_u8, centroids, fast=fast, metric=metric
    )


# Index-map bit packing lives in utils/packing.py (shared with the
# sharded readback paths); these aliases keep the API module's historical
# names working. The fused single-chip paths use the IN-KERNEL tile-word
# pack (fused_assign_packed + unpack_tile_words); the width-axis nibble
# pack remains for the sharded (XLA) readback.
from kmeans_tpu.utils.packing import (  # noqa: E402
    CRUMB_PACK_MAX_K,
    NIBBLE_PACK_MAX_K,
    nibble_packed as _nibble_packed,
    pack_bits as _pack_bits,
    pack_nibbles as _pack_nibbles,
    unpack_nibbles as _unpack_nibbles,
    unpack_tile_words as _unpack_tile_words,
)


def _unpack_idx(words: np.ndarray, h: int, w: int, kp: int) -> np.ndarray:
    """Host inverse of the fused kernel's in-kernel index pack: `[h, w]`
    uint8 indices from the `[M, 128]` i32 word readback (bit width AND
    tile height chosen by the SAME kp-keyed functions the kernel used)."""
    from kmeans_tpu.ops.kernels import quant_tile_rows

    return _unpack_tile_words(
        words, h, w, _pack_bits(kp), tile_rows=quant_tile_rows(kp)
    )


def _unpack_meld(words: np.ndarray, h: int, w: int, kp: int) -> np.ndarray:
    """Host inverse of the meld kernel's in-kernel RGB byte pack:
    `[h, w, 4]` RGBA (alpha 255) from the `[M, 128]` i32 word readback."""
    from kmeans_tpu.ops.kernels import quant_tile_rows
    from kmeans_tpu.utils.packing import unpack_rgb24_tile_words

    return unpack_rgb24_tile_words(
        words, h, w, tile_rows=quant_tile_rows(kp)
    )


def _unpack_gather(
    words: np.ndarray, h: int, w: int, kp: int, palette_rgba: np.ndarray
) -> np.ndarray:
    """`palette_rgba[_unpack_idx(...)]` fused into one native pass
    (`utils.packing.unpack_tile_words_gather`) — the host tail of every
    indexed readback that wants pixels rather than the index map."""
    from kmeans_tpu.ops.kernels import quant_tile_rows
    from kmeans_tpu.utils.packing import unpack_tile_words_gather

    return unpack_tile_words_gather(
        words, h, w, _pack_bits(kp), palette_rgba,
        tile_rows=quant_tile_rows(kp),
    )


@partial(jax.jit, static_argnames=("mode", "fast", "metric"))
def _assign_indexed_jit(
    pixels_u8, palette_lab, mode: str, k_active=None, row_offset=0,
    fast: bool = False, metric: str = "cie94",
):
    """Fixed-palette indexed assignment (the `find` fast path). With
    `k_active`, trailing palette rows are bucket padding and masked;
    `row_offset` shifts dither rows for streamed bands. Accepts
    `[H, W, 3]` input (RGB-only upload; see `_ensure_rgba`)."""
    pixels_u8 = _ensure_rgba(pixels_u8)
    threshold = (
        dither_threshold(palette_lab, k_active=k_active, metric=metric)
        if mode == "dither"
        else jnp.float32(0.0)
    )
    return fused_assign_packed(
        pixels_u8, palette_lab, threshold, k_active=k_active, mode=mode,
        row_offset=row_offset, fast=fast, metric=metric,
    )


@partial(jax.jit, static_argnames=("fast", "metric"))
def _meld_packed_jit(
    pixels_u8, palette_lab, k_active=None, fast: bool = False,
    metric: str = "cie94",
):
    """Fixed-palette meld with the RGB-packed readback (the `find -m meld`
    fast path — 3 B/px instead of 4, bit-identical colors). Accepts
    `[H, W, 3]` input (RGB-only upload)."""
    pixels_u8 = _ensure_rgba(pixels_u8)
    return fused_meld_packed(
        pixels_u8, palette_lab, k_active=k_active, fast=fast,
        metric=metric,
    )


@partial(jax.jit, static_argnames=("mode", "fast", "metric"))
def _quantize_fused_jit(
    pixels_u8, palette_lab, mode: str, k_active=None, row_offset=0,
    fast: bool = False, metric: str = "cie94",
):
    """Fused quantize with the dither threshold computed in-executable.
    Accepts `[H, W, 3]` input (RGB-only upload; see `_ensure_rgba`)."""
    pixels_u8 = _ensure_rgba(pixels_u8)
    threshold = (
        dither_threshold(palette_lab, k_active=k_active, metric=metric)
        if mode == "dither"
        else jnp.float32(0.0)
    )
    return fused_quantize(
        pixels_u8, palette_lab, threshold, k_active=k_active, mode=mode,
        row_offset=row_offset, fast=fast, metric=metric,
    )


@partial(jax.jit, static_argnames=("sh", "sw", "n_pad"))
def _sharded_work_jit(frames_u8, sh: int, sw: int, n_pad: int):
    """Assemble the pixel-sharded training store for B same-sized RGB
    frames in ONE executable: per-frame corner-aligned shrink to
    `[sh, sw]`, sRGB->Lab, flatten/concatenate (frame 0 first, preserving
    the reference seed index), and 0-weight padding to the shard count —
    so the sharded entry points pay one dispatch for the whole prep
    instead of 3 eager device ops per frame (each a tunnel round trip on
    the remote TPU backend). Returns `(work [n_pad, 3], weight [n_pad])`;
    values identical to the former eager per-frame chain (same ops, same
    order)."""
    b, h, w = frames_u8.shape[:3]

    def prep(px):
        tr = resize_uint8(px, sh, sw) if (sw, sh) != (w, h) else px
        return srgb8_to_lab(tr[..., :3].reshape(-1, 3))

    work = jax.vmap(prep)(frames_u8).reshape(-1, 3)
    n = work.shape[0]
    work = jnp.pad(work, ((0, n_pad - n), (0, 0)))
    weight = (jnp.arange(n_pad) < n).astype(jnp.float32)
    return work, weight


@partial(
    jax.jit,
    static_argnames=(
        "kp", "canvas_shape", "lab", "use_pallas", "metric", "restarts",
        "fast",
    ),
)
def _train_bucketed_jit(
    padded_u8: jnp.ndarray,
    kp: int,
    canvas_shape: tuple[int, int],
    first_index,
    src_h,
    src_w,
    out_h,
    out_w,
    convergence,
    k_active,
    lab: bool = True,
    use_pallas: bool = False,
    metric: str = "cie94",
    restarts: int = 1,
    fast: bool = False,
):
    """Training with bucketed (padded) input: the real image lives in the
    top-left `[src_h, src_w]` of `padded_u8` and is shrunk to the dynamic
    `[out_h, out_w]` corner of a static canvas; pad pixels train with
    weight 0. The cluster axis is padded to `kp` with the real count in
    the traced `k_active`, so one executable per (bucket shape, kp) serves
    every image size within the bucket at ANY k <= kp — the serving-path
    answer to per-shape and per-k XLA compiles."""
    ch, cw = canvas_shape
    canvas, weight = resize_to_canvas(
        padded_u8[..., :3], ch, cw, src_h, src_w, out_h, out_w
    )
    rgb = canvas.reshape(-1, 3)
    work = srgb8_to_lab(rgb) if lab else jnp.asarray(rgb, jnp.float32) / 255.0
    # _fit_auto routes big canvases (bucketing + train_max_size=None on
    # large buckets) to the weighted Pallas trainer when available.
    return _fit_auto(
        work, kp, first_index, convergence, use_pallas,
        weight=weight.reshape(-1), k_active=k_active, metric=metric,
        restarts=restarts, fast=fast,
    )


@partial(
    jax.jit,
    static_argnames=(
        "kp", "canvas_shape", "mode", "fast", "restarts", "metric",
    ),
)
def _reduce_bucketed_indexed_jit(
    padded_u8: jnp.ndarray,
    kp: int,
    canvas_shape: tuple[int, int],
    first_index,
    src_h,
    src_w,
    out_h,
    out_w,
    convergence,
    mode: str,
    k_active,
    fast: bool = False,
    restarts: int = 1,
    metric: str = "cie94",
):
    """Bucketed reduce with indexed readback (TPU fused path). Accepts
    `[H, W, 3]` input (RGB-only upload)."""
    padded_u8 = _ensure_rgba(padded_u8)
    centroids, _ = _train_bucketed_jit(
        padded_u8, kp, canvas_shape, first_index, src_h, src_w, out_h, out_w,
        convergence, k_active, use_pallas=True,  # fused-only executable
        restarts=restarts, metric=metric, fast=fast,
    )
    threshold = (
        dither_threshold(centroids, k_active=k_active, metric=metric)
        if mode == "dither"
        else jnp.float32(0.0)
    )
    words = fused_assign_packed(
        padded_u8, centroids, threshold, k_active=k_active, mode=mode,
        fast=fast, metric=metric,
    )
    palette_rgba, _ = _lab_palette_to_u8(centroids)
    return words, palette_rgba


@partial(
    jax.jit,
    static_argnames=("kp", "canvas_shape", "fast", "restarts", "metric"),
)
def _reduce_bucketed_meld_jit(
    padded_u8: jnp.ndarray,
    kp: int,
    canvas_shape: tuple[int, int],
    first_index,
    src_h,
    src_w,
    out_h,
    out_w,
    convergence,
    k_active,
    fast: bool = False,
    restarts: int = 1,
    metric: str = "cie94",
):
    """Bucketed meld reduce with the RGB-packed readback (TPU fused path;
    see `_reduce_meld_packed_jit`). Accepts `[H, W, 3]` input."""
    padded_u8 = _ensure_rgba(padded_u8)
    centroids, _ = _train_bucketed_jit(
        padded_u8, kp, canvas_shape, first_index, src_h, src_w, out_h, out_w,
        convergence, k_active, use_pallas=True,  # fused-only executable
        restarts=restarts, metric=metric, fast=fast,
    )
    return fused_meld_packed(
        padded_u8, centroids, k_active=k_active, fast=fast, metric=metric
    )


@partial(
    jax.jit,
    static_argnames=(
        "kp", "canvas_shape", "mode", "use_pallas", "fast", "metric",
        "restarts",
    ),
)
def _reduce_bucketed_jit(
    padded_u8: jnp.ndarray,
    kp: int,
    canvas_shape: tuple[int, int],
    first_index,
    src_h,
    src_w,
    out_h,
    out_w,
    convergence,
    mode: str,
    use_pallas: bool,
    k_active,
    fast: bool = False,
    metric: str = "cie94",
    restarts: int = 1,
):
    """Bucketed reduce returning full RGBA (meld / k>256 / XLA path).
    Accepts `[H, W, 3]` input (RGB-only upload)."""
    padded_u8 = _ensure_rgba(padded_u8)
    centroids, _ = _train_bucketed_jit(
        padded_u8, kp, canvas_shape, first_index, src_h, src_w, out_h, out_w,
        convergence, k_active, use_pallas=use_pallas, metric=metric,
        restarts=restarts, fast=fast,
    )
    # Meld above QUANT_MAX_KP: no kernel program — XLA chunked meld
    # output pass (see _reduce_jit).
    if use_pallas and not (mode == "meld" and kp > QUANT_MAX_KP):
        threshold = (
            dither_threshold(centroids, k_active=k_active, metric=metric)
            if mode == "dither"
            else jnp.float32(0.0)
        )
        return fused_quantize(
            padded_u8, centroids, threshold, k_active=k_active, mode=mode,
            fast=fast, metric=metric,
        )
    return quantize_image(
        padded_u8, centroids, mode=mode, k_active=k_active, metric=metric
    )


@partial(jax.jit, static_argnames=("canvas_shape",))
def _canvas_shrink_jit(
    padded_u8, canvas_shape: tuple[int, int], src_h, src_w, out_h, out_w
):
    """Bucketed shrink only (CPU palette algorithms): resize the real
    `[src_h, src_w]` corner of a padded image into a static canvas; the
    host crops the `[out_h, out_w]` result."""
    ch, cw = canvas_shape
    canvas, _ = resize_to_canvas(padded_u8, ch, cw, src_h, src_w, out_h, out_w)
    return canvas


def _pallas_available(device=None) -> bool:
    """Use the hand-fused Pallas kernels on real TPU devices only (the CPU
    interpreter is correct but slow; XLA's fusion is the right CPU path).
    With `device`, decide for that device's platform rather than the
    process default backend."""
    if device is not None:
        return getattr(device, "platform", "") == "tpu"
    return jax.default_backend() == "tpu"


@jax.jit
def _lab_palette_to_u8(
    centroids: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Palette readback: Lab -> RGBA8 + the L* sort key recomputed from the
    u8 colors (`CentroidsBuffer::pull_values` + the sort in
    `core/src/lib.rs:276-284`)."""
    rgb8 = lab_to_srgb8(centroids)
    lightness = srgb8_to_lab(rgb8)[:, 0]
    alpha = jnp.full((rgb8.shape[0], 1), 255, jnp.uint8)
    return jnp.concatenate([rgb8, alpha], axis=1), lightness


def _host_fetch(*arrays) -> tuple:
    """Fetch several device arrays to host with OVERLAPPING transfers:
    start every copy async, then materialize each. Sequential
    `np.asarray` calls pay one full transport round trip per array
    (~30-40 ms each through this harness's tunnel); starting the copies
    first collapses them to ~one (measured on TPU: 233.5 -> 192.7 ms
    median on a 4K-reduce-shaped words+palette readback — docs/perf.md).
    On a local PCIe transport the win is the removed dispatch syncs.
    Safe everywhere: plain numpy inputs pass through `np.asarray`
    unchanged."""
    for a in arrays:
        if hasattr(a, "copy_to_host_async"):
            a.copy_to_host_async()
    return tuple(np.asarray(a) for a in arrays)


def _palette_readback(centroids, k: int) -> np.ndarray:
    """Centroids `[kp, 3]` Lab -> `[k, 4]` RGBA8 sorted by L* ascending —
    the `CentroidsBuffer::pull_values` + L*-sort readback idiom
    (`core/src/structures.rs:581-617`, `core/src/lib.rs:276-284`), shared
    by the palette entry points. Trailing (bucket-padding) rows beyond
    `k` are dropped before the sort; conversion happens at the full
    (bounded) kp shape so executables stay keyed on the k bucket."""
    with _phase("readback"):
        rgba, lightness = _lab_palette_to_u8(centroids)
        rgba, lightness = _host_fetch(rgba, lightness)
    with _phase("host_sort"):
        rgba, lightness = rgba[:k], lightness[:k]
        return rgba[np.argsort(lightness, kind="stable")]


def _on_device(method):
    """Run an ImageProcessor entry point with computation pinned to the
    processor's selected device (`jax.default_device`)."""

    @wraps(method)
    def wrapper(self, *args, **kwargs):
        if self._device is None:
            return method(self, *args, **kwargs)
        with jax.default_device(self._device):
            return method(self, *args, **kwargs)

    return wrapper


def _as_image(image) -> Image:
    if isinstance(image, Image):
        return image
    arr = np.asarray(image, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[-1] != 4:
        raise ValueError("expected an Image or an [H, W, 4] uint8 array")
    return Image((arr.shape[1], arr.shape[0]), arr)


def _colors_to_lab(colors: np.ndarray) -> np.ndarray:
    """`CentroidsBuffer::fixed_centroids` (`core/src/structures.rs:523-553`):
    user RGBA8 colors -> Lab centroids (host-side numpy)."""
    colors = np.asarray(colors, dtype=np.uint8).reshape(-1, 4)
    return srgb8_to_lab_np(colors[:, :3])


def _cpu_palette_from_rgb(rgb: np.ndarray, k: int, algo) -> np.ndarray:
    """Dispatch to a CPU palette algorithm over `[N, 3]` RGB rows and sort
    the result by L* — shared by single-image and frame-batch paths."""
    if algo is Algorithm.MEDIANCUT:
        colors = extract_palette_mediancut(rgb, k)
    elif algo is Algorithm.WU:
        colors = extract_palette_wu(rgb, k)
    else:
        colors = extract_palette_octree(rgb, k)
    return _sort_by_lightness(np.asarray(colors, dtype=np.uint8))


def _sort_by_lightness(colors_u8: np.ndarray) -> np.ndarray:
    """Sort RGBA8 colors by Lab L* ascending (`core/src/lib.rs:276-284`)."""
    lightness = srgb8_to_lab_np(colors_u8[:, :3])[:, 0]
    return colors_u8[np.argsort(lightness, kind="stable")]


class ImageProcessor:
    """Device-facing entry point (`core/src/lib.rs:24-65`).

    `devices`: JAX devices to use (defaults to all of `jax.devices()`;
    single-device execution uses the first). Multi-device sharding lives in
    `kmeans_tpu.parallel`.
    """

    def __init__(
        self,
        devices=None,
        fused: bool | None = None,
        train_max_size: int | None = MAX_IMAGE_DIMENSION,
        bucketing: bool = False,
        fast: bool = False,
        delta_e: str = "94",
        restarts: int = 1,
        pipeline: bool = False,
        train_dtype: str | None = None,
    ):
        # Persistent XLA compile cache: on remote-compile TPU deployments a
        # fresh process otherwise pays the full compile for every
        # executable (~minutes). Opt out with KMEANS_TPU_NO_CACHE=1.
        import os as _os

        if not _os.environ.get("KMEANS_TPU_NO_CACHE"):
            from kmeans_tpu.utils.cache import enable_compilation_cache

            enable_compilation_cache()

        # Distance metric (TPU-first extension): CIE94 is the reference's
        # metric (every kernel); CIEDE2000 is implemented in the
        # reference's delta_e.wgsl:24-97 but never wired up — here
        # delta_e="2000" uses it end-to-end (training, assignment, dither
        # threshold, meld blending, convergence). The fused quantize/assign
        # kernels AND the Pallas Lloyd accumulator implement it natively
        # (polynomial atan2 — Mosaic has no atan2 lowering); small
        # (shrunk) trainings use the XLA trainer as usual.
        aliases = {"94": "cie94", "cie94": "cie94",
                   "2000": "cie2000", "cie2000": "cie2000"}
        if str(delta_e) not in aliases:
            raise ValueError(
                f"delta_e must be one of {sorted(aliases)}, got {delta_e!r}"
            )
        self.delta_e = aliases[str(delta_e)]

        self.devices = list(devices) if devices is not None else jax.devices()
        # All single-device work is pinned to devices[0] (jax.default_device
        # around each entry point); multi-device sharding lives in
        # kmeans_tpu.parallel.
        self._device = self.devices[0] if self.devices else None
        # fused=None: auto (Pallas kernel on TPU, XLA fusion elsewhere),
        # decided for the SELECTED device (e.g. devices=jax.devices("cpu")
        # on a TPU host must take the XLA path).
        if fused and not _pallas_available(self._device):
            raise ValueError(
                "fused=True requires a TPU device (the Pallas kernels have "
                "no compiled CPU lowering); omit `fused` for auto-selection"
            )
        self.fused = (
            _pallas_available(self._device) if fused is None else bool(fused)
        )
        # Training-shrink cap. The reference hard-codes 256
        # (`core/src/structures.rs:23`); raising it — or disabling the
        # shrink entirely with train_max_size=None — trades time for
        # palette fidelity, a capability the reference lacks. Full-res
        # training stays fast on TPU: the Pallas tile accumulator
        # (`fit_large`) engages above 1M training pixels.
        self.train_max_size = (
            None if train_max_size is None else int(train_max_size)
        )
        # Shape bucketing (serving mode): pad inputs to the {4,5,6,7}*2^k
        # ladder so unseen image sizes reuse compiled executables (one per
        # bucket, not one per exact shape). Outputs are bit-equal for
        # `find` and near-identical for `reduce` (training sums reduce in
        # a different order over the weighted canvas). See
        # `utils/bucketing.py`.
        self.bucketing = bool(bucketing)
        # fast=True: the fused quantize/assign kernels hoist the CIE94
        # divides into per-pixel reciprocals (2 divides total instead of
        # 2 per centroid), and the Pallas Lloyd accumulator (large/full-res
        # training) uses the divide-free algebraic CIE94 distance —
        # measured 1.5-1.56x on k>16 quantize and 1.23x/iter on k=64
        # training (docs/perf.md). ~1e-4 of pixels can flip to the other
        # side of a nearest-centroid knife edge (a*(1/b) != a/b in f32),
        # giving up bit-parity with the XLA formulas for measurable speed.
        # k <= 16 stays exact under fast on every kernel (no measured gain
        # there); CPU/XLA paths are unchanged.
        self.fast = bool(fast)
        # restarts=N trains N independent k-means++ seedings per request
        # and keeps the lowest-inertia run (restart 0 is always the
        # reference seed, so restarts=1 is exact reference behavior).
        # Applies to EVERY kmeans training path: vmapped on the XLA
        # trainer (fit_restarts), sequential through the Pallas
        # accumulator for large/full-res trainings (fit_large_restarts),
        # and vmapped inside the shard_map on the multi-chip trainers
        # (fit_sharded(restarts=)).
        restarts = int(restarts)
        if restarts < 1:
            raise ValueError("restarts must be >= 1")
        self.restarts = restarts
        # pipeline=True (opt-in): large exact-path reduces stream the
        # image through the device in row bands, overlapping each band's
        # packed-index readback with later bands' uploads. The transport
        # here measured ~63% duplex overlap (tools/exp_duplex.py), but
        # the per-band call overheads made the banded path ~2x SLOWER
        # end-to-end through this harness's high-latency tunnel
        # (interleaved A/B, docs/perf.md round 2), so the monolithic
        # single-dispatch path stays the default. The banded path remains
        # available for low-latency local transports. Training runs first
        # on a host-shrunk strip (numpy mirror of the device sampler —
        # bit-equal on CPU; the TPU's f32 resize rounds ~13% of strip
        # pixels one u8 step differently, a documented deviation).
        self.pipeline = bool(pipeline)
        # train_dtype="bfloat16" (opt-in): store the Lab training planes
        # half-width in the Pallas Lloyd accumulator — half the
        # per-iteration HBM traffic on large/full-resolution trainings
        # (the kernel up-casts on load and accumulates f32). This
        # QUANTIZES the training input (~0.3 delta-E; counts shift ~2e-4
        # of pixels — docs/perf.md round 2), so palettes deviate slightly
        # from the f32 default; measured/iter at 4K: no gain at k=8
        # (compute-bound), ~1.10x exact / 1.13x with fast at k=64. Only
        # engages where training routes to the Pallas accumulator: plain
        # single-image paths on TPU above ~1M training pixels (e.g.
        # train_max_size=None) AND, since round 3, the sharded entry
        # points when their routing picks the per-shard accumulator
        # (`_sharded_trainer_route`). The XLA trainers and the batched
        # entry points (`reduce_images`/`reduce_many` et al — vmapped XLA
        # trainers by construction) ignore it; it is rejected with
        # bucketing to avoid silent no-ops in serving.
        if train_dtype is not None:
            allowed = ("bfloat16", "float32")
            if str(train_dtype) not in allowed:
                raise ValueError(
                    f"train_dtype must be one of {allowed} or None, "
                    f"got {train_dtype!r}"
                )
            if self.bucketing:
                raise ValueError(
                    "train_dtype is not supported with bucketing=True "
                    "(the bucketed trainers do not route through the "
                    "Pallas accumulator's plane store)"
                )
        self.train_dtype = (
            None if train_dtype in (None, "float32") else str(train_dtype)
        )

    # ------------------------------------------------------------------ #
    # Internal palette extraction
    # ------------------------------------------------------------------ #

    @_on_device
    def extract_palette_kmeans(
        self,
        image: Image,
        k: int,
        color_space: ColorSpace = ColorSpace.LAB,
    ) -> jnp.ndarray:
        """Train k centroids on the (shrunk) image; returns `[k, 3]` in the
        working space. Mirrors `operations::extract_palette_kmeans`
        (`core/src/operations.rs:15-88`): shrink to <=256px long side,
        convert, seed, Lloyd.

        With `pipeline=True` (opt-in) the shrink runs on the HOST
        (`resize_uint8_np`, the numpy mirror of the device sampler) and
        only the training strip is uploaded — ~0.2 MB instead of the full
        image (~25 MB at 4K), removing the dominant transfer from every
        training-only call (`palette`, and `find -p` needs none). Same
        deviation policy as the banded reduce: bit-equal on CPU; the
        TPU's f32 resize rounds ~13% of strip pixels one u8 step
        differently, so default palettes stay on the device shrink."""
        w, h = image.dimensions
        sw, sh = shrunk_dimensions(w, h, self.train_max_size)
        first = kmeans_model.reference_seed_index(sw, sh)
        with _phase("host_prep"):
            strip = self._pipeline_strip(_host_rgb(image.pixels))
        with _phase("upload"):
            upload = jnp.asarray(strip)
            _phase_sync(upload)
        with _phase("device"):
            centroids, iters = _train_jit(
                upload,
                k,
                (sh, sw),
                first,
                color_space.convergence,
                lab=color_space is ColorSpace.LAB,
                use_pallas=self.fused,
                metric=self.delta_e,
                restarts=self.restarts,
                fast=self.fast,
                train_dtype=self.train_dtype,
            )
            _phase_sync(centroids)
        if log.isEnabledFor(logging.DEBUG):
            # Debug centroid dump, like the reference's log-gated readback
            # (`core/src/modules.rs:842-870`, convergence log :829).
            log.debug("converged after %d iterations", int(iters))
            for i, c in enumerate(np.asarray(centroids)):
                log.debug("Centroid %d = %s", i, c.tolist())
        return centroids

    def _cpu_palette_u8(self, image: Image, k: int, algo) -> np.ndarray:
        """CPU palette algorithms (`octree_palette`, `core/src/lib.rs:288-331`,
        plus median cut and Wu): shrink to <=128px, reduce on CPU, sort by
        L*. Under bucketing the shrink runs through the static-canvas
        executable (same sampler, one compile per bucket)."""
        rgb = self._cpu_shrunk_rgb(image)
        return _cpu_palette_from_rgb(rgb, k, algo)

    def _shrunk_pixels(self, image: Image, cap: int) -> np.ndarray:
        """Host-side shrink to `cap` for the CPU palette algorithms. Under
        bucketing the resize runs through the static-canvas executable
        (same sampler, one compile per bucket) and the host crops."""
        w, h = image.dimensions
        sw, sh = shrunk_dimensions(w, h, cap)
        # Only the RGB planes are consumed downstream (_cpu_shrunk_rgb
        # slices [..., :3]); upload RGB-only.
        pixels_u8 = _host_rgb(image.pixels)
        if (sw, sh) == (w, h):
            return pixels_u8
        if self.pipeline:
            # The consumers are CPU algorithms (octree/mediancut/wu), so
            # the device round trip (full-image upload + shrunk readback)
            # exists only to run the sampler; pipeline mode shrinks on the
            # host instead — zero transfers, same deviation policy as the
            # pipelined kmeans palette (bit-equal on CPU; the TPU sampler
            # can round isolated pixels one u8 step differently).
            return resize_uint8_np(pixels_u8, sh, sw)
        if self.bucketing:
            padded, _, _ = pad_to_bucket(pixels_u8)
            bh, bw = padded.shape[:2]
            canvas = (min(cap, bh), min(cap, bw))
            return np.asarray(
                _canvas_shrink_jit(jnp.asarray(padded), canvas, h, w, sh, sw)
            )[:sh, :sw]
        return np.asarray(resize_uint8(jnp.asarray(pixels_u8), sh, sw))

    def _pipeline_strip_dims(self, w: int, h: int) -> tuple[int, int]:
        """Dims of the host-shrunk training strip `_pipeline_strip`
        produces — `(w, h)` unchanged when pipeline mode is off (or no
        shrink applies)."""
        if self.pipeline:
            return shrunk_dimensions(w, h, self.train_max_size)
        return w, h

    def _pipeline_strip(self, rgb_u8: np.ndarray) -> np.ndarray:
        """Pipeline mode's host shrink of a training input: resample
        `[h, w, 3]` u8 RGB down to the training-strip dims on the HOST
        (`resize_uint8_np`, the numpy mirror of the device sampler) so
        only the ~0.2 MB strip uploads instead of the full image
        (~25 MB at 4K). Identity when pipeline mode is off or the image
        is already within `train_max_size`. Deviation policy (why this
        is opt-in): within ONE u8 step of the device shrink — numpy
        evaluates the same f32 expressions without XLA's FMA
        contraction, so isolated x.5-boundary pixels round one step
        apart (on CPU backends too, rarely; routinely on TPU), which can
        in turn flip a boundary channel of a trained centroid by one
        step (docs/perf.md; soaked in tools/soak.py)."""
        h, w = rgb_u8.shape[:2]
        sw, sh = self._pipeline_strip_dims(w, h)
        if (sw, sh) == (w, h):
            return rgb_u8
        return resize_uint8_np(rgb_u8, sh, sw)

    def _bucket_train_args(self, w: int, h: int, bw: int, bh: int):
        """Static canvas shape, dynamic shrunk dims, and the seed pixel's
        flat index *within the canvas* for bucketed training."""
        cap = self.train_max_size
        sw, sh = shrunk_dimensions(w, h, cap)
        canvas = (bh, bw) if cap is None else (min(cap, bh), min(cap, bw))
        seed = kmeans_model.reference_seed_index(sw, sh)
        y, x = divmod(seed, sw)
        return canvas, (sw, sh), y * canvas[1] + x

    def _reduce_bucketed(self, image: Image, k: int, reduce_mode) -> np.ndarray:
        """Bucketed kmeans reduce: pad to the bucket, train on the weighted
        canvas with the cluster axis padded to `bucket_k(k)` (requests at
        any k <= kp share the executable), quantize the padded image,
        crop."""
        padded, h, w = pad_to_bucket(_host_rgb(image.pixels))
        bh, bw = padded.shape[:2]
        canvas, (sw, sh), first = self._bucket_train_args(w, h, bw, bh)
        conv = ColorSpace.LAB.convergence
        kp = bucket_k(k)
        if self.fused and reduce_mode is not ReduceMode.MELD and k <= INDEXED_MAX_K:
            words, pal = _reduce_bucketed_indexed_jit(
                jnp.asarray(padded), kp, canvas, first, h, w, sh, sw, conv,
                reduce_mode.value, k, fast=self.fast, restarts=self.restarts,
                metric=self.delta_e,
            )
            words_np, pal_np = _host_fetch(words, pal)
            return _unpack_gather(words_np, bh, bw, kp, pal_np)[:h, :w]
        if (
            self.fused
            and reduce_mode is ReduceMode.MELD
            and kp <= QUANT_MAX_KP
        ):
            # kp > QUANT_MAX_KP: no meld kernel program — the
            # _reduce_bucketed_jit fallthrough routes its output pass to
            # the row-chunked XLA meld.
            words = _reduce_bucketed_meld_jit(
                jnp.asarray(padded), kp, canvas, first, h, w, sh, sw, conv,
                k, fast=self.fast, restarts=self.restarts,
                metric=self.delta_e,
            )
            return _unpack_meld(np.asarray(words), bh, bw, kp)[:h, :w]
        out = _reduce_bucketed_jit(
            jnp.asarray(padded), kp, canvas, first, h, w, sh, sw, conv,
            reduce_mode.value, self.fused, k, fast=self.fast,
            metric=self.delta_e, restarts=self.restarts,
        )
        return np.asarray(out)[:h, :w]

    def warmup(
        self,
        sizes,
        color_counts,
        modes=(ReduceMode.REPLACE,),
        palette: bool = True,
        find_palette_sizes=(),
        gif_frame_counts=(),
        batch_sizes=(),
    ) -> int:
        """Precompile bucketed executables before serving traffic.

        `sizes` is an iterable of representative `(width, height)` pairs;
        each maps to its bucket, and one dummy request per distinct
        (bucket, k, mode) triggers the XLA compile (minutes over a
        remote-compile tunnel — pay it at deploy time, not per request).
        Warms `reduce` for every (bucket, k-bucket, mode), `palette` for
        every (bucket, k-bucket) unless `palette=False`, and `find` for
        every (bucket, mode, k-bucket) with sizes in `find_palette_sizes`
        (user palettes pad to `bucket_k` rows, so one size per power-of-two
        bucket suffices). With `gif_frame_counts`, also warms the batched
        GIF executables (`reduce_images` frame + global palettes and
        `find_batch`) for each frame-count bucket. With `batch_sizes`,
        warms ONLY the micro-batching executables for those frame-count
        buckets — `reduce_many`, `palette_many` (unless `palette=False`),
        and, when `find_palette_sizes` is given, `find_many` (what the
        serving daemon's concurrent-request coalescing hits — serve.py
        passes the batcher's ladder). Returns the number of dummy
        requests issued. Requires bucketing=True.
        """

        from kmeans_tpu.utils.bucketing import bucket_shape

        if not self.bucketing:
            raise ValueError("warmup requires ImageProcessor(bucketing=True)")
        rng = np.random.default_rng(0)
        seen = set()

        def dummy_image(bh, bw):
            dummy = rng.integers(0, 256, (bh, bw, 4), dtype=np.uint8)
            dummy[..., 3] = 255
            return Image((bw, bh), dummy)

        def once(key, fn):
            if key not in seen:
                seen.add(key)
                fn()

        def palette_warm_args(w, h, bh, bw, img):
            """Dummy image + dedupe-key prefix for a palette warm.

            Pipeline mode trains on the HOST-shrunk strip padded to the
            STRIP's bucket, whose shape follows the real aspect ratio —
            the full-image-bucket dummy would warm a different (usually
            never-hit) strip bucket. Use a real-size dummy and key by the
            strip bucket instead."""
            if not self.pipeline:
                return (bh, bw), img
            psw, psh = self._pipeline_strip_dims(int(w), int(h))
            sbh, sbw = bucket_shape(psh, psw)
            return (sbh, sbw, "strip"), dummy_image(int(h), int(w))

        for w, h in sizes:
            bh, bw = bucket_shape(int(h), int(w))
            img = dummy_image(bh, bw)
            for k in color_counts:
                k = int(k)
                # Executables are keyed by the k *bucket* (k_active masks
                # the rest), so k=5 and k=8 share one compile.
                for mode in modes:
                    mode = ReduceMode(mode)
                    once(
                        (bh, bw, bucket_k(k), mode.value),
                        lambda: self.reduce(k, img, reduce_mode=mode),
                    )
                if palette:
                    pal_key, pal_img = palette_warm_args(w, h, bh, bw, img)
                    once(
                        pal_key + (bucket_k(k), "palette"),
                        lambda: self.palette(k, pal_img),
                    )
            for kf in find_palette_sizes:
                kf = int(kf)
                colors = rng.integers(0, 256, (kf, 4), dtype=np.uint8)
                colors[:, 3] = 255
                for mode in modes:
                    mode = ReduceMode(mode)
                    once(
                        (bh, bw, bucket_k(kf), mode.value, "find"),
                        lambda: self.find(img, colors, mode),
                    )
            for fc in gif_frame_counts:
                fb = bucket_frames(int(fc))
                frames = [dummy_image(bh, bw) for _ in range(fb)]
                for k in color_counts:
                    k = int(k)
                    pal_key, pal_img = palette_warm_args(w, h, bh, bw, img)
                    pal_frames = (
                        frames if pal_img is img
                        else [dummy_image(int(h), int(w)) for _ in range(fb)]
                    )
                    once(
                        pal_key + (fb, bucket_k(k), "pimg"),
                        lambda: self.palette_images(pal_frames, k),
                    )
                    for mode in modes:
                        mode = ReduceMode(mode)
                        once(
                            (bh, bw, fb, bucket_k(k), mode.value, "rimg"),
                            lambda: self.reduce_images(frames, k, mode),
                        )
                        # Serving micro-batches (reduce_many) use their own
                        # executable (per-frame traced sizes/seeds).
                        once(
                            (bh, bw, fb, bucket_k(k), mode.value, "rmany"),
                            lambda: self.reduce_many(frames, k, mode),
                        )
                for kf in find_palette_sizes:
                    kf = int(kf)
                    colors = rng.integers(0, 256, (kf, 4), dtype=np.uint8)
                    colors[:, 3] = 255
                    for mode in modes:
                        mode = ReduceMode(mode)
                        once(
                            (bh, bw, fb, bucket_k(kf), mode.value, "fbatch"),
                            lambda: self.find_batch(frames, colors, mode),
                        )
            for bs in batch_sizes:
                fb = bucket_frames(int(bs))
                frames = [dummy_image(bh, bw) for _ in range(fb)]
                for k in color_counts:
                    k = int(k)
                    for mode in modes:
                        mode = ReduceMode(mode)
                        once(
                            (bh, bw, fb, bucket_k(k), mode.value, "rmany"),
                            lambda: self.reduce_many(frames, k, mode),
                        )
                    if palette:
                        pal_key, pal_img = palette_warm_args(w, h, bh, bw, img)
                        pal_frames = (
                            frames if pal_img is img
                            else [dummy_image(int(h), int(w))
                                  for _ in range(fb)]
                        )
                        once(
                            pal_key + (fb, bucket_k(k), "pmany"),
                            lambda: self.palette_many(pal_frames, k),
                        )
                for kf in find_palette_sizes:
                    kf = int(kf)
                    colors = rng.integers(0, 256, (kf, 4), dtype=np.uint8)
                    colors[:, 3] = 255
                    for mode in modes:
                        mode = ReduceMode(mode)
                        # Same executable as find_batch's bucketed tall
                        # stack (identical jit call) — shared dedupe key.
                        once(
                            (bh, bw, fb, bucket_k(kf), mode.value, "fbatch"),
                            lambda: self.find_many(frames, colors, mode),
                        )
        return len(seen)

    # ------------------------------------------------------------------ #
    # Public entry points (parity with core/src/lib.rs)
    # ------------------------------------------------------------------ #

    @_on_device
    def palette(
        self, color_count: int, image, algo: Algorithm = Algorithm.KMEANS
    ) -> np.ndarray:
        """Extract the k dominant colors as `[k, 4]` RGBA8, sorted by L*
        ascending (`core/src/lib.rs:67-77,255-331`)."""
        image = _as_image(image)
        _validate_k(color_count)
        if algo is not Algorithm.KMEANS:
            return self._cpu_palette_u8(image, color_count, algo)
        if self.bucketing:
            # Pipeline mode host-shrinks FIRST and treats the strip as
            # the input image: the bucketed trainer's dynamic resize
            # reduces to its exact identity gather, the upload drops
            # from the image bucket (~25 MB at 4K) to the strip bucket
            # (~0.2 MB), and strip buckets bound the compile set
            # (strips are <= train_max_size per side).
            rgb = self._pipeline_strip(_host_rgb(image.pixels))
            padded, h, w = pad_to_bucket(rgb)
            bh, bw = padded.shape[:2]
            canvas, (sw, sh), first = self._bucket_train_args(w, h, bw, bh)
            centroids, _ = _train_bucketed_jit(
                jnp.asarray(padded), bucket_k(color_count), canvas, first,
                h, w, sh, sw, ColorSpace.LAB.convergence, color_count,
                use_pallas=self.fused, metric=self.delta_e,
                restarts=self.restarts, fast=self.fast,
            )
            return _palette_readback(centroids, color_count)
        centroids = self.extract_palette_kmeans(image, color_count)
        return _palette_readback(centroids, color_count)

    @_on_device
    def find(
        self, image, colors, reduce_mode: ReduceMode = ReduceMode.REPLACE
    ) -> Image:
        """Recolor with a fixed palette — no training
        (`core/src/lib.rs:79-114`)."""
        image = _as_image(image)
        palette_rgba = _colors_rgba(colors)
        if palette_rgba.shape[0] == 0:
            raise ValueError("palette must contain at least one color")
        with _phase("host_prep"):
            palette_lab = _colors_to_lab(palette_rgba)
            rgb = _host_rgb(image.pixels)  # alpha is ignored
            if self.bucketing:
                rgb, h, w = pad_to_bucket(rgb)
        with _phase("upload"):
            dev = jnp.asarray(rgb)
            _phase_sync(dev)
        out = self._quantize(dev, palette_lab, reduce_mode)
        if self.bucketing:
            return Image(image.dimensions, np.asarray(out)[:h, :w])
        return Image(image.dimensions, np.asarray(out))

    @_on_device
    def reduce(
        self,
        color_count: int,
        image,
        algo: Algorithm = Algorithm.KMEANS,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
    ) -> Image:
        """Quantize the image to `color_count` colors
        (`core/src/lib.rs:116-164`)."""
        image = _as_image(image)
        _validate_k(color_count)
        if algo is Algorithm.KMEANS:
            if self.bucketing:
                out = self._reduce_bucketed(image, color_count, reduce_mode)
                return Image(image.dimensions, out)
            w, h = image.dimensions
            sw, sh = shrunk_dimensions(w, h, self.train_max_size)
            first = kmeans_model.reference_seed_index(sw, sh)
            if (
                self.fused
                and reduce_mode is not ReduceMode.MELD
                and color_count <= INDEXED_MAX_K
            ):
                if (
                    self.pipeline
                    and self.train_max_size is not None
                    and h >= PIPELINE_BAND_ROWS * PIPELINE_MIN_BANDS
                ):
                    out = self._reduce_banded(image, color_count, reduce_mode)
                    return Image(image.dimensions, out)
                with _phase("host_prep"):
                    rgb = _host_rgb(image.pixels)
                with _phase("upload"):
                    dev = jnp.asarray(rgb)
                    _phase_sync(dev)
                with _phase("device"):
                    words, palette_rgba = _reduce_indexed_jit(
                        dev,
                        color_count,
                        (sh, sw),
                        first,
                        ColorSpace.LAB.convergence,
                        reduce_mode.value,
                        fast=self.fast,
                        restarts=self.restarts,
                        metric=self.delta_e,
                        train_dtype=self.train_dtype,
                    )
                    _phase_sync(words)
                with _phase("readback"):
                    words_np, pal_np = _host_fetch(words, palette_rgba)
                with _phase("unpack"):
                    out = _unpack_gather(words_np, h, w, color_count, pal_np)
            elif (
                self.fused
                and reduce_mode is ReduceMode.MELD
                and color_count <= QUANT_MAX_KP
            ):
                # Meld's compact tier: in-kernel RGB byte pack (3 B/px,
                # bit-identical colors — meld has no index map). Above
                # QUANT_MAX_KP the meld kernel cannot compile; the else
                # branch's _reduce_jit routes its output pass to the
                # row-chunked XLA meld.
                with _phase("host_prep"):
                    rgb = _host_rgb(image.pixels)
                with _phase("upload"):
                    dev = jnp.asarray(rgb)
                    _phase_sync(dev)
                with _phase("device"):
                    words = _reduce_meld_packed_jit(
                        dev,
                        color_count,
                        (sh, sw),
                        first,
                        ColorSpace.LAB.convergence,
                        fast=self.fast,
                        restarts=self.restarts,
                        metric=self.delta_e,
                        train_dtype=self.train_dtype,
                    )
                    _phase_sync(words)
                with _phase("readback"):
                    words_np = np.asarray(words)
                with _phase("unpack"):
                    out = _unpack_meld(words_np, h, w, color_count)
            else:
                with _phase("host_prep"):
                    rgb = _host_rgb(image.pixels)
                with _phase("upload"):
                    dev = jnp.asarray(rgb)
                    _phase_sync(dev)
                with _phase("device"):
                    out, _ = _reduce_jit(
                        dev,
                        color_count,
                        (sh, sw),
                        first,
                        ColorSpace.LAB.convergence,
                        reduce_mode.value,
                        self.fused,
                        fast=self.fast,
                        metric=self.delta_e,
                        restarts=self.restarts,
                        train_dtype=self.train_dtype,
                    )
                    _phase_sync(out)
        else:
            palette_u8 = self._cpu_palette_u8(image, color_count, algo)
            palette_lab = _colors_to_lab(palette_u8)
            rgb = _host_rgb(image.pixels)  # alpha ignored
            if self.bucketing:
                padded, h, w = pad_to_bucket(rgb)
                out = np.asarray(
                    self._quantize(jnp.asarray(padded), palette_lab, reduce_mode)
                )[:h, :w]
            else:
                out = self._quantize(
                    jnp.asarray(rgb), palette_lab, reduce_mode
                )
        return Image(image.dimensions, np.asarray(out))

    def _reduce_banded(self, image: Image, color_count: int, reduce_mode):
        """Transfer-pipelined exact-path reduce (large images, fused
        indexed path): train on a HOST-shrunk strip first, then stream the
        full-resolution rows through the device in `PIPELINE_BAND_ROWS`
        bands — every band's upload+assign is dispatched before any
        readback blocks, so each band's packed-index readback rides the
        transport's duplex overlap (~63% measured, tools/exp_duplex.py)
        under the later bands' uploads, instead of serializing after them.
        Dither rows are offset per band (seamless Bayer). vs the
        monolithic `_reduce_indexed_jit`: same executables' math, palette
        trained on the numpy-mirrored shrink (equal or ~1 u8 step apart on
        isolated pixels — documented deviation, quality-asserted in
        tests)."""
        pixels = image.pixels
        h, w = pixels.shape[:2]
        sw, sh = shrunk_dimensions(w, h, self.train_max_size)
        first = kmeans_model.reference_seed_index(sw, sh)
        rgb = np.asarray(pixels)[..., :3]  # view; bands copied per band
        # Same-size "resize" is NOT identity under the corner-aligned
        # sampler (it blends adjacent texels); skip it exactly like the
        # monolithic path does when no shrink is needed.
        strip = (
            np.ascontiguousarray(rgb)
            if (sw, sh) == (w, h)
            else resize_uint8_np(rgb, sh, sw)
        )
        centroids, _ = _train_jit(
            jnp.asarray(strip), color_count, (sh, sw), first,
            ColorSpace.LAB.convergence, use_pallas=self.fused,
            metric=self.delta_e, restarts=self.restarts, fast=self.fast,
            train_dtype=self.train_dtype,
        )
        # Dispatch every band (upload + fused assign + device-side bit
        # pack) before blocking on any result: JAX's async dispatch keeps
        # the transfer queue full in both directions.
        pending = []
        for r0 in range(0, h, PIPELINE_BAND_ROWS):
            band = np.ascontiguousarray(rgb[r0 : r0 + PIPELINE_BAND_ROWS])
            words = _assign_indexed_jit(
                jnp.asarray(band), centroids, reduce_mode.value, None, r0,
                fast=self.fast, metric=self.delta_e,
            )
            pending.append((r0, band.shape[0], words))
        # Start every band's device->host copy (and the palette's) before
        # blocking on any: the transfers overlap instead of paying one
        # transport round trip each (_host_fetch).
        fetched = _host_fetch(
            _lab_palette_to_u8(centroids)[0], *[p[2] for p in pending]
        )
        palette_rgba, word_arrays = fetched[0], fetched[1:]
        out = np.empty((h, w, 4), np.uint8)
        for (r0, bh, _), words_np in zip(pending, word_arrays):
            out[r0 : r0 + bh] = _unpack_gather(
                words_np, bh, w, color_count, palette_rgba
            )
        return out

    def _quantize(self, pixels_u8, palette_lab, reduce_mode: ReduceMode):
        palette_lab = jnp.asarray(palette_lab, jnp.float32)
        k = palette_lab.shape[0]
        k_active = None
        if self.bucketing:
            # Bucket the palette size too: pad rows (masked by k_active)
            # so find executables are keyed by the k *bucket* and fully
            # enumerable by warmup.
            palette_lab, k_active = pad_palette_k(palette_lab)
        if self.fused:
            if reduce_mode is not ReduceMode.MELD and k <= INDEXED_MAX_K:
                with _phase("device"):
                    words = _assign_indexed_jit(
                        pixels_u8, palette_lab, reduce_mode.value, k_active,
                        fast=self.fast, metric=self.delta_e,
                    )
                    _phase_sync(words)
                with _phase("readback"):
                    words_np, pal_np = _host_fetch(
                        words, _lab_palette_to_u8(palette_lab)[0]
                    )
                with _phase("unpack"):
                    return _unpack_gather(
                        words_np, pixels_u8.shape[0], pixels_u8.shape[1],
                        palette_lab.shape[0], pal_np,
                    )
            if reduce_mode is ReduceMode.MELD:
                if palette_lab.shape[0] > QUANT_MAX_KP:
                    # No meld kernel program above QUANT_MAX_KP (compile
                    # crash class, tools/exp_k2048.py); row-chunked XLA.
                    return quantize_image(
                        pixels_u8, palette_lab, mode="meld",
                        k_active=k_active, metric=self.delta_e,
                    )
                words = _meld_packed_jit(
                    pixels_u8, palette_lab, k_active, fast=self.fast,
                    metric=self.delta_e,
                )
                return _unpack_meld(
                    np.asarray(words), pixels_u8.shape[0],
                    pixels_u8.shape[1], palette_lab.shape[0],
                )
            return _quantize_fused_jit(
                pixels_u8, palette_lab, reduce_mode.value, k_active,
                fast=self.fast, metric=self.delta_e,
            )
        return quantize_image(
            pixels_u8, palette_lab, mode=reduce_mode.value, k_active=k_active,
            metric=self.delta_e,
        )

    # ------------------------------------------------------------------ #
    # TPU-first extensions
    # ------------------------------------------------------------------ #

    @_on_device
    def find_batch(
        self,
        images,
        colors,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
    ) -> list[Image]:
        """Apply a fixed palette to a batch of same-sized frames (e.g. GIF
        frames) in one vmapped executable — the batched variant of `find`
        for BASELINE config 5."""
        frames = [_as_image(im) for im in images]
        if not frames:
            raise ValueError("need at least one frame")
        dims = frames[0].dimensions
        for f in frames:
            if f.dimensions != dims:
                raise ValueError("all frames must share dimensions")
        palette_rgba = _colors_rgba(colors)
        if palette_rgba.shape[0] == 0:
            raise ValueError("palette must contain at least one color")
        palette_lab = jnp.asarray(_colors_to_lab(palette_rgba))
        h, w = frames[0].pixels.shape[:2]
        k_active = None
        if self.bucketing:
            # Per-pixel op: pad to the bucket (spatially, in frame count —
            # pad frames repeat frame 0 and are discarded — and in palette
            # size, masked by k_active), crop after — bit-equal.
            palette_lab, k_active = pad_palette_k(palette_lab)
            with _phase("host_prep"):
                padded = [
                    pad_to_bucket(_host_rgb(f.pixels))[0] for f in frames
                ]
                padded += (
                    [padded[0]] * (bucket_frames(len(padded)) - len(padded))
                )
                stack = np.stack(padded)
        else:
            with _phase("host_prep"):
                stack = np.stack([_host_rgb(f.pixels) for f in frames])
        kp = palette_lab.shape[0]
        if self.fused and reduce_mode is not ReduceMode.MELD and kp <= INDEXED_MAX_K:
            # Fused-kernel batch: one tall packed assign over every frame
            # (see _find_batch_fused_jit — bit-equal to per-frame).
            with _phase("upload"):
                dev = jnp.asarray(stack)
                _phase_sync(dev)
            with _phase("device"):
                words = _find_batch_fused_jit(
                    dev, palette_lab, reduce_mode.value,
                    k_active, fast=self.fast, metric=self.delta_e,
                )
                _phase_sync(words)
            bsz, sh_, sw_ = stack.shape[:3]
            h4 = -(-sh_ // 4) * 4
            with _phase("readback"):
                words_np, pal_u8 = _host_fetch(
                    words, _lab_palette_to_u8(palette_lab)[0]
                )
            with _phase("unpack"):
                outs = _unpack_gather(
                    words_np, bsz * h4, sw_, kp, pal_u8
                ).reshape(bsz, h4, sw_, 4)[: len(frames), :h, :w]
        elif (
            self.fused
            and reduce_mode is ReduceMode.MELD
            and kp <= QUANT_MAX_KP
        ):
            # Meld's batch tier: one tall RGB24-packed meld launch,
            # bit-identical to per-frame (no dither phase to align).
            # kp > QUANT_MAX_KP falls to the vmapped XLA batch below.
            words = _find_batch_meld_jit(
                jnp.asarray(stack), palette_lab, k_active,
                fast=self.fast, metric=self.delta_e,
            )
            bsz, sh_, sw_ = stack.shape[:3]
            outs = _unpack_meld(np.asarray(words), bsz * sh_, sw_, kp).reshape(
                bsz, sh_, sw_, 4
            )[: len(frames), :h, :w]
        else:
            outs = np.asarray(
                _find_batch_jit(
                    jnp.asarray(stack), palette_lab, reduce_mode.value,
                    k_active, metric=self.delta_e,
                )
            )[: len(frames), :h, :w]
        return [Image(dims, outs[i]) for i in range(len(frames))]

    @_on_device
    def find_many(
        self,
        images,
        colors,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
    ) -> list[Image]:
        """Recolor a batch of images that may DIFFER in size with ONE
        fixed palette, coalescing same-bucket frames into a single fused
        tall-stack assign — the `/find` counterpart of `reduce_many`
        (serve.py aggregates concurrent same-(palette, mode) requests
        through this instead of one executable launch per request).

        Requires bucketing for the coalescing to engage (frames group by
        their shape bucket; the executable population stays the bounded
        warmable set — `warmup(batch_sizes=..., find_palette_sizes=...)`
        covers it). Without bucketing, for palettes past the 512-color
        indexed cap, or for any frame alone in its bucket, falls back to
        per-image `find`. Coalesced frames run the same fused program per
        pixel as solo `find` (stacking adds rows; replace/dither keep
        Bayer phase y%4 == 0 like `_find_batch_fused_jit`; meld takes the
        tall RGB24-packed launch), asserted bit-equal in tests."""
        frames = [_as_image(im) for im in images]
        if not frames:
            raise ValueError("need at least one image")
        palette_rgba = _colors_rgba(colors)
        if palette_rgba.shape[0] == 0:
            raise ValueError("palette must contain at least one color")
        if (
            not self.bucketing
            or not self.fused
            or palette_rgba.shape[0] > INDEXED_MAX_K
        ):
            return [self.find(f, palette_rgba, reduce_mode) for f in frames]
        from kmeans_tpu.utils.bucketing import bucket_shape

        groups: dict[tuple[int, int], list[int]] = {}
        for i, f in enumerate(frames):
            h, w = f.pixels.shape[:2]
            groups.setdefault(bucket_shape(h, w), []).append(i)

        results: list[Image | None] = [None] * len(frames)
        palette_lab = None
        for (bh, bw), idxs in groups.items():
            if len(idxs) == 1:
                i = idxs[0]
                results[i] = self.find(frames[i], palette_rgba, reduce_mode)
                continue
            if palette_lab is None:
                palette_lab, k_active = pad_palette_k(
                    jnp.asarray(_colors_to_lab(palette_rgba))
                )
                kp = palette_lab.shape[0]
            padded = [
                pad_to_bucket(_host_rgb(frames[i].pixels))[0] for i in idxs
            ]
            n_pad = bucket_frames(len(idxs)) - len(idxs)
            stack = np.stack(padded + [padded[0]] * n_pad)
            if reduce_mode is ReduceMode.MELD:
                # Tall-stack meld (RGB24-packed readback; bit-identical
                # to per-frame find — no dither phase to align).
                words = _find_batch_meld_jit(
                    jnp.asarray(stack), palette_lab, k_active,
                    fast=self.fast, metric=self.delta_e,
                )
                px = _unpack_meld(
                    np.asarray(words), stack.shape[0] * bh, bw, kp
                ).reshape(stack.shape[0], bh, bw, 4)
            else:
                words = _find_batch_fused_jit(
                    jnp.asarray(stack), palette_lab, reduce_mode.value,
                    k_active, fast=self.fast, metric=self.delta_e,
                )
                h4 = -(-bh // 4) * 4
                words_np, pal_u8 = _host_fetch(
                    words, _lab_palette_to_u8(palette_lab)[0]
                )
                px = _unpack_gather(
                    words_np, stack.shape[0] * h4, bw, kp, pal_u8
                ).reshape(stack.shape[0], h4, bw, 4)
            for j, i in enumerate(idxs):
                h, w = frames[i].pixels.shape[:2]
                results[i] = Image(frames[i].dimensions, px[j, :h, :w])
        return results

    @_on_device
    def reduce_images(
        self,
        images,
        color_count: int,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
    ) -> list[Image]:
        """Quantize a batch of same-sized frames at one k in a single
        vmapped executable (each frame trains its own palette) — per-device
        frame batching, the 'batch multiple images/gif frames per device'
        capability."""
        frames = [_as_image(im) for im in images]
        if not frames:
            raise ValueError("need at least one frame")
        _validate_k(color_count)
        dims = frames[0].dimensions
        for f in frames:
            if f.dimensions != dims:
                raise ValueError("all frames must share dimensions")
        w, h = dims
        if self.bucketing:
            padded = [pad_to_bucket(_host_rgb(f.pixels))[0] for f in frames]
            padded += [padded[0]] * (bucket_frames(len(padded)) - len(padded))
            padded = np.stack(padded)
            bh, bw = padded.shape[1:3]
            canvas, (sw, sh), first = self._bucket_train_args(w, h, bw, bh)
            kp = bucket_k(color_count)
            if self._frames_fused_ok(padded.shape[0], kp, reduce_mode):
                words, palettes = _reduce_images_bucketed_fused_jit(
                    jnp.asarray(padded), kp, canvas, first, h, w, sh, sw,
                    ColorSpace.LAB.convergence, reduce_mode.value,
                    color_count, fast=self.fast, metric=self.delta_e,
                    restarts=self.restarts,
                )
                outs = self._frames_fused_outs(
                    words, palettes, len(frames), bh, bw, kp, reduce_mode
                )[:, :h, :w]
            else:
                outs = np.asarray(
                    _reduce_images_bucketed_jit(
                        jnp.asarray(padded), kp, canvas, first,
                        h, w, sh, sw, ColorSpace.LAB.convergence,
                        reduce_mode.value, color_count, metric=self.delta_e,
                        restarts=self.restarts,
                    )
                )[: len(frames), :h, :w]
            return [Image(dims, outs[i]) for i in range(len(frames))]
        sw, sh = shrunk_dimensions(w, h, self.train_max_size)
        first = kmeans_model.reference_seed_index(sw, sh)
        stack = jnp.asarray(np.stack([_host_rgb(f.pixels) for f in frames]))
        if self._frames_fused_ok(len(frames), color_count, reduce_mode):
            words, palettes = _reduce_images_fused_jit(
                stack, color_count, (sh, sw), first, reduce_mode.value,
                fast=self.fast, metric=self.delta_e, restarts=self.restarts,
            )
            outs = self._frames_fused_outs(
                words, palettes, len(frames), h, w, color_count, reduce_mode
            )
        else:
            outs = np.asarray(
                _reduce_images_jit(
                    stack, color_count, (sh, sw), first, reduce_mode.value,
                    metric=self.delta_e, restarts=self.restarts,
                )
            )
        return [Image(dims, outs[i]) for i in range(len(frames))]

    def _frames_fused_ok(self, b: int, kp: int, reduce_mode) -> bool:
        """Gate for the per-frame-palette fused batch kernels: TPU fused
        processor, indexable palette (replace/dither; meld has no index
        cap — its RGB24 pack serves any k), and the stacked SMEM centroid
        table within the kernel's budget (`FRAMES_MAX_BK`). Meld admitted
        round 3 under the golden-quality policy (see
        `_frames_quantize_tail`)."""
        return (
            self.fused
            and (reduce_mode is ReduceMode.MELD or kp <= INDEXED_MAX_K)
            and kp <= QUANT_MAX_KP  # b=1 edge: B*KP fits but the per-
            #   frame kernel program itself cannot compile above the cap
            and b * kp <= FRAMES_MAX_BK
        )

    @staticmethod
    def _frames_fused_outs(
        words, palettes, n: int, h: int, w: int, kp: int, reduce_mode=None
    ) -> np.ndarray:
        """Host tail of the fused frame-batch reduce: unpack each frame's
        in-kernel-packed index words and gather its own palette
        (replace/dither), or invert the RGB24 pack (meld)."""
        if reduce_mode is ReduceMode.MELD:
            words_np = np.asarray(words)
            return np.stack(
                [_unpack_meld(words_np[i], h, w, kp) for i in range(n)]
            )
        words, pals = _host_fetch(words, palettes)
        return np.stack(
            [_unpack_gather(words[i], h, w, kp, pals[i]) for i in range(n)]
        )

    @_on_device
    def palette_images(
        self, images, color_count: int, algo: Algorithm = Algorithm.KMEANS
    ) -> np.ndarray:
        """One palette trained jointly over a batch of same-sized frames
        (global GIF palette: every frame quantizes consistently, no
        cross-frame flicker — unlike `reduce_images`, which trains each
        frame its own palette). KMEANS trains on the concatenated shrunk
        frames in a single executable; CPU algorithms run over the
        concatenated shrunk pixels. Returns `[k, 4]` RGBA8, L*-sorted."""
        frames = [_as_image(im) for im in images]
        if not frames:
            raise ValueError("need at least one frame")
        _validate_k(color_count)
        dims = frames[0].dimensions
        for f in frames:
            if f.dimensions != dims:
                raise ValueError("all frames must share dimensions")
        w, h = dims
        if algo is not Algorithm.KMEANS:
            rgb = np.concatenate(
                [self._cpu_shrunk_rgb(f) for f in frames], axis=0
            )
            return _cpu_palette_from_rgb(rgb, color_count, algo)
        if self.bucketing:
            from kmeans_tpu.utils.bucketing import bucket_k

            # Pipeline mode host-shrinks each frame and treats the strips
            # as the input frames (the trainer's dynamic resize becomes
            # its exact identity gather) — B strip-bucket uploads instead
            # of B image-bucket uploads; same policy as `palette`. Each
            # frame's full-res host RGB stays transient inside the
            # comprehension (peak host RAM = one frame + the padded set).
            padded = [
                pad_to_bucket(self._pipeline_strip(_host_rgb(f.pixels)))[0]
                for f in frames
            ]
            w, h = self._pipeline_strip_dims(w, h)
            n_pad = bucket_frames(len(padded)) - len(padded)
            padded = np.stack(padded + [padded[0]] * n_pad)
            frame_valid = np.concatenate(
                [np.ones(len(frames), np.float32), np.zeros(n_pad, np.float32)]
            )
            bh, bw = padded.shape[1:3]
            canvas, (sw, sh), first = self._bucket_train_args(w, h, bw, bh)
            centroids, _ = _train_frames_bucketed_jit(
                jnp.asarray(padded), bucket_k(color_count), canvas, first,
                h, w, sh, sw, ColorSpace.LAB.convergence,
                jnp.asarray(frame_valid), color_count, metric=self.delta_e,
                restarts=self.restarts,
            )
            # Convert at the full (bounded) kp shape, slice active rows on
            # the host — slicing centroids first would key the conversion
            # executable on the exact k.
            return _palette_readback(centroids, color_count)
        sw, sh = shrunk_dimensions(w, h, self.train_max_size)
        first = kmeans_model.reference_seed_index(sw, sh)
        # Training-only call: pipeline mode uploads host-shrunk strips
        # (B x ~0.2 MB) instead of the full stack.
        stack = jnp.asarray(
            np.stack([self._pipeline_strip(_host_rgb(f.pixels)) for f in frames])
        )
        centroids, _ = _train_frames_jit(
            stack, color_count, (sh, sw), first, ColorSpace.LAB.convergence,
            metric=self.delta_e, restarts=self.restarts,
        )
        rgba, lightness = _host_fetch(*_lab_palette_to_u8(centroids))
        return rgba[np.argsort(lightness, kind="stable")]

    def _cpu_shrunk_rgb(self, image: Image) -> np.ndarray:
        """Shrink to the octree cap and return `[N, 3]` RGB rows."""
        return self._shrunk_pixels(image, OCTREE_MAX_SIZE)[..., :3].reshape(-1, 3)

    def find_sharded(
        self,
        image,
        colors,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
        mesh=None,
    ) -> Image:
        """Multi-chip `find`: fixed-palette recolor with the image's rows
        sharded over the mesh's pixel axis (no collectives — the output
        pass is embarrassingly parallel). Transfer parity with the
        single-chip path: RGB-only upload; replace/dither with k <= INDEXED_MAX_K
        read back an index map (2/4/8 bits per pixel width-packed for
        k <= 256, raw uint16 above) that the host expands via
        `palette[idx]`; meld on TPU meshes reads back in-kernel-packed
        RGB24 words (3 B/px, any k)."""
        from kmeans_tpu.parallel.mesh import make_mesh
        from kmeans_tpu.parallel.sharded_ops import quantize_image_sharded

        image = _as_image(image)
        palette_rgba = _colors_rgba(colors)
        if palette_rgba.shape[0] == 0:
            raise ValueError("palette must contain at least one color")
        palette_lab = jnp.asarray(_colors_to_lab(palette_rgba))
        if mesh is None:
            mesh = make_mesh(self.devices, data=1)
        rgb = _host_rgb(image.pixels)  # alpha is ignored
        if reduce_mode is ReduceMode.MELD:
            out = self._meld_sharded(mesh, rgb, palette_lab)
        elif palette_lab.shape[0] <= INDEXED_MAX_K:
            out = self._quantize_indexed_sharded(
                mesh, rgb, palette_lab, reduce_mode
            )
        else:
            out = np.asarray(
                quantize_image_sharded(
                    mesh, rgb, palette_lab, mode=reduce_mode.value,
                    metric=self.delta_e,
                )
            )
        return Image(image.dimensions, out)

    def _quantize_indexed_sharded(
        self, mesh, rgb, palette_lab, reduce_mode, k_active=None
    ) -> np.ndarray:
        """Shared sharded indexed-readback epilogue: packed index map off
        the mesh, host unpack + `palette[idx]` gather — the multi-chip
        twin of the single-chip `_assign_indexed_jit` readback path. On
        TPU meshes each shard runs the fused Pallas kernel
        (`assign_fused_sharded`: gamma LUT + in-kernel sublane pack,
        10-40x the XLA quantizer per chip); CPU meshes keep the XLA
        executable (2/4/8-bit width pack, raw uint16 above 256) — same
        bytes per pixel either way."""
        from kmeans_tpu.parallel.mesh import PIXEL_AXIS
        from kmeans_tpu.parallel.sharded_ops import (
            assign_fused_sharded,
            assign_indexed_sharded,
            unpack_fused_sharded,
        )

        w = rgb.shape[1]
        # Honor the explicit fused=False opt-out exactly like every
        # single-chip route: a user working around a Mosaic issue must be
        # able to force the XLA sharded executable on a TPU mesh too.
        if self.fused and _pallas_available(mesh.devices.flat[0]):
            words, _ = assign_fused_sharded(
                mesh, rgb, palette_lab, mode=reduce_mode.value,
                k_active=k_active, metric=self.delta_e, fast=self.fast,
            )
            arr, pal = _host_fetch(
                words, _lab_palette_to_u8(jnp.asarray(palette_lab))[0]
            )
            idx = unpack_fused_sharded(
                arr, rgb.shape[0], w, int(palette_lab.shape[0]),
                int(mesh.shape[PIXEL_AXIS]),
            )
            return pal[idx]
        packed, bits = assign_indexed_sharded(
            mesh, rgb, palette_lab, mode=reduce_mode.value, k_active=k_active,
            metric=self.delta_e,
        )
        arr, pal = _host_fetch(
            packed, _lab_palette_to_u8(jnp.asarray(palette_lab))[0]
        )
        idx = _unpack_nibbles(arr, w, bits) if bits < 8 else arr[:, :w]
        return pal[idx]

    def _meld_sharded(
        self, mesh, rgb, palette_lab, k_active=None
    ) -> np.ndarray:
        """Sharded meld epilogue: on TPU meshes each shard runs the fused
        meld kernel with the in-kernel RGB24 pack (3 B/px readback,
        bit-identical colors — the multi-chip twin of the single-chip
        `_meld_packed_jit` route); CPU meshes and the fused=False opt-out
        keep the XLA sharded executable (4 B/px RGBA)."""
        from kmeans_tpu.parallel.mesh import PIXEL_AXIS
        from kmeans_tpu.parallel.sharded_ops import (
            meld_fused_sharded,
            quantize_image_sharded,
            unpack_meld_sharded,
        )

        palette_lab = jnp.asarray(palette_lab)
        if (
            self.fused
            and _pallas_available(mesh.devices.flat[0])
            and palette_lab.shape[0] <= QUANT_MAX_KP
        ):
            # kp > QUANT_MAX_KP: no meld kernel program (compile crash
            # class) — the XLA sharded meld below handles any k.
            words = meld_fused_sharded(
                mesh, rgb, palette_lab, k_active=k_active,
                metric=self.delta_e, fast=self.fast,
            )
            return unpack_meld_sharded(
                np.asarray(words), rgb.shape[0], rgb.shape[1],
                int(palette_lab.shape[0]), int(mesh.shape[PIXEL_AXIS]),
            )
        return np.asarray(
            quantize_image_sharded(
                mesh, rgb, palette_lab, mode="meld", k_active=k_active,
                metric=self.delta_e,
            )
        )

    def _sharded_fit_kwargs(self, n_px: int, kp: int, mesh) -> dict:
        """Trainer selection + opt-in threading for the sharded fits:
        route by the SAME large-N/metric branches as single-chip
        (`_sharded_trainer_route` mirrors `_fit_auto`), honoring the
        fused=False opt-out; `fast`/`train_dtype` reach the per-shard
        Pallas accumulator exactly as they reach `fit_large`."""
        use_pallas = self.fused and _pallas_available(mesh.devices.flat[0])
        trainer = _sharded_trainer_route(
            n_px, kp, use_pallas, self.delta_e, fast=self.fast
        )
        return {
            "trainer": trainer,
            "fast": self.fast,
            "plane_dtype": self.train_dtype if trainer == "pallas" else None,
        }

    def _fit_sharded_work(self, work, weight, k, first, mesh, n: int):
        """Pixel-sharded fit over an assembled (already shard-padded) work
        store — the shared tail of `_fit_sharded_centroids` and
        `palette_images_sharded`, with `_fit_auto`-parity routing
        (full-res sharded trainings run the per-shard Pallas accumulator,
        not the one-hot protocol). `n` is the REAL (unpadded) pixel count
        the trainer-route budget sees."""
        from kmeans_tpu.parallel.distributed import fit_sharded

        centroids, _ = fit_sharded(
            mesh, work, weight, k, first,
            convergence=ColorSpace.LAB.convergence, metric=self.delta_e,
            restarts=self.restarts,
            **self._sharded_fit_kwargs(n, k, mesh),
        )
        return centroids

    def _fit_sharded_centroids(self, image: Image, k: int, mesh):
        """Shared trainer for the sharded entry points: shrink, convert,
        pad to the shard count (0-weight padding) — all in ONE jitted
        executable (`_sharded_work_jit`) — then the pixel-sharded fit."""
        w, h = image.dimensions
        sw, sh = shrunk_dimensions(w, h, self.train_max_size)
        first = kmeans_model.reference_seed_index(sw, sh)
        n = sh * sw
        d = mesh.devices.size
        n_pad = (n + d - 1) // d * d
        # RGB-only upload (alpha never participates) — single-chip parity.
        work, weight = _sharded_work_jit(
            jnp.asarray(_host_rgb(image.pixels))[None], sh, sw, n_pad
        )
        return self._fit_sharded_work(work, weight, k, first, mesh, n)

    def palette_sharded(self, color_count: int, image, mesh=None) -> np.ndarray:
        """Multi-chip `palette`: training sharded over the mesh's pixel
        axis (psum/all_gather over ICI); returns `[k, 4]` RGBA8 sorted by
        L* like `palette`."""
        from kmeans_tpu.parallel.mesh import make_mesh

        image = _as_image(image)
        _validate_k(color_count)
        if mesh is None:
            mesh = make_mesh(self.devices, data=1)
        centroids = self._fit_sharded_centroids(image, color_count, mesh)
        return _palette_readback(centroids, color_count)

    def reduce_sharded(
        self,
        color_count: int,
        image,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
        mesh=None,
    ) -> Image:
        """Multi-chip reduce: training sharded over the mesh's pixel axis
        (psum/all_gather collectives over ICI) and the full-resolution
        quantize sharded row-wise. Semantically equivalent to `reduce`
        modulo f32 reduction reordering in the psum'd centroid sums.

        With `bucketing=True` the input pads to its shape bucket, training
        runs on the static weighted canvas with the k axis padded to its
        bucket, and quantize runs on the padded rows — multi-chip serving
        with the same bounded executable population as single-chip."""
        from kmeans_tpu.parallel.distributed import fit_sharded
        from kmeans_tpu.parallel.mesh import make_mesh
        from kmeans_tpu.parallel.sharded_ops import quantize_image_sharded

        image = _as_image(image)
        _validate_k(color_count)
        if mesh is None:
            mesh = make_mesh(self.devices, data=1)
        if self.bucketing:
            # RGB-only upload of the bucket-padded pixels (alpha never
            # participates) — single-chip transfer parity.
            padded, h, w = pad_to_bucket(_host_rgb(image.pixels))
            bh, bw = padded.shape[:2]
            canvas, (sw, sh), first = self._bucket_train_args(w, h, bw, bh)
            ch, cw = canvas
            canvas_u8, weight = resize_to_canvas(
                jnp.asarray(padded)[..., :3], ch, cw, h, w, sh, sw
            )
            work = srgb8_to_lab(canvas_u8.reshape(-1, 3))
            wvec = weight.reshape(-1)
            n = work.shape[0]
            d = mesh.devices.size
            n_pad = (n + d - 1) // d * d
            if n_pad != n:
                work = jnp.pad(work, ((0, n_pad - n), (0, 0)))
                wvec = jnp.pad(wvec, (0, n_pad - n))
            centroids, _ = fit_sharded(
                mesh, work, wvec, bucket_k(color_count), first,
                convergence=ColorSpace.LAB.convergence, k_active=color_count,
                metric=self.delta_e, restarts=self.restarts,
                **self._sharded_fit_kwargs(n, bucket_k(color_count), mesh),
            )
            if reduce_mode is ReduceMode.MELD:
                out = self._meld_sharded(
                    mesh, padded, centroids, k_active=color_count
                )
            elif color_count <= INDEXED_MAX_K:
                out = self._quantize_indexed_sharded(
                    mesh, padded, centroids, reduce_mode, k_active=color_count
                )
            else:
                out = np.asarray(
                    quantize_image_sharded(
                        mesh, padded, centroids, mode=reduce_mode.value,
                        k_active=color_count, metric=self.delta_e,
                    )
                )
            return Image(image.dimensions, out[:h, :w])
        centroids = self._fit_sharded_centroids(image, color_count, mesh)
        rgb = _host_rgb(image.pixels)
        if reduce_mode is ReduceMode.MELD:
            out = self._meld_sharded(mesh, rgb, centroids)
        elif color_count <= INDEXED_MAX_K:
            out = self._quantize_indexed_sharded(
                mesh, rgb, centroids, reduce_mode
            )
        else:
            out = np.asarray(
                quantize_image_sharded(
                    mesh, rgb, centroids, mode=reduce_mode.value,
                    metric=self.delta_e,
                )
            )
        return Image(image.dimensions, out)

    @_on_device
    def reduce_images_sharded(
        self,
        images,
        color_count: int,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
        mesh=None,
    ) -> list[Image]:
        """Multi-chip `reduce_images`: B same-sized frames each train
        their own palette in ONE DP x SP executable — frames sharded over
        the mesh's data axis, pixels over its pixel axis
        (`fit_sharded_batch`, SURVEY §2.3's DP x SP row) — then each
        frame runs the sharded output pass. Training honors the same
        `_fit_auto`-parity routing as every other sharded entry point
        (`_sharded_trainer_route`: full-res frames run the sequential
        per-frame Pallas/chunked protocols inside the shard_map, never
        the `[N_local, K]` one-hot), plus `restarts`/`fast`/`train_dtype`.

        The frame batch pads to the data-axis size by repeating frame 0
        (padded outputs dropped); with `bucketing=True` frames pad to
        their shape bucket and k to its bucket, like `reduce_sharded`."""
        from kmeans_tpu.parallel.distributed import fit_sharded_batch
        from kmeans_tpu.parallel.mesh import DATA_AXIS, PIXEL_AXIS, make_mesh
        from kmeans_tpu.parallel.sharded_ops import quantize_image_sharded

        frames = [_as_image(im) for im in images]
        if not frames:
            raise ValueError("need at least one frame")
        _validate_k(color_count)
        dims = frames[0].dimensions
        for f in frames:
            if f.dimensions != dims:
                raise ValueError("all frames must share dimensions")
        if mesh is None:
            mesh = make_mesh(self.devices, data=1)
        w, h = dims
        n_frames = len(frames)
        pad_b = (-n_frames) % mesh.shape[DATA_AXIS]
        rgb_list = [_host_rgb(f.pixels) for f in frames]
        rgb_list += [rgb_list[0]] * pad_b

        if self.bucketing:
            rgb_list = [pad_to_bucket(rgb)[0] for rgb in rgb_list]
            bh, bw = rgb_list[0].shape[:2]
            canvas, (sw, sh), first = self._bucket_train_args(w, h, bw, bh)
            ch, cw = canvas
            kp = bucket_k(color_count)
            works, wvecs = [], []
            for prgb in rgb_list:
                canvas_u8, wt = resize_to_canvas(
                    jnp.asarray(prgb)[..., :3], ch, cw, h, w, sh, sw
                )
                works.append(srgb8_to_lab(canvas_u8.reshape(-1, 3)))
                wvecs.append(wt.reshape(-1))
        else:
            sw, sh = shrunk_dimensions(w, h, self.train_max_size)
            first = kmeans_model.reference_seed_index(sw, sh)
            kp = color_count
            works, wvecs = [], []
            for prgb in rgb_list:
                px = jnp.asarray(prgb)
                tr = (
                    resize_uint8(px, sh, sw) if (sw, sh) != (w, h) else px
                )
                work1 = srgb8_to_lab(tr[..., :3].reshape(-1, 3))
                works.append(work1)
                wvecs.append(jnp.ones(work1.shape[0], jnp.float32))
        n = works[0].shape[0]
        p = mesh.shape[PIXEL_AXIS]
        n_pad = (n + p - 1) // p * p
        if n_pad != n:
            works = [jnp.pad(wk, ((0, n_pad - n), (0, 0))) for wk in works]
            wvecs = [jnp.pad(wv, (0, n_pad - n)) for wv in wvecs]
        k_actives = jnp.full((len(rgb_list),), color_count, jnp.int32)
        cents = fit_sharded_batch(
            mesh, jnp.stack(works), jnp.stack(wvecs), kp, first, k_actives,
            convergence=ColorSpace.LAB.convergence, metric=self.delta_e,
            restarts=self.restarts,
            **self._sharded_fit_kwargs(n, kp, mesh),
        )
        outs = []
        for i in range(n_frames):
            c = cents[i]
            rgb = rgb_list[i]
            if reduce_mode is ReduceMode.MELD:
                out = self._meld_sharded(
                    mesh, rgb, c, k_active=color_count
                )
            elif color_count <= INDEXED_MAX_K:
                out = self._quantize_indexed_sharded(
                    mesh, rgb, c, reduce_mode, k_active=color_count
                )
            else:
                out = np.asarray(
                    quantize_image_sharded(
                        mesh, rgb, c, mode=reduce_mode.value,
                        k_active=color_count, metric=self.delta_e,
                    )
                )
            outs.append(Image(dims, out[:h, :w]))
        return outs

    def palette_images_sharded(
        self,
        images,
        color_count: int,
        algo: Algorithm = Algorithm.KMEANS,
        mesh=None,
    ) -> np.ndarray:
        """Multi-chip `palette_images`: ONE palette trained jointly over B
        same-sized frames, with the concatenated shrunk training pixels
        sharded over the mesh's pixel axis (round-5 surface symmetry —
        the DP x SP family's training-only member). The joint training is
        a single fit, so it rides `fit_sharded` over the concatenation
        (frame 0 first, preserving the reference seed index) with
        `_fit_auto`-parity trainer routing; CPU palette algorithms do not
        train on device and fall back to `palette_images`. Returns
        `[k, 4]` RGBA8 sorted by L* like `palette_images` (equal modulo
        f32 psum reduction ordering)."""
        from kmeans_tpu.parallel.mesh import make_mesh

        frames = [_as_image(im) for im in images]
        if not frames:
            raise ValueError("need at least one frame")
        _validate_k(color_count)
        dims = frames[0].dimensions
        for f in frames:
            if f.dimensions != dims:
                raise ValueError("all frames must share dimensions")
        if algo is not Algorithm.KMEANS:
            return self.palette_images(frames, color_count, algo)
        if mesh is None:
            mesh = make_mesh(self.devices, data=1)
        w, h = dims
        sw, sh = shrunk_dimensions(w, h, self.train_max_size)
        first = kmeans_model.reference_seed_index(sw, sh)
        n = len(frames) * sh * sw
        d = mesh.devices.size
        n_pad = (n + d - 1) // d * d
        stack = np.stack([_host_rgb(f.pixels) for f in frames])
        work, weight = _sharded_work_jit(jnp.asarray(stack), sh, sw, n_pad)
        centroids = self._fit_sharded_work(
            work, weight, color_count, first, mesh, n
        )
        return _palette_readback(centroids, color_count)

    def find_batch_sharded(
        self,
        images,
        colors,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
        mesh=None,
    ) -> list[Image]:
        """Multi-chip `find_batch`: B same-sized frames recolored with one
        fixed palette in ONE tall-stack sharded launch (round-5 surface
        symmetry). Frames pad rows to a multiple of 4 and stack tall
        exactly like the single-chip `_find_batch_fused_jit` (the Bayer
        dither matrix is 4-periodic, so each frame keeps the per-frame
        phase `find` uses); the tall image's rows then shard over the
        mesh's pixel axis through the same epilogues as `find_sharded`
        (fused Pallas kernel per shard on TPU meshes, packed indexed /
        RGB24 meld readbacks, XLA executable on CPU meshes) — one launch
        and one readback for the whole batch instead of B. Bit-equal to
        per-frame `find_sharded` by construction (per-pixel op; phase
        r%4 within every frame)."""
        from kmeans_tpu.parallel.mesh import make_mesh
        from kmeans_tpu.parallel.sharded_ops import quantize_image_sharded

        frames = [_as_image(im) for im in images]
        if not frames:
            raise ValueError("need at least one frame")
        dims = frames[0].dimensions
        for f in frames:
            if f.dimensions != dims:
                raise ValueError("all frames must share dimensions")
        palette_rgba = _colors_rgba(colors)
        if palette_rgba.shape[0] == 0:
            raise ValueError("palette must contain at least one color")
        palette_lab = _colors_to_lab(palette_rgba)
        kp = palette_lab.shape[0]
        if mesh is None:
            mesh = make_mesh(self.devices, data=1)
        w, h = dims
        h4 = -(-h // 4) * 4
        stack = np.zeros((len(frames), h4, w, 3), np.uint8)
        for i, f in enumerate(frames):
            stack[i, :h] = _host_rgb(f.pixels)
        tall = stack.reshape(len(frames) * h4, w, 3)
        if reduce_mode is ReduceMode.MELD:
            out = self._meld_sharded(mesh, tall, jnp.asarray(palette_lab))
        elif kp <= INDEXED_MAX_K:
            out = self._quantize_indexed_sharded(
                mesh, tall, palette_lab, reduce_mode
            )
        else:
            out = np.asarray(
                quantize_image_sharded(
                    mesh, tall, palette_lab, mode=reduce_mode.value,
                    metric=self.delta_e,
                )
            )
        out = out.reshape(len(frames), h4, w, 4)[:, :h]
        return [Image(dims, out[i]) for i in range(len(frames))]

    @_on_device
    def reduce_streamed(
        self,
        color_count: int,
        image,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
        band_rows: int = 4096,
    ) -> Image:
        """Gigapixel reduce: stream the image through the device in row
        bands, so device memory holds one band at a time — image size is
        bounded by host RAM, not HBM (the reference is capped at
        8192x8192 by GPU texture limits, `README.md:9-11`).

        Pass 1 shrinks each band horizontally to the training width via
        the dynamic-canvas op, assembles the [H, sw] strip on the host,
        shrinks it vertically, and runs the weighted fit — every step on
        per-bucket executables. Pass 2 quantizes each band with the
        trained palette; dither rows are offset by the band's absolute
        position, so the Bayer pattern is seamless across band edges.

        Numerics note: the two-stage (horizontal-then-vertical) training
        shrink rounds to uint8 between stages, so for images larger than
        the training cap the palette can differ from `reduce`'s
        single-stage shrink by ~1 u8 step; images that need no shrink
        train on identical pixels. Streaming always runs on bucketed
        executables (that is what makes the band shapes static), so on a
        `bucketing=False` processor results match `reduce` of a
        `bucketing=True` one, not the exact-shape path.
        """
        image = _as_image(image)
        _validate_k(color_count)
        band_rows = max(int(band_rows), 4)
        centroids = self._train_streamed(image, color_count, band_rows)
        w, h = image.dimensions

        # Pass 2: quantize bands with absolute dither offsets.
        out = self._quantize_bands(
            image.pixels, h, w, centroids, color_count, reduce_mode, band_rows
        )
        return Image(image.dimensions, out)

    def _train_streamed(self, image: Image, color_count: int, band_rows: int):
        """Pass 1 of the streamed paths: per-band horizontal shrink into a
        `[h, sw]` training strip, then vertical shrink + weighted fit —
        every step on bucketed executables. The RGB slice/copy happens per
        band so peak extra host RAM stays at one band. `band_rows` must
        already be clamped (>= 4) by the caller. Returns the trained
        `[kp, 3]` Lab centroids with `color_count` active rows."""
        from kmeans_tpu.utils.bucketing import bucket_k

        cap = self.train_max_size
        if cap is None:
            raise ValueError(
                "streamed training requires a finite train_max_size (the "
                "training strip is assembled at that width)"
            )
        w, h = image.dimensions
        sw, sh = shrunk_dimensions(w, h, cap)
        pixels = image.pixels
        conv = ColorSpace.LAB.convergence
        kp = bucket_k(color_count)

        # Per-band horizontal shrink -> [h, sw] training strip. Alpha is
        # ignored by the whole pipeline: upload RGB-only band slices.
        if (sw, sh) == (w, h):
            # No shrink: the image fits the cap, so one small copy is fine.
            strip = _host_rgb(pixels)
        else:
            bands = []
            for r0 in range(0, h, band_rows):
                band = _host_rgb(pixels[r0 : r0 + band_rows])
                bh_real = band.shape[0]
                padded, _, _ = pad_to_bucket(band)
                canvas_h = padded.shape[0]  # = next_bucket(bh_real)
                shrunk = np.asarray(
                    _canvas_shrink_jit(
                        jnp.asarray(padded), (canvas_h, cap),
                        bh_real, w, bh_real, sw,
                    )
                )[:bh_real, :sw]
                bands.append(shrunk)
            strip = np.concatenate(bands, axis=0)  # [h, sw, C]

        # Vertical shrink + weighted fit on the strip (bucketed executables).
        strip_padded, strip_h, strip_w = pad_to_bucket(strip)
        sbh, sbw = strip_padded.shape[:2]
        canvas = (min(cap, sbh), min(cap, sbw))
        seed = kmeans_model.reference_seed_index(sw, sh)
        y0, x0 = divmod(seed, sw)
        first = y0 * canvas[1] + x0
        centroids, _ = _train_bucketed_jit(
            jnp.asarray(strip_padded), kp, canvas, first,
            strip_h, strip_w, sh, sw, conv, color_count,
            use_pallas=self.fused, metric=self.delta_e,
            restarts=self.restarts, fast=self.fast,
        )
        return centroids

    @_on_device
    def palette_streamed(
        self, color_count: int, image, band_rows: int = 4096
    ) -> np.ndarray:
        """Gigapixel `palette`: extract the k dominant colors of an image
        streamed through the device in row bands (training only — no
        output pass), returning `[k, 4]` RGBA8 sorted by L* like
        `palette`. Image size is bounded by host RAM, not HBM."""
        image = _as_image(image)
        _validate_k(color_count)
        band_rows = max(int(band_rows), 4)
        centroids = self._train_streamed(image, color_count, band_rows)
        return _palette_readback(centroids, color_count)

    def _quantize_bands(
        self, pixels, h, w, palette_lab, k_active, reduce_mode, band_rows
    ) -> np.ndarray:
        """Stream `pixels[h, w, 3|4]` through the device in row bands and
        quantize with a fixed (possibly k-padded) palette; dither rows are
        offset by each band's absolute position so the Bayer pattern is
        seamless across band edges. The RGB slice/copy happens PER BAND so
        peak extra host RAM stays at one band, not a whole-image copy.
        Shared by `reduce_streamed` (after training) and `find_streamed`.
        `band_rows` must already be clamped (>= 4) by the caller."""
        use_indexed = (
            self.fused
            and reduce_mode is not ReduceMode.MELD
            and palette_lab.shape[0] <= INDEXED_MAX_K
        )
        palette_rgba = (
            np.asarray(_lab_palette_to_u8(palette_lab)[0])
            if use_indexed
            else None
        )
        out = np.empty((h, w, 4), np.uint8)
        for r0 in range(0, h, band_rows):
            band = _host_rgb(pixels[r0 : r0 + band_rows])
            bh_real = band.shape[0]
            padded, _, _ = pad_to_bucket(band)
            if use_indexed:
                words = _assign_indexed_jit(
                    jnp.asarray(padded), palette_lab, reduce_mode.value,
                    k_active, r0, fast=self.fast, metric=self.delta_e,
                )
                out[r0 : r0 + bh_real] = _unpack_gather(
                    np.asarray(words), padded.shape[0], padded.shape[1],
                    palette_lab.shape[0], palette_rgba,
                )[:bh_real, :w]
            elif (
                self.fused
                and reduce_mode is ReduceMode.MELD
                and palette_lab.shape[0] <= QUANT_MAX_KP
            ):
                # Meld's compact tier (3 B/px RGB24 words, bit-identical
                # colors); meld has no row phase, so bands need no offset.
                # kp > QUANT_MAX_KP has no meld kernel program — falls to
                # the XLA quantize_image branch below.
                words = _meld_packed_jit(
                    jnp.asarray(padded), palette_lab, k_active,
                    fast=self.fast, metric=self.delta_e,
                )
                out[r0 : r0 + bh_real] = _unpack_meld(
                    np.asarray(words), padded.shape[0], padded.shape[1],
                    palette_lab.shape[0],
                )[:bh_real, :w]
            elif self.fused and not (
                reduce_mode is ReduceMode.MELD
                and palette_lab.shape[0] > QUANT_MAX_KP
            ):
                band_out = _quantize_fused_jit(
                    jnp.asarray(padded), palette_lab, reduce_mode.value,
                    k_active, r0, fast=self.fast, metric=self.delta_e,
                )
                out[r0 : r0 + bh_real] = np.asarray(band_out)[:bh_real, :w]
            else:
                band_out = quantize_image(
                    jnp.asarray(padded), palette_lab, mode=reduce_mode.value,
                    k_active=k_active, row_offset=r0, metric=self.delta_e,
                )
                out[r0 : r0 + bh_real] = np.asarray(band_out)[:bh_real, :w]
        return out

    @_on_device
    def find_streamed(
        self,
        image,
        colors,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
        band_rows: int = 4096,
    ) -> Image:
        """Gigapixel `find`: fixed-palette recolor streamed through the
        device in row bands (no training pass at all, so image size is
        bounded by host RAM, not HBM). Bands run on bucketed executables
        with the palette k-padded, so arbitrary image heights reuse a
        bounded executable set; output is bit-equal to whole-image `find`
        on a bucketed processor (it is purely per-pixel)."""
        image = _as_image(image)
        palette_rgba = _colors_rgba(colors)
        if palette_rgba.shape[0] == 0:
            raise ValueError("palette must contain at least one color")
        palette_lab = jnp.asarray(_colors_to_lab(palette_rgba), jnp.float32)
        palette_lab, k_active = pad_palette_k(palette_lab)
        w, h = image.dimensions
        band_rows = max(int(band_rows), 4)
        out = self._quantize_bands(
            image.pixels, h, w, palette_lab, k_active, reduce_mode, band_rows
        )
        return Image(image.dimensions, out)

    @_on_device
    def reduce_pipelined(
        self,
        images,
        color_count: int,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
    ) -> list[Image]:
        """Streaming variant of `reduce` over many images: dispatch every
        frame's upload+compute first (JAX async dispatch overlaps the
        host<->device transfers of frame i+1 with the compute of frame i),
        then gather results. Unlike `reduce_images`, frames may differ in
        size and memory use stays at one frame per in-flight step."""
        _validate_k(color_count)
        use_indexed = (
            self.fused
            and reduce_mode is not ReduceMode.MELD
            and color_count <= INDEXED_MAX_K
        )
        WINDOW = 4  # bounded in-flight frames: overlap without HBM blowup
        pending = []
        results = []

        def drain_one():
            dims, out, palette, post = pending.pop(0)
            if palette is not None:
                arr, pal = _host_fetch(out, palette)
                results.append(Image(dims, post(arr, pal)))
            else:
                (arr,) = _host_fetch(out)
                results.append(Image(dims, post(arr) if post is not None else arr))

        def _crop(h, w):
            return lambda a: a[:h, :w]

        def _gather_crop(hp, wp, h, w, kp):
            # unpack + palette gather in ONE native pass (the same
            # _unpack_gather tail every sibling indexed path uses)
            return lambda a, pal: _unpack_gather(a, hp, wp, kp, pal)[:h, :w]

        def _unpack_meld_crop(hp, wp, h, w, kp):
            return lambda a: _unpack_meld(a, hp, wp, kp)[:h, :w]

        for im in images:
            if len(pending) >= WINDOW:
                drain_one()
            image = _as_image(im)
            if self.bucketing:
                # Bucketed dispatch: varied frame sizes reuse per-bucket
                # executables instead of compiling per exact shape.
                padded, h, w = pad_to_bucket(_host_rgb(image.pixels))
                bh, bw = padded.shape[:2]
                canvas, (sw, sh), first = self._bucket_train_args(w, h, bw, bh)
                conv = ColorSpace.LAB.convergence
                kp = bucket_k(color_count)
                if use_indexed:
                    words, pal = _reduce_bucketed_indexed_jit(
                        jnp.asarray(padded), kp, canvas, first,
                        h, w, sh, sw, conv, reduce_mode.value, color_count,
                        fast=self.fast, restarts=self.restarts,
                        metric=self.delta_e,
                    )
                    post = _gather_crop(bh, bw, h, w, kp)
                    pending.append((image.dimensions, words, pal, post))
                elif (
                    self.fused
                    and reduce_mode is ReduceMode.MELD
                    and kp <= QUANT_MAX_KP
                ):
                    # Meld's compact tier (3 B/px RGB24 words): same
                    # executable the bucketed single-image meld uses.
                    # kp > QUANT_MAX_KP: no meld kernel program — the
                    # _reduce_bucketed_jit fallthrough routes its output
                    # pass to the row-chunked XLA meld.
                    words = _reduce_bucketed_meld_jit(
                        jnp.asarray(padded), kp, canvas, first,
                        h, w, sh, sw, conv, color_count,
                        fast=self.fast, restarts=self.restarts,
                        metric=self.delta_e,
                    )
                    post = _unpack_meld_crop(bh, bw, h, w, kp)
                    pending.append((image.dimensions, words, None, post))
                else:
                    out = _reduce_bucketed_jit(
                        jnp.asarray(padded), kp, canvas, first,
                        h, w, sh, sw, conv, reduce_mode.value, self.fused,
                        color_count, fast=self.fast, metric=self.delta_e,
                        restarts=self.restarts,
                    )
                    pending.append((image.dimensions, out, None, _crop(h, w)))
                continue
            w, h = image.dimensions
            sw, sh = shrunk_dimensions(w, h, self.train_max_size)
            first = kmeans_model.reference_seed_index(sw, sh)
            if use_indexed:
                words, palette_rgba = _reduce_indexed_jit(
                    jnp.asarray(_host_rgb(image.pixels)),
                    color_count,
                    (sh, sw),
                    first,
                    ColorSpace.LAB.convergence,
                    reduce_mode.value,
                    fast=self.fast,
                    restarts=self.restarts,
                    metric=self.delta_e,
                    train_dtype=self.train_dtype,
                )
                post = _gather_crop(h, w, h, w, color_count)
                pending.append((image.dimensions, words, palette_rgba, post))
            elif (
                self.fused
                and reduce_mode is ReduceMode.MELD
                and color_count <= QUANT_MAX_KP
            ):
                # Above QUANT_MAX_KP the meld kernel cannot compile; the
                # _reduce_jit fallthrough routes the output pass to the
                # row-chunked XLA meld (same gate as solo reduce()).
                words = _reduce_meld_packed_jit(
                    jnp.asarray(_host_rgb(image.pixels)),
                    color_count,
                    (sh, sw),
                    first,
                    ColorSpace.LAB.convergence,
                    fast=self.fast,
                    restarts=self.restarts,
                    metric=self.delta_e,
                    train_dtype=self.train_dtype,
                )
                post = _unpack_meld_crop(h, w, h, w, color_count)
                pending.append((image.dimensions, words, None, post))
            else:
                out, _ = _reduce_jit(
                    jnp.asarray(_host_rgb(image.pixels)),
                    color_count,
                    (sh, sw),
                    first,
                    ColorSpace.LAB.convergence,
                    reduce_mode.value,
                    self.fused,
                    fast=self.fast,
                    metric=self.delta_e,
                    train_dtype=self.train_dtype,
                    restarts=self.restarts,
                )
                pending.append((image.dimensions, out, None, None))
        while pending:
            drain_one()
        return results

    @_on_device
    def reduce_batch(
        self,
        image,
        color_counts,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
    ) -> list[Image]:
        """Quantize one image at several k values in a single compiled,
        vmapped executable (replaces `core/examples/parallel.rs:36-51`'s
        one-thread-per-k host concurrency). All k share one padded cluster
        axis; inactive clusters are masked."""
        image = _as_image(image)
        ks = [int(k) for k in color_counts]
        if not ks:
            raise ValueError("need at least one color count")
        for k in ks:
            _validate_k(k)
        kmax = max(ks)
        w, h = image.dimensions
        if self.bucketing:
            # The cluster axis is k_active-masked, so padding kmax to the
            # ladder is free and lets different k sets share executables.
            kmax = next_bucket(kmax)
            padded, h_, w_ = pad_to_bucket(_host_rgb(image.pixels))
            bh, bw = padded.shape[:2]
            canvas, (sw, sh), first = self._bucket_train_args(w, h, bw, bh)
            # Bucket the batch length too (pad entries repeat ks[0] and
            # are discarded) so varying k-list sizes reuse executables.
            ks_padded = ks + [ks[0]] * (bucket_frames(len(ks)) - len(ks))
            outs = np.asarray(
                _reduce_batch_bucketed_jit(
                    jnp.asarray(padded),
                    jnp.asarray(ks_padded, jnp.int32),
                    kmax,
                    canvas,
                    first,
                    h, w, sh, sw,
                    reduce_mode.value,
                    metric=self.delta_e,
                    restarts=self.restarts,
                )
            )[: len(ks), :h, :w]
            return [Image(image.dimensions, outs[i]) for i in range(len(ks))]
        sw, sh = shrunk_dimensions(w, h, self.train_max_size)
        first = kmeans_model.reference_seed_index(sw, sh)
        outs = np.asarray(
            _reduce_batch_jit(
                jnp.asarray(_host_rgb(image.pixels)),
                jnp.asarray(ks, jnp.int32),
                kmax,
                (sh, sw),
                first,
                reduce_mode.value,
                metric=self.delta_e,
                restarts=self.restarts,
            )
        )
        return [Image(image.dimensions, outs[i]) for i in range(len(ks))]

    @_on_device
    def reduce_many(
        self,
        images,
        color_count: int,
        reduce_mode: ReduceMode = ReduceMode.REPLACE,
    ) -> list[Image]:
        """Quantize a batch of images that may DIFFER in size, coalescing
        same-bucket frames into one vmapped executable — the serving-side
        micro-batching primitive (`serve.py` aggregates concurrent
        same-(k, mode) requests through this instead of serializing them
        behind the device lock one executable launch at a time).

        Requires bucketing for the coalescing to engage (frames group by
        their shape bucket; per-frame real/shrunk dims and seed indices
        are traced vectors, so the executable population stays the
        bounded warmable set). Without bucketing — or for any frame alone
        in its bucket — falls back to per-image `reduce`. Each frame
        trains its own palette with the standard protocol; batched
        outputs can differ from solo `reduce` only by vmap's f32
        reduction reordering (same caveat as `reduce_images`)."""
        frames = [_as_image(im) for im in images]
        if not frames:
            raise ValueError("need at least one image")
        _validate_k(color_count)
        if not self.bucketing or self.fast:
            # No bucketing -> nothing to coalesce on. fast=True -> the
            # coalesced executable quantizes with the exact XLA formulas
            # while solo requests use the fast fused kernels; batching
            # would make the SAME input's output depend on concurrent
            # traffic, so fast processors keep per-image semantics.
            return [
                self.reduce(color_count, f, Algorithm.KMEANS, reduce_mode)
                for f in frames
            ]
        from kmeans_tpu.utils.bucketing import bucket_shape

        groups: dict[tuple[int, int], list[int]] = {}
        for i, f in enumerate(frames):
            h, w = f.pixels.shape[:2]
            groups.setdefault(bucket_shape(h, w), []).append(i)

        results: list[Image | None] = [None] * len(frames)
        kp = bucket_k(color_count)
        conv = ColorSpace.LAB.convergence
        for (bh, bw), idxs in groups.items():
            # The vmapped coalesced executables replicate only the
            # plain-trainer route; buckets whose training canvas routes
            # solo requests to the Pallas / chunked large-N trainers
            # (_plain_fit_route False) coalesce through the HEAVY
            # executable instead — sequential per-frame trainings via
            # lax.map in ONE launch, so solo memory behavior is kept
            # while concurrent heavy requests stop paying a launch each.
            h0, w0 = frames[idxs[0]].pixels.shape[:2]
            canvas0, _, _ = self._bucket_train_args(w0, h0, bw, bh)
            plain = _plain_fit_route(
                canvas0[0] * canvas0[1], kp, self.fused, self.delta_e
            )
            if len(idxs) == 1:
                for i in idxs:
                    results[i] = self.reduce(
                        color_count, frames[i], Algorithm.KMEANS, reduce_mode
                    )
                continue
            padded, firsts = [], []
            src_hs, src_ws, out_hs, out_ws = [], [], [], []
            canvas = None
            for i in idxs:
                pad, h, w = pad_to_bucket(_host_rgb(frames[i].pixels))
                canvas, (sw, sh), first = self._bucket_train_args(
                    w, h, bw, bh
                )
                padded.append(pad)
                firsts.append(first)
                src_hs.append(h)
                src_ws.append(w)
                out_hs.append(sh)
                out_ws.append(sw)
            n_pad = bucket_frames(len(idxs)) - len(idxs)
            stack = np.stack(padded + [padded[0]] * n_pad)

            def vec(v):
                return jnp.asarray(v + [v[0]] * n_pad, jnp.int32)

            if not plain:
                outs_dev, pals = _reduce_many_bucketed_heavy_jit(
                    jnp.asarray(stack), kp, canvas, vec(firsts),
                    vec(src_hs), vec(src_ws), vec(out_hs), vec(out_ws),
                    conv, reduce_mode.value, color_count, self.fused,
                    fast=self.fast, metric=self.delta_e,
                    restarts=self.restarts,
                )
                if (
                    self.fused
                    and reduce_mode is not ReduceMode.MELD
                    and kp <= INDEXED_MAX_K
                ):
                    words_np, pals_np = _host_fetch(outs_dev, pals)
                    outs = np.stack([
                        _unpack_gather(words_np[j], bh, bw, kp, pals_np[j])
                        for j in range(len(idxs))
                    ])
                elif (
                    self.fused
                    and reduce_mode is ReduceMode.MELD
                    and kp <= QUANT_MAX_KP
                ):
                    # kp > QUANT_MAX_KP: the heavy jit's meld branch
                    # returned full RGBA (row-chunked XLA meld), not
                    # packed RGB24 words — take the plain else tail.
                    words_np = np.asarray(outs_dev)
                    outs = np.stack([
                        _unpack_meld(words_np[j], bh, bw, kp)
                        for j in range(len(idxs))
                    ])
                else:
                    outs = np.asarray(outs_dev)
            elif self._frames_fused_ok(stack.shape[0], kp, reduce_mode):
                # Fused frame-batch tail (exact kernels: this processor is
                # not `fast`, so outputs stay bit-equal to the XLA
                # quantizer the non-fused executable uses).
                words, palettes = _reduce_many_bucketed_fused_jit(
                    jnp.asarray(stack), kp, canvas, vec(firsts),
                    vec(src_hs), vec(src_ws), vec(out_hs), vec(out_ws),
                    conv, reduce_mode.value, color_count,
                    metric=self.delta_e, restarts=self.restarts,
                )
                outs = self._frames_fused_outs(
                    words, palettes, len(idxs), bh, bw, kp, reduce_mode
                )
            else:
                outs = np.asarray(
                    _reduce_many_bucketed_jit(
                        jnp.asarray(stack), kp, canvas, vec(firsts),
                        vec(src_hs), vec(src_ws), vec(out_hs), vec(out_ws),
                        conv, reduce_mode.value, color_count,
                        metric=self.delta_e, restarts=self.restarts,
                    )
                )
            for j, i in enumerate(idxs):
                h, w = frames[i].pixels.shape[:2]
                results[i] = Image(frames[i].dimensions, outs[j][:h, :w])
        return results

    @_on_device
    def palette_many(
        self,
        images,
        color_count: int,
        algo: Algorithm = Algorithm.KMEANS,
    ) -> list[np.ndarray]:
        """Per-image palettes for a batch of images that may DIFFER in
        size, coalescing same-bucket frames into one vmapped training
        executable — the `/palette` counterpart of `reduce_many`
        (serve.py aggregates concurrent same-(k, algo) requests through
        this). Each entry is `[k, 4]` RGBA8, L*-sorted, exactly like solo
        `palette` (unlike `palette_images`, which trains ONE palette
        jointly over same-sized frames).

        Requires bucketing + kmeans for the coalescing to engage (CPU
        algorithms have no batched executable; `fast` processors keep
        per-image semantics like `reduce_many`). Under pipeline mode each
        frame host-shrinks to its training strip first — grouping then
        happens on strip buckets, the same executables solo `palette`
        hits. Coalesced palettes can differ from solo ones only by vmap's
        f32 reduction reordering (the `reduce_many` caveat)."""
        frames = [_as_image(im) for im in images]
        if not frames:
            raise ValueError("need at least one image")
        _validate_k(color_count)
        if not self.bucketing or self.fast or algo is not Algorithm.KMEANS:
            return [self.palette(color_count, f, algo) for f in frames]
        from kmeans_tpu.utils.bucketing import bucket_shape

        def train_hw(f: Image) -> tuple[int, int]:
            # Pipeline mode groups by the STRIP bucket (the executables
            # solo palette hits); the strip itself is only computed for
            # frames that actually coalesce — singletons fall back to
            # solo palette, which computes its own strip.
            h, w = f.pixels.shape[:2]
            if self.pipeline:
                sw, sh = self._pipeline_strip_dims(w, h)
                return sh, sw
            return h, w

        groups: dict[tuple[int, int], list[int]] = {}
        for i, f in enumerate(frames):
            groups.setdefault(bucket_shape(*train_hw(f)), []).append(i)

        results: list[np.ndarray | None] = [None] * len(frames)
        kp = bucket_k(color_count)
        conv = ColorSpace.LAB.convergence
        for (bh, bw), idxs in groups.items():
            # Same two-tier coalescing as reduce_many: plain buckets take
            # the vmapped executable, heavy buckets the sequential
            # lax.map executable (one launch, solo memory behavior).
            th0, tw0 = train_hw(frames[idxs[0]])
            canvas0, _, _ = self._bucket_train_args(tw0, th0, bw, bh)
            plain = _plain_fit_route(
                canvas0[0] * canvas0[1], kp, self.fused, self.delta_e
            )
            if len(idxs) == 1:
                for i in idxs:
                    results[i] = self.palette(color_count, frames[i], algo)
                continue
            padded, firsts = [], []
            src_hs, src_ws, out_hs, out_ws = [], [], [], []
            canvas = None
            for i in idxs:
                rgb = _host_rgb(frames[i].pixels)
                if self.pipeline:
                    rgb = self._pipeline_strip(rgb)
                pad, h, w = pad_to_bucket(rgb)
                canvas, (sw, sh), first = self._bucket_train_args(
                    w, h, bw, bh
                )
                padded.append(pad)
                firsts.append(first)
                src_hs.append(h)
                src_ws.append(w)
                out_hs.append(sh)
                out_ws.append(sw)
            n_pad = bucket_frames(len(idxs)) - len(idxs)
            stack = np.stack(padded + [padded[0]] * n_pad)

            def vec(v):
                return jnp.asarray(v + [v[0]] * n_pad, jnp.int32)

            if plain:
                rgba, light = _palette_many_bucketed_jit(
                    jnp.asarray(stack), kp, canvas, vec(firsts),
                    vec(src_hs), vec(src_ws), vec(out_hs), vec(out_ws),
                    conv, color_count, metric=self.delta_e,
                    restarts=self.restarts,
                )
            else:
                rgba, light = _palette_many_bucketed_heavy_jit(
                    jnp.asarray(stack), kp, canvas, vec(firsts),
                    vec(src_hs), vec(src_ws), vec(out_hs), vec(out_ws),
                    conv, color_count, self.fused, fast=self.fast,
                    metric=self.delta_e, restarts=self.restarts,
                )
            rgba_np, light_np = _host_fetch(rgba, light)
            for j, i in enumerate(idxs):
                r = rgba_np[j][:color_count]
                l = light_np[j][:color_count]
                results[i] = r[np.argsort(l, kind="stable")]
        return results


@partial(
    jax.jit, static_argnames=("kp", "canvas_shape", "metric", "restarts")
)
def _palette_many_bucketed_jit(
    frames_u8,  # [B, BH, BW, 3|4] bucket-padded, sizes may differ per frame
    kp: int,
    canvas_shape: tuple[int, int],
    first_indices,  # [B]
    src_hs,  # [B]
    src_ws,  # [B]
    out_hs,  # [B]
    out_ws,  # [B]
    convergence,
    k_active,
    metric: str = "cie94",
    restarts: int = 1,
):
    """Per-frame palettes over bucketed frames of DIFFERENT original
    sizes: the training half of `_reduce_many_bucketed_jit` (same traced
    per-frame vectors, so one executable per (bucket, frame bucket, kp)
    serves any size mix) followed by the batched u8 + L* readback
    conversion (`_lab_palette_to_u8` vmapped; the host sorts/crops)."""
    frames_u8 = _ensure_rgba(frames_u8)
    ch, cw = canvas_shape

    def one(frame, first, src_h, src_w, out_h, out_w):
        canvas, weight = resize_to_canvas(
            frame[..., :3], ch, cw, src_h, src_w, out_h, out_w
        )
        work = srgb8_to_lab(canvas.reshape(-1, 3))
        centroids, _ = kmeans_model.fit_restarts(
            work, kp, first, restarts=restarts, convergence=convergence,
            weight=weight.reshape(-1), k_active=k_active, metric=metric,
        )
        return centroids

    cents = jax.vmap(one)(
        frames_u8, first_indices, src_hs, src_ws, out_hs, out_ws
    )
    return jax.vmap(_lab_palette_to_u8)(cents)


@partial(
    jax.jit,
    static_argnames=("k", "train_shape", "mode", "metric", "restarts"),
)
def _reduce_images_jit(
    frames_u8, k: int, train_shape, first_index, mode: str,
    metric: str = "cie94", restarts: int = 1,
):
    def one(frame):
        sh, sw = train_shape
        train_u8 = (
            resize_uint8(frame, sh, sw)
            if (frame.shape[0], frame.shape[1]) != (sh, sw)
            else frame
        )
        work = srgb8_to_lab(train_u8[..., :3].reshape(-1, 3))
        centroids, _ = kmeans_model.fit_restarts(
            work, k, first_index, restarts=restarts, metric=metric
        )
        return quantize_image(frame, centroids, mode=mode, metric=metric)

    return jax.vmap(one)(frames_u8)


@partial(
    jax.jit,
    static_argnames=("kp", "canvas_shape", "mode", "metric", "restarts"),
)
def _reduce_images_bucketed_jit(
    frames_u8,  # [B, BH, BW, 4] bucket-padded
    kp: int,
    canvas_shape: tuple[int, int],
    first_index,
    src_h,
    src_w,
    out_h,
    out_w,
    convergence,
    mode: str,
    k_active,
    metric: str = "cie94",
    restarts: int = 1,
):
    """Bucketed per-frame train + quantize over a padded frame stack (the
    GIF serving path): one executable per (bucket, frame bucket, kp, mode)
    serving any k <= kp."""
    ch, cw = canvas_shape

    def one(frame):
        canvas, weight = resize_to_canvas(
            frame[..., :3], ch, cw, src_h, src_w, out_h, out_w
        )
        work = srgb8_to_lab(canvas.reshape(-1, 3))
        centroids, _ = kmeans_model.fit_restarts(
            work, kp, first_index, restarts=restarts, convergence=convergence,
            weight=weight.reshape(-1), k_active=k_active, metric=metric,
        )
        return quantize_image(
            frame, centroids, mode=mode, k_active=k_active, metric=metric
        )

    return jax.vmap(one)(frames_u8)


def _frames_quantize_tail(frames_u8, cents, mode, k_active, fast, metric):
    """Shared tail of the fused frame-batch reduce paths: per-frame dither
    thresholds, then ONE per-frame-palette Pallas launch over the full-res
    frames — in-kernel index packing for replace/dither
    (`fused_assign_frames_packed`; bit-exact vs the XLA quantizer) or the
    in-kernel RGB24 pack for meld (`fused_meld_frames_packed`; admitted
    round 3 under the golden-quality policy — the frame kernel's dynamic
    centroid indexing can flip 1-ulp blend ties vs solo meld, measured
    tiny on hardware, docs/perf.md round 3). Returns `(words,
    palettes_rgba)`."""
    k_actives = None if k_active is None else jnp.asarray(k_active, jnp.int32)
    palettes = jax.vmap(lambda c: _lab_palette_to_u8(c)[0])(cents)
    if mode == "meld":
        words = fused_meld_frames_packed(
            frames_u8, cents, k_actives, fast=fast, metric=metric
        )
        return words, palettes
    if mode == "dither":
        thr = jax.vmap(
            lambda c: dither_threshold(c, k_active=k_active, metric=metric)
        )(cents)
    else:
        thr = jnp.zeros((frames_u8.shape[0],), jnp.float32)
    words = fused_assign_frames_packed(
        frames_u8, cents, thr, k_actives, mode=mode, fast=fast, metric=metric
    )
    return words, palettes


@partial(
    jax.jit,
    static_argnames=("k", "train_shape", "mode", "fast", "metric", "restarts"),
)
def _reduce_images_fused_jit(
    frames_u8, k: int, train_shape, first_index, mode: str,
    fast: bool = False, metric: str = "cie94", restarts: int = 1,
):
    """Fused-kernel `reduce_images`: vmapped per-frame training (XLA — the
    Pallas trainer cannot vmap on Mosaic), then one per-frame-palette
    fused assign launch over ALL frames (`fused_assign_frames_packed`)
    instead of the vmapped XLA quantizer, with in-kernel index packing.
    Bit-equal per frame to the fused single-image `reduce`."""
    frames_u8 = _ensure_rgba(frames_u8)

    def train(frame):
        sh, sw = train_shape
        train_u8 = (
            resize_uint8(frame, sh, sw)
            if (frame.shape[0], frame.shape[1]) != (sh, sw)
            else frame
        )
        work = srgb8_to_lab(train_u8[..., :3].reshape(-1, 3))
        centroids, _ = kmeans_model.fit_restarts(
            work, k, first_index, restarts=restarts, metric=metric
        )
        return centroids

    cents = jax.vmap(train)(frames_u8)  # [B, k, 3]
    return _frames_quantize_tail(frames_u8, cents, mode, None, fast, metric)


@partial(
    jax.jit,
    static_argnames=("kp", "canvas_shape", "mode", "fast", "metric",
                     "restarts"),
)
def _reduce_images_bucketed_fused_jit(
    frames_u8,  # [B, BH, BW, 3|4] bucket-padded
    kp: int,
    canvas_shape: tuple[int, int],
    first_index,
    src_h,
    src_w,
    out_h,
    out_w,
    convergence,
    mode: str,
    k_active,
    fast: bool = False,
    metric: str = "cie94",
    restarts: int = 1,
):
    """Bucketed `_reduce_images_bucketed_jit` with the fused frame-batch
    quantize tail (packed index readback) replacing the vmapped XLA
    quantizer."""
    frames_u8 = _ensure_rgba(frames_u8)
    ch, cw = canvas_shape

    def train(frame):
        canvas, weight = resize_to_canvas(
            frame[..., :3], ch, cw, src_h, src_w, out_h, out_w
        )
        work = srgb8_to_lab(canvas.reshape(-1, 3))
        centroids, _ = kmeans_model.fit_restarts(
            work, kp, first_index, restarts=restarts, convergence=convergence,
            weight=weight.reshape(-1), k_active=k_active, metric=metric,
        )
        return centroids

    cents = jax.vmap(train)(frames_u8)
    return _frames_quantize_tail(
        frames_u8, cents, mode, k_active, fast, metric
    )


@partial(
    jax.jit,
    static_argnames=("kp", "canvas_shape", "mode", "metric", "restarts"),
)
def _reduce_many_bucketed_fused_jit(
    frames_u8,  # [B, BH, BW, 3|4] bucket-padded, sizes may differ per frame
    kp: int,
    canvas_shape: tuple[int, int],
    first_indices,  # [B]
    src_hs,  # [B]
    src_ws,  # [B]
    out_hs,  # [B]
    out_ws,  # [B]
    convergence,
    mode: str,
    k_active,
    metric: str = "cie94",
    restarts: int = 1,
):
    """`_reduce_many_bucketed_jit` (the serving micro-batch executable)
    with the fused frame-batch quantize tail: per-frame train stays
    vmapped XLA, the full-res quantize becomes one per-frame-palette
    Pallas launch with in-kernel index packing. Always the EXACT kernels:
    `reduce_many` routes fast-mode processors away from coalescing (their
    early return keeps per-image semantics), so coalesced outputs stay
    bit-equal to the per-image XLA quantizer."""
    frames_u8 = _ensure_rgba(frames_u8)
    ch, cw = canvas_shape

    def train(frame, first, src_h, src_w, out_h, out_w):
        canvas, weight = resize_to_canvas(
            frame[..., :3], ch, cw, src_h, src_w, out_h, out_w
        )
        work = srgb8_to_lab(canvas.reshape(-1, 3))
        centroids, _ = kmeans_model.fit_restarts(
            work, kp, first, restarts=restarts, convergence=convergence,
            weight=weight.reshape(-1), k_active=k_active, metric=metric,
        )
        return centroids

    cents = jax.vmap(train)(
        frames_u8, first_indices, src_hs, src_ws, out_hs, out_ws
    )
    return _frames_quantize_tail(
        frames_u8, cents, mode, k_active, False, metric
    )


@partial(
    jax.jit,
    static_argnames=("kp", "canvas_shape", "mode", "metric", "restarts"),
)
def _reduce_many_bucketed_jit(
    frames_u8,  # [B, BH, BW, 3|4] bucket-padded, sizes may differ per frame
    kp: int,
    canvas_shape: tuple[int, int],
    first_indices,  # [B] per-frame seed (depends on each frame's shrink)
    src_hs,  # [B] per-frame real heights
    src_ws,  # [B] per-frame real widths
    out_hs,  # [B] per-frame shrunk heights
    out_ws,  # [B] per-frame shrunk widths
    convergence,
    mode: str,
    k_active,
    metric: str = "cie94",
    restarts: int = 1,
):
    """Batched bucketed reduce over frames of DIFFERENT original sizes:
    every per-frame quantity (real dims, shrunk dims, seed index) is a
    traced vector, so one executable per (bucket, frame bucket, kp, mode)
    serves any mix of image sizes inside the bucket — the serving-side
    micro-batching executable (`ImageProcessor.reduce_many`,
    `serve.py`). Same per-frame semantics as `_reduce_bucketed_jit`."""
    frames_u8 = _ensure_rgba(frames_u8)
    ch, cw = canvas_shape

    def one(frame, first, src_h, src_w, out_h, out_w):
        canvas, weight = resize_to_canvas(
            frame[..., :3], ch, cw, src_h, src_w, out_h, out_w
        )
        work = srgb8_to_lab(canvas.reshape(-1, 3))
        centroids, _ = kmeans_model.fit_restarts(
            work, kp, first, restarts=restarts, convergence=convergence,
            weight=weight.reshape(-1), k_active=k_active, metric=metric,
        )
        return quantize_image(
            frame, centroids, mode=mode, k_active=k_active, metric=metric
        )

    return jax.vmap(one)(
        frames_u8, first_indices, src_hs, src_ws, out_hs, out_ws
    )


@partial(
    jax.jit,
    static_argnames=(
        "kp", "canvas_shape", "mode", "use_pallas", "fast", "metric",
        "restarts",
    ),
)
def _reduce_many_bucketed_heavy_jit(
    frames_u8,  # [B, BH, BW, 3|4] bucket-padded, sizes may differ per frame
    kp: int,
    canvas_shape: tuple[int, int],
    first_indices,  # [B]
    src_hs,  # [B]
    src_ws,  # [B]
    out_hs,  # [B]
    out_ws,  # [B]
    convergence,
    mode: str,
    k_active,
    use_pallas: bool,
    fast: bool = False,
    metric: str = "cie94",
    restarts: int = 1,
):
    """Micro-batch executable for the HEAVY buckets — trainings whose
    canvas routes solo requests to the Pallas-accumulator / chunked
    large-N trainers (`_plain_fit_route` False), where a vmapped batch
    would stack B [N, K]-class intermediates. `lax.map` runs each frame
    STRICTLY SEQUENTIALLY inside ONE executable: solo memory behavior
    (one frame's training state live at a time), solo per-frame routing
    (`_fit_auto` on the shared static canvas), but a single launch for
    the whole batch — so concurrent 4K-class or k > 64 requests stop
    paying one tunnel round trip each (VERDICT round-2 task 4). The
    quantize tail mirrors solo `reduce`: fused packed-index (k <= INDEXED_MAX_K) /
    packed-RGB meld / full-RGBA kernels on TPU, the XLA quantizer
    elsewhere. Returns (per-frame outputs, per-frame RGBA8 palettes)."""
    frames_u8 = _ensure_rgba(frames_u8)
    ch, cw = canvas_shape

    def one(args):
        frame, first, src_h, src_w, out_h, out_w = args
        canvas, weight = resize_to_canvas(
            frame[..., :3], ch, cw, src_h, src_w, out_h, out_w
        )
        work = srgb8_to_lab(canvas.reshape(-1, 3))
        centroids, _ = _fit_auto(
            work, kp, first, convergence, use_pallas,
            weight=weight.reshape(-1), k_active=k_active, metric=metric,
            restarts=restarts, fast=fast,
        )
        if use_pallas:
            if mode == "meld":
                if kp > QUANT_MAX_KP:
                    # No meld kernel program above QUANT_MAX_KP — the
                    # row-chunked XLA meld (see _reduce_jit).
                    out = quantize_image(
                        frame, centroids, mode="meld", k_active=k_active,
                        metric=metric,
                    )
                else:
                    out = fused_meld_packed(
                        frame, centroids, k_active=k_active, fast=fast,
                        metric=metric,
                    )
            else:
                threshold = (
                    dither_threshold(centroids, k_active=k_active,
                                     metric=metric)
                    if mode == "dither"
                    else jnp.float32(0.0)
                )
                if kp <= INDEXED_MAX_K:
                    out = fused_assign_packed(
                        frame, centroids, threshold, k_active=k_active,
                        mode=mode, fast=fast, metric=metric,
                    )
                else:
                    out = fused_quantize(
                        frame, centroids, threshold, k_active=k_active,
                        mode=mode, fast=fast, metric=metric,
                    )
        else:
            out = quantize_image(
                frame, centroids, mode=mode, k_active=k_active, metric=metric
            )
        return out, centroids

    outs, cents = jax.lax.map(
        one, (frames_u8, first_indices, src_hs, src_ws, out_hs, out_ws)
    )
    palettes = jax.vmap(lambda c: _lab_palette_to_u8(c)[0])(cents)
    return outs, palettes


@partial(
    jax.jit,
    static_argnames=(
        "kp", "canvas_shape", "use_pallas", "fast", "metric", "restarts",
    ),
)
def _palette_many_bucketed_heavy_jit(
    frames_u8,
    kp: int,
    canvas_shape: tuple[int, int],
    first_indices,
    src_hs,
    src_ws,
    out_hs,
    out_ws,
    convergence,
    k_active,
    use_pallas: bool,
    fast: bool = False,
    metric: str = "cie94",
    restarts: int = 1,
):
    """`_palette_many_bucketed_jit` for the heavy buckets: sequential
    per-frame `_fit_auto` trainings via `lax.map` in ONE executable (see
    `_reduce_many_bucketed_heavy_jit`), then the batched u8 + L*
    readback."""
    frames_u8 = _ensure_rgba(frames_u8)
    ch, cw = canvas_shape

    def one(args):
        frame, first, src_h, src_w, out_h, out_w = args
        canvas, weight = resize_to_canvas(
            frame[..., :3], ch, cw, src_h, src_w, out_h, out_w
        )
        work = srgb8_to_lab(canvas.reshape(-1, 3))
        centroids, _ = _fit_auto(
            work, kp, first, convergence, use_pallas,
            weight=weight.reshape(-1), k_active=k_active, metric=metric,
            restarts=restarts, fast=fast,
        )
        return centroids

    cents = jax.lax.map(
        one, (frames_u8, first_indices, src_hs, src_ws, out_hs, out_ws)
    )
    return jax.vmap(_lab_palette_to_u8)(cents)


@partial(
    jax.jit, static_argnames=("kp", "canvas_shape", "metric", "restarts")
)
def _train_frames_bucketed_jit(
    frames_u8,
    kp: int,
    canvas_shape: tuple[int, int],
    first_index,
    src_h,
    src_w,
    out_h,
    out_w,
    convergence,
    frame_valid,
    k_active,
    metric: str = "cie94",
    restarts: int = 1,
):
    """Bucketed joint palette: per-frame weighted canvases concatenated
    into one weighted fit. `frame_valid[B]` (f32) zeroes out frames added
    by frame-count bucketing so they never influence the palette."""
    ch, cw = canvas_shape

    def shrink(frame):
        return resize_to_canvas(
            frame[..., :3], ch, cw, src_h, src_w, out_h, out_w
        )

    canvases, weights = jax.vmap(shrink)(frames_u8)  # [B, ch, cw, 3], [B, ch, cw]
    weights = weights * frame_valid[:, None, None]
    work = srgb8_to_lab(canvases.reshape(-1, 3))
    return kmeans_model.fit_restarts(
        work, kp, first_index, restarts=restarts, convergence=convergence,
        weight=weights.reshape(-1), k_active=k_active, metric=metric,
    )


@partial(
    jax.jit, static_argnames=("k", "train_shape", "metric", "restarts")
)
def _train_frames_jit(
    frames_u8, k: int, train_shape, first_index, convergence,
    metric: str = "cie94", restarts: int = 1,
):
    """Joint palette over a frame stack: shrink every frame, concatenate
    the Lab pixels, fit once. The seed index addresses frame 0 (the
    concatenation starts with it), matching single-image semantics."""
    sh, sw = train_shape

    def shrink(frame):
        if (frame.shape[0], frame.shape[1]) != (sh, sw):
            return resize_uint8(frame, sh, sw)
        return frame

    shrunk = jax.vmap(shrink)(frames_u8)  # [B, sh, sw, C]
    work = srgb8_to_lab(shrunk[..., :3].reshape(-1, 3))
    return kmeans_model.fit_restarts(
        work, k, first_index, restarts=restarts, convergence=convergence,
        metric=metric,
    )


@partial(jax.jit, static_argnames=("mode", "metric"))
def _find_batch_jit(
    frames_u8, palette_lab, mode: str, k_active=None, metric: str = "cie94"
):
    return jax.vmap(
        lambda f: quantize_image(
            f, palette_lab, mode=mode, k_active=k_active, metric=metric
        )
    )(frames_u8)


@partial(jax.jit, static_argnames=("mode", "fast", "metric"))
def _find_batch_fused_jit(
    frames_u8,  # [B, H, W, 3|4]
    palette_lab,
    mode: str,
    k_active=None,
    fast: bool = False,
    metric: str = "cie94",
):
    """Fused-kernel `find_batch`: stack the same-sized frames into ONE
    tall image and run a single packed fused assign over it — a frame
    batch is just more rows to a per-pixel pass. Each frame's rows pad to
    a multiple of 4 first, so every frame starts at Bayer phase y%4 == 0
    and the tall image's dither is BIT-EQUAL to per-frame dithering
    (the 4x4 matrix is 4-periodic in y; pad rows are cropped by the host
    unpack). Returns the packed index words for the `[B*H4, W]` tall
    image (`utils.packing.unpack_tile_words`, then reshape/slice)."""
    frames_u8 = _ensure_rgba(frames_u8)
    b, h, w = frames_u8.shape[:3]
    h4 = -(-h // 4) * 4
    if h4 != h:
        frames_u8 = jnp.pad(frames_u8, ((0, 0), (0, h4 - h), (0, 0), (0, 0)))
    tall = frames_u8.reshape(b * h4, w, 4)
    threshold = (
        dither_threshold(palette_lab, k_active=k_active, metric=metric)
        if mode == "dither"
        else jnp.float32(0.0)
    )
    return fused_assign_packed(
        tall, palette_lab, threshold, k_active=k_active, mode=mode,
        fast=fast, metric=metric,
    )


@partial(jax.jit, static_argnames=("fast", "metric"))
def _find_batch_meld_jit(
    frames_u8,  # [B, H, W, 3|4]
    palette_lab,
    k_active=None,
    fast: bool = False,
    metric: str = "cie94",
):
    """Fused-kernel meld `find_batch`: stack the same-sized frames into
    ONE tall image and run a single RGB24-packed meld over it. Meld has
    no dither phase, so frames need no row alignment — frame f is rows
    [f*H, (f+1)*H) of the tall image and the result is BIT-IDENTICAL to
    per-frame `fused_meld_packed` (same palette, per-pixel op;
    `_unpack_meld` then reshape/slice recovers the frames)."""
    frames_u8 = _ensure_rgba(frames_u8)
    b, h, w = frames_u8.shape[:3]
    tall = frames_u8.reshape(b * h, w, 4)
    return fused_meld_packed(
        tall, palette_lab, k_active=k_active, fast=fast, metric=metric
    )


@partial(
    jax.jit,
    static_argnames=("kmax", "canvas_shape", "mode", "metric", "restarts"),
)
def _reduce_batch_bucketed_jit(
    padded_u8: jnp.ndarray,
    k_actives: jnp.ndarray,
    kmax: int,
    canvas_shape: tuple[int, int],
    first_index,
    src_h,
    src_w,
    out_h,
    out_w,
    mode: str,
    metric: str = "cie94",
    restarts: int = 1,
):
    """Bucketed multi-k batch: weighted-canvas training vmapped over
    k_active, quantize on the padded image (host crops)."""
    ch, cw = canvas_shape
    canvas, weight = resize_to_canvas(
        padded_u8[..., :3], ch, cw, src_h, src_w, out_h, out_w
    )
    work = srgb8_to_lab(canvas.reshape(-1, 3))
    wvec = weight.reshape(-1)
    fit_v = jax.vmap(
        lambda ka: kmeans_model.fit_restarts(
            work, kmax, first_index, restarts=restarts, k_active=ka,
            weight=wvec, metric=metric,
        )[0]
    )
    centroids = fit_v(k_actives)
    quant_v = jax.vmap(
        lambda cents, ka: quantize_image(
            padded_u8, cents, mode=mode, k_active=ka, metric=metric
        )
    )
    return quant_v(centroids, k_actives)


@partial(
    jax.jit,
    static_argnames=("kmax", "train_shape", "mode", "metric", "restarts"),
)
def _reduce_batch_jit(
    pixels_u8: jnp.ndarray,
    k_actives: jnp.ndarray,
    kmax: int,
    train_shape: tuple[int, int],
    first_index: int,
    mode: str,
    metric: str = "cie94",
    restarts: int = 1,
):
    """vmapped train + quantize over a batch of k values, one executable."""
    sh, sw = train_shape
    train_u8 = (
        resize_uint8(pixels_u8, sh, sw)
        if (pixels_u8.shape[0], pixels_u8.shape[1]) != (sh, sw)
        else pixels_u8
    )
    work = srgb8_to_lab(train_u8[..., :3].reshape(-1, 3))

    fit_v = jax.vmap(
        lambda ka: kmeans_model.fit_restarts(
            work, kmax, first_index, restarts=restarts, k_active=ka,
            metric=metric,
        )[0]
    )
    centroids = fit_v(k_actives)  # [B, kmax, 3]

    quant_v = jax.vmap(
        lambda cents, ka: quantize_image(
            pixels_u8, cents, mode=mode, k_active=ka, metric=metric
        )
    )
    return quant_v(centroids, k_actives)


def _validate_k(k) -> None:
    try:
        ok = int(k) == k and int(k) >= 1
    except (TypeError, ValueError):
        ok = False
    if not ok:
        raise ValueError("k must be an integer higher than 0.")


def _colors_rgba(colors) -> np.ndarray:
    arr = np.asarray(colors, dtype=np.uint8)
    if arr.ndim == 2 and arr.shape[1] == 3:
        arr = np.concatenate(
            [arr, np.full((arr.shape[0], 1), 255, np.uint8)], axis=1
        )
    return arr.reshape(-1, 4)
