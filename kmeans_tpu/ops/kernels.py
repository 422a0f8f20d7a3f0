"""Pallas TPU kernels: fused full-resolution quantize pass.

The reference implements the output stage as 3-4 separate GPU dispatches
over intermediate Rgba32Float textures (convert -> find_centroid ->
swap/mix -> revert, `core/src/operations.rs:99-271`), i.e. ~4 reads + 4
writes of f32 pixel data per output pixel. The Pallas kernel here does the
entire chain in ONE pass at the memory-bandwidth floor:

- pixels stay packed as uint32 RGBA (4 B/px read + 4 B/px write, the
  minimum possible traffic); bytes are unpacked/repacked with shifts
  inside the kernel;
- sRGB -> Lab, the CIE94 argmin over centroids, the mode math (replace /
  Bayer dither / meld) and Lab -> sRGB all happen in registers/VMEM;
- the sRGB gamma linearization runs as a 256-entry LUT gather by default
  (use_lut; two 128-lane half-tables via take_along_axis — the one gather
  shape Mosaic lowers): measured 1.16x over the pow chain at 4K k=8 AND
  exactly XLA-valued by construction (0 hardware mismatches vs the XLA
  path in 393K pixels, where the Mosaic pow chain showed ulp deviations);
- the centroid loop walks an SMEM-resident palette with a `k_active`
  mask, so one compiled kernel serves every k <= K_pad; for static
  CIE94 palettes up to UNROLL_KP_MAX (256) it unrolls to straight-line
  VPU code (no loop-carried VMEM; 1.45x at k=8 round 1, 2.1-2.6x on the
  k=64/256 shapes round 2 — docs/perf.md); kp=512 (whose straight-line
  program fails to compile) runs a `fori_loop` over fully-unrolled
  UNROLL_CHUNK-trip chunks (2.0x exact — docs/perf.md); CIEDE2000
  palettes above 16 stay rolled (trig-chain-bound: zero measured gain,
  76-636 s remote compiles, form-dependent bits — tools/exp_unroll3.py);
- pixel coordinates for the 4x4 Bayer matrix are derived from the flat
  element index (closed form: M4[y][x] = 4*((2x+3y)&3 of low bits) +
  ((2x+3y)&3 of high bits)), no table lookup.

The math matches `ops/quantize.py` (same formulas, same reference WGSL
citations); `tests/test_kernels.py` checks bit-equality of the uint8
outputs against the XLA path. Caveat: replace/dither emit discrete palette
colors and match the XLA path bit-for-bit in practice, but meld's
continuous blend can differ by 1 u8 step on ~1e-4 of pixels — XLA chooses
FMA contractions per fusion context, so cross-compilation bit-equality of
float expressions is empirical, not guaranteed.

Layout: the [H, W, 4] u8 image is bitcast to flat u32 [N], padded to a
multiple of (TILE_ROWS * 128) and tiled as [M, 128]; the grid walks row
tiles. f32 throughout (VPU); no MXU involvement — this pass is purely
bandwidth-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmeans_tpu.ops import colorspace as cs

# Tile heights measured independently per kernel shape (re-swept on
# hardware after the round-2 gamma-LUT change and again after the
# full-unroll cutoff change; docs/perf.md): the small-k quantize kernel
# pipelines best at 256 rows (0.629 vs 0.714 ms at 128, 4K k=8); k > 16
# keeps 128 whether rolled (6.00 vs 6.65 ms at 4K k=64) or fully
# unrolled (2.51 vs 4.21 ms — and the unrolled k=256 program fails to
# compile at 256 rows); the Lloyd accumulator at 128 (0.496 vs 0.621).
QUANT_TILE_ROWS = 256          # small-palette quantize/assign (kp <= 16)
QUANT_TILE_ROWS_ROLLED = 128   # large-palette quantize/assign (kp > 16,
#                                unrolled, chunked, or rolled alike)
# Full-unroll cutoff for the CIE94 quantize centroid loop: palettes
# with kp <= this unroll to straight-line VPU code (no loop-carried
# VMEM). Mosaic's loop lowering supports only unroll=1 or full unroll
# (partial `unroll=` raises NotImplementedError). Swept on hardware
# (tools/exp_unroll*.py, docs/perf.md): 256 is the measured optimum —
# full unroll is 2.1-2.4x on the exact k=64/256 replace shapes
# (6.08 -> 2.51 ms, 22.8 -> 10.6 ms at 4K), 2.4-2.6x on meld, and
# 1.1-1.2x on the factorized-fast ones, while kp=512 straight-line
# programs fail to compile (remote tpu_compile_helper crash) — kp=512
# runs the chunked form instead. CIEDE2000 ignores both knobs and stays
# rolled above 16 (see k_loop in _quantize_kernel: zero gain, 76-636 s
# compiles, form-dependent bits — tools/exp_unroll3.py).
# Bit-stability ON HARDWARE is per-variant, asserted where it matters:
# replace exact+fast and dither are bit-equal across every form AND
# (dither/replace) vs the XLA twin; meld's 8-carry body can flip
# knife-edge ties between forms on some data (tools/exp_unroll3/4.py).
UNROLL_KP_MAX = 256
# Chunk size of the kp > UNROLL_KP_MAX (i.e. kp == 512) quantize loop:
# a fori_loop over fully-unrolled UNROLL_CHUNK-trip chunks. Swept on
# hardware (tools/exp_chunk.py, docs/perf.md): 4K k=512 exact
# 44.35 -> 22.12 ms at chunk 128 (2.0x; 64/256 within 2.5%), fast
# 15.44 -> 13.65/14.31 ms (64/128). Bit-equal across chunk sizes on
# device (chunk 1 IS the round-1 rolled loop, trip for trip).
UNROLL_CHUNK = 128
# Loop-form knobs for the NON-cie94 (CIEDE2000) quantize loop: pinned
# rolled above 16 by measurement (zero gain, 76-636 s compiles,
# form-dependent bits — tools/exp_unroll3.py). Module-level so the
# experiment scripts can re-sweep it on a future jax/Mosaic build; the
# production default must stay (16, 1) unless re-measured.
UNROLL_KP_MAX_2000 = 16
UNROLL_CHUNK_2000 = 1
# Candidate count of the CIEDE2000 fast tier (`fast=True, metric=
# "cie2000", kp > 16`): a cheap screening loop (the factorized CIE94
# score — 7 FMAs/trip against the SMEM G-table) keeps the PRUNE_M
# nearest candidates per pixel, and the exact CIEDE2000 trig chain runs
# only on those survivors (gathered from a VMEM centroid table) — the
# k x trig cost that made exact fused cie2000 451 ms at 4K k=256
# (docs/perf.md) shrinks to M x trig + k x screen. Swept on hardware
# (tools/exp_prune.py); mismatch vs exact measured and documented in
# docs/perf.md. Like every fast mode: opt-in, never a default.
PRUNE_M = 8
# kp-dependent M (round 4): at kp >= 256 the top-8 screen sits exactly
# on the 1e-3 mismatch bar while M=16 is still 3.6x at 9.4e-5 mismatch
# (docs/perf.md) — a strictly better trade for large palettes, so the
# tier widens its candidate set above PRUNE_M_GATE clusters.
# `prune_m_for` is the one gate; all three knobs flow through
# `set_loop_knobs` (the gate knob exists so tests can exercise the
# large branch at interpret-friendly kp).
PRUNE_M_LARGE = 16
PRUNE_M_GATE = 128
# Loop form of the pruned screening pass: CHUNKED, never fully unrolled.
# The screen carries 2*M live [tile, 128] buffers through the insertion
# chain; a fully-unrolled kp-trip straight-line form on top of that blew
# Mosaic's 16 MB scoped-VMEM stack at 4K k=64 m=4 (16.41M, hardware —
# the CPU interpreter cannot catch program-size failures). A fori over
# PRUNE_CHUNK-trip unrolled chunks bounds the straight-line program at
# one chunk while keeping the 7-FMA screen body dense.
PRUNE_CHUNK = 32
# Largest palette the Lloyd tile accumulator accepts. Its two Python
# loops (distance + per-cluster mask reductions) fully unroll over kp,
# so this bounds kernel program size; swept on hardware
# (tools/exp_accum2.py, docs/perf.md).
ACCUM_MAX_K = 512
# Loop form of the EXACT CIEDE2000 accumulator above this kp: the
# distance loop runs as a fori over ACCUM_CHUNK_2000-trip fully-unrolled
# chunks and the per-cluster mask-reduction loop as a fori over
# ACCUM_MASK_CHUNK-trip chunks with `pl.ds` dynamic stores, instead of
# the full kp unroll — the fully-unrolled exact cie2000 program measured
# 130/351 s remote compiles at k=128/256 (deploy-hostile), which kept
# exact cie2000 k > 64 full-res training on the row-chunked XLA fallback
# through round 3 (_fit_auto). Below the cutoff the round-2 unrolled
# program is byte-identical (cache entries stay warm). Swept on hardware
# (tools/exp_accum_2000.py, docs/perf.md).
ACCUM_UNROLL_2000 = 64
ACCUM_CHUNK_2000 = 1
ACCUM_MASK_CHUNK = 32


def prune_m_for(kp: int) -> int:
    """Candidate count of the pruned CIEDE2000 tier for a `kp`-cluster
    palette: PRUNE_M (8) up to PRUNE_M_GATE (128) clusters,
    PRUNE_M_LARGE (16) above — measured strictly better on the quality
    axis at kp >= 256 (3.6x at 9.4e-5 mismatch vs 7.6x at the 1.0e-3
    bar; docs/perf.md round 3, landed round 4)."""
    return PRUNE_M if kp <= PRUNE_M_GATE else PRUNE_M_LARGE


def set_loop_knobs(
    kp_max=None, chunk=None, kp_max_2000=None, chunk_2000=None, prune_m=None,
    prune_chunk=None, accum_kp_2000=None, accum_chunk_2000=None,
    accum_mask_chunk=None, prune_m_large=None, prune_m_gate=None,
):
    """Set the loop-form knobs AND clear the jit caches in one step.

    The knobs are module globals read at TRACE time and are not part of
    any jit cache key, so mutating them directly serves stale loop forms
    from already-traced executables. Every sweeper (tools/exp_*.py,
    tests/conftest.py) must go through this helper. Returns the previous
    values `(kp_max, chunk, kp_max_2000, chunk_2000, prune_m,
    prune_chunk, accum_kp_2000, accum_chunk_2000, accum_mask_chunk,
    prune_m_large, prune_m_gate)`.

    `prune_m` alone pins M at EVERY kp (it also sets the large tier);
    pass `prune_m_large` in the same call to keep the tiers split —
    restores must therefore pass BOTH (`prune_m=prev[4],
    prune_m_large=prev[9]`)."""
    global UNROLL_KP_MAX, UNROLL_CHUNK, UNROLL_KP_MAX_2000, UNROLL_CHUNK_2000
    global PRUNE_M, PRUNE_CHUNK, PRUNE_M_LARGE, PRUNE_M_GATE
    global ACCUM_UNROLL_2000, ACCUM_CHUNK_2000, ACCUM_MASK_CHUNK
    prev = (
        UNROLL_KP_MAX, UNROLL_CHUNK, UNROLL_KP_MAX_2000, UNROLL_CHUNK_2000,
        PRUNE_M, PRUNE_CHUNK,
        ACCUM_UNROLL_2000, ACCUM_CHUNK_2000, ACCUM_MASK_CHUNK,
        PRUNE_M_LARGE, PRUNE_M_GATE,
    )
    if kp_max is not None:
        UNROLL_KP_MAX = kp_max
    if chunk is not None:
        UNROLL_CHUNK = chunk
    if kp_max_2000 is not None:
        UNROLL_KP_MAX_2000 = kp_max_2000
    if chunk_2000 is not None:
        UNROLL_CHUNK_2000 = chunk_2000
    if prune_m is not None:
        PRUNE_M = prune_m
        # A sweep that pins M means M at EVERY kp: without this, a
        # `prune_m=4` sweep at kp > PRUNE_M_GATE would silently measure
        # PRUNE_M_LARGE (the round-4 self-review caught exactly that in
        # tools/exp_prune.py's k=256 rows). Pass prune_m_large in the
        # same call to keep the tiers split.
        if prune_m_large is None:
            PRUNE_M_LARGE = prune_m
    if prune_chunk is not None:
        PRUNE_CHUNK = prune_chunk
    if accum_kp_2000 is not None:
        ACCUM_UNROLL_2000 = accum_kp_2000
    if accum_chunk_2000 is not None:
        ACCUM_CHUNK_2000 = accum_chunk_2000
    if accum_mask_chunk is not None:
        ACCUM_MASK_CHUNK = accum_mask_chunk
    if prune_m_large is not None:
        PRUNE_M_LARGE = prune_m_large
    if prune_m_gate is not None:
        PRUNE_M_GATE = prune_m_gate
    jax.clear_caches()
    return prev
ACCUM_TILE_ROWS = 128
TILE_ROWS = ACCUM_TILE_ROWS  # back-compat alias (pack_lab_planes layout)
LANES = 128


def quant_tile_rows(kp: int) -> int:
    """Static tile height the quantize kernel uses for a palette size —
    the host unpack of in-kernel-packed indices MUST consult this same
    function (utils/packing.unpack_tile_words does)."""
    return QUANT_TILE_ROWS if kp <= 16 else QUANT_TILE_ROWS_ROLLED

# Metrics the hand-fused kernels implement. Routing decisions (e.g.
# api._fit_auto's large-trainer gate) consult this rather than assuming
# every entry of ops.delta_e.METRICS has a kernel lowering.
PALLAS_METRICS = ("cie94", "cie2000")

# Packed-index readback cap. Round 2 set it to 512 (matching the
# reference's palette-image rule); round 4's k=1024 tier work raised it
# to 1024 — the 16-bit words hold indices to 65535, the chunked kernel
# loop compiles and runs at kp=1024 (46 ms at 4K, docs/perf.md), and
# the host/native unpack-gather bounds-check any k, so k in 513..1024
# reduce/find now reads back 2 B/px instead of 4 B/px full RGBA.
INDEXED_MAX_K = 1024

# Largest palette a SINGLE fused kernel program may compile at: the
# chunked centroid loop at kp=2048 deterministically crashes the remote
# Mosaic compiler (tools/exp_k2048.py, round 5 — same failure class as
# the kp>512 full unroll). Above it, replace/dither quantize decomposes
# into <= QUANT_MAX_KP halves (`fused_quantize_halves` — each half the
# measured production kernel) and meld routes to the row-chunked XLA
# path; `fused_quantize`/`fused_meld_packed` enforce this so no caller
# can reach the crashing compile.
QUANT_MAX_KP = 1024

_K1 = 0.045
_K2 = 0.015


# ------------------------------------------------------------------ #
# Plane-wise color math (identical formulas to ops/colorspace.py, kept
# planar so the VPU never shuffles a 3-wide channel axis).
# ------------------------------------------------------------------ #


def _lab_from_linear_planes(r, g, b):
    """Matrix + cube-root half of sRGB->Lab over pre-linearized planes
    (each already scaled by 100) — shared by the pow path and the gamma-LUT
    path so both produce identical downstream arithmetic."""
    planes = []
    for row, wp in zip(cs.RGB_TO_XYZ, cs.WHITE_POINT):
        t = (row[0] * r + row[1] * g + row[2] * b) / wp
        planes.append(
            jnp.where(
                t > 0.008856,
                jnp.maximum(t, 0.0) ** (1.0 / 3.0),
                7.787 * t + 16.0 / 116.0,
            )
        )
    fx, fy, fz = planes
    return 116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)


def _srgb_to_lab_planes(r, g, b):
    def lin(c):
        return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92) * 100.0

    return _lab_from_linear_planes(lin(r), lin(g), lin(b))


def gamma_lut_values() -> jnp.ndarray:
    """The 256-entry sRGB linearization LUT as `[2, 128]` f32 (x100, the
    scale `_srgb_to_lab_planes` uses), computed with the SAME XLA formula
    the unfused path applies per pixel — so kernel outputs via the LUT are
    bit-identical to the XLA path by construction. Mosaic lowers exactly
    one gather shape (indices == operand shape + 1, i.e. element-wise
    take_along_axis), hence the two 128-lane half-tables; see
    tools/exp_gather.py for the measured forms."""
    v = jnp.arange(256, dtype=jnp.float32) / 255.0
    lin = jnp.where(v > 0.04045, ((v + 0.055) / 1.055) ** 2.4, v / 12.92)
    return (lin * 100.0).reshape(2, 128)


def _lut_gather(lut_ref, idx):
    """LUT lookup of u8-valued int32 `idx` via the one gather form Mosaic
    supports: per-lane take_along_axis against two broadcast half-tables,
    selected by the index's top bit."""
    lo_t = jnp.broadcast_to(lut_ref[0:1, :], idx.shape)
    hi_t = jnp.broadcast_to(lut_ref[1:2, :], idx.shape)
    lo = jnp.take_along_axis(lo_t, jnp.minimum(idx, 127), axis=1)
    hi = jnp.take_along_axis(hi_t, jnp.maximum(idx - 128, 0), axis=1)
    return jnp.where(idx < 128, lo, hi)


def _lab_to_srgb_planes(l, a, b):
    fy = (l + 16.0) / 116.0
    fx = a / 500.0 + fy
    fz = fy - b / 200.0

    def finv(t, wp):
        t3 = t * t * t
        return jnp.where(t3 > 0.008856, t3, (t - 16.0 / 116.0) / 7.787) * (wp / 100.0)

    x = finv(fx, cs.WHITE_POINT[0])
    y = finv(fy, cs.WHITE_POINT[1])
    z = finv(fz, cs.WHITE_POINT[2])
    out = []
    for row in cs.XYZ_TO_RGB:
        c = row[0] * x + row[1] * y + row[2] * z
        safe = jnp.maximum(c, 0.0)
        out.append(
            jnp.clip(
                jnp.where(c > 0.0031308, 1.055 * safe ** (1.0 / 2.4) - 0.055, 12.92 * c),
                0.0,
                1.0,
            )
        )
    return out[0], out[1], out[2]


def _cie94_sq_planes(l1, a1, b1, l2, a2, b2):
    """Squared CIE94, first color = pixel (delta_e.wgsl:1-22)."""
    dl = l1 - l2
    da = a1 - a2
    db = b1 - b2
    c1 = jnp.sqrt(a1 * a1 + b1 * b1)
    c2 = jnp.sqrt(a2 * a2 + b2 * b2)
    dcab = c1 - c2
    dhab_sq = jnp.maximum(da * da + db * db - dcab * dcab, 0.0)
    sc = 1.0 + _K1 * c1
    sh = 1.0 + _K2 * c1
    return dl * dl + (dcab / sc) ** 2 + dhab_sq / (sh * sh)


# atan(t)/t minimax-style polynomial on t^2 (Chebyshev fit, deg 8):
# max |atan_poly - atan| = 1.4e-7 in f32 over [0, 1].
_ATAN_COEFS = (
    9.9999998808e-01, -3.3333120781e-01, 1.9993716143e-01,
    -1.4213196197e-01, 1.0681421033e-01, -7.5968098671e-02,
    4.3855599054e-02, -1.6827448528e-02, 3.0499680694e-03,
)
_PI = 3.14159265358979323846


def _atan2_planes(y, x):
    """Plane-wise atan2 for the CIEDE2000 hue angle: Mosaic has no atan2
    lowering (docs/STATUS.md), so the octant-reduced polynomial above
    stands in. Max error ~1.4e-7 rad — far below any hue difference that
    could flip a nearest-centroid assignment."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)  # t in [0, 1]; 0 when x == y == 0
    u = t * t
    p = jnp.float32(_ATAN_COEFS[-1])
    for c in _ATAN_COEFS[-2::-1]:
        p = p * u + jnp.float32(c)
    r = p * t  # atan(t)
    r = jnp.where(ay > ax, jnp.float32(_PI / 2) - r, r)
    r = jnp.where(x < 0.0, jnp.float32(_PI) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _cie2000_sq_planes(l1, a1, b1, l2, a2, b2, c1=None):
    """Squared CIEDE2000, plane-wise — the same Sharma formulation as
    `ops/delta_e.py::distance_cie2000_sq` (delta_e.wgsl:24-97) with the
    polynomial atan2 above. Used by the fused kernels when the processor
    runs with delta_e="2000". `c1` optionally supplies the precomputed
    first-color chroma (bit-identical hoist out of the centroid loop)."""
    deg360 = jnp.float32(2.0 * _PI)
    deg180 = jnp.float32(_PI)
    pow25_7 = jnp.float32(6103515625.0)  # 25^7

    if c1 is None:
        c1 = jnp.sqrt(a1 * a1 + b1 * b1)
    c2 = jnp.sqrt(a2 * a2 + b2 * b2)
    bar_c = (c1 + c2) * 0.5
    bar_c2 = bar_c * bar_c
    bar_c7 = bar_c2 * bar_c2 * bar_c2 * bar_c
    g = 0.5 * (1.0 - jnp.sqrt(bar_c7 / (bar_c7 + pow25_7)))

    a1p = (1.0 + g) * a1
    a2p = (1.0 + g) * a2
    c1p = jnp.sqrt(a1p * a1p + b1 * b1)
    c2p = jnp.sqrt(a2p * a2p + b2 * b2)

    def hue(b, ap):
        h = _atan2_planes(b, ap)
        h = jnp.where(h < 0.0, h + deg360, h)
        return jnp.where(jnp.logical_and(b == 0.0, ap == 0.0), 0.0, h)

    h1p = hue(b1, a1p)
    h2p = hue(b2, a2p)

    dlp = l2 - l1
    dcp = c2p - c1p

    dh = h2p - h1p
    abs_dh = jnp.abs(dh)
    dhp = jnp.where(
        abs_dh <= deg180,
        dh,
        jnp.where(h2p <= h1p, dh + deg360, dh - deg360),
    )
    dhp = jnp.where(c1p * c2p == 0.0, 0.0, dhp)
    d_big_h = 2.0 * jnp.sqrt(c1p * c2p) * jnp.sin(dhp * 0.5)

    bar_lp = (l1 + l2) * 0.5
    bar_cp = (c1p + c2p) * 0.5

    h_sum = h1p + h2p
    bar_h = jnp.where(
        abs_dh > deg180,
        jnp.where(h_sum < deg360, (h_sum + deg360) * 0.5, (h_sum - deg360) * 0.5),
        h_sum * 0.5,
    )
    bar_h = jnp.where(c1p * c2p == 0.0, h_sum, bar_h)

    rad30 = jnp.float32(_PI / 6.0)
    rad6 = jnp.float32(_PI / 30.0)
    rad63 = jnp.float32(63.0 * _PI / 180.0)
    t = (
        1.0
        - 0.17 * jnp.cos(bar_h - rad30)
        + 0.24 * jnp.cos(2.0 * bar_h)
        + 0.32 * jnp.cos(3.0 * bar_h + rad6)
        - 0.20 * jnp.cos(4.0 * bar_h - rad63)
    )

    rad275 = jnp.float32(275.0 * _PI / 180.0)
    rad25 = jnp.float32(25.0 * _PI / 180.0)
    arg = (bar_h - rad275) / rad25
    d_theta = rad30 * jnp.exp(-(arg * arg))
    bar_cp2 = bar_cp * bar_cp
    bar_cp7 = bar_cp2 * bar_cp2 * bar_cp2 * bar_cp
    r_c = 2.0 * jnp.sqrt(bar_cp7 / (bar_cp7 + pow25_7))
    lm = bar_lp - 50.0
    lm50 = lm * lm
    s_l = 1.0 + (0.015 * lm50) / jnp.sqrt(20.0 + lm50)
    s_c = 1.0 + 0.045 * bar_cp
    s_h = 1.0 + 0.015 * bar_cp * t
    r_t = -jnp.sin(2.0 * d_theta) * r_c

    tl = dlp / s_l
    tc = dcp / s_c
    th = d_big_h / s_h
    return jnp.maximum(tl * tl + tc * tc + th * th + r_t * tc * th, 0.0)


def _factor_mode(fast: bool, metric: str, kp: int) -> bool:
    """True when the quantize kernel runs the factorized fast CIE94 score.
    Keyed on palette SIZE (kp > 16), not loop form — kp=64/256 palettes
    are unrolled AND factorized under fast=True. Capped at 512: the
    factorized rolled loop at kp=1024 crashes the remote Mosaic compiler
    (tools/exp_k1024.py, HTTP 500 subprocess exit 1), so past the indexed
    tiers' 512 cap `fast` silently falls back to the exact loop — same
    rule as the prune tier. The kernel and its wrapper MUST agree on this
    predicate, since it adds the SMEM G-table operand."""
    return bool(fast) and metric == "cie94" and 16 < kp <= 512


def factor_g_table(centroids_lab: jnp.ndarray) -> jnp.ndarray:
    """Per-centroid feature rows `[KP, 7]` of the factorized CIE94 score
    (see `_quantize_kernel`'s fast branch): [L2, L2^2, C2, C2^2, a2, b2,
    a2^2 + b2^2]. Computed once per launch on the XLA side so the kernel's
    centroid loop carries no scalar arithmetic."""
    l2, a2, b2 = centroids_lab[:, 0], centroids_lab[:, 1], centroids_lab[:, 2]
    ab2 = a2 * a2 + b2 * b2
    c2 = jnp.sqrt(ab2)
    return jnp.stack([l2, l2 * l2, c2, c2 * c2, a2, b2, ab2], axis=1)


def _prune_mode(fast: bool, metric: str, kp: int) -> bool:
    """True when the quantize kernel runs the two-pass pruned CIEDE2000
    fast tier: factorized-CIE94 screening keeps the PRUNE_M nearest
    candidates, exact CIEDE2000 runs only on them. Same size gate as the
    cie94 fast mode (kp > 16: below it the exact loop is already
    transcendental-bound and fast changes nothing; capped at 512 like
    `_factor_mode` — the factorized screen it shares crashed the remote
    compiler at kp=1024, so past 512 `fast` falls back to the exact
    loop). The kernel and its wrappers MUST agree on this predicate — it
    adds the SMEM G-table and the VMEM centroid/palette gather tables as
    operands."""
    return bool(fast) and metric == "cie2000" and 16 < kp <= 512


def prune_rows(kp: int) -> int:
    """Rows per 128-lane gather table covering a kp-entry palette."""
    return (kp + LANES - 1) // LANES


def prune_c_table(centroids_lab: jnp.ndarray) -> jnp.ndarray:
    """Centroid Lab channels in the gatherable `[3 * H, 128]` layout the
    pruned exact pass reads with `_table_gather` (H = `prune_rows(kp)`;
    channel c of centroid k sits at row c * H + k // 128, lane k % 128).
    Accepts `[KP, 3]` (single palette) or `[B, KP, 3]` (frame batch ->
    `[B * 3 * H, 128]`, frame b's block at rows b * 3H..)."""
    batched = centroids_lab.ndim == 3
    c = centroids_lab if batched else centroids_lab[None]
    b, kp = c.shape[0], c.shape[1]
    h = prune_rows(kp)
    pad = jnp.pad(c, ((0, 0), (0, h * LANES - kp), (0, 0)))
    out = pad.transpose(0, 2, 1).reshape(b * 3 * h, LANES)
    return out


def prune_pal_table(packed_pal: jnp.ndarray) -> jnp.ndarray:
    """Packed RGBA palette words in the gatherable `[H, 128]` (or
    `[B * H, 128]`) layout for the pruned color-emit gather."""
    batched = packed_pal.ndim == 2
    p = packed_pal if batched else packed_pal[None]
    b, kp = p.shape[0], p.shape[1]
    h = prune_rows(kp)
    pad = jnp.pad(p, ((0, 0), (0, h * LANES - kp)))
    return pad.reshape(b * h, LANES)


def _table_gather(tab_ref, idx, n_rows: int, row0: int = 0):
    """Per-pixel table lookup `table[idx]` via the one gather form Mosaic
    lowers (element-wise take_along_axis against broadcast 128-lane rows,
    like `_lut_gather`): `tab_ref` holds the table as `n_rows` rows of
    128 lanes starting at static row `row0`; `idx` is an i32 tile with
    values in [0, n_rows * 128)."""
    out = None
    for h in range(n_rows):
        row = jnp.broadcast_to(tab_ref[row0 + h : row0 + h + 1, :], idx.shape)
        v = jnp.take_along_axis(
            row, jnp.clip(idx - h * LANES, 0, LANES - 1), axis=1
        )
        if out is None:
            out = v
        else:
            out = jnp.where((idx >> 7) == h, v, out)
    return out


def _bayer_value(x, y):
    """(M4[y%4][x%4] / 16) - 0.5 in closed form (see module docstring);
    matches mix_colors.wgsl:14-27."""
    lo = (2 * (x & 1) + 3 * (y & 1)) & 3
    hi = (2 * ((x >> 1) & 1) + 3 * ((y >> 1) & 1)) & 3
    m = 4 * lo + hi
    return m.astype(jnp.float32) / 16.0 - 0.5


def _screen_factor_planes(l_p, a_p, b_p, c1_p):
    """Pixel-side factors `(rsh2, q, f0, f2, f4, f5)` of the factorized
    CIE94 score dE^2 = pixelOnly(p) + F(p).G(c) (derivation in
    tools/exp_mxu.py; G rows from `factor_g_table`). This is the fast-mode
    DISTANCE under cie94 and the screening RANK of the pruned cie2000
    tier; one definition serves `_quantize_kernel` and `_lloyd_acc_kernel`
    so the factorization cannot drift between the quantizer's and the
    trainer's assignments."""
    sc_p = 1.0 + _K1 * c1_p
    sh_p = 1.0 + _K2 * c1_p
    rsh2_p = 1.0 / (sh_p * sh_p)
    q_p = 1.0 / (sc_p * sc_p) - rsh2_p
    return (
        rsh2_p,
        q_p,
        -2.0 * l_p,
        -2.0 * c1_p * q_p,
        -2.0 * a_p * rsh2_p,
        -2.0 * b_p * rsh2_p,
    )


def _screen_k_fn(gtab_ref, factors, cent_base=None):
    """Factorized score against the precomputed SMEM G-table: 6 vector
    FMAs + 1 scalar-broadcast add per centroid, zero in-loop scalar
    arithmetic. `cent_base` offsets into stacked per-frame tables
    (frame-batch mode)."""
    rsh2_p, q_p, f0_p, f2_p, f4_p, f5_p = factors

    def screen_k(k):
        i = k if cent_base is None else cent_base + k
        return (
            f0_p * gtab_ref[i, 0]
            + gtab_ref[i, 1]
            + f2_p * gtab_ref[i, 2]
            + q_p * gtab_ref[i, 3]
            + f4_p * gtab_ref[i, 4]
            + f5_p * gtab_ref[i, 5]
            + rsh2_p * gtab_ref[i, 6]
        )

    return screen_k


def _chunked_k_loop(body, init, kp: int, chunk: int):
    """fori_loop over `chunk`-trip fully-unrolled chunks (Mosaic supports
    only unroll=1 or full, so partial unrolling is spelled this way) with
    a straight-line tail for kp % chunk. `chunk <= 1` degenerates to a
    plain fori_loop."""
    if chunk <= 1:
        return jax.lax.fori_loop(0, kp, body, init)
    chunk = min(chunk, kp)
    n_full = kp // chunk

    def chunk_body(c, carry):
        base = c * chunk
        for j in range(chunk):
            carry = body(base + j, carry)
        return carry

    carry = jax.lax.fori_loop(0, n_full, chunk_body, init)
    for k in range(n_full * chunk, kp):  # kp % chunk tail (none today)
        carry = body(k, carry)
    return carry


def _prune_screen(screen_k, k_active, l_p, kp: int, k_loop):
    """Pass 1 of the two-pass pruned CIEDE2000 fast tier, shared verbatim
    by `_quantize_kernel` and `_lloyd_acc_kernel` (the tie-break, masking,
    and insertion semantics MUST stay common — a divergence here silently
    splits the trainer's assignments from the quantizer's): keep the
    `min(PRUNE_M, kp)` nearest candidates by the cheap screening rank via
    a top-m insertion network (m compare-swap stages on (d, k) carries).
    The 2m live carries are why callers chunk the loop (PRUNE_CHUNK) —
    full unroll on top of the insertion carries blew the 16 MB
    scoped-VMEM stack at 4K k=64 on hardware. Returns the m (rank,
    index) plane pairs as two lists."""
    m = min(prune_m_for(kp), kp)
    big = jnp.float32(3.4e38)

    def sbody(k, carry):
        carry = list(carry)
        sd = screen_k(k)
        sd = jnp.where(k < k_active, sd, big)
        si = jnp.zeros(l_p.shape, jnp.int32) + k
        for j in range(m):
            d_j, i_j = carry[2 * j], carry[2 * j + 1]
            take = sd < d_j
            nd = jnp.where(take, sd, d_j)
            ni = jnp.where(take, si, i_j)
            sd = jnp.where(take, d_j, sd)
            si = jnp.where(take, i_j, si)
            carry[2 * j], carry[2 * j + 1] = nd, ni
        return tuple(carry)

    sinit = []
    for _ in range(m):
        sinit.append(jnp.full_like(l_p, big))
        sinit.append(jnp.zeros(l_p.shape, jnp.int32))
    scarry = k_loop(sbody, tuple(sinit))
    return (
        [scarry[2 * j] for j in range(m)],
        [scarry[2 * j + 1] for j in range(m)],
    )


# ------------------------------------------------------------------ #
# Kernel body
# ------------------------------------------------------------------ #


def _quantize_kernel(
    scalar_ref,  # SMEM [2] i32: k_active, row_offset (dither band offset)
    thr_ref,  # SMEM [1] f32 dither threshold ([B] when frame_tiles > 0)
    cents_ref,  # SMEM [KP, 3] f32 Lab centroids ([B*KP, 3] per-frame mode)
    pal_ref,  # SMEM [KP] i32 packed RGBA palette colors ([B*KP] per-frame)
    *refs,  # [gtab SMEM [KP, 7] if factor,] [lut VMEM [2, 128] if use_lut,]
    #         in_ref, out_ref VMEM tiles
    kp: int,
    mode: str,
    width: int,
    emit_index: bool = False,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
    pack_bits_n: int = 0,
    tile_rows: int = QUANT_TILE_ROWS,
    frame_tiles: int = 0,
    emit_rgb24: bool = False,
    emit_distance: bool = False,
):
    """`frame_tiles > 0` selects per-frame-palette batch mode: the 1-D
    grid covers `B * frame_tiles` tiles (each frame padded to a whole
    number of tiles), and tile `i` reads frame `i // frame_tiles`'s
    centroids/packed palette/threshold from the stacked SMEM operands —
    one launch quantizes B frames against B DIFFERENT palettes (the
    `reduce_images`/`reduce_many` per-frame-training batch, which
    jax.vmap of pallas_call cannot express on Mosaic: the batching rule
    emits size-1 SMEM blocks that the TPU lowering rejects). The
    `frame_tiles == 0` single-palette path is untouched — identical
    jaxpr, so existing compiled-cache entries stay valid."""
    factor = _factor_mode(fast, metric, kp)
    prune = _prune_mode(fast, metric, kp)
    refs = list(refs)
    gtab_ref = refs.pop(0) if (factor or prune) else None
    ctab_ref = refs.pop(0) if prune else None
    ptab_ref = (
        refs.pop(0)
        if (prune and mode in ("replace", "dither") and not emit_index)
        else None
    )
    lut_ref = refs.pop(0) if use_lut else None
    if emit_distance:
        # Two-half k > 512 support (round 4): the packed-index tiers
        # additionally write the winning distance plane, so an XLA
        # combine can merge two <= 512-half launches into the global
        # argmin (first-min semantics preserved: strict < in the halves,
        # ties resolved to the lower-index half by the merger).
        in_ref, out_ref, out_dist_ref = refs
    else:
        in_ref, out_ref = refs
    if frame_tiles:
        frame = pl.program_id(0) // frame_tiles
        # Per-frame k (scalars[2 + f]): each frame in the stacked batch
        # may quantize against a different active palette size (mixed-k
        # `reduce_many` coalescing).
        k_active = scalar_ref[2 + frame]
        threshold = thr_ref[frame]
        cent_base = frame * kp
    else:
        k_active = scalar_ref[0]
        threshold = thr_ref[0]

    # Packed pixels travel as int32 (Mosaic has no u32<->f32 casts); the
    # byte masks make every extracted channel a small non-negative int32,
    # and the arithmetic >> before & 0xFF is harmless.
    x = in_ref[:]
    if use_lut:
        # Gamma by 256-entry LUT gather (gamma_lut_values: the XLA lin
        # formula on the u8 grid — bit-identical by construction) instead
        # of three pow chains; see tools/exp_gather.py measurements.
        rl = _lut_gather(lut_ref, x & 0xFF)
        gl = _lut_gather(lut_ref, (x >> 8) & 0xFF)
        bl = _lut_gather(lut_ref, (x >> 16) & 0xFF)
        l_p, a_p, b_p = _lab_from_linear_planes(rl, gl, bl)
    else:
        r = (x & 0xFF).astype(jnp.float32) / 255.0
        g = ((x >> 8) & 0xFF).astype(jnp.float32) / 255.0
        b = ((x >> 16) & 0xFF).astype(jnp.float32) / 255.0
        l_p, a_p, b_p = _srgb_to_lab_planes(r, g, b)

    if mode == "dither":
        # Pixel coordinates from the flat element index (mix_colors.wgsl:70).
        tile = pl.program_id(0)
        if frame_tiles:
            # Each frame restarts its own dither phase at y == 0.
            tile = tile % frame_tiles
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        flat = (tile * tile_rows + rows) * LANES + lanes
        # width is compile-time static: Mosaic strength-reduces the div/mod
        # into multiply-shift instead of a per-pixel integer divide.
        # row_offset shifts y for streamed row bands (0 for whole images).
        px = flat % width
        py = flat // width + scalar_ref[1]
        adjust = threshold * _bayer_value(px, py)
        l_p = l_p + adjust
        a_p = a_p + adjust
        b_p = b_p + adjust

    big = jnp.float32(3.4e38)
    zero = jnp.zeros_like(l_p)

    def centroid(k):
        if frame_tiles:
            i = cent_base + k
            return cents_ref[i, 0], cents_ref[i, 1], cents_ref[i, 2]
        return cents_ref[k, 0], cents_ref[k, 1], cents_ref[k, 2]

    def k_loop(body, init):
        # kp is static. The unroll policy is METRIC-aware (all measured,
        # tools/exp_unroll*.py + exp_chunk.py, docs/perf.md):
        # - cie94: unroll up to UNROLL_KP_MAX into straight-line VPU
        #   code (no loop-carried VMEM; 2.1-2.6x); kp=512 (kp is a power
        #   of two) runs a fori_loop over UNROLL_CHUNK-trip fully-
        #   unrolled chunks (2.0x, program bounded at one chunk).
        #   replace/dither outputs measured bit-equal across every form
        #   on device; meld's 8-carry body is NOT form-bit-stable on all
        #   data (Mosaic contracts FMAs differently — knife-edge ties
        #   can flip on ~4e-5 of pixels; no form matches the XLA twin
        #   bit-exactly on hardware anyway, and the enforced bars —
        #   interpret-mode bit-equality, golden quality — hold for every
        #   form), so meld takes the 2.4-2.6x too.
        # - cie2000: ALWAYS rolled above 16 — straight-line/chunked
        #   forms measured ZERO speedup (the body is trig-chain-bound,
        #   not carry-bound), 76-636 s remote compiles, and form-
        #   dependent bits. Identical program to round 1.
        # Trip order and per-trip arithmetic are identical in all forms.
        # The pruned-cie2000 SCREENING loop is a cie94-class body (7 FMAs
        # + the top-M insert) but carries 2*M live buffers, so it gets
        # its OWN chunked form (PRUNE_CHUNK) — full unroll on top of the
        # insertion carries blew the scoped-VMEM stack on hardware (see
        # the PRUNE_CHUNK constant).
        if prune:
            kp_max, chunk = (0, PRUNE_CHUNK)
        else:
            kp_max, chunk = (
                (UNROLL_KP_MAX, UNROLL_CHUNK)
                if metric == "cie94"
                else (UNROLL_KP_MAX_2000, UNROLL_CHUNK_2000)
            )
        if kp <= kp_max:
            carry = init
            for k in range(kp):
                carry = body(k, carry)
            return carry
        return _chunked_k_loop(body, init, kp, chunk)

    if metric == "cie94":
        # Pixel-side CIE94 terms depend only on the (adjusted) pixel: hoist
        # the chroma sqrt and S weights out of the centroid loop
        # (bit-identical to recomputing them per k — same inputs, same
        # expressions). Under factor mode dist_sq is never called
        # (dist_sq_k is the factorized score), so its S weights are only
        # emitted on the exact path.
        c1_p = jnp.sqrt(a_p * a_p + b_p * b_p)
        if not factor:
            sc_p = 1.0 + _K1 * c1_p
            sh2_p = (1.0 + _K2 * c1_p) * (1.0 + _K2 * c1_p)
        # Fast mode: factorized CIE94 score. The squared distance splits as
        #   dE^2(p, c) = pixelOnly(p) + F(p).G(c)
        # with F/G 7-wide (tools/exp_mxu.py derivation); pixelOnly is
        # constant per pixel, so dropping it preserves the argmin (and the
        # meld 2-closest ordering) while cutting the centroid loop to 6
        # vector FMAs + 1 scalar-broadcast add against a PRECOMPUTED
        # centroid feature table in SMEM (gtab — computing G in-kernel
        # would put a scalar sqrt in every fori trip, which measured
        # ~1.7x slower than the table; tools/exp_mxu.py). The
        # factorization reassociates the f32 sums and drops the
        # (mathematically redundant) dhab_sq >= 0 clamp, so knife-edge
        # ties can flip — opt-in, documented in docs/perf.md (measured
        # 1.7x over the round-2 reciprocal-hoisted fast form at 4K k=64,
        # 1.9x at k=256; mismatch vs exact ~2e-6 of pixels). Engaged by
        # palette size (kp > 16, `_factor_mode`), NOT by loop form —
        # kp=64/256 are unrolled AND factorized under fast=True. Only
        # the kp <= 16 kernels (transcendental-bound) keep exact divides
        # — and therefore bit-parity — under fast=True.
        fast = factor
        if fast:
            sfac = _screen_factor_planes(l_p, a_p, b_p, c1_p)

        def dist_sq(cl, ca, cb):
            dl = l_p - cl
            da = a_p - ca
            db = b_p - cb
            c2 = jnp.sqrt(ca * ca + cb * cb)  # scalar per centroid
            dcab = c1_p - c2
            dhab_sq = jnp.maximum(da * da + db * db - dcab * dcab, 0.0)
            t = dcab / sc_p
            return dl * dl + t * t + dhab_sq / sh2_p

        pair_sq = _cie94_sq_planes
    else:  # cie2000 (fused; polynomial atan2 — see _atan2_planes)
        # Pixel-side chroma is centroid-independent: hoist it out of the
        # centroid loop (bit-identical — same expression, same inputs).
        c1_p = jnp.sqrt(a_p * a_p + b_p * b_p)
        if prune:
            # The fast tier's SCREENING rank is the factorized CIE94
            # score (it only orders candidates; the winning distance is
            # always exact CIEDE2000), so it shares the cie94 fast
            # branch's pixel factors and SMEM G-table.
            sfac = _screen_factor_planes(l_p, a_p, b_p, c1_p)
        fast = False  # the cie94 'fast' lever never applies to this metric

        def dist_sq(cl, ca, cb):
            return _cie2000_sq_planes(l_p, a_p, b_p, cl, ca, cb, c1=c1_p)

        pair_sq = _cie2000_sq_planes

    if factor or prune:
        # Factorized fast score against the SMEM G-table (gtab rows from
        # `factor_g_table`). Under prune it is only the screening RANK;
        # under cie94 fast it is the distance itself.
        screen_k = _screen_k_fn(
            gtab_ref, sfac, cent_base if frame_tiles else None
        )

    if factor:
        dist_sq_k = screen_k
    else:

        def dist_sq_k(k):
            return dist_sq(*centroid(k))

    if prune:
        # ---- CIEDE2000 fast tier: two-pass candidate pruning ----
        # Pass 1 keeps the m nearest candidates by the cheap screening
        # rank (top-m insertion: m compare-swap stages on (d, k) carries);
        # pass 2 evaluates exact CIEDE2000 only on those survivors, whose
        # Lab channels are gathered per pixel from the VMEM centroid
        # table (`prune_c_table` layout). The k x trig chain that made
        # exact fused cie2000 451 ms at 4K k=256 becomes k x ~12 VPU ops
        # + m x trig. Opt-in (`fast=True`): the winner is chosen by exact
        # distances, but a true nearest centroid screened out of the
        # top-m is lost — mismatch rate measured in docs/perf.md.
        m = min(prune_m_for(kp), kp)
        h_rows = prune_rows(kp)
        big_half = jnp.float32(1.7e38)  # validity test: below any screen
        cand_d, cand_i = _prune_screen(screen_k, k_active, l_p, kp, k_loop)

        def exact_j(j):
            """(exact d^2, index, cl, ca, cb) of screening candidate j;
            invalid (masked k_active) candidates stay at big."""
            idx = cand_i[j]
            cl = _table_gather(ctab_ref, idx, h_rows, 0)
            ca = _table_gather(ctab_ref, idx, h_rows, h_rows)
            cb = _table_gather(ctab_ref, idx, h_rows, 2 * h_rows)
            d = _cie2000_sq_planes(l_p, a_p, b_p, cl, ca, cb, c1=c1_p)
            return jnp.where(cand_d[j] < big_half, d, big), idx, cl, ca, cb

    if mode in ("replace", "dither"):
        if prune:
            # Winner among the m survivors by EXACT distance; ties break
            # by screening rank (strict <), not centroid index — a
            # documented fast-mode deviation, like cie94 fast's
            # knife-edge flips. The color emit gathers the packed
            # palette word by the winning index (`prune_pal_table`).
            best_d = jnp.full_like(l_p, big)
            best_sel = jnp.zeros(l_p.shape, jnp.int32)
            for j in range(m):
                d, idx, _, _, _ = exact_j(j)
                sel = (
                    idx
                    if emit_index
                    else _table_gather(ptab_ref, idx, h_rows, 0)
                )
                take = d < best_d
                best_d = jnp.where(take, d, best_d)
                best_sel = jnp.where(take, sel, best_sel)
        else:
            # Each output form needs exactly TWO loop carries: the index
            # map carries best_k, the color modes carry the packed
            # palette select (pal_ref[k] at loop-trip time — a scalar
            # SMEM read, so carrying it is as cheap as carrying k).
            # Dropping the unused third carry cuts the rolled (k > 16)
            # loop's carried VMEM a third; selection logic is unchanged,
            # so outputs are bit-identical.
            sel0 = jnp.zeros(l_p.shape, jnp.int32)

            def body(k, carry):
                best_d, best_sel = carry
                d = dist_sq_k(k)
                d = jnp.where(k < k_active, d, big)
                take = d < best_d
                if emit_index:
                    sel = k
                elif frame_tiles:
                    sel = pal_ref[cent_base + k]
                else:
                    sel = pal_ref[k]
                return (
                    jnp.where(take, d, best_d),
                    jnp.where(take, sel, best_sel),
                )

            best_d, best_sel = k_loop(body, (jnp.full_like(l_p, big), sel0))
        best_k = best_packed = best_sel
        if emit_index:
            if emit_distance:
                out_dist_ref[:] = best_d
            if pack_bits_n:
                # In-kernel sublane pack: fold 32/bits sublane blocks of
                # the index tile into one i32 word each (static row
                # slices + shifts — pure VPU). Cuts the kernel's output
                # write traffic by that factor AND removes the separate
                # XLA pack pass (docs/perf.md round 2). The host inverts
                # this exact layout with utils.packing.unpack_tile_words.
                ppw = 32 // pack_bits_n
                blk = best_k.shape[0] // ppw
                acc = best_k[0:blk, :]
                for j in range(1, ppw):
                    acc = acc | (
                        best_k[blk * j : blk * (j + 1), :]
                        << (pack_bits_n * j)
                    )
                out_ref[:] = acc
            else:
                out_ref[:] = best_k
            return
        # k == 1 short-circuit is a no-op here (argmin already yields
        # centroid 0); emit the precomputed packed palette color directly —
        # no per-pixel Lab->sRGB reversion needed for these modes.
        out_ref[:] = best_packed
        return
    else:  # meld (mix_colors.wgsl:29-47,85-90)

        def meld_update(carry, d, cl, ca, cb):
            d1, l1, a1, b1, d2, l2, a2, b2 = carry
            first = d < d1
            second = jnp.logical_and(jnp.logical_not(first), d < d2)
            # new second-closest: old closest if displaced, else maybe d
            n_d2 = jnp.where(first, d1, jnp.where(second, d, d2))
            n_l2 = jnp.where(first, l1, jnp.where(second, cl, l2))
            n_a2 = jnp.where(first, a1, jnp.where(second, ca, a2))
            n_b2 = jnp.where(first, b1, jnp.where(second, cb, b2))
            n_d1 = jnp.where(first, d, d1)
            n_l1 = jnp.where(first, cl, l1)
            n_a1 = jnp.where(first, ca, a1)
            n_b1 = jnp.where(first, cb, b1)
            return n_d1, n_l1, n_a1, n_b1, n_d2, n_l2, n_a2, n_b2

        init = (jnp.full_like(l_p, big), zero, zero, zero) * 2
        if prune:
            # 2-closest by EXACT distance among the m screening
            # survivors, consuming the gathered candidate Lab values —
            # the blend tail below is identical to the exact path's.
            carry = init
            for j in range(m):
                d, _, cl, ca, cb = exact_j(j)
                carry = meld_update(carry, d, cl, ca, cb)
            _, l1, a1, b1, d2_carry, l2, a2, b2 = carry
        else:

            def body(k, carry):
                cl, ca, cb = centroid(k)
                d = dist_sq_k(k)
                d = jnp.where(k < k_active, d, big)
                return meld_update(carry, d, cl, ca, cb)

            _, l1, a1, b1, d2_carry, l2, a2, b2 = k_loop(body, init)
        # factor = d(color, second) / d(closest, second); CIE94 asymmetric
        # orientations per mix_colors.wgsl:86 (metric-dependent). The loop
        # carry already holds d^2(pixel, second) computed with the exact
        # formula, so reuse it — except under cie94 fast mode, whose
        # reciprocal-hoisted distances must not feed the blend factor.
        if fast:
            num = jnp.sqrt(pair_sq(l_p, a_p, b_p, l2, a2, b2))
        else:
            num = jnp.sqrt(d2_carry)
        den = jnp.sqrt(pair_sq(l1, a1, b1, l2, a2, b2))
        factor = num / den
        ol = factor * l1 + (1.0 - factor) * l2
        oa = factor * a1 + (1.0 - factor) * a2
        ob = factor * b1 + (1.0 - factor) * b2

    if mode in ("dither", "meld"):
        # k == 1 short-circuit (mix_colors.wgsl:104-108,127-131).
        cl, ca, cb = centroid(0)
        is1 = k_active == 1
        ol = jnp.where(is1, cl, ol)
        oa = jnp.where(is1, ca, oa)
        ob = jnp.where(is1, cb, ob)

    orr, og, obb = _lab_to_srgb_planes(ol, oa, ob)
    r8 = jnp.round(orr * 255.0).astype(jnp.int32)
    g8 = jnp.round(og * 255.0).astype(jnp.int32)
    b8 = jnp.round(obb * 255.0).astype(jnp.int32)
    if emit_rgb24:
        # In-kernel RGB byte pack (meld's compact readback): alpha is
        # always 255, so 4 sublane blocks of RGB fold into 3 output words
        # — 3 B/px device->host instead of 4, with BIT-IDENTICAL colors
        # (unlike a quantized (k1, k2, factor) record, measured mean
        # 0.056 dE / 31% of pixels at one u8 step — docs/perf.md round
        # 3). Static row slices + shifts, pure VPU; the host inverts the
        # exact layout with utils.packing.unpack_rgb24_tile_words.
        blk = r8.shape[0] // 4

        def s(x, j):
            return x[blk * j : blk * (j + 1), :]

        out_ref[0:blk, :] = (
            s(r8, 0) | (s(g8, 0) << 8) | (s(b8, 0) << 16) | (s(r8, 1) << 24)
        )
        out_ref[blk : 2 * blk, :] = (
            s(g8, 1) | (s(b8, 1) << 8) | (s(r8, 2) << 16) | (s(g8, 2) << 24)
        )
        out_ref[2 * blk : 3 * blk, :] = (
            s(b8, 2) | (s(r8, 3) << 8) | (s(g8, 3) << 16) | (s(b8, 3) << 24)
        )
        return
    # 0xFF000000 as signed int32 (alpha = 255).
    out_ref[:] = r8 | (g8 << 8) | (b8 << 16) | jnp.int32(-16777216)


# ------------------------------------------------------------------ #
# Host wrapper
# ------------------------------------------------------------------ #


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _packed_palette(centroids_lab: jnp.ndarray) -> jnp.ndarray:
    """Palette entries as packed RGBA int32 (alpha 255), converted with the
    SAME XLA Lab->sRGB code the unfused path applies per pixel — so emitting
    these via select in the kernel is bit-identical to per-pixel reversion."""
    rgb8 = cs.lab_to_srgb8(centroids_lab).astype(jnp.int32)
    return (
        rgb8[:, 0] | (rgb8[:, 1] << 8) | (rgb8[:, 2] << 16) | jnp.int32(-16777216)
    )


@functools.partial(
    jax.jit, static_argnames=("mode", "interpret", "fast", "metric", "use_lut")
)
def fused_quantize(
    rgba_u8: jnp.ndarray,
    centroids_lab: jnp.ndarray,
    threshold: jnp.ndarray,
    k_active=None,
    mode: str = "replace",
    interpret: bool = False,
    row_offset=0,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
) -> jnp.ndarray:
    """Fused single-pass quantize: `[H, W, 4]` u8 -> `[H, W, 4]` u8.

    `threshold` is the dither threshold (scalar, ignored for other modes) —
    computed by `ops.quantize.dither_threshold` on the tiny palette.
    `row_offset` shifts dither y coordinates for streamed row bands.
    `interpret=True` runs the Pallas interpreter (for CPU tests).
    `fast=True` hoists the CIE94 divides into per-pixel reciprocals —
    faster, but gives up bit-parity with the XLA path on knife-edge ties.
    """
    if mode not in ("replace", "dither", "meld"):
        raise ValueError(f"unknown mode {mode!r}")
    if metric not in PALLAS_METRICS:
        raise ValueError(f"unknown metric {metric!r} (cie94 or cie2000)")
    if centroids_lab.shape[0] > QUANT_MAX_KP:
        # kp > 1024 cannot compile as one kernel program (QUANT_MAX_KP);
        # replace/dither decompose into <= 1024-entry halves, meld's
        # 2-closest blend does not (callers route the row-chunked XLA
        # meld — `ops.quantize.quantize_image`).
        if mode == "meld":
            raise ValueError(
                f"fused meld supports k <= {QUANT_MAX_KP} (the kp="
                f"{centroids_lab.shape[0]} kernel program crashes the "
                "Mosaic compiler); use ops.quantize.quantize_image"
            )
        return fused_quantize_halves(
            rgba_u8, centroids_lab, threshold, k_active=k_active, mode=mode,
            interpret=interpret, row_offset=row_offset, fast=fast,
            metric=metric, use_lut=use_lut, half=QUANT_MAX_KP,
        )
    h, w = rgba_u8.shape[0], rgba_u8.shape[1]
    n = h * w
    out = _run_quantize_kernel(
        rgba_u8, centroids_lab, threshold, k_active, mode, interpret, False,
        row_offset, fast, metric, use_lut,
    )
    out_flat = out.reshape(-1)[:n]
    rgba = jax.lax.bitcast_convert_type(out_flat, jnp.uint8)  # [N, 4]
    return rgba.reshape(h, w, 4)


@jax.named_scope("quantize.fused")
def _run_quantize_kernel(
    rgba_u8, centroids_lab, threshold, k_active, mode, interpret, emit_index,
    row_offset=0, fast=False, metric="cie94", use_lut=True, pack_bits_n=0,
    emit_rgb24=False, emit_distance=False,
):
    """Shared pad/tile/pallas_call plumbing for fused_quantize/fused_assign.
    The named_scope labels the pass in profiler traces, like the
    reference's wgpu pass labels (core/src/modules.rs:777)."""
    h, w = rgba_u8.shape[0], rgba_u8.shape[1]
    n = h * w
    kp = centroids_lab.shape[0]
    k_act = jnp.asarray(kp if k_active is None else k_active, jnp.int32)

    tile_rows = quant_tile_rows(kp)
    packed = jax.lax.bitcast_convert_type(rgba_u8.reshape(n, 4), jnp.int32)
    n_pad = _round_up(n, tile_rows * LANES)
    packed = jnp.pad(packed, (0, n_pad - n))
    tiles = packed.reshape(n_pad // LANES, LANES)
    grid = (n_pad // (tile_rows * LANES),)

    scalars = jnp.stack([k_act, jnp.asarray(row_offset, jnp.int32)])
    thr = jnp.asarray(threshold, jnp.float32).reshape(1)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    cents_f32 = jnp.asarray(centroids_lab, jnp.float32)
    packed_pal = _packed_palette(centroids_lab)
    operands = [
        scalars,
        thr,
        cents_f32,
        packed_pal,
    ]
    if _factor_mode(fast, metric, kp) or _prune_mode(fast, metric, kp):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(factor_g_table(cents_f32))
    if _prune_mode(fast, metric, kp):
        # Pruned cie2000 fast tier: VMEM gather tables for the exact pass
        # (centroid Lab channels; packed palette words for the color
        # emit) — layouts documented at prune_c_table/prune_pal_table.
        h_rows = prune_rows(kp)
        in_specs.append(
            pl.BlockSpec(
                (3 * h_rows, LANES), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(prune_c_table(cents_f32))
        if mode in ("replace", "dither") and not emit_index:
            in_specs.append(
                pl.BlockSpec(
                    (h_rows, LANES), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(prune_pal_table(packed_pal))
    if use_lut:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(gamma_lut_values())
    in_specs.append(
        pl.BlockSpec(
            (tile_rows, LANES), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        )
    )
    operands.append(tiles)

    out_rows = tile_rows
    out_shape = tiles.shape
    if pack_bits_n:
        ppw = 32 // pack_bits_n
        out_rows = tile_rows // ppw
        out_shape = (tiles.shape[0] // ppw, LANES)
    elif emit_rgb24:
        out_rows = tile_rows * 3 // 4
        out_shape = (tiles.shape[0] * 3 // 4, LANES)
    out_shapes = jax.ShapeDtypeStruct(out_shape, jnp.int32)
    out_specs = pl.BlockSpec(
        (out_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    if emit_distance:
        # Second output: the winning distance plane in pixel-tile layout
        # (f32, same shape as the input tiles) for the two-half merge.
        assert emit_index and pack_bits_n and mode in ("replace", "dither")
        out_shapes = [
            out_shapes, jax.ShapeDtypeStruct(tiles.shape, jnp.float32)
        ]
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (tile_rows, LANES), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    return pl.pallas_call(
        functools.partial(
            _quantize_kernel, kp=kp, mode=mode, width=w, emit_index=emit_index,
            fast=fast, metric=metric, use_lut=use_lut, pack_bits_n=pack_bits_n,
            tile_rows=tile_rows, emit_rgb24=emit_rgb24,
            emit_distance=emit_distance,
        ),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*operands)


def _lloyd_acc_kernel(
    scalar_ref,  # SMEM [2] i32: k_active, n_valid
    cents_ref,  # SMEM [KP, 3] f32
    lab_ref,  # VMEM [3, TILE_ROWS, 128] f32 (L, a, b planes)
    *refs,  # [gtab SMEM [KP, 7] if factorized-fast,]
    #         [weight VMEM [TILE_ROWS, 128] f32 if weighted,] out VMEM
    kp: int,
    weighted: bool = False,
    metric: str = "cie94",
    emit_inertia: bool = False,
    fast: bool = False,
):
    """One tile of the Lloyd update: assign each pixel to its nearest
    centroid (CIE94 or CIEDE2000 via `metric`) and emit per-centroid
    lane-partial (sum, count)
    accumulators. Replaces choose_centroid.wgsl's decoupled-lookback global
    scan: each grid step reduces its tile to [KP, 4, 128] partials; XLA sums
    partials over tiles+lanes outside. No [N, K] one-hot ever exists, so
    full-resolution training stays at the bandwidth floor (12 B/px/iter;
    +4 B/px with a weight plane, used by the shape-bucketing path where
    pad pixels carry weight 0).

    `emit_inertia=True` adds a fifth stat row: the (weighted) sum of each
    assigned pixel's squared distance to its centroid — summing it over
    clusters gives the within-cluster inertia the multi-restart winner
    selection minimizes (`models/kmeans.py::fit_large_restarts`), for the
    cost of one extra multiply-reduce per cluster. The default (False)
    keeps the original output shape, so existing compiled executables'
    cache keys are untouched.

    `fast=True` (CIE94) switches the centroid loop to the factorized
    score dE^2 - pixelOnly(p) = F(p).G(c) (6 vector FMAs per centroid; see
    the quantize kernel's fast branch and tools/exp_mxu.py) — the dropped
    pixel-only term cannot change any per-pixel argmin. When emit_inertia
    is also set, fast falls back to the round-2 reciprocal-algebraic
    distance (d = dL^2 + (da^2+db^2)/Sh^2 + dCab^2*(1/Sc^2 - 1/Sh^2), no
    dhab_sq clamp) so best_d stays a true squared distance for the
    inertia column. Neither form is bit-identical to exact — knife-edge
    assignments can flip — so fast is opt-in, like the quantize kernels'
    fast mode.

    `fast=True` with CIEDE2000 and kp > 16 (`_prune_mode`) runs the same
    two-pass candidate pruning as the quantize kernels: a chunked
    factorized-CIE94 screen keeps the PRUNE_M nearest candidates, the
    exact trig chain runs only on those survivors (gathered from the
    VMEM `prune_c_table`). The winner is chosen by EXACT CIEDE2000
    distances, so best_d is a true squared distance and the inertia
    column stays valid — but a true nearest centroid screened out of the
    top-M is lost (mismatch rate measured in docs/perf.md). This is what
    makes cie2000 k > 64 full-resolution training deployable: the exact
    unrolled accumulator measured 130/351 s remote compiles at k=128/256.

    bf16 `lab_ref` planes are up-cast to f32 on load (accumulation always
    f32): half the HBM traffic per iteration for ~0.3 delta-E input
    quantization, also opt-in."""
    factor = fast and metric == "cie94" and not emit_inertia
    prune = _prune_mode(fast, metric, kp)
    refs = list(refs)
    gtab_ref = refs.pop(0) if (factor or prune) else None
    ctab_ref = refs.pop(0) if prune else None
    if weighted:
        w_ref, out_ref = refs
    else:
        (out_ref,) = refs
    k_active = scalar_ref[0]
    n_valid = scalar_ref[1]
    l_p = lab_ref[0]
    a_p = lab_ref[1]
    b_p = lab_ref[2]
    if l_p.dtype != jnp.float32:
        l_p = l_p.astype(jnp.float32)
        a_p = a_p.astype(jnp.float32)
        b_p = b_p.astype(jnp.float32)

    tile = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, l_p.shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, l_p.shape, 1)
    flat = (tile * ACCUM_TILE_ROWS + rows) * LANES + lanes
    valid = flat < n_valid

    big = jnp.float32(3.4e38)
    best_d = jnp.full_like(l_p, big)
    best_k = jnp.zeros(l_p.shape, jnp.int32)
    # Pixel-side terms hoisted out of the centroid loop — identical
    # expressions on the same inputs, so every distance (and therefore
    # every assignment) is bit-identical to the rolled form.
    c1_p = jnp.sqrt(a_p * a_p + b_p * b_p)
    if factor:
        # Factorized CIE94 score (same derivation as the quantize kernel's
        # fast branch / tools/exp_mxu.py): dE^2 = pixelOnly(p) + F(p).G(c),
        # and pixelOnly cannot change the per-pixel argmin, so the centroid
        # loop shrinks to 6 vector FMAs + 1 scalar add against the
        # precomputed SMEM G-table (no in-loop scalar sqrt). NOT used when
        # emit_inertia is set: best_d must then be a true squared distance
        # (the restart-winner inertia pass always runs exact anyway —
        # models/kmeans.py::fit_large_restarts).
        dist_k = _screen_k_fn(
            gtab_ref, _screen_factor_planes(l_p, a_p, b_p, c1_p)
        )
    elif metric == "cie94" and fast:
        # Algebraic expansion on per-pixel reciprocals (see docstring):
        # zero divides, zero clamps in the centroid loop. best_d stays a
        # true (differently-rounded) squared distance, as the inertia
        # column requires.
        sc_p = 1.0 + _K1 * c1_p
        sh_p = 1.0 + _K2 * c1_p
        rsh2_p = 1.0 / (sh_p * sh_p)
        q_p = 1.0 / (sc_p * sc_p) - rsh2_p

        def dist(cl, ca, cb):
            dl = l_p - cl
            da = a_p - ca
            db = b_p - cb
            c2 = jnp.sqrt(ca * ca + cb * cb)  # scalar per centroid
            dcab = c1_p - c2
            return dl * dl + (da * da + db * db) * rsh2_p + dcab * dcab * q_p
    elif metric == "cie94":
        sc_p = 1.0 + _K1 * c1_p
        sh_p = 1.0 + _K2 * c1_p
        sh2_p = sh_p * sh_p

        def dist(cl, ca, cb):
            dl = l_p - cl
            da = a_p - ca
            db = b_p - cb
            c2 = jnp.sqrt(ca * ca + cb * cb)  # scalar per centroid
            dcab = c1_p - c2
            dhab_sq = jnp.maximum(da * da + db * db - dcab * dcab, 0.0)
            t = dcab / sc_p
            return dl * dl + t * t + dhab_sq / sh2_p
    else:  # cie2000 (polynomial atan2 — see _atan2_planes)
        if prune:
            # Screening-rank factors (factorized CIE94 — it only ORDERS
            # candidates; winners are chosen by exact CIEDE2000 below).
            screen_k = _screen_k_fn(
                gtab_ref, _screen_factor_planes(l_p, a_p, b_p, c1_p)
            )

        def dist(cl, ca, cb):
            return _cie2000_sq_planes(l_p, a_p, b_p, cl, ca, cb, c1=c1_p)

    if prune:
        # ---- pruned CIEDE2000 assignment (mirrors the quantize kernel's
        # fast tier, ops/kernels.py::_quantize_kernel prune branch) ----
        # Pass 1: chunked screen keeps the m nearest candidates by the
        # cheap rank (2m live carries — the same scoped-VMEM pressure that
        # forced PRUNE_CHUNK on the quantize screen applies here).
        m = min(prune_m_for(kp), kp)
        h_rows = prune_rows(kp)
        big_half = jnp.float32(1.7e38)
        cand_d, cand_i = _prune_screen(
            screen_k, k_active, l_p, kp,
            lambda body, init: _chunked_k_loop(body, init, kp, PRUNE_CHUNK),
        )

        # Pass 2: exact CIEDE2000 on the m survivors only (VMEM gather of
        # their Lab channels); winner by exact distance, tie-break by
        # screening rank (strict <) like the quantize tier.
        for j in range(m):
            idx = cand_i[j]
            cl = _table_gather(ctab_ref, idx, h_rows, 0)
            ca = _table_gather(ctab_ref, idx, h_rows, h_rows)
            cb = _table_gather(ctab_ref, idx, h_rows, 2 * h_rows)
            d = dist(cl, ca, cb)
            d = jnp.where(cand_d[j] < big_half, d, big)
            take = d < best_d
            best_d = jnp.where(take, d, best_d)
            best_k = jnp.where(take, idx, best_k)
    elif metric == "cie2000" and kp > ACCUM_UNROLL_2000:
        # EXACT CIEDE2000 at large kp: the full kp unroll of the trig
        # chain measured 130/351 s remote compiles at k=128/256, so the
        # loop rolls into ACCUM_CHUNK_2000-trip fully-unrolled chunks
        # (the quantize kernel's exact-cie2000 form — trip order and
        # per-trip arithmetic identical to the unrolled program). This is
        # what moves exact cie2000 k > 64 full-res training off the
        # row-chunked XLA fallback (_fit_auto; tools/exp_accum_2000.py).
        def kbody(k, carry):
            bd, bk = carry
            d = dist(cents_ref[k, 0], cents_ref[k, 1], cents_ref[k, 2])
            d = jnp.where(k < k_active, d, big)
            take = d < bd
            return jnp.where(take, d, bd), jnp.where(take, k, bk)

        best_d, best_k = _chunked_k_loop(
            kbody, (best_d, best_k), kp, ACCUM_CHUNK_2000
        )
    else:
        # kp is small and static: unroll (VPU-friendly, no loop-carried
        # VMEM).
        for k in range(kp):
            if factor:
                d = dist_k(k)
            else:
                d = dist(cents_ref[k, 0], cents_ref[k, 1], cents_ref[k, 2])
            d = jnp.where(k < k_active, d, big)
            take = d < best_d
            best_d = jnp.where(take, d, best_d)
            best_k = jnp.where(take, k, best_k)

    if metric == "cie2000" and not prune and kp > ACCUM_UNROLL_2000:
        # Chunked per-cluster reduction twin of the chunked distance loop
        # above: dynamic `pl.ds` stores into the untiled cluster dim keep
        # the program bounded at one ACCUM_MASK_CHUNK-trip chunk. Same
        # per-cluster arithmetic as the unrolled loop below, one store per
        # stat row (the store ordering differs — totals are per-row
        # independent, so values cannot).
        def mbody(k, carry):
            mask = jnp.logical_and(best_k == k, valid)
            maskf = mask.astype(jnp.float32)
            if weighted:
                maskf = maskf * w_ref[:]
            out_ref[0, pl.ds(k, 1), 0, :] = jnp.sum(l_p * maskf, axis=0)[None]
            out_ref[0, pl.ds(k, 1), 1, :] = jnp.sum(a_p * maskf, axis=0)[None]
            out_ref[0, pl.ds(k, 1), 2, :] = jnp.sum(b_p * maskf, axis=0)[None]
            out_ref[0, pl.ds(k, 1), 3, :] = jnp.sum(maskf, axis=0)[None]
            if emit_inertia:
                out_ref[0, pl.ds(k, 1), 4, :] = jnp.sum(
                    best_d * maskf, axis=0
                )[None]
            return carry

        _chunked_k_loop(mbody, jnp.int32(0), kp, ACCUM_MASK_CHUNK)
    else:
        # Static store loop — kept VERBATIM from round 2 so every default
        # path's jaxpr (and therefore its compile-cache entry) is
        # untouched by the round-4 chunked form above.
        for k in range(kp):
            mask = jnp.logical_and(best_k == k, valid)
            maskf = mask.astype(jnp.float32)
            if weighted:
                maskf = maskf * w_ref[:]
            out_ref[0, k, 0, :] = jnp.sum(l_p * maskf, axis=0)
            out_ref[0, k, 1, :] = jnp.sum(a_p * maskf, axis=0)
            out_ref[0, k, 2, :] = jnp.sum(b_p * maskf, axis=0)
            out_ref[0, k, 3, :] = jnp.sum(maskf, axis=0)
            if emit_inertia:
                out_ref[0, k, 4, :] = jnp.sum(best_d * maskf, axis=0)


def lloyd_accumulate(
    lab_planes: jnp.ndarray,  # [3, M, 128] f32
    centroids: jnp.ndarray,  # [KP, 3] f32
    n_valid,
    k_active=None,
    weight_planes: jnp.ndarray | None = None,  # [M, 128] f32
    interpret: bool = False,
    metric: str = "cie94",
    emit_inertia: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """Per-cluster (sumL, suma, sumb, count) totals `[KP, 4]` over all valid
    pixels. `lab_planes` is the padded plane layout from `pack_lab_planes`
    (f32, or bf16 for half the per-iteration HBM traffic — up-cast on
    load, f32 accumulation); `weight_planes` (from `pack_plane`, optional)
    scales each pixel's contribution — weight-0 pixels vanish from sums
    and counts. `emit_inertia=True` appends a fifth column: the weighted
    sum of each member pixel's squared distance to the centroid
    (`[KP, 5]` result). `fast=True` uses the factorized CIE94 score (or,
    with emit_inertia, the divide-free algebraic distance); with
    CIEDE2000 and kp > 16 it runs the pruned two-pass tier (screen +
    exact on PRUNE_M survivors — what makes cie2000 k > 64 training
    compile in seconds instead of minutes) — knife-edge assignments may
    flip / a screened-out true nearest is lost; see
    `_lloyd_acc_kernel`."""
    kp = centroids.shape[0]
    if kp > ACCUM_MAX_K:
        raise ValueError(f"training kernel supports k <= {ACCUM_MAX_K}")
    if metric not in PALLAS_METRICS:
        raise ValueError(f"unknown metric {metric!r} (cie94 or cie2000)")
    m = lab_planes.shape[1]
    if m % ACCUM_TILE_ROWS != 0:
        raise ValueError(
            f"lab_planes rows ({m}) must be a multiple of {ACCUM_TILE_ROWS}; "
            "use pack_lab_planes"
        )
    grid = (m // ACCUM_TILE_ROWS,)
    k_act = jnp.asarray(kp if k_active is None else k_active, jnp.int32)
    scalars = jnp.stack([k_act, jnp.asarray(n_valid, jnp.int32)])

    weighted = weight_planes is not None
    cents_f32 = jnp.asarray(centroids, jnp.float32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (3, ACCUM_TILE_ROWS, LANES), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [scalars, cents_f32, lab_planes]
    if (fast and metric == "cie94" and not emit_inertia) or _prune_mode(
        fast, metric, kp
    ):
        # Factorized fast score / pruned screen rank: precomputed centroid
        # feature table (must mirror the kernel's factor/prune predicates).
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(factor_g_table(cents_f32))
    if _prune_mode(fast, metric, kp):
        # Pruned cie2000 fast tier: VMEM gather table of centroid Lab
        # channels for the exact pass (layout at prune_c_table).
        h_rows = prune_rows(kp)
        in_specs.append(
            pl.BlockSpec(
                (3 * h_rows, LANES), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(prune_c_table(cents_f32))
    if weighted:
        in_specs.append(
            pl.BlockSpec(
                (ACCUM_TILE_ROWS, LANES), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(jnp.asarray(weight_planes, jnp.float32))

    stats = 5 if emit_inertia else 4
    partials = pl.pallas_call(
        functools.partial(
            _lloyd_acc_kernel, kp=kp, weighted=weighted, metric=metric,
            emit_inertia=emit_inertia, fast=fast,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid[0], kp, stats, LANES), jnp.float32
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, kp, stats, LANES),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*operands)

    return partials.sum(axis=(0, 3))  # [KP, stats]


def pack_lab_planes(
    lab: jnp.ndarray, dtype=None
) -> tuple[jnp.ndarray, int]:
    """`[N, 3]` Lab -> padded plane layout `[3, M, 128]` + valid count.
    `dtype=jnp.bfloat16` stores half-width planes (half the training
    kernel's per-iteration HBM traffic; ~0.3 delta-E input quantization —
    opt-in, see `lloyd_accumulate`)."""
    n = lab.shape[0]
    n_pad = _round_up(n, ACCUM_TILE_ROWS * LANES)
    padded = jnp.pad(lab, ((0, n_pad - n), (0, 0)))
    planes = padded.T.reshape(3, n_pad // LANES, LANES)
    if dtype is not None and planes.dtype != dtype:
        planes = planes.astype(dtype)
    return planes, n


def pack_plane(vec: jnp.ndarray) -> jnp.ndarray:
    """`[N]` -> padded `[M, 128]` plane (matching `pack_lab_planes`)."""
    n = vec.shape[0]
    n_pad = _round_up(n, ACCUM_TILE_ROWS * LANES)
    return jnp.pad(vec, (0, n_pad - n)).reshape(n_pad // LANES, LANES)


@functools.partial(
    jax.jit, static_argnames=("mode", "interpret", "fast", "metric", "use_lut")
)
def fused_assign(
    rgba_u8: jnp.ndarray,
    centroids_lab: jnp.ndarray,
    threshold: jnp.ndarray,
    k_active=None,
    mode: str = "replace",
    interpret: bool = False,
    row_offset=0,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
) -> jnp.ndarray:
    """Like `fused_quantize` but returns the per-pixel palette index
    `[H, W]` uint8 instead of recolored pixels — 1 B/px device->host
    traffic instead of 4 B/px; the host reconstructs `palette[idx]`.
    Valid for replace/dither (meld blends colors, so it has no index
    representation). Requires k <= 256."""
    if mode not in ("replace", "dither"):
        raise ValueError("fused_assign supports replace/dither only")
    if metric not in PALLAS_METRICS:
        raise ValueError(f"unknown metric {metric!r} (cie94 or cie2000)")
    if centroids_lab.shape[0] > 256:
        raise ValueError("indexed output requires k <= 256")
    h, w = rgba_u8.shape[0], rgba_u8.shape[1]
    n = h * w
    out = _run_quantize_kernel(
        rgba_u8, centroids_lab, threshold, k_active, mode, interpret, True,
        row_offset, fast, metric, use_lut,
    )
    return out.reshape(-1)[:n].astype(jnp.uint8).reshape(h, w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "interpret", "fast", "metric", "use_lut", "emit_distance"
    ),
)
def fused_assign_packed(
    rgba_u8: jnp.ndarray,
    centroids_lab: jnp.ndarray,
    threshold: jnp.ndarray,
    k_active=None,
    mode: str = "replace",
    interpret: bool = False,
    row_offset=0,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
    emit_distance: bool = False,
) -> jnp.ndarray:
    """`fused_assign` with the index map bit-packed INSIDE the kernel:
    32/bits sublane blocks of each tile fold into one i32 word (bits =
    `utils.packing.pack_bits(kp)`: 2/4/8/16), so the kernel writes 2-16x
    fewer output bytes and the separate XLA pack pass disappears. Returns
    `[ceil(n / (LANES * ppw)), LANES]` i32 words in the tile layout that
    `utils.packing.unpack_tile_words(words, h, w, bits)` inverts on the
    host (which then gathers `palette[idx]`). Replace/dither; k <= 512
    (the reference's palette-image cap, `cli.rs` <=512 distinct colors —
    257..512 take the 16-bit tier at 2 B/px, half the RGBA readback).

    `emit_distance=True` (round 4, the k > 512 two-half building block)
    additionally returns the winning distance plane as `[n_tiles, 128]`
    f32 in pixel-tile layout — `(words, dists)`."""
    from kmeans_tpu.utils.packing import pack_bits

    if mode not in ("replace", "dither"):
        raise ValueError("fused_assign supports replace/dither only")
    if metric not in PALLAS_METRICS:
        raise ValueError(f"unknown metric {metric!r} (cie94 or cie2000)")
    if centroids_lab.shape[0] > INDEXED_MAX_K:
        raise ValueError(
            f"packed indexed output requires k <= {INDEXED_MAX_K}"
        )
    bits = pack_bits(centroids_lab.shape[0])
    return _run_quantize_kernel(
        rgba_u8, centroids_lab, threshold, k_active, mode, interpret, True,
        row_offset, fast, metric, use_lut, pack_bits_n=bits,
        emit_distance=emit_distance,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mode", "interpret", "fast", "metric", "use_lut"),
)
def fused_quantize_two_half(
    rgba_u8: jnp.ndarray,
    centroids_lab: jnp.ndarray,
    threshold: jnp.ndarray,
    k_active=None,
    mode: str = "replace",
    interpret: bool = False,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
) -> jnp.ndarray:
    """k > 512 fused quantize as TWO <= 512-half kernel launches + an
    XLA argmin merge — replace/dither only (meld's 2-closest blend does
    not decompose into per-half winners without a 4-way merge).

    Why: the single rolled kernel is trip-bound at large kp (k=1024 at
    4K measured 89.2 ms exact AND fast — tools/exp_k1024.py), while the
    <= 512 halves run the chunked-unroll straight-line form (22.1 ms
    exact / 13.7 ms fast each at 4K k=512), and the in-kernel
    chunked-unroll at kp = 1024 crashes the remote Mosaic compiler. Each
    half emits its packed u16 index words plus the winning distance
    plane (`emit_distance`); the merge takes half B strictly-less so
    ties resolve to half A — exactly the single loop's first-min
    semantics. Distances are computed per candidate by the same
    plane formulas in both forms, and replace/dither outputs measured
    bit-equal across loop forms on hardware (docs/perf.md round 2), so
    the merged output matches the rolled single-kernel path wherever
    that equality holds (pinned in interpret tests; hardware checksum in
    tools/exp_two_half.py). Everything (two pallas_calls + merge +
    palette gather) traces into ONE executable — one tunnel dispatch.

    Returns recolored `[H, W, 4]` u8 like `fused_quantize`. Requires
    512 < kp <= 1024."""
    if mode not in ("replace", "dither"):
        raise ValueError("two-half quantize supports replace/dither only")
    kp = centroids_lab.shape[0]
    if not 512 < kp <= 1024:
        raise ValueError("two-half quantize requires 512 < k <= 1024")
    return fused_quantize_halves(
        rgba_u8, centroids_lab, threshold, k_active=k_active, mode=mode,
        interpret=interpret, fast=fast, metric=metric, use_lut=use_lut,
        half=512,
    )


def fused_quantize_halves(
    rgba_u8: jnp.ndarray,
    centroids_lab: jnp.ndarray,
    threshold: jnp.ndarray,
    k_active=None,
    mode: str = "replace",
    interpret: bool = False,
    row_offset=0,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
    half: int = QUANT_MAX_KP,
) -> jnp.ndarray:
    """k > `half` fused quantize as ceil(kp / half) <= `half`-entry
    kernel launches + an XLA argmin merge — the N-half generalization of
    the round-4 two-half decomposition, and the ONLY kernel-class route
    above QUANT_MAX_KP=1024 (the single kernel's chunked centroid loop
    at kp=2048 crashes the remote Mosaic compiler — tools/exp_k2048.py;
    round 4 rejected two-half ROUTING at k <= 1024 because the single
    chunked kernel was 1.6-2x faster there, but above 1024 that kernel
    does not exist). Replace/dither only (meld's 2-closest blend does
    not decompose; callers route the row-chunked XLA meld).

    Every half is PADDED to exactly `half` centroid rows (pads masked
    via its k_active slice), so all launches share one kernel program
    and one distance tier for every (fast, metric) combination — a
    factorized half merged against an exact half would compare scores
    on different scales. Each half emits its packed index words plus
    the winning distance plane (`emit_distance`); the merge takes a
    later half strictly-less, so ties resolve to the earliest half —
    exactly the single loop's first-min `d < best_d` semantics (the
    two-half interpret tests + tools/soak.py pin bit-equality to the
    single kernel on the exact tiers wherever that kernel compiles).
    Everything (N pallas_calls + merge + palette gather) traces into
    ONE executable — one tunnel dispatch.

    Returns recolored `[H, W, 4]` u8 like `fused_quantize`. Requires
    kp > half (use the single kernel at or below it)."""
    from kmeans_tpu.utils.packing import pack_bits

    if mode not in ("replace", "dither"):
        raise ValueError("halved quantize supports replace/dither only")
    if metric not in PALLAS_METRICS:
        raise ValueError(f"unknown metric {metric!r} (cie94 or cie2000)")
    if half > QUANT_MAX_KP:
        raise ValueError(f"half must be <= {QUANT_MAX_KP}")
    kp = centroids_lab.shape[0]
    if kp <= half:
        raise ValueError(f"halved quantize requires k > {half}")
    h, w = rgba_u8.shape[0], rgba_u8.shape[1]
    n = h * w
    k_act = jnp.asarray(kp if k_active is None else k_active, jnp.int32)
    n_halves = -(-kp // half)
    kp_pad = n_halves * half
    padded = (
        jnp.concatenate(
            [
                centroids_lab,
                jnp.broadcast_to(
                    centroids_lab[-1:], (kp_pad - kp, centroids_lab.shape[1])
                ),
            ]
        )
        if kp_pad != kp
        else centroids_lab
    )

    def run_half(cents, k_act_half):
        bits = pack_bits(cents.shape[0])
        words, dists = _run_quantize_kernel(
            rgba_u8, cents, threshold, k_act_half, mode, interpret, True,
            row_offset, fast, metric, use_lut, pack_bits_n=bits,
            emit_distance=True,
        )
        # Device-side inverse of the kernel's in-tile sublane pack: word
        # row r of a tile holds index rows {j * blk + r} at bit j * bits
        # (see the pack in _quantize_kernel; utils.packing.
        # unpack_tile_words is the host twin of this layout).
        tile_rows = quant_tile_rows(cents.shape[0])
        ppw = 32 // bits
        blk = tile_rows // ppw
        g = words.shape[0] // blk
        w3 = words.reshape(g, blk, LANES)
        mask = jnp.int32((1 << bits) - 1)
        idx3 = jnp.concatenate(
            [(w3 >> (bits * j)) & mask for j in range(ppw)], axis=1
        )
        return idx3.reshape(-1)[:n], dists.reshape(-1)[:n]

    idx = d = None
    for i in range(n_halves):
        ka_i = jnp.clip(k_act - i * half, 0, half)
        idx_i, d_i = run_half(padded[i * half : (i + 1) * half], ka_i)
        if idx is None:
            idx, d = idx_i, d_i
        else:
            win = d_i < d  # strict: ties -> earliest half (lower
            #                indices), the single loop's update rule
            idx = jnp.where(win, idx_i + i * half, idx)
            d = jnp.where(win, d_i, d)
    words = jnp.take(
        _packed_palette(centroids_lab), idx, axis=0
    )  # [n] packed RGBA
    out = jax.lax.bitcast_convert_type(
        words.reshape(h, w)[..., None], jnp.uint8
    ).reshape(h, w, 4)
    return out


@functools.partial(
    jax.jit, static_argnames=("interpret", "fast", "metric", "use_lut")
)
def fused_meld_packed(
    rgba_u8: jnp.ndarray,
    centroids_lab: jnp.ndarray,
    k_active=None,
    interpret: bool = False,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
) -> jnp.ndarray:
    """Meld with the output RGB byte-packed INSIDE the kernel: alpha is
    unconditionally 255 (mix_colors/lab_to_rgb.wgsl:36,80), so the kernel
    folds 4 sublane blocks of RGB into 3 i32 words — 3 B/px device->host
    readback instead of 4 B/px RGBA, with BIT-IDENTICAL colors (meld has
    no index representation, so this is its analogue of the
    replace/dither packed-index tiers). Returns
    `[ceil(n / LANES) * 3 // 4, LANES]` i32 words in the tile layout
    `utils.packing.unpack_rgb24_tile_words(words, h, w,
    tile_rows=quant_tile_rows(kp))` inverts on the host. Any
    k <= QUANT_MAX_KP (above it the kernel program cannot compile —
    tools/exp_k2048.py — and meld does not decompose into halves;
    callers route the row-chunked XLA meld)."""
    if metric not in PALLAS_METRICS:
        raise ValueError(f"unknown metric {metric!r} (cie94 or cie2000)")
    if centroids_lab.shape[0] > QUANT_MAX_KP:
        raise ValueError(
            f"fused meld supports k <= {QUANT_MAX_KP}; use "
            "ops.quantize.quantize_image for larger palettes"
        )
    return _run_quantize_kernel(
        rgba_u8, centroids_lab, jnp.float32(0.0), k_active, "meld",
        interpret, False, 0, fast, metric, use_lut, emit_rgb24=True,
    )


# Per-frame-palette batch mode: B * KP SMEM rows per launch. Batches whose
# stacked centroid table would exceed this fall back to the vmapped XLA
# quantizer (SMEM is the TPU's small scalar memory; 2048 rows = 24 KB of
# centroids + 8 KB of packed palette, comfortably within every core).
FRAMES_MAX_BK = 2048


@jax.named_scope("quantize.fused_frames")
def _run_quantize_kernel_frames(
    frames_u8, centroids_lab, thresholds, k_actives, mode, interpret,
    emit_index, fast=False, metric="cie94", use_lut=True, pack_bits_n=0,
    emit_rgb24=False,
):
    """Frame-batched variant of `_run_quantize_kernel`: one pallas_call
    quantizes B same-shaped frames, EACH against its own palette — the
    `reduce_images`/`reduce_many` per-frame-training batch that
    `jax.vmap` of the single-frame kernel cannot lower on Mosaic (the
    batching rule blocks SMEM operands into size-1 blocks, which the TPU
    lowering rejects). Each frame's pixel stream pads independently to a
    whole number of kernel tiles, so per-frame dither phase and the
    per-frame packed-index word layout are IDENTICAL to B single-frame
    launches (`unpack_tile_words` inverts each frame's slice as if it
    were alone)."""
    b, h, w = frames_u8.shape[0], frames_u8.shape[1], frames_u8.shape[2]
    n = h * w
    kp = centroids_lab.shape[1]
    tile_rows = quant_tile_rows(kp)

    packed = jax.lax.bitcast_convert_type(
        frames_u8.reshape(b, n, 4), jnp.int32
    )  # [B, N]
    n_pad = _round_up(n, tile_rows * LANES)
    packed = jnp.pad(packed, ((0, 0), (0, n_pad - n)))
    tiles = packed.reshape(b * (n_pad // LANES), LANES)
    frame_tiles = n_pad // (tile_rows * LANES)
    grid = (b * frame_tiles,)

    if k_actives is None:
        k_act = jnp.full((b,), kp, jnp.int32)
    else:
        k_act = jnp.broadcast_to(
            jnp.asarray(k_actives, jnp.int32).reshape(-1), (b,)
        )
    # Layout: [shared k (unused in frame mode), row_offset, k_act[0..B-1]].
    scalars = jnp.concatenate([jnp.zeros((2,), jnp.int32), k_act])
    thr = jnp.broadcast_to(
        jnp.asarray(thresholds, jnp.float32).reshape(-1), (b,)
    )
    cents = jnp.asarray(centroids_lab, jnp.float32).reshape(b * kp, 3)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    packed_pal = _packed_palette(cents)
    operands = [scalars, thr, cents, packed_pal]
    if _factor_mode(fast, metric, kp) or _prune_mode(fast, metric, kp):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(factor_g_table(cents))
    if _prune_mode(fast, metric, kp):
        # Per-frame gather tables, block-mapped so the kernel always sees
        # its own frame's rows at static offsets (grid step i belongs to
        # frame i // frame_tiles).
        h_rows = prune_rows(kp)
        in_specs.append(
            pl.BlockSpec(
                (3 * h_rows, LANES),
                lambda i: (i // frame_tiles, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(
            prune_c_table(jnp.asarray(centroids_lab, jnp.float32))
        )
        if mode in ("replace", "dither") and not emit_index:
            in_specs.append(
                pl.BlockSpec(
                    (h_rows, LANES),
                    lambda i: (i // frame_tiles, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(prune_pal_table(packed_pal.reshape(b, kp)))
    if use_lut:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(gamma_lut_values())
    in_specs.append(
        pl.BlockSpec(
            (tile_rows, LANES), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        )
    )
    operands.append(tiles)

    out_rows = tile_rows
    out_shape = tiles.shape
    if pack_bits_n:
        ppw = 32 // pack_bits_n
        out_rows = tile_rows // ppw
        out_shape = (tiles.shape[0] // ppw, LANES)
    elif emit_rgb24:
        out_rows = tile_rows * 3 // 4
        out_shape = (tiles.shape[0] * 3 // 4, LANES)
    return pl.pallas_call(
        functools.partial(
            _quantize_kernel, kp=kp, mode=mode, width=w, emit_index=emit_index,
            fast=fast, metric=metric, use_lut=use_lut, pack_bits_n=pack_bits_n,
            tile_rows=tile_rows, frame_tiles=frame_tiles,
            emit_rgb24=emit_rgb24,
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (out_rows, LANES), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*operands)


def _validate_frames_args(frames_u8, centroids_lab, mode, metric):
    if mode not in ("replace", "dither", "meld"):
        raise ValueError(f"unknown mode {mode!r}")
    if metric not in PALLAS_METRICS:
        raise ValueError(f"unknown metric {metric!r} (cie94 or cie2000)")
    if frames_u8.ndim != 4 or frames_u8.shape[-1] != 4:
        raise ValueError("frames must be [B, H, W, 4] u8")
    if (
        centroids_lab.ndim != 3
        or centroids_lab.shape[0] != frames_u8.shape[0]
    ):
        raise ValueError("centroids must be [B, KP, 3]")
    if frames_u8.shape[0] * centroids_lab.shape[1] > FRAMES_MAX_BK:
        raise ValueError(
            f"B * KP exceeds FRAMES_MAX_BK ({FRAMES_MAX_BK}); use the "
            "vmapped XLA path for this batch"
        )


@functools.partial(
    jax.jit, static_argnames=("mode", "interpret", "fast", "metric", "use_lut")
)
def fused_quantize_frames(
    frames_u8: jnp.ndarray,
    centroids_lab: jnp.ndarray,
    thresholds: jnp.ndarray,
    k_actives=None,
    mode: str = "replace",
    interpret: bool = False,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
) -> jnp.ndarray:
    """Frame-batched `fused_quantize`: `[B, H, W, 4]` u8 frames, each
    quantized against ITS OWN `[B, KP, 3]` Lab palette (per-frame
    `thresholds[B]` for dither, optional per-frame `k_actives[B]`), in one
    kernel launch -> `[B, H, W, 4]` u8. Each frame restarts dither phase
    and tiling at its own origin. Replace/dither are bit-equal to running
    `fused_quantize` per frame (verified on hardware); meld is bit-equal
    in interpret mode but NOT on real silicon — its 2-closest blend picks
    up 1-ulp flips under the frame kernel's dynamic centroid indexing,
    which is why api.py's frame-batch gates exclude meld. Both metrics."""
    _validate_frames_args(frames_u8, centroids_lab, mode, metric)
    b, h, w = frames_u8.shape[0], frames_u8.shape[1], frames_u8.shape[2]
    n = h * w
    out = _run_quantize_kernel_frames(
        frames_u8, centroids_lab, thresholds, k_actives, mode, interpret,
        False, fast, metric, use_lut,
    )
    out_flat = out.reshape(b, -1)[:, :n]
    rgba = jax.lax.bitcast_convert_type(out_flat, jnp.uint8)  # [B, N, 4]
    return rgba.reshape(b, h, w, 4)


@functools.partial(
    jax.jit, static_argnames=("mode", "interpret", "fast", "metric", "use_lut")
)
def fused_assign_frames_packed(
    frames_u8: jnp.ndarray,
    centroids_lab: jnp.ndarray,
    thresholds: jnp.ndarray,
    k_actives=None,
    mode: str = "replace",
    interpret: bool = False,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
) -> jnp.ndarray:
    """Frame-batched `fused_assign_packed`: per-frame palettes, in-kernel
    bit-packed index output. Returns `[B, W_f, LANES]` i32 words where
    each frame's `[W_f, LANES]` slice has EXACTLY the single-frame
    `fused_assign_packed` layout for an `[H, W]` image — the host inverts
    frame `f` with `unpack_tile_words(words[f], h, w, bits,
    tile_rows=quant_tile_rows(kp))`. Replace/dither, kp <= 512."""
    from kmeans_tpu.utils.packing import pack_bits

    if mode not in ("replace", "dither"):
        raise ValueError("fused_assign supports replace/dither only")
    _validate_frames_args(frames_u8, centroids_lab, mode, metric)
    kp = centroids_lab.shape[1]
    if kp > 512:
        raise ValueError("packed indexed output requires k <= 512")
    bits = pack_bits(kp)
    b = frames_u8.shape[0]
    words = _run_quantize_kernel_frames(
        frames_u8, centroids_lab, thresholds, k_actives, mode, interpret,
        True, fast, metric, use_lut, pack_bits_n=bits,
    )
    return words.reshape(b, -1, LANES)


@functools.partial(
    jax.jit, static_argnames=("interpret", "fast", "metric", "use_lut")
)
def fused_meld_frames_packed(
    frames_u8: jnp.ndarray,
    centroids_lab: jnp.ndarray,
    k_actives=None,
    interpret: bool = False,
    fast: bool = False,
    metric: str = "cie94",
    use_lut: bool = True,
) -> jnp.ndarray:
    """Frame-batched `fused_meld_packed`: B same-shaped frames, each
    melded against ITS OWN `[B, KP, 3]` Lab palette, RGB byte-packed
    inside the kernel (3 B/px readback). Returns `[B, W_f, LANES]` i32
    words; frame `f` inverts with `utils.packing.unpack_rgb24_tile_words
    (words[f], h, w, tile_rows=quant_tile_rows(kp))`. Bit-stability
    note: the frame kernel's dynamic centroid indexing COULD in
    principle contract FMAs differently from the single-frame kernel
    (the class of 1-ulp blend flips the round-2 unroll policy hit), so
    callers admit it under the golden-quality policy, not bit-form
    purity — but the hardware measurement found ZERO differing pixels
    vs per-frame `fused_meld_packed` at k=8 and k=64 on 8x768x640
    random frames (docs/perf.md, tools/exp_meld_frames.py). Any k."""
    _validate_frames_args(frames_u8, centroids_lab, "meld", metric)
    b = frames_u8.shape[0]
    words = _run_quantize_kernel_frames(
        frames_u8, centroids_lab,
        jnp.zeros((b,), jnp.float32), k_actives, "meld", interpret,
        False, fast, metric, use_lut, emit_rgb24=True,
    )
    return words.reshape(b, -1, LANES)
