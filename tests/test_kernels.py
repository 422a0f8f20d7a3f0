"""Pallas fused-quantize kernel vs the XLA reference path: outputs must be
bit-identical uint8 for every mode (interpreter mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmeans_tpu.ops.colorspace import srgb8_to_lab
from kmeans_tpu.ops.kernels import fused_quantize
from kmeans_tpu.ops.quantize import dither_threshold, quantize_image


def _image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))


def _palette(k, seed=1):
    rng = np.random.default_rng(seed)
    return srgb8_to_lab(jnp.asarray(rng.integers(0, 256, (k, 3), dtype=np.uint8)))


@pytest.mark.parametrize("mode", ["replace", "dither", "meld"])
@pytest.mark.parametrize("shape", [(16, 24), (33, 77)])
def test_fused_matches_xla(mode, shape):
    img = _image(*shape)
    pal = _palette(5)
    thr = dither_threshold(pal)
    expected = np.asarray(quantize_image(img, pal, mode=mode))
    got = np.asarray(fused_quantize(img, pal, thr, mode=mode, interpret=True))
    mismatch = (expected != got).mean()
    np.testing.assert_array_equal(got, expected, err_msg=f"mismatch={mismatch:.4f}")


def test_fused_k_active_mask():
    img = _image(16, 16, 3)
    pal8 = _palette(8, seed=2)
    thr3 = dither_threshold(pal8, k_active=3)
    expected = np.asarray(quantize_image(img, pal8, mode="replace", k_active=3))
    got = np.asarray(
        fused_quantize(img, pal8, thr3, k_active=3, mode="replace", interpret=True)
    )
    np.testing.assert_array_equal(got, expected)


def test_fused_k1():
    img = _image(8, 8, 4)
    pal = _palette(1, seed=5)
    thr = jnp.float32(0.0)
    for mode in ["replace", "dither", "meld"]:
        expected = np.asarray(quantize_image(img, pal, mode=mode))
        got = np.asarray(fused_quantize(img, pal, thr, mode=mode, interpret=True))
        np.testing.assert_array_equal(got, expected)


def test_fused_nonaligned_total():
    # H*W far from a multiple of the 32768-px tile; exercises padding.
    img = _image(3, 5, 6)
    pal = _palette(4, seed=7)
    expected = np.asarray(quantize_image(img, pal, mode="replace"))
    got = np.asarray(
        fused_quantize(img, pal, jnp.float32(0), mode="replace", interpret=True)
    )
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("mode", ["replace", "dither"])
def test_fused_assign_indexed_matches(mode):
    img = _image(19, 37, 8)
    pal = _palette(6, seed=9)
    thr = dither_threshold(pal)
    from kmeans_tpu.ops.kernels import fused_assign
    from kmeans_tpu.ops.colorspace import lab_to_srgb8

    idx = np.asarray(fused_assign(img, pal, thr, mode=mode, interpret=True))
    assert idx.shape == (19, 37) and idx.dtype == np.uint8
    # Reconstructing palette[idx] must equal the full fused output.
    rgb8 = np.asarray(lab_to_srgb8(pal))
    palette_rgba = np.concatenate(
        [rgb8, np.full((len(rgb8), 1), 255, np.uint8)], axis=1
    )
    recon = palette_rgba[idx]
    full = np.asarray(fused_quantize(img, pal, thr, mode=mode, interpret=True))
    np.testing.assert_array_equal(recon, full)


def test_lloyd_accumulate_matches_matmul():
    from kmeans_tpu.ops.kernels import lloyd_accumulate, pack_lab_planes
    from kmeans_tpu.models.kmeans import _update_centroids, assign_clusters

    rng = np.random.default_rng(10)
    pix = jnp.asarray(rng.normal(50, 25, (5000, 3)).astype(np.float32))
    cents = jnp.asarray(rng.normal(50, 25, (6, 3)).astype(np.float32))
    planes, n = pack_lab_planes(pix)
    totals = np.asarray(
        lloyd_accumulate(planes, cents, n, interpret=True)
    )
    assign = assign_clusters(pix, cents)
    sums, counts = _update_centroids(pix, assign, 6)
    np.testing.assert_allclose(totals[:, :3], np.asarray(sums), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(totals[:, 3], np.asarray(counts), atol=0)


def test_lloyd_accumulate_gate_and_large_k_routing(monkeypatch):
    """The accumulator accepts k up to ACCUM_MAX_K (512) and the k>64
    over-budget training route prefers it over the row-chunked XLA
    trainer when Pallas is available. Correctness at k=128/256/512 is
    hardware-verified (counts exactly equal to the one-hot path over
    8.3M pixels, sums within 7e-6 relative — tools/exp_accum2.py;
    interpret-mode runs at k>64 are infeasible: the CPU XLA compile of
    the unrolled program takes 170+ s at k=64). This test checks the
    gate and the routing decision without compiling kernels."""
    import pytest

    from kmeans_tpu import api
    from kmeans_tpu.ops.kernels import (
        ACCUM_MAX_K,
        lloyd_accumulate,
        pack_lab_planes,
    )

    assert ACCUM_MAX_K == 512
    # Shipped loop-form policy (conftest pins small knobs for interpret
    # compile speed; the production values are stashed there).
    from kmeans_tpu.ops import kernels as _k

    assert getattr(_k, "PROD_UNROLL_KNOBS", None) == (256, 128)
    assert (_k.UNROLL_KP_MAX_2000, _k.UNROLL_CHUNK_2000) == (16, 1)
    planes, n = pack_lab_planes(jnp.zeros((100, 3), jnp.float32))
    with pytest.raises(ValueError, match="k <= 512"):
        lloyd_accumulate(planes, jnp.zeros((513, 3), jnp.float32), n)

    calls = []
    monkeypatch.setattr(
        api.kmeans_model, "fit_large",
        lambda *a, **k: (calls.append("pallas"), (None, None))[1],
    )
    monkeypatch.setattr(
        api.kmeans_model, "fit_large_restarts",
        lambda *a, **k: (calls.append("pallas_restarts"), (None, None))[1],
    )
    monkeypatch.setattr(
        api.kmeans_model, "fit_chunked",
        lambda *a, **k: (calls.append("chunked"), (None, None))[1],
    )
    # 2M x 128 = 256M elems > _CHUNKED_TRAIN_ELEMS: the over-budget route.
    work = jnp.zeros((2_000_000, 3), jnp.float32)
    api._fit_auto(work, 128, 0, 1.0, use_pallas=True)
    api._fit_auto(work, 128, 0, 1.0, use_pallas=True, restarts=3)
    api._fit_auto(work, 128, 0, 1.0, use_pallas=False)  # CPU fallback
    api._fit_auto(work, 600, 0, 1.0, use_pallas=True)  # beyond ACCUM_MAX_K
    # cie2000 k>64 routes to the accumulator in BOTH tiers: fast=True
    # rides the pruned tier (round 3); exact rides the chunked-loop form
    # (round 4 — 5.1/7.6 s compiles vs the 130/351 s unrolled program,
    # 1.3x/iter over fit_chunked; tools/exp_accum_2000.py, docs/perf.md).
    api._fit_auto(work, 128, 0, 1.0, use_pallas=True, metric="cie2000")
    api._fit_auto(
        work, 128, 0, 1.0, use_pallas=True, metric="cie2000", fast=True
    )
    assert calls == [
        "pallas", "pallas_restarts", "chunked", "chunked", "pallas",
        "pallas",
    ]


def test_lloyd_accumulate_prune_full_m_matches_exact():
    """Pruned cie2000 accumulator (fast=True, kp > 16) with PRUNE_M >= kp:
    every candidate survives screening and the winner is chosen by exact
    distances, so assignments — and therefore the (sum, count, inertia)
    totals, summed in the same order — must be BIT-EQUAL to the exact
    accumulator (exact-distance ties are measure-zero on random f32).
    The inertia column only matches to ~1 ulp: the pruned pass computes
    the same winning distance from VECTOR-gathered centroid planes while
    the exact loop broadcasts SMEM scalars, and the two contract FMAs
    differently (same class as the unroll-form lesson in STATUS.md).
    Validates the accumulator's screen, gather tables, and exact pass
    end-to-end, weighted and unweighted."""
    from kmeans_tpu.ops import kernels as k_mod
    from kmeans_tpu.ops.kernels import (
        lloyd_accumulate,
        pack_lab_planes,
        pack_plane,
    )

    rng = np.random.default_rng(11)
    pix = jnp.asarray(rng.uniform(0, 100, (700, 3)).astype(np.float32))
    cents = jnp.asarray(rng.uniform(0, 100, (20, 3)).astype(np.float32))
    weight = jnp.asarray(
        rng.uniform(0, 2, (700,)).astype(np.float32)
    )
    planes, n = pack_lab_planes(pix)
    wplanes = pack_plane(weight)
    prev = k_mod.set_loop_knobs(prune_m=64)
    try:
        for kwargs in (
            {},
            {"emit_inertia": True},
            {"weight_planes": wplanes, "emit_inertia": True},
            {"k_active": 13},
        ):
            want = np.asarray(
                lloyd_accumulate(
                    planes, cents, n, interpret=True, metric="cie2000",
                    **kwargs,
                )
            )
            got = np.asarray(
                lloyd_accumulate(
                    planes, cents, n, interpret=True, metric="cie2000",
                    fast=True, **kwargs,
                )
            )
            np.testing.assert_array_equal(
                got[:, :4], want[:, :4], err_msg=str(kwargs)
            )
            if got.shape[1] == 5:
                np.testing.assert_allclose(
                    got[:, 4], want[:, 4], rtol=1e-6, err_msg=str(kwargs)
                )
    finally:
        k_mod.set_loop_knobs(prune_m=prev[4], prune_m_large=prev[9])


def test_lloyd_accumulate_cie2000_chunked_matches_unrolled():
    """The round-4 chunked EXACT-CIEDE2000 accumulator form (fori over
    ACCUM_CHUNK_2000-trip chunks + dynamic-store reduction loop, engaged
    at kp > ACCUM_UNROLL_2000 so full-res exact cie2000 k > 64 training
    compiles in seconds — tools/exp_accum_2000.py) must produce the SAME
    ASSIGNMENTS as the fully-unrolled round-2 form: sums and counts
    bit-equal, inertia within ~1 ulp (the two forms contract the distance
    chain's FMAs differently — the STATUS.md loop-form lesson; counts
    equal proves no assignment flipped on this data). Knobs lowered so
    the test runs at interpret-friendly kp; covers weighted, inertia,
    k_active masking, and a chunk size that does not divide kp."""
    from kmeans_tpu.ops import kernels as k_mod
    from kmeans_tpu.ops.kernels import (
        lloyd_accumulate,
        pack_lab_planes,
        pack_plane,
    )

    rng = np.random.default_rng(13)
    pix = jnp.asarray(rng.uniform(0, 100, (800, 3)).astype(np.float32))
    cents = jnp.asarray(rng.uniform(0, 100, (24, 3)).astype(np.float32))
    wplanes = pack_plane(
        jnp.asarray(rng.uniform(0, 2, (800,)).astype(np.float32))
    )
    planes, n = pack_lab_planes(pix)
    cases = (
        {},
        {"emit_inertia": True},
        {"weight_planes": wplanes, "emit_inertia": True},
        {"k_active": 19},
    )
    want = [
        np.asarray(
            lloyd_accumulate(
                planes, cents, n, interpret=True, metric="cie2000", **kw
            )
        )
        for kw in cases
    ]  # kp=24 <= ACCUM_UNROLL_2000: the unrolled round-2 program
    prev = k_mod.set_loop_knobs(
        accum_kp_2000=8, accum_chunk_2000=5, accum_mask_chunk=7
    )
    try:
        for kw, w in zip(cases, want):
            got = np.asarray(
                lloyd_accumulate(
                    planes, cents, n, interpret=True, metric="cie2000", **kw
                )
            )
            np.testing.assert_array_equal(
                got[:, :4], w[:, :4], err_msg=str(kw)
            )
            if got.shape[1] == 5:
                np.testing.assert_allclose(
                    got[:, 4], w[:, 4], rtol=1e-6, err_msg=str(kw)
                )
    finally:
        k_mod.set_loop_knobs(
            accum_kp_2000=prev[6], accum_chunk_2000=prev[7],
            accum_mask_chunk=prev[8],
        )


def test_prune_m_kp_dependent_default():
    """Round-4: the pruned tier's candidate count is kp-dependent —
    PRUNE_M (8) up to 128 clusters, PRUNE_M_LARGE (16) above (measured
    strictly better at kp >= 256: 3.6x at 9.4e-5 mismatch vs 7.6x at
    the 1.0e-3 bar, docs/perf.md). Both knobs flow through
    set_loop_knobs."""
    from kmeans_tpu.ops import kernels as k_mod

    assert k_mod.prune_m_for(16) == k_mod.PRUNE_M
    assert k_mod.prune_m_for(128) == k_mod.PRUNE_M
    assert k_mod.prune_m_for(129) == k_mod.PRUNE_M_LARGE
    assert k_mod.prune_m_for(512) == k_mod.PRUNE_M_LARGE
    assert (k_mod.PRUNE_M, k_mod.PRUNE_M_LARGE) == (8, 16)
    prev = k_mod.set_loop_knobs(prune_m_large=32)
    try:
        assert k_mod.prune_m_for(256) == 32
        assert k_mod.prune_m_for(64) == k_mod.PRUNE_M
        # A sweep that pins prune_m ALONE means M at every kp — without
        # this, an M sweep at kp > gate silently measures PRUNE_M_LARGE
        # (round-4 review: exp_prune.py's k=256 rows did exactly that).
        k_mod.set_loop_knobs(prune_m=4)
        assert k_mod.prune_m_for(64) == 4
        assert k_mod.prune_m_for(256) == 4
        # ...while passing both keeps the tiers split.
        k_mod.set_loop_knobs(prune_m=4, prune_m_large=24)
        assert k_mod.prune_m_for(64) == 4
        assert k_mod.prune_m_for(256) == 24
    finally:
        k_mod.set_loop_knobs(prune_m=prev[4], prune_m_large=prev[9])


def test_prune_m_large_reaches_kernel():
    """The kp > PRUNE_M_GATE branch of `prune_m_for` must actually steer
    the accumulator's pruned screen: with the gate lowered to 16 and
    (prune_m=1, prune_m_large=3), a kp=20 pruned run must be bit-equal
    to a uniform m=3 reference (had the small knob leaked through, it
    would equal the distinguishable uniform m=1 reference instead). The
    gate knob exists precisely so this runs at interpret-friendly kp —
    at the production gate the same check needs kp=132 compiles
    (~6 min on the CPU interpreter)."""
    from kmeans_tpu.ops import kernels as k_mod
    from kmeans_tpu.ops.kernels import lloyd_accumulate, pack_lab_planes

    rng = np.random.default_rng(3)
    pix = jnp.asarray(rng.uniform(0, 100, (300, 3)).astype(np.float32))
    cents = jnp.asarray(rng.uniform(0, 100, (20, 3)).astype(np.float32))
    planes, n = pack_lab_planes(pix)

    def run():
        return np.asarray(
            lloyd_accumulate(
                planes, cents, n, interpret=True, metric="cie2000",
                fast=True,
            )
        )

    prev = k_mod.set_loop_knobs(prune_m=3, prune_m_large=3, prune_m_gate=16)
    try:
        ref3 = run()
        k_mod.set_loop_knobs(prune_m=1, prune_m_large=1)
        ref1 = run()
        assert not np.array_equal(ref1, ref3)  # m=1 vs m=3 distinguishable
        k_mod.set_loop_knobs(prune_m=1, prune_m_large=3)
        np.testing.assert_array_equal(run(), ref3)
    finally:
        k_mod.set_loop_knobs(
            prune_m=prev[4], prune_m_large=prev[9], prune_m_gate=prev[10]
        )


def test_lloyd_accumulate_prune_default_m_quality():
    """At the production PRUNE_M the pruned accumulator must stay close to
    exact: total counts conserved, per-cluster counts within a small
    fraction of N, and the fast=True cie94 gate unaffected (cie94 + fast
    still runs the factorized score, not the prune path)."""
    from kmeans_tpu.ops.kernels import lloyd_accumulate, pack_lab_planes

    rng = np.random.default_rng(12)
    pix = jnp.asarray(rng.uniform(0, 100, (900, 3)).astype(np.float32))
    cents = jnp.asarray(rng.uniform(0, 100, (24, 3)).astype(np.float32))
    planes, n = pack_lab_planes(pix)
    exact = np.asarray(
        lloyd_accumulate(planes, cents, n, interpret=True, metric="cie2000")
    )
    fast = np.asarray(
        lloyd_accumulate(
            planes, cents, n, interpret=True, metric="cie2000", fast=True
        )
    )
    assert fast[:, 3].sum() == exact[:, 3].sum() == 900
    assert np.abs(fast[:, 3] - exact[:, 3]).sum() / 900 < 2e-2


def test_lloyd_accumulate_emit_inertia():
    """emit_inertia adds a 5th column = per-cluster weighted sums of the
    squared distance to the assigned (nearest) centroid; columns 0-3 are
    untouched."""
    from kmeans_tpu.models.kmeans import _masked_d2, assign_clusters
    from kmeans_tpu.ops.kernels import (
        lloyd_accumulate,
        pack_lab_planes,
        pack_plane,
    )

    rng = np.random.default_rng(29)
    pix = jnp.asarray(rng.normal(50, 25, (4000, 3)).astype(np.float32))
    cents = jnp.asarray(rng.normal(50, 25, (5, 3)).astype(np.float32))
    weight = jnp.asarray(rng.uniform(0, 2, 4000).astype(np.float32))
    planes, n = pack_lab_planes(pix)
    totals = np.asarray(
        lloyd_accumulate(
            planes, cents, n, weight_planes=pack_plane(weight),
            interpret=True, emit_inertia=True,
        )
    )
    assert totals.shape == (5, 5)
    base = np.asarray(
        lloyd_accumulate(
            planes, cents, n, weight_planes=pack_plane(weight), interpret=True
        )
    )
    np.testing.assert_array_equal(totals[:, :4], base)
    d2 = np.asarray(_masked_d2(pix, cents, jnp.ones(5, bool)))
    assign = np.asarray(assign_clusters(pix, cents))
    dmin = d2[np.arange(4000), assign] * np.asarray(weight)
    expect = np.array([dmin[assign == k].sum() for k in range(5)])
    np.testing.assert_allclose(totals[:, 4], expect, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize(
    "shape,k,mode",
    [
        ((61, 93), 3, "replace"),   # bits=2, ragged
        ((257, 129), 8, "dither"),  # bits=4, > one tile
        ((300, 511), 40, "dither"), # bits=8 (4 px/word)
        ((8, 8), 200, "replace"),   # tiny, large palette
    ],
)
def test_fused_assign_packed_roundtrip(shape, k, mode):
    """The in-kernel sublane pack must invert exactly through
    utils.packing.unpack_tile_words for every bit width and ragged
    shape — drift between the kernel's layout and the host unpack means
    silently garbled pixels."""
    from kmeans_tpu.ops.kernels import (
        fused_assign,
        fused_assign_packed,
        quant_tile_rows,
    )
    from kmeans_tpu.utils.packing import pack_bits, unpack_tile_words

    h, w = shape
    img = _image(h, w, seed=k)
    pal = _palette(k, seed=k + 1)
    idx = np.asarray(fused_assign(img, pal, 9.0, mode=mode, interpret=True))
    words = np.asarray(
        fused_assign_packed(img, pal, 9.0, mode=mode, interpret=True)
    )
    got = unpack_tile_words(
        words, h, w, pack_bits(k), tile_rows=quant_tile_rows(k)
    )
    np.testing.assert_array_equal(got, idx)


@pytest.mark.parametrize("k", [300, 512, 1024])
def test_fused_assign_packed_16bit_tier(k):
    """256 < k <= INDEXED_MAX_K (1024 since late round 4) packs two
    16-bit indices per i32 word (the large-palette tier; half the
    traffic of the RGBA readback it replaces — above 512 it replaces
    the full-RGBA tier entirely). The unpack must yield uint16 and
    invert the kernel's layout exactly; indices must match the XLA
    argmin."""
    from kmeans_tpu.ops.kernels import (
        fused_assign_packed,
        quant_tile_rows,
    )
    from kmeans_tpu.ops.quantize import assign_index
    from kmeans_tpu.utils.packing import pack_bits, unpack_tile_words

    h, w = 45, 71
    img = _image(h, w, seed=11)
    pal = _palette(k, seed=12)
    assert pack_bits(k) == 16
    words = np.asarray(
        fused_assign_packed(
            img, pal, dither_threshold(pal), mode="dither", interpret=True
        )
    )
    got = unpack_tile_words(words, h, w, 16, tile_rows=quant_tile_rows(k))
    assert got.dtype == np.uint16
    lab = srgb8_to_lab(img[..., :3])
    want = np.asarray(assign_index(lab, pal, mode="dither")).astype(np.uint16)
    np.testing.assert_array_equal(got, want)


def test_gamma_lut_bit_equal_discrete_modes():
    """The default gamma-LUT kernels (use_lut=True) must be bit-identical
    to the pow-chain kernels (use_lut=False) on every discrete-output
    path — the LUT holds the XLA lin formula's values on the u8 grid by
    construction (on hardware the LUT is in fact STRICTLY closer to XLA:
    0 mismatches vs the pow chain's ulp deviations; docs/perf.md). meld's
    continuous blend is allowed the same ±1-u8 FMA-contraction tolerance
    as fused-vs-XLA."""
    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.kernels import fused_assign, fused_quantize

    rng = np.random.default_rng(47)
    img = jnp.asarray(rng.integers(0, 256, (61, 93, 4), dtype=np.uint8))
    pal = srgb8_to_lab(
        jnp.asarray(rng.integers(0, 256, (6, 3), dtype=np.uint8))
    )
    for mode in ("replace", "dither"):
        a = np.asarray(
            fused_quantize(
                img, pal, 9.0, mode=mode, interpret=True, use_lut=False
            )
        )
        b = np.asarray(
            fused_quantize(
                img, pal, 9.0, mode=mode, interpret=True, use_lut=True
            )
        )
        np.testing.assert_array_equal(a, b, err_msg=mode)
        ia = np.asarray(
            fused_assign(
                img, pal, 9.0, mode=mode, interpret=True, use_lut=False
            )
        )
        ib = np.asarray(
            fused_assign(
                img, pal, 9.0, mode=mode, interpret=True, use_lut=True
            )
        )
        np.testing.assert_array_equal(ia, ib, err_msg=mode)
    a = np.asarray(
        fused_quantize(img, pal, 9.0, mode="meld", interpret=True,
                       use_lut=False)
    ).astype(int)
    b = np.asarray(
        fused_quantize(img, pal, 9.0, mode="meld", interpret=True,
                       use_lut=True)
    ).astype(int)
    d = np.abs(a - b)
    assert d.max() <= 1 and (d > 0).mean() < 1e-3


def test_lloyd_accumulate_fast_and_bf16_variants():
    """Opt-in traffic/flop variants track the exact kernel: fast
    (algebraic CIE94) totals match within float noise; bf16 planes match
    within the ~0.3 delta-E input quantization."""
    from kmeans_tpu.ops.kernels import lloyd_accumulate, pack_lab_planes

    rng = np.random.default_rng(41)
    pix = jnp.asarray(rng.normal(50, 25, (6000, 3)).astype(np.float32))
    cents = jnp.asarray(rng.normal(50, 25, (8, 3)).astype(np.float32))
    planes, n = pack_lab_planes(pix)
    exact = np.asarray(lloyd_accumulate(planes, cents, n, interpret=True))

    fast = np.asarray(
        lloyd_accumulate(planes, cents, n, interpret=True, fast=True)
    )
    # counts may differ by a few knife-edge pixels; sums track closely
    assert np.abs(fast[:, 3] - exact[:, 3]).max() <= 3
    np.testing.assert_allclose(fast[:, :3], exact[:, :3], rtol=2e-2, atol=60)

    bplanes, n2 = pack_lab_planes(pix, dtype=jnp.bfloat16)
    assert bplanes.dtype == jnp.bfloat16 and n2 == n
    b16 = np.asarray(lloyd_accumulate(bplanes, cents, n, interpret=True))
    assert np.abs(b16[:, 3] - exact[:, 3]).max() <= 30  # ~0.5% of pixels
    counts = np.maximum(exact[:, 3], 1)
    # per-cluster mean Lab error stays at the bf16 quantization scale
    mean_err = np.abs(b16[:, :3] / np.maximum(b16[:, 3:4], 1) -
                      exact[:, :3] / counts[:, None])
    assert mean_err.max() < 1.0


def test_fit_large_restarts_selects_min_inertia_run():
    """fit_large_restarts: restarts=1 is exactly fit_large; restarts=R
    returns bit-for-bit the lowest-inertia run among the individually-run
    seeded fits (same seeds as derive_restart_seeds)."""
    from kmeans_tpu.models.kmeans import (
        _masked_d2,
        derive_restart_seeds,
        fit_large,
        fit_large_restarts,
    )

    rng = np.random.default_rng(31)
    centers = np.array(
        [[15.0, 5, -20], [55.0, 35, 25], [80.0, -35, -25], [45.0, -45, 45]]
    )
    pix = jnp.asarray(
        (centers[rng.integers(0, 4, 3000)] + rng.normal(0, 1.0, (3000, 3)))
        .astype(np.float32)
    )
    c1, i1 = fit_large(pix, 4, 0, interpret=True)
    cr, ir = fit_large_restarts(pix, 4, 0, restarts=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(cr))
    assert int(i1) == int(ir)

    R = 4
    seeds = np.asarray(derive_restart_seeds(3000, 0, R))
    runs = [fit_large(pix, 4, int(s), interpret=True) for s in seeds]

    def inertia(c):
        d2 = _masked_d2(pix, jnp.asarray(c), jnp.ones(4, bool))
        return float(jnp.sum(jnp.min(d2, axis=1)))

    best = int(np.argmin([inertia(c) for c, _ in runs]))
    cR, iR = fit_large_restarts(pix, 4, 0, restarts=R, interpret=True)
    np.testing.assert_array_equal(np.asarray(cR), np.asarray(runs[best][0]))
    assert int(iR) == int(runs[best][1])


def test_fit_large_bf16_planes_close_to_f32():
    """plane_dtype="bfloat16" (opt-in, docs/perf.md round 2): the trainer
    must run and land centroids close to the f32 default — the bf16
    planes quantize the INPUT (~0.3 delta-E class), they do not change
    the algorithm. restarts path takes the same knob."""
    from kmeans_tpu.models.kmeans import fit_large, fit_large_restarts

    rng = np.random.default_rng(17)
    centers = np.array([[20.0, 0, 0], [60.0, 40, -30], [90.0, -50, 50]])
    pix = jnp.asarray(
        (centers[rng.integers(0, 3, 3000)] + rng.normal(0, 0.5, (3000, 3)))
        .astype(np.float32)
    )
    c32, _ = fit_large(pix, 3, 0, interpret=True)
    c16, _ = fit_large(pix, 3, 0, interpret=True, plane_dtype="bfloat16")
    assert np.all(np.isfinite(np.asarray(c16)))
    # Cluster centers are ~0.5-sigma blobs; bf16 input rounding moves
    # centroids far less than the inter-cluster spacing.
    assert np.max(np.abs(np.asarray(c16) - np.asarray(c32))) < 1.0
    cr16, _ = fit_large_restarts(
        pix, 3, 0, restarts=2, interpret=True, plane_dtype="bfloat16"
    )
    assert np.all(np.isfinite(np.asarray(cr16)))


def test_fit_large_matches_fit():
    from kmeans_tpu.models.kmeans import fit, fit_large

    rng = np.random.default_rng(11)
    centers = np.array([[20.0, 0, 0], [60.0, 40, -30], [90.0, -50, 50]])
    pix = jnp.asarray(
        (centers[rng.integers(0, 3, 3000)] + rng.normal(0, 0.5, (3000, 3))).astype(
            np.float32
        )
    )
    c1, i1 = fit(pix, 3, 0)
    c2, i2 = fit_large(pix, 3, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-3)
    assert int(i1) == int(i2)


def test_fused_fuzz_shapes_modes():
    # Randomized sweep: arbitrary dims / k / k_active across all modes must
    # stay bit-identical between the Pallas kernel and the XLA formulas.
    rng = np.random.default_rng(42)
    for trial in range(6):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        k = int(rng.integers(1, 12))
        k_active = int(rng.integers(1, k + 1))
        mode = ["replace", "dither", "meld"][trial % 3]
        img = jnp.asarray(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
        pal = _palette(k, seed=100 + trial)
        thr = dither_threshold(pal, k_active=k_active)
        want = np.asarray(quantize_image(img, pal, mode=mode, k_active=k_active))
        got = np.asarray(
            fused_quantize(
                img, pal, thr, k_active=k_active, mode=mode, interpret=True
            )
        )
        if mode == "meld":
            # Continuous blend: XLA's per-fusion FMA contraction choices can
            # shift isolated pixels by one u8 step.
            diff = np.abs(got.astype(int) - want.astype(int))
            frac = (diff.max(axis=-1) > 0).mean()
            assert frac <= 1e-3 and diff.max() <= 1, (
                f"trial={trial} {h}x{w} k={k}/{k_active} meld: "
                f"frac={frac} maxdiff={diff.max()}"
            )
        else:
            np.testing.assert_array_equal(
                got, want, err_msg=f"trial={trial} {h}x{w} k={k}/{k_active} {mode}"
            )


def test_validate_kernels_module():
    from kmeans_tpu.ops.validate import validate_kernels

    assert validate_kernels(verbose=False)


def test_fused_rejects_unknown_mode():
    img = _image(4, 4)
    pal = _palette(2)
    with pytest.raises(ValueError):
        fused_quantize(img, pal, jnp.float32(0), mode="swap", interpret=True)


def test_lloyd_accumulate_rejects_unpacked_layout():
    from kmeans_tpu.ops.kernels import lloyd_accumulate

    bad = jnp.zeros((3, 100, 128), jnp.float32)  # 100 not a TILE_ROWS multiple
    with pytest.raises(ValueError):
        lloyd_accumulate(bad, jnp.zeros((2, 3)), 100 * 128, interpret=True)


def test_mediancut_empty_input():
    from kmeans_tpu.models.mediancut import extract_palette_mediancut

    assert extract_palette_mediancut(np.zeros((0, 3), np.uint8), 8) == []


def test_lloyd_accumulate_weighted_matches_matmul():
    from kmeans_tpu.models.kmeans import _update_centroids, assign_clusters
    from kmeans_tpu.ops.kernels import lloyd_accumulate, pack_lab_planes, pack_plane

    rng = np.random.default_rng(14)
    pix = jnp.asarray(rng.normal(50, 25, (4000, 3)).astype(np.float32))
    cents = jnp.asarray(rng.normal(50, 25, (5, 3)).astype(np.float32))
    weight = jnp.asarray(
        (rng.uniform(size=4000) > 0.3).astype(np.float32)
    )
    planes, n = pack_lab_planes(pix)
    totals = np.asarray(
        lloyd_accumulate(
            planes, cents, n, weight_planes=pack_plane(weight), interpret=True
        )
    )
    assign = assign_clusters(pix, cents)
    sums, counts = _update_centroids(pix, assign, 5, weight)
    np.testing.assert_allclose(totals[:, :3], np.asarray(sums), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(totals[:, 3], np.asarray(counts), atol=0)


def test_fit_large_weighted_matches_fit_weighted():
    from kmeans_tpu.models.kmeans import fit, fit_large

    rng = np.random.default_rng(15)
    centers = np.array([[20.0, 0, 0], [60.0, 40, -30], [90.0, -50, 50]])
    real = (centers[rng.integers(0, 3, 2000)] + rng.normal(0, 0.5, (2000, 3)))
    garbage = rng.normal(0, 80, (500, 3))
    pix = jnp.asarray(np.concatenate([real, garbage]).astype(np.float32))
    weight = jnp.concatenate([jnp.ones(2000), jnp.zeros(500)]).astype(jnp.float32)
    c1, i1 = fit(pix, 3, 0, weight=weight)
    c2, i2 = fit_large(pix, 3, 0, weight=weight, interpret=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-3)
    assert int(i1) == int(i2)


@pytest.mark.parametrize("mode", ["replace", "dither", "meld"])
def test_fused_fast_mode_quality(mode):
    """fast=True hoists the rolled loop's CIE94 divides into reciprocals
    (engaged for kp > 16 only): assignments may flip only on knife-edge
    ties, so outputs must agree on ~all pixels and any differing pixel
    must still be a palette color (replace)."""
    img = _image(48, 64, seed=7)
    pal = _palette(24, seed=3)
    thr = dither_threshold(pal)
    exact = np.asarray(fused_quantize(img, pal, thr, mode=mode, interpret=True))
    fast = np.asarray(
        fused_quantize(img, pal, thr, mode=mode, interpret=True, fast=True)
    )
    pixel_diff = (exact != fast).any(axis=-1).mean()
    assert pixel_diff < 1e-3, f"fast mode flipped {pixel_diff:.2%} of pixels"
    if mode == "replace":
        pal_rgba = set(map(tuple, np.unique(exact.reshape(-1, 4), axis=0)))
        got_rgba = set(map(tuple, np.unique(fast.reshape(-1, 4), axis=0)))
        assert got_rgba <= pal_rgba


def test_fused_fast_mode_small_k_bit_equal():
    """For kp <= 16 the unrolled kernel showed no fast-mode speedup, so
    fast=True keeps exact divides there: outputs are bit-equal."""
    img = _image(48, 64, seed=7)
    pal = _palette(8, seed=3)
    thr = dither_threshold(pal)
    for mode in ("replace", "dither", "meld"):
        exact = np.asarray(
            fused_quantize(img, pal, thr, mode=mode, interpret=True)
        )
        fast = np.asarray(
            fused_quantize(img, pal, thr, mode=mode, interpret=True, fast=True)
        )
        np.testing.assert_array_equal(exact, fast)


def test_fused_assign_fast_mode_quality():
    from kmeans_tpu.ops.kernels import fused_assign

    img = _image(48, 64, seed=9)
    pal = _palette(24, seed=5)
    thr = dither_threshold(pal)
    exact = np.asarray(fused_assign(img, pal, thr, mode="replace", interpret=True))
    fast = np.asarray(
        fused_assign(img, pal, thr, mode="replace", interpret=True, fast=True)
    )
    assert (exact != fast).mean() < 1e-3


def test_atan2_planes_matches_numpy():
    """The kernel's polynomial atan2 (Mosaic has no atan2 lowering) must
    match numpy to ~1e-6 rad across all quadrants and the axes."""
    from kmeans_tpu.ops.kernels import _atan2_planes

    rng = np.random.default_rng(11)
    y = rng.uniform(-90, 90, 4096).astype(np.float32)
    x = rng.uniform(-90, 90, 4096).astype(np.float32)
    # include axes and the origin
    y = np.concatenate([y, [0, 0, 1, -1, 0]]).astype(np.float32)
    x = np.concatenate([x, [1, -1, 0, 0, 0]]).astype(np.float32)
    got = np.asarray(_atan2_planes(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    # x<0, y=0: convention boundary (pi vs -pi) — compare angles modulo 2pi
    diff = np.abs(got - want)
    diff = np.minimum(diff, 2 * np.pi - diff)
    assert diff.max() < 2e-6, diff.max()


def test_cie2000_planes_matches_reference_formula():
    from kmeans_tpu.ops.delta_e import distance_cie2000_sq
    from kmeans_tpu.ops.kernels import _cie2000_sq_planes

    rng = np.random.default_rng(13)
    lab1 = np.column_stack(
        [rng.uniform(0, 100, 512), rng.uniform(-80, 80, (512, 2))]
    ).astype(np.float32)
    lab2 = np.column_stack(
        [rng.uniform(0, 100, 512), rng.uniform(-80, 80, (512, 2))]
    ).astype(np.float32)
    got = np.asarray(
        _cie2000_sq_planes(
            jnp.asarray(lab1[:, 0]), jnp.asarray(lab1[:, 1]), jnp.asarray(lab1[:, 2]),
            jnp.asarray(lab2[:, 0]), jnp.asarray(lab2[:, 1]), jnp.asarray(lab2[:, 2]),
        )
    )
    want = np.asarray(distance_cie2000_sq(lab1, lab2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["replace", "dither", "meld"])
def test_fused_cie2000_matches_xla(mode):
    """Fused kernels with metric='cie2000' vs the XLA path: the polynomial
    atan2 can flip knife-edge assignments only — outputs agree on ~all
    pixels, and replace outputs stay within the palette."""
    img = _image(48, 64, seed=21)
    pal = _palette(6, seed=7)
    expected = np.asarray(
        quantize_image(img, pal, mode=mode, metric="cie2000")
    )
    thr = dither_threshold(pal, metric="cie2000")
    got = np.asarray(
        fused_quantize(
            img, pal, thr, mode=mode, interpret=True, metric="cie2000"
        )
    )
    flips = (expected != got).any(axis=-1).mean()
    assert flips < 2e-3, f"cie2000 fused flipped {flips:.2%} of pixels"
    if mode == "replace":
        pal_rgba = set(map(tuple, np.unique(expected.reshape(-1, 4), axis=0)))
        got_rgba = set(map(tuple, np.unique(got.reshape(-1, 4), axis=0)))
        assert got_rgba <= pal_rgba


def test_fused_assign_cie2000_matches_xla():
    from kmeans_tpu.models.kmeans import assign_clusters
    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.kernels import fused_assign

    img = _image(40, 48, seed=31)
    pal = _palette(9, seed=9)
    lab = srgb8_to_lab(np.asarray(img)[..., :3].reshape(-1, 3))
    want = np.asarray(assign_clusters(lab, pal, metric="cie2000"))
    got = np.asarray(
        fused_assign(
            img, pal, jnp.float32(0.0), mode="replace", interpret=True,
            metric="cie2000",
        )
    ).reshape(-1)
    assert (want != got).mean() < 2e-3


def test_fused_rejects_unknown_metric():
    img = _image(4, 4)
    pal = _palette(2)
    with pytest.raises(ValueError, match="unknown metric"):
        fused_quantize(img, pal, jnp.float32(0), metric="94", interpret=True)


def test_lloyd_accumulate_cie2000_matches_matmul():
    from kmeans_tpu.models.kmeans import _update_centroids, assign_clusters
    from kmeans_tpu.ops.kernels import lloyd_accumulate, pack_lab_planes

    rng = np.random.default_rng(33)
    # well-separated clusters: knife-edge atan2 flips can't move counts
    centers = np.array([[20.0, 10, -30], [60.0, -40, 20], [85.0, 30, 45]])
    pix = jnp.asarray(
        (centers[rng.integers(0, 3, 4000)] + rng.normal(0, 1.0, (4000, 3)))
        .astype(np.float32)
    )
    cents = jnp.asarray(centers.astype(np.float32))
    planes, n = pack_lab_planes(pix)
    totals = np.asarray(
        lloyd_accumulate(planes, cents, n, interpret=True, metric="cie2000")
    )
    assign = assign_clusters(pix, cents, metric="cie2000")
    sums, counts = _update_centroids(pix, assign, 3)
    np.testing.assert_allclose(totals[:, :3], np.asarray(sums), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(totals[:, 3], np.asarray(counts), atol=0)


def test_fit_large_cie2000_matches_fit():
    from kmeans_tpu.models.kmeans import fit, fit_large

    rng = np.random.default_rng(35)
    centers = np.array([[25.0, 5, -20], [55.0, 35, 25], [80.0, -35, -25]])
    pix = jnp.asarray(
        (centers[rng.integers(0, 3, 3000)] + rng.normal(0, 0.6, (3000, 3)))
        .astype(np.float32)
    )
    c1, i1 = fit(pix, 3, 0, metric="cie2000")
    c2, i2 = fit_large(pix, 3, 0, interpret=True, metric="cie2000")
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-2)
    assert int(i1) == int(i2)


@pytest.mark.parametrize("metric", ["cie94", "cie2000"])
@pytest.mark.parametrize("mode", ["replace", "dither", "meld"])
def test_fused_quantize_frames_matches_per_frame(mode, metric):
    """The per-frame-palette batch kernel must be bit-equal to B separate
    single-frame launches: each frame restarts tiling and dither phase at
    its own origin, reads ITS OWN centroid/palette/threshold rows, and
    masks its own k_active."""
    from kmeans_tpu.ops.kernels import fused_quantize_frames

    b, h, w, kp = 3, 37, 53, 8
    frames = jnp.stack([_image(h, w, seed=40 + i) for i in range(b)])
    cents = jnp.stack([_palette(kp, seed=50 + i) for i in range(b)])
    k_act = jnp.asarray([8, 5, 3], jnp.int32)
    thr = jnp.stack(
        [
            dither_threshold(cents[i], k_active=int(k_act[i]), metric=metric)
            for i in range(b)
        ]
    )
    batched = np.asarray(
        fused_quantize_frames(
            frames, cents, thr, k_act, mode=mode, interpret=True,
            metric=metric,
        )
    )
    for i in range(b):
        single = np.asarray(
            fused_quantize(
                frames[i], cents[i], thr[i], k_active=int(k_act[i]),
                mode=mode, interpret=True, metric=metric,
            )
        )
        np.testing.assert_array_equal(batched[i], single)


@pytest.mark.parametrize("mode", ["replace", "dither"])
def test_fused_assign_frames_packed_matches_per_frame(mode):
    """Frame-batched in-kernel index packing: every frame's word slice must
    carry exactly the single-frame `fused_assign_packed` layout, so the
    SAME host unpack inverts it."""
    from kmeans_tpu.ops.kernels import (
        fused_assign_frames_packed,
        fused_assign_packed,
        quant_tile_rows,
    )
    from kmeans_tpu.utils.packing import pack_bits, unpack_tile_words

    b, h, w, kp = 3, 37, 53, 8
    frames = jnp.stack([_image(h, w, seed=60 + i) for i in range(b)])
    cents = jnp.stack([_palette(kp, seed=70 + i) for i in range(b)])
    thr = jnp.stack([dither_threshold(c) for c in cents])
    words = np.asarray(
        fused_assign_frames_packed(
            frames, cents, thr, None, mode=mode, interpret=True
        )
    )
    bits = pack_bits(kp)
    tr = quant_tile_rows(kp)
    for i in range(b):
        sw = np.asarray(
            fused_assign_packed(
                frames[i], cents[i], thr[i], mode=mode, interpret=True
            )
        )
        np.testing.assert_array_equal(words[i].reshape(sw.shape), sw)
        got = np.asarray(
            unpack_tile_words(
                jnp.asarray(words[i].reshape(sw.shape)), h, w, bits,
                tile_rows=tr,
            )
        )
        want = np.asarray(
            unpack_tile_words(jnp.asarray(sw), h, w, bits, tile_rows=tr)
        )
        np.testing.assert_array_equal(got, want)


def test_fused_frames_rejects_oversize_batch():
    from kmeans_tpu.ops.kernels import FRAMES_MAX_BK, fused_quantize_frames

    b = FRAMES_MAX_BK // 256 + 1
    frames = jnp.zeros((b, 4, 4, 4), jnp.uint8)
    cents = jnp.zeros((b, 256, 3), jnp.float32)
    thr = jnp.zeros((b,), jnp.float32)
    with pytest.raises(ValueError, match="FRAMES_MAX_BK"):
        fused_quantize_frames(frames, cents, thr, interpret=True)


# ------------------------------------------------------------------ #
# CIEDE2000 fast tier (two-pass candidate pruning) — round 3
# ------------------------------------------------------------------ #


def test_prune_full_m_matches_exact():
    """With PRUNE_M >= kp the screening pass keeps EVERY candidate, so the
    pruned selection must equal the exact cie2000 fused path for every
    mode (validates the gather tables, masks, and the exact pass
    end-to-end; ties are measure-zero on random f32 data)."""
    from kmeans_tpu.ops import kernels as k_mod

    img = _image(24, 40, seed=5)
    pal = _palette(20, seed=6)
    thr = dither_threshold(pal, metric="cie2000")
    prev = k_mod.set_loop_knobs(prune_m=64)
    try:
        for mode in ("replace", "dither", "meld"):
            want = np.asarray(
                fused_quantize(
                    img, pal, thr, mode=mode, interpret=True,
                    metric="cie2000",
                )
            )
            got = np.asarray(
                fused_quantize(
                    img, pal, thr, mode=mode, interpret=True,
                    metric="cie2000", fast=True,
                )
            )
            np.testing.assert_array_equal(got, want, err_msg=mode)
    finally:
        k_mod.set_loop_knobs(prune_m=prev[4], prune_m_large=prev[9])


def test_prune_default_m_quality_and_k_active():
    """At the production PRUNE_M the pruned tier must (a) rarely disagree
    with exact (screening keeps the true nearest in its top-m for almost
    every pixel), (b) never emit an index >= k_active, (c) match exact
    when k_active <= m (every active candidate survives screening)."""
    from kmeans_tpu.ops.kernels import fused_assign

    img = _image(40, 48, seed=7)
    pal = _palette(24, seed=8)
    exact = np.asarray(
        fused_assign(
            img, pal, jnp.float32(0.0), mode="replace", interpret=True,
            metric="cie2000",
        )
    )
    fast = np.asarray(
        fused_assign(
            img, pal, jnp.float32(0.0), mode="replace", interpret=True,
            metric="cie2000", fast=True,
        )
    )
    assert (fast != exact).mean() < 5e-3
    # (b)+(c): masked palette with k_active <= m
    ka = 6
    exact_m = np.asarray(
        fused_assign(
            img, pal, jnp.float32(0.0), k_active=ka, mode="replace",
            interpret=True, metric="cie2000",
        )
    )
    fast_m = np.asarray(
        fused_assign(
            img, pal, jnp.float32(0.0), k_active=ka, mode="replace",
            interpret=True, metric="cie2000", fast=True,
        )
    )
    assert fast_m.max() < ka
    np.testing.assert_array_equal(fast_m, exact_m)


def test_prune_packed_and_frames_match_single():
    """The pruned tier must compose with the in-kernel bit pack and the
    per-frame-palette batch mode: packed words unpack to the same index
    map as fused_assign, and the frame batch matches per-frame
    launches."""
    from kmeans_tpu.ops.kernels import (
        fused_assign,
        fused_assign_frames_packed,
        fused_assign_packed,
        fused_quantize_frames,
        quant_tile_rows,
    )
    from kmeans_tpu.utils.packing import pack_bits, unpack_tile_words

    h, w, kp = 24, 40, 20
    img = _image(h, w, seed=9)
    pal = _palette(kp, seed=10)
    idx = np.asarray(
        fused_assign(
            img, pal, jnp.float32(0.0), mode="replace", interpret=True,
            metric="cie2000", fast=True,
        )
    )
    words = fused_assign_packed(
        img, pal, jnp.float32(0.0), mode="replace", interpret=True,
        metric="cie2000", fast=True,
    )
    got = unpack_tile_words(
        np.asarray(words), h, w, pack_bits(kp), tile_rows=quant_tile_rows(kp)
    )
    np.testing.assert_array_equal(got, idx)

    frames = jnp.stack([_image(h, w, seed=11), _image(h, w, seed=12)])
    pals = jnp.stack([pal, _palette(kp, seed=13)])
    thrs = jnp.zeros(2, jnp.float32)
    batch = np.asarray(
        fused_quantize_frames(
            frames, pals, thrs, mode="replace", interpret=True,
            metric="cie2000", fast=True,
        )
    )
    for f in range(2):
        solo = np.asarray(
            fused_quantize(
                frames[f], pals[f], jnp.float32(0.0), mode="replace",
                interpret=True, metric="cie2000", fast=True,
            )
        )
        np.testing.assert_array_equal(batch[f], solo, err_msg=f"frame {f}")
    wordsb = fused_assign_frames_packed(
        frames, pals, thrs, mode="replace", interpret=True,
        metric="cie2000", fast=True,
    )
    for f in range(2):
        gotb = unpack_tile_words(
            np.asarray(wordsb[f]), h, w, pack_bits(kp),
            tile_rows=quant_tile_rows(kp),
        )
        solo_idx = np.asarray(
            fused_assign(
                frames[f], pals[f], jnp.float32(0.0), mode="replace",
                interpret=True, metric="cie2000", fast=True,
            )
        )
        np.testing.assert_array_equal(gotb, solo_idx, err_msg=f"frame {f}")


def test_fused_meld_packed_matches_rgba():
    """The in-kernel RGB byte pack (meld's 3 B/px compact readback) must
    unpack to EXACTLY the RGBA kernel's output — it is a byte-layout
    change, not a numeric one — across palette sizes on both sides of
    the tile split and with k_active masking."""
    from kmeans_tpu.ops.kernels import (
        fused_meld_packed,
        fused_quantize,
        quant_tile_rows,
    )
    from kmeans_tpu.utils.packing import unpack_rgb24_tile_words

    for h, w, kp, ka in ((16, 24, 5, None), (33, 77, 20, None), (24, 40, 8, 3)):
        img = _image(h, w, seed=kp)
        pal = _palette(kp, seed=kp + 1)
        want = np.asarray(
            fused_quantize(
                img, pal, jnp.float32(0.0), k_active=ka, mode="meld",
                interpret=True,
            )
        )
        words = fused_meld_packed(img, pal, k_active=ka, interpret=True)
        got = unpack_rgb24_tile_words(
            np.asarray(words), h, w, tile_rows=quant_tile_rows(kp)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"kp={kp}")


def test_unpack_meld_api_helper():
    """api._unpack_meld consults the same kp-keyed tile height as the
    kernel (a drift here garbles pixels silently)."""
    from kmeans_tpu.api import _unpack_meld
    from kmeans_tpu.ops.kernels import fused_meld_packed, fused_quantize

    img = _image(20, 30, seed=3)
    pal = _palette(6, seed=4)
    want = np.asarray(
        fused_quantize(img, pal, jnp.float32(0.0), mode="meld", interpret=True)
    )
    words = fused_meld_packed(img, pal, interpret=True)
    np.testing.assert_array_equal(
        _unpack_meld(np.asarray(words), 20, 30, 6), want
    )


def test_k1024_tier_routing_and_quantize():
    """The reference accepts any -c >= 1 (cli/src/args.rs validate_k has
    no upper bound); above 512 this repo routes training to the chunked
    XLA trainer (the accumulator raises past ACCUM_MAX_K) and quantize to
    the chunk-unrolled kernel — since late round 4 THROUGH the 16-bit
    packed-index tier (INDEXED_MAX_K = 1024: 2 B/px readback instead of
    full RGBA). Pin the routing and exercise the kernel at kp=1024 in
    interpret mode."""
    import kmeans_tpu.api as api
    from kmeans_tpu.models import kmeans as km
    from kmeans_tpu.ops.kernels import ACCUM_MAX_K, lloyd_accumulate

    # training route: k=1024 past the element budget -> fit_chunked
    big_n = api._CHUNKED_TRAIN_ELEMS // 1024 + 1
    assert api._sharded_trainer_route(big_n, 1024, True, "cie94") == "chunked"
    assert not api._plain_fit_route(big_n, 1024, True, "cie94")
    routed = []
    real = km.fit_chunked

    def spy(*a, **k):
        routed.append(True)
        return real(*a, **k)

    km_fit_chunked = km.fit_chunked
    try:
        km.fit_chunked = spy
        work = jnp.asarray(
            np.random.default_rng(0).uniform(0, 100, (2048, 3)), jnp.float32
        )
        # monkeypatch-free: force the budget branch with a tiny threshold
        old = api._CHUNKED_TRAIN_ELEMS
        api._CHUNKED_TRAIN_ELEMS = 1
        try:
            api._fit_auto(work, 1024, 0, 1.0, use_pallas=True)
        finally:
            api._CHUNKED_TRAIN_ELEMS = old
    finally:
        km.fit_chunked = km_fit_chunked
    assert routed == [True]

    # the accumulator's documented cap
    assert ACCUM_MAX_K == 512
    with pytest.raises(ValueError, match="k <= 512"):
        lloyd_accumulate(
            jnp.zeros((3, 128, 128), jnp.float32),
            jnp.zeros((1024, 3), jnp.float32),
            128 * 128,
        )

    # quantize kernel at kp=1024: the chunk-unrolled centroid loop serves
    # any kp; outputs must match the XLA quantizer bit-for-bit.
    img = _image(16, 24, seed=40)
    pal = _palette(1024, seed=41)
    want = np.asarray(quantize_image(img, pal, mode="replace"))
    got = np.asarray(
        fused_quantize(img, pal, jnp.float32(0.0), mode="replace",
                       interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_fused_meld_frames_packed_matches_per_frame():
    """Frame-batched RGB24-packed meld must equal B single-frame
    `fused_meld_packed` launches in interpret mode (per-frame palettes,
    per-frame k_active) — each frame's word slice has exactly the
    single-frame layout."""
    from kmeans_tpu.ops.kernels import (
        fused_meld_frames_packed,
        fused_meld_packed,
        quant_tile_rows,
    )
    from kmeans_tpu.utils.packing import unpack_rgb24_tile_words

    b, h, w, kp = 3, 22, 37, 20
    frames = np.stack([_image(h, w, seed=10 + f) for f in range(b)])
    pals = np.stack([_palette(kp, seed=20 + f) for f in range(b)])
    kas = np.array([kp, 7, 12], np.int32)
    words = fused_meld_frames_packed(
        jnp.asarray(frames), jnp.asarray(pals), k_actives=jnp.asarray(kas),
        interpret=True,
    )
    words_np = np.asarray(words)
    for f in range(b):
        solo = fused_meld_packed(
            jnp.asarray(frames[f]), jnp.asarray(pals[f]),
            k_active=int(kas[f]), interpret=True,
        )
        got = unpack_rgb24_tile_words(
            words_np[f], h, w, tile_rows=quant_tile_rows(kp)
        )
        want = unpack_rgb24_tile_words(
            np.asarray(solo), h, w, tile_rows=quant_tile_rows(kp)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"frame {f}")


def test_fused_assign_packed_emit_distance():
    """`emit_distance=True` (the k > 512 two-half building block) must
    return the winning distance plane alongside the packed words: the
    words are unchanged from the plain call, and per pixel the distance
    equals the masked minimum of the kernel's own plane distance formula
    over active candidates."""
    from kmeans_tpu.ops.kernels import (
        _cie94_sq_planes,
        fused_assign_packed,
        gamma_lut_values,
        quant_tile_rows,
    )
    from kmeans_tpu.utils.packing import pack_bits, unpack_tile_words

    h, w, k, ka = 21, 37, 9, 7
    img = _image(h, w, seed=3)
    pal = _palette(k, seed=4)
    plain = np.asarray(
        fused_assign_packed(img, pal, 9.0, k_active=ka, interpret=True)
    )
    words, dists = fused_assign_packed(
        img, pal, 9.0, k_active=ka, interpret=True, emit_distance=True
    )
    np.testing.assert_array_equal(np.asarray(words), plain)
    idx = unpack_tile_words(
        np.asarray(words), h, w, pack_bits(k), tile_rows=quant_tile_rows(k)
    )
    # Expected: min over ACTIVE candidates of the same plane formula on
    # the same LUT-gamma Lab values the kernel uses.
    lut = np.asarray(gamma_lut_values()).reshape(-1)[:256]
    px = np.asarray(img).astype(np.int64)
    rl, gl, bl = lut[px[..., 0]], lut[px[..., 1]], lut[px[..., 2]]
    from kmeans_tpu.ops.kernels import _lab_from_linear_planes

    l_p, a_p, b_p = (
        np.asarray(x)
        for x in _lab_from_linear_planes(
            jnp.asarray(rl, jnp.float32),
            jnp.asarray(gl, jnp.float32),
            jnp.asarray(bl, jnp.float32),
        )
    )
    pal_np = np.asarray(pal)
    d_all = np.stack(
        [
            np.asarray(
                _cie94_sq_planes(
                    jnp.asarray(l_p), jnp.asarray(a_p), jnp.asarray(b_p),
                    jnp.float32(pal_np[j, 0]), jnp.float32(pal_np[j, 1]),
                    jnp.float32(pal_np[j, 2]),
                )
            )
            for j in range(ka)
        ]
    )
    d_flat = np.asarray(dists).reshape(-1)[: h * w].reshape(h, w)
    # The kernel hoists the pixel-side CIE94 terms out of the loop
    # (t = dcab/sc; t*t) while _cie94_sq_planes squares the quotient
    # directly — same math, ~1e-5 relative rounding skew.
    np.testing.assert_allclose(d_flat, d_all.min(0), rtol=1e-4, atol=1e-4)
    # The emitted distance is the distance OF the emitted index.
    d_sel = np.take_along_axis(d_all, idx[None].astype(np.int64), 0)[0]
    np.testing.assert_allclose(d_flat, d_sel, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["replace", "dither"])
@pytest.mark.parametrize("metric", ["cie94", "cie2000"])
def test_two_half_quantize_matches_single_kernel(mode, metric):
    """512 < k <= 1024 as two <= 512-half launches + XLA argmin merge
    must reproduce the single rolled kernel bit-for-bit in interpret
    mode on the EXACT tiers (per-candidate distances are the same
    formulas; the merge's strict-less-on-B rule is the loop's first-min
    semantics). Covers k_active straddling and inside half A."""
    from kmeans_tpu.ops.kernels import fused_quantize_two_half

    k = 516
    img = _image(18, 30, seed=6)
    pal = _palette(k, seed=7)
    thr = dither_threshold(pal)
    for ka in (k, 514, 300):
        want = np.asarray(
            fused_quantize(
                img, pal, thr, k_active=ka, mode=mode, interpret=True,
                metric=metric,
            )
        )
        got = np.asarray(
            fused_quantize_two_half(
                img, pal, thr, k_active=ka, mode=mode, interpret=True,
                metric=metric,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"k_active={ka}")


@pytest.mark.parametrize("metric", ["cie94", "cie2000"])
def test_two_half_quantize_fast_tier(metric):
    """fast=True two-half runs BOTH halves in the fast tier (half B is
    padded to 512 rows so the tiers can't mix — a factorized half and
    an exact half would emit distances on different scales and corrupt
    the merge). The single kernel above 512 silently ignores `fast`, so
    the comparison bar is the fast tiers' documented one: every output
    pixel is a palette color and knife-edge flips vs exact are rare."""
    from kmeans_tpu.ops.colorspace import lab_to_srgb8
    from kmeans_tpu.ops.kernels import fused_quantize_two_half

    k = 516
    img = _image(18, 30, seed=8)
    pal = _palette(k, seed=9)
    thr = dither_threshold(pal)
    exact = np.asarray(
        fused_quantize_two_half(
            img, pal, thr, mode="replace", interpret=True, metric=metric
        )
    )
    got = np.asarray(
        fused_quantize_two_half(
            img, pal, thr, mode="replace", interpret=True, fast=True,
            metric=metric,
        )
    )
    rgb8 = np.asarray(lab_to_srgb8(pal))
    palette_rgba = {
        (r, g, b, 255) for r, g, b in map(tuple, rgb8.tolist())
    }
    out_px = {tuple(p) for p in got.reshape(-1, 4).tolist()}
    assert out_px <= palette_rgba  # every pixel is a palette color
    flips = (exact != got).any(axis=-1).mean()
    assert flips <= 2e-3, f"fast-tier flips {flips:.4%}"


def test_two_half_quantize_validates():
    from kmeans_tpu.ops.kernels import fused_quantize_two_half

    img = _image(8, 8)
    with pytest.raises(ValueError, match="512 < k <= 1024"):
        fused_quantize_two_half(img, _palette(512), 9.0, interpret=True)
    with pytest.raises(ValueError, match="replace/dither"):
        fused_quantize_two_half(
            img, _palette(513), 9.0, mode="meld", interpret=True
        )


@pytest.mark.parametrize("mode", ["replace", "dither"])
def test_halves_quantize_matches_xla_above_cap(mode):
    """k > QUANT_MAX_KP routes `fused_quantize` through the N-half
    decomposition (the single kernel program cannot compile there —
    tools/exp_k2048.py); the exact tier must stay bit-equal to the XLA
    quantizer, including k_active straddles of the 1024 boundary."""
    from kmeans_tpu.ops.kernels import QUANT_MAX_KP
    from kmeans_tpu.ops.quantize import quantize_image

    k = QUANT_MAX_KP + 8
    img = _image(10, 14, seed=11)
    pal = _palette(k, seed=12)
    thr = dither_threshold(pal)
    for ka in (k, QUANT_MAX_KP + 1, 1000):
        want = np.asarray(
            quantize_image(img, pal, mode=mode, k_active=ka)
        )
        got = np.asarray(
            fused_quantize(
                img, pal, thr, k_active=ka, mode=mode, interpret=True
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"k_active={ka}")


def test_fused_meld_rejects_above_cap():
    """No meld kernel program exists above QUANT_MAX_KP (compile-crash
    class); both entry points must reject with a clean error instead of
    reaching the crashing compile."""
    from kmeans_tpu.ops.kernels import QUANT_MAX_KP, fused_meld_packed

    img = _image(8, 8)
    pal = _palette(QUANT_MAX_KP + 1)
    with pytest.raises(ValueError, match="fused meld supports k <="):
        fused_meld_packed(img, pal, interpret=True)
    with pytest.raises(ValueError, match="fused meld supports k <="):
        fused_quantize(img, pal, 0.0, mode="meld", interpret=True)


def test_halves_quantize_validates():
    from kmeans_tpu.ops.kernels import QUANT_MAX_KP, fused_quantize_halves

    img = _image(8, 8)
    with pytest.raises(ValueError, match="requires k >"):
        fused_quantize_halves(img, _palette(512), 0.0, half=512, interpret=True)
    with pytest.raises(ValueError, match="half must be"):
        fused_quantize_halves(
            img, _palette(3000), 0.0, half=2048, interpret=True
        )
    with pytest.raises(ValueError, match="replace/dither"):
        fused_quantize_halves(
            img, _palette(1030), 0.0, mode="meld", interpret=True
        )


def test_frames_fused_gate_respects_quant_cap():
    """b=1 frame batches at kp > QUANT_MAX_KP fit the B*KP SMEM budget
    but the per-frame kernel program cannot compile — the fused-frames
    gate must refuse them."""
    from kmeans_tpu.api import ImageProcessor, ReduceMode

    p = ImageProcessor.__new__(ImageProcessor)
    p.fused = True
    assert not p._frames_fused_ok(1, 2048, ReduceMode.MELD)
    assert p._frames_fused_ok(2, 1024, ReduceMode.MELD)
