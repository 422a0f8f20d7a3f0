"""Output-mode tests: replace/dither/meld formulas vs. straightforward
numpy re-derivations of the reference WGSL (`mix_colors.wgsl`, `swap.wgsl`)."""

import jax.numpy as jnp
import numpy as np

from kmeans_tpu.ops.colorspace import srgb8_to_lab
from kmeans_tpu.ops.delta_e import distance_cie94
from kmeans_tpu.ops.quantize import (
    BAYER_4X4,
    bayer_values,
    dither,
    dither_threshold,
    meld,
    nearest_color,
    quantize_image,
)


def _d94(a, b):
    return float(distance_cie94(jnp.asarray(a), jnp.asarray(b)))


def _np_dither_threshold(palette):
    """Literal transcription of mix_colors.wgsl:52-68."""
    a, b = palette[0], palette[1]
    dab = _d94(a, b)
    for i in range(2, len(palette)):
        ci = palette[i]
        da = _d94(ci, a)
        db = _d94(ci, b)
        if da > db and da > dab:
            dab, b = da, ci
        elif db > dab:
            dab, a = db, ci
    return dab / np.sqrt(len(palette))


def test_bayer_matrix_values():
    bv = np.asarray(bayer_values(8, 8))
    m = np.asarray(BAYER_4X4, np.float32) / 16.0 - 0.5
    np.testing.assert_allclose(bv[:4, :4], m, atol=1e-7)
    np.testing.assert_allclose(bv[4:8, 4:8], m, atol=1e-7)  # tiles with period 4


def test_dither_threshold_matches_greedy():
    rng = np.random.default_rng(5)
    for k in [2, 3, 5, 8, 16]:
        pal = rng.normal(50, 30, size=(k, 3)).astype(np.float32)
        expected = _np_dither_threshold(pal)
        got = float(dither_threshold(jnp.asarray(pal)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_nearest_color_exact():
    rng = np.random.default_rng(6)
    pal = rng.normal(50, 30, size=(5, 3)).astype(np.float32)
    pts = rng.normal(50, 30, size=(40, 3)).astype(np.float32)
    out = np.asarray(nearest_color(jnp.asarray(pts), jnp.asarray(pal)))
    for i, p in enumerate(pts):
        dists = [_d94(p, c) for c in pal]
        np.testing.assert_allclose(out[i], pal[int(np.argmin(dists))], atol=1e-6)


def test_meld_formula():
    pal = np.array([[20.0, 0, 0], [80.0, 0, 0], [50.0, 40, 0]], np.float32)
    pts = np.array([[45.0, 5.0, 0.0]], np.float32)
    out = np.asarray(meld(jnp.asarray(pts), jnp.asarray(pal)))[0]
    # numpy re-derivation (mix_colors.wgsl:29-47,85-90)
    d = [_d94(pts[0], c) for c in pal]
    order = np.argsort(d, kind="stable")
    closest, second = pal[order[0]], pal[order[1]]
    factor = _d94(pts[0], second) / _d94(closest, second)
    expected = factor * closest + (1 - factor) * second
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_k1_short_circuit():
    pal = jnp.asarray(np.array([[50.0, 10.0, -10.0]], np.float32))
    lab = jnp.zeros((4, 4, 3))
    for fn in (dither, meld):
        out = np.asarray(fn(lab, pal))
        np.testing.assert_allclose(
            out, np.broadcast_to(np.asarray(pal)[0], out.shape), atol=1e-6
        )


def test_quantize_image_replace_k_colors():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8)
    pal_u8 = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0]], np.uint8)
    pal_lab = srgb8_to_lab(jnp.asarray(pal_u8))
    out = np.asarray(quantize_image(jnp.asarray(img), pal_lab, mode="replace"))
    uniq = np.unique(out.reshape(-1, 4), axis=0)
    assert len(uniq) <= 3
    assert (uniq[:, 3] == 255).all()


def test_quantize_alpha_is_opaque():
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 3] = 17  # transparent input
    pal_lab = srgb8_to_lab(jnp.asarray(np.array([[1, 2, 3]], np.uint8)))
    out = np.asarray(quantize_image(jnp.asarray(img), pal_lab, mode="replace"))
    assert (out[..., 3] == 255).all()  # reference stores alpha 1.0


def test_dither_changes_pixels_vs_replace():
    # A mid-gray image between two palette colors must dither into a mix.
    img = np.full((16, 16, 4), 128, np.uint8)
    img[..., 3] = 255
    pal_lab = srgb8_to_lab(
        jnp.asarray(np.array([[0, 0, 0], [255, 255, 255]], np.uint8))
    )
    rep = np.asarray(quantize_image(jnp.asarray(img), pal_lab, mode="replace"))
    dit = np.asarray(quantize_image(jnp.asarray(img), pal_lab, mode="dither"))
    assert len(np.unique(rep.reshape(-1, 4), axis=0)) == 1
    assert len(np.unique(dit.reshape(-1, 4), axis=0)) == 2  # checkered mix


def test_meld_chunked_matches_block():
    # K > 64 routes through the row-chunked meld; results must equal the
    # unchunked computation (chunking only bounds the intermediate).
    from kmeans_tpu.ops.quantize import _meld_block, meld

    rng = np.random.default_rng(6)
    lab = jnp.asarray(rng.normal(50, 20, (37, 29, 3)).astype(np.float32))
    palette = jnp.asarray(rng.normal(50, 20, (70, 3)).astype(np.float32))
    chunked = np.asarray(meld(lab, palette))
    block = np.asarray(_meld_block(lab, palette))
    np.testing.assert_allclose(chunked, block, rtol=1e-6, atol=1e-4)
    # k_active masking still honored through the chunked path.
    chunked_ka = np.asarray(meld(lab, palette, k_active=65))
    block_ka = np.asarray(_meld_block(lab, palette, k_active=65))
    np.testing.assert_allclose(chunked_ka, block_ka, rtol=1e-6, atol=1e-4)


def test_quantize_image_cie2000_metric():
    """metric='cie2000' quantizes with CIEDE2000 assignment: output pixels
    are palette colors, and a crafted pixel assigns differently from CIE94
    where the metrics disagree."""
    import jax.numpy as jnp
    import numpy as np

    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.quantize import quantize_image

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 256, (24, 32, 4), dtype=np.uint8))
    pal = srgb8_to_lab(jnp.asarray(rng.integers(0, 256, (6, 3), dtype=np.uint8)))
    for mode in ("replace", "dither", "meld"):
        out = np.asarray(quantize_image(img, pal, mode=mode, metric="cie2000"))
        assert out.shape == (24, 32, 4)
        assert (out[..., 3] == 255).all()
    out94 = np.asarray(quantize_image(img, pal, mode="replace"))
    out00 = np.asarray(quantize_image(img, pal, mode="replace", metric="cie2000"))
    pal_rgba = set(
        map(tuple, np.unique(out94.reshape(-1, 4), axis=0))
    ) | set(map(tuple, np.unique(out00.reshape(-1, 4), axis=0)))
    got = set(map(tuple, np.unique(out00.reshape(-1, 4), axis=0)))
    assert got <= pal_rgba
    # The two metrics weigh chroma/hue differently; on random data some
    # pixels land in different clusters.
    assert (out94 != out00).any()
