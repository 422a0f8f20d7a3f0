"""CIE delta-E color difference metrics.

TPU-native reimplementation of the reference's shared WGSL include
`core/shaders/functions/delta_e.wgsl:1-97`:

- `distance_cie94` (delta_e.wgsl:1-22) is THE distance metric used by every
  compute kernel in the reference (assignment, k-means++ seeding, dither,
  meld, convergence). Note it is *asymmetric*: the S_C and S_H weights are
  derived from the chroma of the FIRST argument only (the reference always
  passes the pixel/candidate first and the centroid second).
- `distance_cie2000` (delta_e.wgsl:24-97) is implemented but only exercised
  by unit tests in the reference; same here. We implement the standard
  Sharma formulation; the reference's WGSL has a sign quirk in the
  delta-h-prime branch for |dh| > 180 and h2 <= h1 which the standard
  formula corrects (the reference's own golden test pairs do not hit that
  branch, so both pass the same tests).

These are pure jnp functions designed to broadcast: pass `lab1[..., None, :]`
against `lab2[k, 3]` to get a `[..., k]` distance matrix that XLA fuses with
the following argmin, so the matrix never materialises in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp

_K1 = 0.045
_K2 = 0.015


def distance_cie94(lab1: jnp.ndarray, lab2: jnp.ndarray) -> jnp.ndarray:
    """CIE94 delta-E between Lab colors (last axis = [L, a, b]).

    Asymmetric, matching delta_e.wgsl:1-22: S_C/S_H use C1 (first arg).
    Broadcasts over leading axes.
    """
    lab1 = jnp.asarray(lab1, jnp.float32)
    lab2 = jnp.asarray(lab2, jnp.float32)
    dl = lab1[..., 0] - lab2[..., 0]
    da = lab1[..., 1] - lab2[..., 1]
    db = lab1[..., 2] - lab2[..., 2]

    c1 = jnp.sqrt(lab1[..., 1] ** 2 + lab1[..., 2] ** 2)
    c2 = jnp.sqrt(lab2[..., 1] ** 2 + lab2[..., 2] ** 2)
    dcab = c1 - c2

    dhab_sq = jnp.maximum(da * da + db * db - dcab * dcab, 0.0)

    sc = 1.0 + _K1 * c1
    sh = 1.0 + _K2 * c1

    return jnp.sqrt(dl * dl + (dcab / sc) ** 2 + dhab_sq / (sh * sh))


def distance_cie94_sq(lab1: jnp.ndarray, lab2: jnp.ndarray) -> jnp.ndarray:
    """Squared CIE94 delta-E. Monotone in `distance_cie94`, so argmin/argmax
    selections are identical while skipping the sqrt — used on the hot
    assignment path."""
    lab1 = jnp.asarray(lab1, jnp.float32)
    lab2 = jnp.asarray(lab2, jnp.float32)
    dl = lab1[..., 0] - lab2[..., 0]
    da = lab1[..., 1] - lab2[..., 1]
    db = lab1[..., 2] - lab2[..., 2]

    c1 = jnp.sqrt(lab1[..., 1] ** 2 + lab1[..., 2] ** 2)
    c2 = jnp.sqrt(lab2[..., 1] ** 2 + lab2[..., 2] ** 2)
    dcab = c1 - c2

    dhab_sq = jnp.maximum(da * da + db * db - dcab * dcab, 0.0)

    sc = 1.0 + _K1 * c1
    sh = 1.0 + _K2 * c1

    return dl * dl + (dcab / sc) ** 2 + dhab_sq / (sh * sh)


def distance_cie2000(lab1: jnp.ndarray, lab2: jnp.ndarray) -> jnp.ndarray:
    """CIEDE2000 delta-E (Sharma et al. formulation; delta_e.wgsl:24-97).

    Deliberate deviation: the reference shader (dead code upstream — never
    wired into a pipeline) has two bugs this implementation does NOT
    reproduce: its hue guard tests `a1Prime` twice instead of `lab1.b`
    (delta_e.wgsl:52), and its delta-h wrap yields `dh` instead of
    `dh + 360` when |dh| > 180 with h2 <= h1 (delta_e.wgsl:60-66). This
    repo implements Sharma et al. correctly (validated against the
    published test pairs in tests/test_delta_e.py); do not "fix" it back
    to the buggy shader form for parity's sake."""
    return jnp.sqrt(distance_cie2000_sq(lab1, lab2))


def distance_cie2000_sq(lab1: jnp.ndarray, lab2: jnp.ndarray) -> jnp.ndarray:
    """Squared CIEDE2000. Always >= 0 (the R_T cross term satisfies
    |R_T| <= 2, so a^2 + b^2 + R_T*a*b >= (|a| - |b|)^2), and sqrt is
    monotone — argmin selections over the squared form match the full
    metric while skipping the final sqrt on the hot path."""
    lab1 = jnp.asarray(lab1, jnp.float32)
    lab2 = jnp.asarray(lab2, jnp.float32)
    l1, a1, b1 = lab1[..., 0], lab1[..., 1], lab1[..., 2]
    l2, a2, b2 = lab2[..., 0], lab2[..., 1], lab2[..., 2]

    deg360 = jnp.float32(jnp.deg2rad(360.0))
    deg180 = jnp.float32(jnp.deg2rad(180.0))
    pow25_7 = jnp.float32(6103515625.0)  # 25^7

    c1 = jnp.sqrt(a1 * a1 + b1 * b1)
    c2 = jnp.sqrt(a2 * a2 + b2 * b2)
    bar_c = (c1 + c2) / 2.0
    bar_c7 = bar_c ** 7
    g = 0.5 * (1.0 - jnp.sqrt(bar_c7 / (bar_c7 + pow25_7)))

    a1p = (1.0 + g) * a1
    a2p = (1.0 + g) * a2
    c1p = jnp.sqrt(a1p * a1p + b1 * b1)
    c2p = jnp.sqrt(a2p * a2p + b2 * b2)

    def hue(b, ap):
        h = jnp.arctan2(b, ap)
        h = jnp.where(h < 0.0, h + deg360, h)
        return jnp.where((b == 0.0) & (ap == 0.0), 0.0, h)

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
    d_big_h = 2.0 * jnp.sqrt(c1p * c2p) * jnp.sin(dhp / 2.0)

    bar_lp = (l1 + l2) / 2.0
    bar_cp = (c1p + c2p) / 2.0

    h_sum = h1p + h2p
    bar_h = jnp.where(
        abs_dh > deg180,
        jnp.where(h_sum < deg360, (h_sum + deg360) / 2.0, (h_sum - deg360) / 2.0),
        h_sum / 2.0,
    )
    bar_h = jnp.where(c1p * c2p == 0.0, h_sum, bar_h)

    rad = jnp.deg2rad
    t = (
        1.0
        - 0.17 * jnp.cos(bar_h - jnp.float32(rad(30.0)))
        + 0.24 * jnp.cos(2.0 * bar_h)
        + 0.32 * jnp.cos(3.0 * bar_h + jnp.float32(rad(6.0)))
        - 0.20 * jnp.cos(4.0 * bar_h - jnp.float32(rad(63.0)))
    )

    d_theta = jnp.float32(rad(30.0)) * jnp.exp(
        -(((bar_h - jnp.float32(rad(275.0))) / jnp.float32(rad(25.0))) ** 2)
    )
    bar_cp7 = bar_cp ** 7
    r_c = 2.0 * jnp.sqrt(bar_cp7 / (bar_cp7 + pow25_7))
    lm50 = (bar_lp - 50.0) ** 2
    s_l = 1.0 + (0.015 * lm50) / jnp.sqrt(20.0 + lm50)
    s_c = 1.0 + 0.045 * bar_cp
    s_h = 1.0 + 0.015 * bar_cp * t
    r_t = -jnp.sin(2.0 * d_theta) * r_c

    return jnp.maximum(
        (dlp / s_l) ** 2
        + (dcp / s_c) ** 2
        + (d_big_h / s_h) ** 2
        + r_t * (dcp / s_c) * (d_big_h / s_h),
        0.0,
    )


# Selectable distance metric (TPU-first extension: the reference implements
# CIEDE2000 in delta_e.wgsl:24-97 but only ever calls CIE94 from its
# kernels; here `delta_e="2000"` makes it usable end-to-end).
METRICS = {
    "cie94": (distance_cie94, distance_cie94_sq),
    "cie2000": (distance_cie2000, distance_cie2000_sq),
}


def metric_fns(name: str):
    """(distance, distance_sq) pair for a metric name."""
    try:
        return METRICS[name]
    except KeyError:
        raise ValueError(
            f"unknown delta-E metric {name!r}; expected one of {sorted(METRICS)}"
        ) from None
