"""Sound CIEDE2000 screening bounds: can an EXACT fast tier exist?

STATUS.md (round 4) records that the only road past the exact
chunked-loop accumulator's 1.3x is screening, and that an EXACT screen
needs a provable CIEDE2000 lower bound. This experiment builds that
bound and measures whether it is tight enough to be useful.

The bound avoids the expensive part of the exact chain (atan2 + the
four-cosine T polynomial + the Gaussian rotation angle) using three
identities:

  (dH')^2 = d'^2 - (dC')^2          # primed-plane Euclidean distance
  cos(2hbar') = (a1'a2' - b1b2) / (C1'C2')   # even harmonics are
  sin(2hbar') = (a1'b2 + a2'b1) / (C1'C2')   # algebraic (no atan2)

Everything in dE2000^2 is then exactly computable EXCEPT the odd
harmonics of T (0.17 cos(hbar'-30) and 0.32 cos(3hbar'+6)) and the
Gaussian dtheta term, which depend on hbar' only through a TWO-VALUED
ambiguity (hbar' is known mod 180 from its double angle; the CIEDE2000
hue-mean wrap rule picks one of the two). Evaluating both candidates
and taking the min/max yields sound lower/upper bounds [LB, UB] with
dE^2 guaranteed inside (up to f32 rounding, covered by a relative
margin).

Measured questions:
  1. Soundness: LB <= dE^2 <= UB on millions of random pairs (f64/f32).
  2. Tightness: distribution of UB/LB.
  3. Screening power: for realistic (image pixel, trained palette)
     workloads at k=128/256, how many candidates have
     LB <= min_c UB(c)? (The kernel architecture needs a FIXED M
     survivor cap — if the 99.999th percentile of that count exceeds
     the pruned tier's M=8/16, a sound screen cannot beat the landed
     factorized-CIE94 screen within the same architecture.)

Run: python tools/exp_sound_screen.py [n_random=2000000]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def cie2000_sq_ref(lab1, lab2):
    """Reference exact dE2000^2 (float64 numpy, standard formula —
    mirrors ops/delta_e.distance_cie2000's math in f64)."""
    L1, a1, b1 = lab1[..., 0], lab1[..., 1], lab1[..., 2]
    L2, a2, b2 = lab2[..., 0], lab2[..., 1], lab2[..., 2]
    C1 = np.hypot(a1, b1)
    C2 = np.hypot(a2, b2)
    Cbar = 0.5 * (C1 + C2)
    c7 = Cbar**7
    G = 0.5 * (1.0 - np.sqrt(c7 / (c7 + 25.0**7)))
    a1p = a1 * (1.0 + G)
    a2p = a2 * (1.0 + G)
    C1p = np.hypot(a1p, b1)
    C2p = np.hypot(a2p, b2)
    h1p = np.degrees(np.arctan2(b1, a1p)) % 360.0
    h2p = np.degrees(np.arctan2(b2, a2p)) % 360.0
    dLp = L2 - L1
    dCp = C2p - C1p
    dhp = h2p - h1p
    dhp = np.where(dhp > 180.0, dhp - 360.0, dhp)
    dhp = np.where(dhp < -180.0, dhp + 360.0, dhp)
    dhp = np.where((C1p * C2p) == 0.0, 0.0, dhp)
    dHp = 2.0 * np.sqrt(C1p * C2p) * np.sin(np.radians(dhp) / 2.0)
    Lbar = 0.5 * (L1 + L2)
    Cbarp = 0.5 * (C1p + C2p)
    hsum = h1p + h2p
    habs = np.abs(h1p - h2p)
    hbar = np.where(
        (C1p * C2p) == 0.0,
        hsum,
        np.where(
            habs <= 180.0,
            0.5 * hsum,
            np.where(hsum < 360.0, 0.5 * (hsum + 360.0), 0.5 * (hsum - 360.0)),
        ),
    )
    T = (
        1.0
        - 0.17 * np.cos(np.radians(hbar - 30.0))
        + 0.24 * np.cos(np.radians(2.0 * hbar))
        + 0.32 * np.cos(np.radians(3.0 * hbar + 6.0))
        - 0.20 * np.cos(np.radians(4.0 * hbar - 63.0))
    )
    dtheta = 30.0 * np.exp(-(((hbar - 275.0) / 25.0) ** 2))
    c7p = Cbarp**7
    RC = 2.0 * np.sqrt(c7p / (c7p + 25.0**7))
    SL = 1.0 + 0.015 * (Lbar - 50.0) ** 2 / np.sqrt(20.0 + (Lbar - 50.0) ** 2)
    SC = 1.0 + 0.045 * Cbarp
    SH = 1.0 + 0.015 * Cbarp * T
    RT = -np.sin(np.radians(2.0 * dtheta)) * RC
    x = dCp / SC
    y = dHp / SH
    ll = dLp / SL
    return ll * ll + x * x + y * y + RT * x * y


def cie2000_sq_bounds(lab1, lab2):
    """Sound [LB, UB] for dE2000^2 without atan2/T-polynomial on the
    true hue mean: hbar' enters only via its double angle (algebraic)
    plus a two-valued half-angle ambiguity, evaluated both ways."""
    L1, a1, b1 = lab1[..., 0], lab1[..., 1], lab1[..., 2]
    L2, a2, b2 = lab2[..., 0], lab2[..., 1], lab2[..., 2]
    C1 = np.hypot(a1, b1)
    C2 = np.hypot(a2, b2)
    Cbar = 0.5 * (C1 + C2)
    c7 = Cbar**7
    G = 0.5 * (1.0 - np.sqrt(c7 / (c7 + 25.0**7)))
    a1p = a1 * (1.0 + G)
    a2p = a2 * (1.0 + G)
    C1p = np.hypot(a1p, b1)
    C2p = np.hypot(a2p, b2)
    prod = C1p * C2p
    safe = np.where(prod == 0.0, 1.0, prod)

    dLp = L2 - L1
    dCp = C2p - C1p
    # (dH')^2 via the primed-plane chord — exact, no angles.
    dsq = (a2p - a1p) ** 2 + (b2 - b1) ** 2
    dHp_sq = np.maximum(dsq - dCp * dCp, 0.0)
    dHp_sq = np.where(prod == 0.0, 0.0, dHp_sq)
    dHp_abs = np.sqrt(dHp_sq)

    Lbar = 0.5 * (L1 + L2)
    Cbarp = 0.5 * (C1p + C2p)
    # Even harmonics of the hue mean: algebraic.
    cos2h = (a1p * a2p - b1 * b2) / safe
    sin2h = (a1p * b2 + a2p * b1) / safe
    # Two candidates for hbar' (mod 360): half angles of (cos2h, sin2h).
    h2x = np.degrees(np.arctan2(sin2h, cos2h)) % 360.0  # = 2*hbar mod 360
    cand = np.stack([0.5 * h2x, 0.5 * h2x + 180.0], axis=0)

    def T_of(h):
        return (
            1.0
            - 0.17 * np.cos(np.radians(h - 30.0))
            + 0.24 * np.cos(np.radians(2.0 * h))
            + 0.32 * np.cos(np.radians(3.0 * h + 6.0))
            - 0.20 * np.cos(np.radians(4.0 * h - 63.0))
        )

    T_c = T_of(cand)
    T_lo, T_hi = np.min(T_c, axis=0), np.max(T_c, axis=0)
    dtheta_c = 30.0 * np.exp(-(((cand - 275.0) / 25.0) ** 2))
    # dtheta is tiny except near 275 deg; max over the two candidates
    # bounds |RT| soundly (RT <= 0 always).
    dtheta_hi = np.max(dtheta_c, axis=0)
    c7p = Cbarp**7
    RC = 2.0 * np.sqrt(c7p / (c7p + 25.0**7))
    RT_abs_hi = np.sin(np.radians(2.0 * dtheta_hi)) * RC

    SL = 1.0 + 0.015 * (Lbar - 50.0) ** 2 / np.sqrt(20.0 + (Lbar - 50.0) ** 2)
    SC = 1.0 + 0.045 * Cbarp
    SH_lo = 1.0 + 0.015 * Cbarp * T_lo
    SH_hi = 1.0 + 0.015 * Cbarp * T_hi

    ll = dLp / SL
    x = dCp / SC
    y_lo = dHp_abs / SH_hi
    y_hi = dHp_abs / np.maximum(SH_lo, 1e-12)
    # dE^2 = ll^2 + x^2 + y^2 + RT*x*y, RT in [-RT_abs_hi, 0],
    # y in [y_lo, y_hi] (sign folded into the cross-term bound):
    base = ll * ll + x * x
    lb = base + y_lo * y_lo - RT_abs_hi * np.abs(x) * y_hi
    # Sharper alternative: -|RT| |x||y| >= -|RT|/2 (x^2 + y^2)
    lb_amgm = base * (1.0 - 0.5 * RT_abs_hi) + y_lo * y_lo * (
        1.0 - 0.5 * RT_abs_hi
    )
    lb = np.maximum(lb, lb_amgm)
    lb = np.maximum(lb, 0.0)
    ub = base + y_hi * y_hi + RT_abs_hi * np.abs(x) * y_hi
    return lb, ub


def random_lab(rng, n):
    """Random Lab points biased to the sRGB-ish gamut box."""
    L = rng.uniform(0.0, 100.0, n)
    a = rng.uniform(-90.0, 90.0, n)
    b = rng.uniform(-90.0, 90.0, n)
    return np.stack([L, a, b], axis=-1)


def soundness(rng, n):
    lab1 = random_lab(rng, n)
    lab2 = random_lab(rng, n)
    d = cie2000_sq_ref(lab1, lab2)
    lb, ub = cie2000_sq_bounds(lab1, lab2)
    viol_lb = np.sum(lb > d * (1.0 + 1e-12) + 1e-9)
    viol_ub = np.sum(ub < d * (1.0 - 1e-12) - 1e-9)
    # An in-kernel screen would evaluate the bound in f32: compare
    # f32-computed bounds against the f64 truth with the relative
    # margin a real implementation would carry (1e-4 covers the bound
    # arithmetic's rounding; violations here = margin insufficient).
    lb32, ub32 = cie2000_sq_bounds(
        lab1.astype(np.float32).astype(np.float64),
        lab2.astype(np.float32).astype(np.float64),
    )
    lb32 = lb32.astype(np.float32).astype(np.float64)
    ub32 = ub32.astype(np.float32).astype(np.float64)
    margin = 1e-4
    viol_lb32 = np.sum(lb32 * (1.0 - margin) - 1e-6 > d)
    viol_ub32 = np.sum(ub32 * (1.0 + margin) + 1e-6 < d)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(lb > 0, ub / lb, np.inf)
    return {
        "n": int(n),
        "lb_violations": int(viol_lb),
        "ub_violations": int(viol_ub),
        "lb_violations_f32_margined": int(viol_lb32),
        "ub_violations_f32_margined": int(viol_ub32),
        "ub_over_lb_p50": float(np.percentile(ratio[np.isfinite(ratio)], 50)),
        "ub_over_lb_p95": float(np.percentile(ratio[np.isfinite(ratio)], 95)),
        "ub_over_lb_p999": float(np.percentile(ratio[np.isfinite(ratio)], 99.9)),
    }


def survivors(rng, n_pix, k):
    """Fixed-M feasibility: survivors = #candidates with LB <= min UB.
    Palette drawn from the same distribution as the pixels (a trained
    palette is a codebook of the pixel distribution — random draws are
    the pessimistic case: real Lloyd palettes spread further apart)."""
    pix = random_lab(rng, n_pix)
    pal = random_lab(rng, k)
    lb = np.empty((n_pix, k))
    ub = np.empty((n_pix, k))
    d = np.empty((n_pix, k))
    for j in range(k):
        c = np.broadcast_to(pal[j], pix.shape)
        lb[:, j], ub[:, j] = cie2000_sq_bounds(pix, c)
        d[:, j] = cie2000_sq_ref(pix, c)
    min_ub = ub.min(axis=1, keepdims=True)
    surv = (lb <= min_ub).sum(axis=1)
    # Check: true argmin always survives (it must, if bounds are sound).
    arg = d.argmin(axis=1)
    arg_lb = lb[np.arange(n_pix), arg]
    argmin_pruned = int((arg_lb > min_ub[:, 0]).sum())
    return {
        "k": k,
        "n_pix": n_pix,
        "survivors_mean": float(surv.mean()),
        "survivors_p50": float(np.percentile(surv, 50)),
        "survivors_p99": float(np.percentile(surv, 99)),
        "survivors_p999": float(np.percentile(surv, 99.9)),
        "survivors_max": int(surv.max()),
        "argmin_pruned": argmin_pruned,
    }


def survivors_trained(rng, k):
    """Same survivor statistic with a REAL workload: tokyo's Lab pixels
    against a Lloyd-trained k-palette of the same image (trained
    palettes spread their centroids, so this is the realistic case; the
    random-palette runs above are the pessimistic one)."""
    import jax.numpy as jnp

    from kmeans_tpu.models import kmeans as km
    from kmeans_tpu.ops.colorspace import srgb_to_lab
    from kmeans_tpu.ops.resize import resize_bilinear, shrunk_dimensions
    from kmeans_tpu.utils.imageio import load_image

    gfx = "/root/reference/gfx/tokyo.png"
    if not os.path.exists(gfx):
        return None
    img = load_image(gfx)
    rgb = jnp.asarray(img.pixels[..., :3], jnp.float32) / 255.0
    lab = srgb_to_lab(rgb)
    h, w = lab.shape[:2]
    # The REAL pipeline's shrink math (truncating, clamped) — an inline
    # reimplementation here trained on dimensions the actual trainer
    # never uses (round-4 review finding).
    sw, sh = shrunk_dimensions(w, h, 256)
    shrunk = resize_bilinear(lab, sh, sw).reshape(-1, 3)
    pal, _ = km.fit_restarts(
        shrunk, k, km.reference_seed_index(sw, sh)
    )
    pal = np.asarray(pal)
    pix = np.asarray(lab.reshape(-1, 3))
    pix = pix[rng.choice(pix.shape[0], 20_000, replace=False)]
    lb = np.empty((pix.shape[0], k))
    ub = np.empty((pix.shape[0], k))
    d = np.empty((pix.shape[0], k))
    for j in range(k):
        c = np.broadcast_to(pal[j].astype(np.float64), pix.shape)
        lb[:, j], ub[:, j] = cie2000_sq_bounds(pix, c)
        d[:, j] = cie2000_sq_ref(pix, c)
    min_ub = ub.min(axis=1, keepdims=True)
    surv = (lb <= min_ub).sum(axis=1)
    arg = d.argmin(axis=1)
    argmin_pruned = int((lb[np.arange(len(pix)), arg] > min_ub[:, 0]).sum())
    return {
        "k": k,
        "workload": "tokyo + trained palette",
        "survivors_mean": float(surv.mean()),
        "survivors_p99": float(np.percentile(surv, 99)),
        "survivors_p999": float(np.percentile(surv, 99.9)),
        "survivors_max": int(surv.max()),
        "argmin_pruned": argmin_pruned,
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rng = np.random.default_rng(20260821)
    out = {"soundness": soundness(rng, n)}
    print(json.dumps(out["soundness"]), flush=True)
    for k in (64, 128, 256):
        r = survivors(rng, 20_000, k)
        out[f"survivors_k{k}"] = r
        print(json.dumps(r), flush=True)
    r = survivors_trained(rng, 128)
    if r is not None:
        out["survivors_trained_k128"] = r
        print(json.dumps(r), flush=True)
    with open("/tmp/exp_sound_screen.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote /tmp/exp_sound_screen.json", file=sys.stderr)


if __name__ == "__main__":
    main()
