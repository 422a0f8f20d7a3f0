"""Hardware experiment: factorized CIE94 argmin for large palettes.

The rolled (k > 16) fused-assign loop is the slowest remaining kernel
path (6.0 ms at 4K k=64 / 22.7 ms at k=256 exact; 4.63 / 17.1 ms fast —
docs/perf.md). CIE94's squared distance factorizes:

    dE^2(p, c) = pixelOnly(p) + F(p) . G(c)

with (wC = 1/SC^2, wH = 1/SH^2, q = wC - wH; all pixel-only since
SC/SH depend on the PIXEL chroma only):

    F(p) = [-2 L1, 1, -2 C1 q, q, -2 a1 wH, -2 b1 wH, wH]
    G(c) = [L2, L2^2, C2, C2^2, a2, b2, a2^2 + b2^2]

pixelOnly(p) is constant per pixel, so argmin_c dE^2 = argmin_c F.G —
7 FMA-class ops per centroid instead of ~14 (subs, squares, sqrt-free
but two reciprocal-weighted terms), and the dot form is MXU-shaped.
The factorization drops the dhab_sq >= 0 clamp and reassociates the
f32 sums, so it is a FAST-mode candidate (knife-edge ties can flip),
like the existing reciprocal-hoisted fast distance.

Variants measured (4K, replace, emit-index unpacked, k = 64 / 256):

    rolled-fast   current fast=True kernel (baseline)
    factor-vpu    rolled loop over k, 7 SMEM scalars per centroid
    factor-mxu    jax.lax.dot_general([TR,128,8] x [8,KC]) per k-chunk
                  + 3-D argmin merge (tries to engage the MXU)

plus the assignment-mismatch fraction of each vs the exact kernel.
Prints one JSON line per measurement. Run ON TPU; budget remote
compiles (~1-4 min per new executable) on first run.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 3840, 2160
N = WIDTH * HEIGHT
LOOP = 20


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def _build_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kmeans_tpu.ops.kernels import (
        LANES,
        _lab_from_linear_planes,
        _lut_gather,
        _round_up,
        gamma_lut_values,
    )

    K1, K2 = 0.045, 0.015

    def _pixel_features(lut_ref, x):
        rl = _lut_gather(lut_ref, x & 0xFF)
        gl = _lut_gather(lut_ref, (x >> 8) & 0xFF)
        bl = _lut_gather(lut_ref, (x >> 16) & 0xFF)
        l_p, a_p, b_p = _lab_from_linear_planes(rl, gl, bl)
        c1 = jnp.sqrt(a_p * a_p + b_p * b_p)
        sc = 1.0 + K1 * c1
        sh = 1.0 + K2 * c1
        wh = 1.0 / (sh * sh)
        q = 1.0 / (sc * sc) - wh
        return (
            -2.0 * l_p,          # f0 (. L2)
            -2.0 * c1 * q,       # f2 (. C2)
            q,                   # f3 (. C2^2)
            -2.0 * a_p * wh,     # f4 (. a2)
            -2.0 * b_p * wh,     # f5 (. b2)
            wh,                  # f6 (. a2^2 + b2^2)
        )                        # f1 = 1 (. L2^2) folded as an add

    # ---------------- factor-vpu: SMEM scalar walk ---------------- #

    def _factor_vpu_kernel(gtab_ref, lut_ref, in_ref, out_ref, *, kp):
        f0, f2, f3, f4, f5, f6 = _pixel_features(lut_ref, in_ref[:])
        big = jnp.float32(3.4e38)

        def body(k, carry):
            best_d, best_k = carry
            s = (
                f0 * gtab_ref[k, 0]
                + gtab_ref[k, 1]
                + f2 * gtab_ref[k, 2]
                + f3 * gtab_ref[k, 3]
                + f4 * gtab_ref[k, 4]
                + f5 * gtab_ref[k, 5]
                + f6 * gtab_ref[k, 6]
            )
            take = s < best_d
            return jnp.where(take, s, best_d), jnp.where(take, k, best_k)

        init = (jnp.full(f0.shape, big), jnp.zeros(f0.shape, jnp.int32))
        _, best_k = jax.lax.fori_loop(0, kp, body, init)
        out_ref[:] = best_k

    # -------------- factor-mxu: dot_general per k-chunk -------------- #

    def _factor_mxu_kernel(gmat_ref, lut_ref, in_ref, out_ref, *, kp, kc):
        f0, f2, f3, f4, f5, f6 = _pixel_features(lut_ref, in_ref[:])
        ones = jnp.ones_like(f0)
        zero = jnp.zeros_like(f0)
        feats = jnp.stack(
            [f0, ones, f2, f3, f4, f5, f6, zero], axis=-1
        )  # [TR, 128, 8]
        big = jnp.float32(3.4e38)
        best_d = jnp.full(f0.shape, big)
        best_k = jnp.zeros(f0.shape, jnp.int32)
        for c0 in range(0, kp, kc):
            g = gmat_ref[:, c0 : c0 + kc]  # [8, KC]
            scores = jax.lax.dot_general(
                feats,
                g,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TR, 128, KC]
            d = jnp.min(scores, axis=-1)
            i = jnp.argmin(scores, axis=-1).astype(jnp.int32) + c0
            take = d < best_d
            best_d = jnp.where(take, d, best_d)
            best_k = jnp.where(take, i, best_k)
        out_ref[:] = best_k

    def _g_table(cents):
        l2, a2, b2 = cents[:, 0], cents[:, 1], cents[:, 2]
        c2 = jnp.sqrt(a2 * a2 + b2 * b2)
        return jnp.stack(
            [l2, l2 * l2, c2, c2 * c2, a2, b2, a2 * a2 + b2 * b2], axis=1
        )  # [KP, 7]

    def _run(kernel_name, rgba_u8, cents, tile_rows, kc=64, interpret=False):
        kp = cents.shape[0]
        h, w = rgba_u8.shape[0], rgba_u8.shape[1]
        n = h * w
        packed = jax.lax.bitcast_convert_type(
            rgba_u8.reshape(n, 4), jnp.int32
        )
        n_pad = _round_up(n, tile_rows * LANES)
        packed = jnp.pad(packed, (0, n_pad - n))
        tiles = packed.reshape(n_pad // LANES, LANES)
        grid = (n_pad // (tile_rows * LANES),)

        gtab = _g_table(jnp.asarray(cents, jnp.float32))
        if kernel_name == "factor-vpu":
            kern = functools.partial(_factor_vpu_kernel, kp=kp)
            g_operand = gtab
            g_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        else:
            kern = functools.partial(_factor_mxu_kernel, kp=kp, kc=kc)
            gmat = jnp.pad(gtab, ((0, 0), (0, 1))).T  # [8, KP]
            g_operand = gmat
            g_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(tiles.shape, jnp.int32),
            grid=grid,
            in_specs=[
                g_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (tile_rows, LANES), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_rows, LANES), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(g_operand, gamma_lut_values(), tiles)
        return out.reshape(-1)[:n].astype(jnp.uint8).reshape(h, w)

    return _run


def _smoke() -> None:
    """CPU interpret-mode check: both experimental kernels' argmin must
    match the exact kernel's on a small image (knife-edge ties aside).
    Run with JAX_PLATFORMS=cpu python tools/exp_mxu.py --smoke."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kmeans_tpu.ops.kernels import fused_assign

    rng = np.random.default_rng(2)
    rgba = rng.integers(0, 256, (40, 100, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    img = jnp.asarray(rgba)
    kp = 64
    cents = np.stack(
        [
            rng.uniform(0, 100, kp),
            rng.uniform(-60, 60, kp),
            rng.uniform(-60, 60, kp),
        ],
        axis=1,
    ).astype(np.float32)
    cj = jnp.asarray(cents)
    run = _build_kernels()
    exact = np.asarray(
        fused_assign(img, cj, jnp.float32(0.0), mode="replace",
                     interpret=True)
    )
    for name, tr in (("factor-vpu", 128), ("factor-mxu", 32)):
        idx = np.asarray(run(name, img, cj, tr, interpret=True))
        frac = (idx != exact).mean()
        print(f"{name}: mismatch {frac:.6f}")
        assert frac < 1e-3, (name, frac)
    print("smoke ok")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.ops.kernels import fused_assign
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    rgba = rng.integers(0, 256, (HEIGHT, WIDTH, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    img = jnp.asarray(rgba)

    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    run = _build_kernels()
    results = []
    for kp in (64, 256):
        # Lab-ish random centroids
        cents = np.stack(
            [
                rng.uniform(0, 100, kp),
                rng.uniform(-60, 60, kp),
                rng.uniform(-60, 60, kp),
            ],
            axis=1,
        ).astype(np.float32)
        cj = jnp.asarray(cents)
        thr = jnp.float32(0.0)

        exact_idx = np.asarray(
            fused_assign(img, cj, thr, mode="replace", fast=False)
        )

        def time_call(fn):
            # In-jit loop: LOOP kernel launches per dispatch with a scalar
            # readback, so neither the per-call latency nor an 8.3 MB index
            # readback (~250 ms through this tunnel) pollutes the signal.
            # `eps = acc * 0` threads the carry into the kernel's inputs so
            # XLA cannot hoist the loop-invariant body (bench.py pattern).
            @jax.jit
            def loop():
                def body(i, acc):
                    idx = fn(acc * 0.0)
                    return acc + idx[0, 0].astype(jnp.float32)

                return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

            np.asarray(loop())  # compile
            t = min(_timed(lambda: np.asarray(loop())) for _ in range(3))
            return max((t - lat) / LOOP, 1e-6)

        variants = {
            "rolled-fast": lambda eps: fused_assign(
                img, cj + eps, thr, mode="replace", fast=True
            ),
        }
        for tr in (128,):
            variants[f"factor-vpu-tr{tr}"] = (
                lambda eps, tr=tr: run("factor-vpu", img, cj + eps, tr)
            )
        for tr, kc in ((32, 64), (8, 64)):
            variants[f"factor-mxu-tr{tr}-kc{kc}"] = (
                lambda eps, tr=tr, kc=kc: run("factor-mxu", img, cj + eps, tr, kc)
            )

        for name, fn in variants.items():
            try:
                t = time_call(fn)
                idx = np.asarray(jax.jit(fn)(jnp.float32(0.0)))
                mismatch = float((idx != exact_idx).mean())
            except Exception as e:
                msg = str(e).splitlines()[0][:200]
                r = {"variant": name, "k": kp, "error": msg}
                results.append(r)
                print(json.dumps(r), flush=True)
                continue
            r = {
                "variant": name,
                "k": kp,
                "ms": round(t * 1e3, 3),
                "gpix_s": round(N / t / 1e9, 2),
                "mismatch_frac_vs_exact": round(mismatch, 7),
            }
            results.append(r)
            print(json.dumps(r), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        _smoke()
    else:
        main()
