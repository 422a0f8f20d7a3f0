"""Hardware experiment: the k > 512 tier (VERDICT round-2 task 7).

The reference accepts any `-c >= 1` (`cli/src/args.rs` validate_k has no
upper bound); this repo's indexed/unrolled tiers stop at 512, so k=1024
routes to the fused quantize kernel (full-RGBA readback) and the
chunked XLA trainer. This measures, at 4K on the real TPU:

    fused_quantize replace k=1024   exact + fast, three loop forms:
      production (kp_max=256 -> _chunked_k_loop(1024, 128)),
      forced rolled (kp_max=16),
      FULL 1024-trip unroll (kp_max=1024 — the compiler-crash case)
    fit_chunked k=1024              ms/iter (training fallback)

LABEL CORRECTION (late round 4): the original capture named the
kp_max=1024 case "chunk128" — but kp <= kp_max selects the FULL unroll,
so that case was the (crashing) straight-line program and the
PRODUCTION chunked form went unmeasured; its 89.2 ms "rolled" rows were
published as the default's number. tools/exp_two_half.py measured the
actual production form at 46.2 ms; this tool now sweeps it explicitly.
Run ON TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 3840, 2160
LOOP = 8


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.models.kmeans import fit_chunked
    from kmeans_tpu.ops import kernels
    from kmeans_tpu.ops.colorspace import srgb8_to_lab_np
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (HEIGHT, WIDTH, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    img = jnp.asarray(rgba)
    np.asarray(img[0, 0])

    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    k = 1024
    pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
    cents = jnp.asarray(srgb8_to_lab_np(pal))

    def quant_case(label, fast, kp_max, chunk):
        kernels.set_loop_knobs(kp_max=kp_max, chunk=chunk)

        def call(img, cents, acc):
            out = kernels.fused_quantize(
                img, cents, jnp.float32(0.0) + acc * 0.0,
                mode="replace", fast=fast,
            )
            return out, out[0, 0, 0].astype(jnp.float32)

        @jax.jit
        def loop(img, cents):
            def body(i, acc):
                _, tag = call(img, cents, acc)
                return acc + tag

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        try:
            compile_s = _timed(lambda: np.asarray(loop(img, cents)))
        except Exception as e:
            r = {"case": label, "error": repr(e)[:200]}
            print(json.dumps(r), flush=True)
            return r
        t = min(_timed(lambda: np.asarray(loop(img, cents))) for _ in range(3))
        per_call = max((t - lat) / LOOP, 1e-9)
        out = np.asarray(call(img, cents, jnp.float32(0.0))[0])
        r = {
            "case": label, "ms": round(per_call * 1e3, 2),
            "gpix_s": round(WIDTH * HEIGHT / per_call / 1e9, 3),
            "compile_s": round(compile_s, 1),
            "checksum": int(np.ascontiguousarray(out).view(np.uint32).sum(dtype=np.uint64) % 2**32),
        }
        print(json.dumps(r), flush=True)
        return r

    # Indexed-tier extension (late round 4, INDEXED_MAX_K 512 -> 1024):
    # e2e comparison of the 16-bit packed-index readback (2 B/px +
    # native unpack-gather) vs the full-RGBA readback it replaces at
    # k = 1024, plus pixel equality of the reconstructions. Run alone
    # with `--only-indexed`.
    def indexed_tier_case():
        from kmeans_tpu.ops.colorspace import lab_to_srgb8
        from kmeans_tpu.ops.kernels import quant_tile_rows
        from kmeans_tpu.utils.packing import (
            pack_bits as _pb,
            unpack_tile_words_gather,
        )

        kernels.set_loop_knobs(kp_max=256, chunk=128)  # production form
        thr = jnp.float32(0.0)
        full = jax.jit(
            lambda i, c: kernels.fused_quantize(i, c, thr, mode="replace")
        )
        packed = jax.jit(
            lambda i, c: kernels.fused_assign_packed(
                i, c, thr, mode="replace"
            )
        )
        rgb8 = np.asarray(lab_to_srgb8(cents))
        pal_rgba = np.concatenate(
            [rgb8, np.full((k, 1), 255, np.uint8)], axis=1
        )
        np.asarray(full(img, cents))  # compiles
        np.asarray(packed(img, cents))
        t_full = min(
            _timed(lambda: np.asarray(full(img, cents))) for _ in range(3)
        )

        def indexed_e2e():
            words = np.asarray(packed(img, cents))
            return unpack_tile_words_gather(
                words, HEIGHT, WIDTH, _pb(k), pal_rgba,
                tile_rows=quant_tile_rows(k),
            )
        got = indexed_e2e()
        t_idx = min(_timed(indexed_e2e) for _ in range(3))
        want = np.asarray(full(img, cents))
        r = {
            "case": "k1024-e2e-readback",
            "full_rgba_ms": round(t_full * 1e3, 1),
            "indexed16_ms": round(t_idx * 1e3, 1),
            "speedup": round(t_full / t_idx, 2),
            "mismatch_px": int((want != got).any(axis=-1).sum()),
        }
        print(json.dumps(r), flush=True)
        return r

    if "--only-indexed" in sys.argv:
        results = [indexed_tier_case()]
        with open("/tmp/exp_k1024_indexed.json", "w") as f:
            json.dump(results, f, indent=1)
        return

    results = [
        quant_case("production-chunk128-exact", False, 256, 128),
        quant_case("production-chunk128-fast", True, 256, 128),
        quant_case("forced-rolled-exact", False, 16, 1),
        quant_case("forced-rolled-fast", True, 16, 1),
        quant_case("full-unroll-1024-exact", False, 1024, 128),
        quant_case("full-unroll-1024-fast", True, 1024, 128),
    ]
    results.append(indexed_tier_case())
    kernels.set_loop_knobs(kp_max=256, chunk=128)

    # Training fallback: fit_chunked ms/iter at k=1024 on a shrunk-training
    # -scale plane (256px shrink = 36.9k px is the production route; also
    # the full-res 8.3M plane to bound worst-case).
    for n, tag in ((256 * 144, "shrink"), (WIDTH * HEIGHT, "fullres")):
        px = jnp.asarray(rng.uniform(0, 100, (n, 3)).astype(np.float32))

        fit = jax.jit(
            lambda p, fi, k=None: fit_chunked(p, k, fi), static_argnums=(2,)
        )
        compile_s = _timed(lambda: jax.block_until_ready(fit(px, 0, k)))
        best, iters = 1e9, 1
        for _ in range(3):
            t0 = time.perf_counter()
            c, it = fit(px, 0, k)
            np.asarray(c)
            best = min(best, time.perf_counter() - t0)
            iters = int(np.asarray(it))
        r = {
            "case": f"fit_chunked-k1024-{tag}", "n": n, "iters": iters,
            "fit_ms": round((best - lat) * 1e3, 1),
            "ms_per_iter": round((best - lat) * 1e3 / max(iters, 1), 2),
            "compile_s": round(compile_s, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    with open("/tmp/exp_k1024.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/exp_k1024.json", file=sys.stderr)


if __name__ == "__main__":
    main()
