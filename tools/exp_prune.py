"""Hardware experiment: the CIEDE2000 fast tier (two-pass candidate
pruning) — VERDICT round-2 task 3.

`fast=True, metric="cie2000", kp > 16` screens with the factorized CIE94
score, keeps PRUNE_M candidates, and runs the exact CIEDE2000 trig chain
only on the survivors. This measures, at 4K on the real TPU
(12-call in-jit loop, min of 3, in-run call latency subtracted):

    exact cie2000 replace k=64 / k=256      (the round-2 numbers)
    pruned (fast)          k=64 / k=256      at PRUNE_M in {4, 8, 16}

and, per setting, the MISMATCH RATE: fraction of pixels whose chosen
palette index differs from the exact kernel's (a true nearest screened
out of the top-M is the documented fast-mode deviation). Decision bar
(VERDICT): >=3x speedup with mismatch <= 1e-3 of pixels. Run ON TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 3840, 2160
LOOP = 12


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.ops import kernels
    from kmeans_tpu.ops.colorspace import srgb8_to_lab_np
    from kmeans_tpu.utils.cache import enable_compilation_cache
    from kmeans_tpu.utils.packing import pack_bits, unpack_tile_words

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (HEIGHT, WIDTH, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    img = jnp.asarray(rgba)
    np.asarray(img[0, 0])  # settle the upload

    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    def cents_for(k):
        pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        return jnp.asarray(srgb8_to_lab_np(pal))

    def measure(k, fast, cents):
        # cents passed in: exact and pruned MUST rank the same palette
        # (an earlier revision drew a fresh random palette per call and
        # measured a meaningless ~99% "mismatch").

        def call(img, cents, acc):
            words = kernels.fused_assign_packed(
                img, cents, jnp.float32(0.0) + acc * 0.0,
                mode="replace", fast=fast, metric="cie2000",
            )
            return words, words[0, 0].astype(jnp.float32)

        @jax.jit
        def loop(img, cents):
            def body(i, acc):
                _, tag = call(img, cents, acc)
                return acc + tag

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        compile_s = _timed(lambda: np.asarray(loop(img, cents)))
        t = min(_timed(lambda: np.asarray(loop(img, cents))) for _ in range(3))
        per_call = max((t - lat) / LOOP, 1e-9)
        words, _ = call(img, cents, jnp.float32(0.0))
        idx = unpack_tile_words(
            np.asarray(words), HEIGHT, WIDTH, pack_bits(k),
            tile_rows=kernels.quant_tile_rows(k),
        )
        return per_call * 1e3, compile_s, idx

    results = []
    for k in (64, 256):
        cents = cents_for(k)
        exact_ms, exact_comp, exact_idx = measure(k, False, cents)
        r = {
            "case": f"cie2000-exact-k{k}", "ms": round(exact_ms, 2),
            "gpix_s": round(WIDTH * HEIGHT / exact_ms / 1e6, 3),
            "compile_s": round(exact_comp, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)
        for m in (4, 8, 16):
            kernels.set_loop_knobs(prune_m=m)
            ms, comp, idx = measure(k, True, cents)
            mism = float((idx != exact_idx).mean())
            r = {
                "case": f"cie2000-prune-k{k}", "prune_m": m,
                "ms": round(ms, 2),
                "gpix_s": round(WIDTH * HEIGHT / ms / 1e6, 3),
                "speedup_vs_exact": round(exact_ms / ms, 2),
                "mismatch_frac": mism,
                "compile_s": round(comp, 1),
            }
            results.append(r)
            print(json.dumps(r), flush=True)
        kernels.set_loop_knobs(prune_m=8, prune_m_large=16)

    with open("/tmp/exp_prune.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/exp_prune.json", file=sys.stderr)


if __name__ == "__main__":
    main()
