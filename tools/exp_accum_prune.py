"""Hardware decision: pruned CIEDE2000 training accumulator (round 3).

Round 2 rejected the EXACT cie2000 accumulator above k=64: the fully
unrolled trig bodies measured 130/351 s remote compiles at k=128/256
(deploy-hostile), so cie2000 k>64 full-res training stayed on the
row-chunked XLA trainer. Round 3's pruned tier (chunked factorized-CIE94
screen keeps PRUNE_M candidates, exact trig only on survivors) bounds the
program size — this measures, on the real chip:

    full-res 8.3 Mpix cie2000 training at k in {128, 256}:
    fit_large(fast=True) [pruned accumulator] vs fit_chunked [exact XLA]
    — compile seconds, ms/iter to convergence, and the final-centroid
    deviation between the two protocols.

Run ON TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 8_294_400  # 4K pixel count


def _timed(f):
    t0 = time.perf_counter()
    out = f()
    return out, time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.models.kmeans import fit_chunked, fit_large
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(4)
    # Lab-range blobs: k-means on pure uniform noise converges slowly and
    # unrepresentatively; blobs give realistic iteration counts.
    centers = rng.uniform(0, 100, (32, 3)).astype(np.float32)
    pix_np = (
        centers[rng.integers(0, 32, N)]
        + rng.normal(0, 3, (N, 3)).astype(np.float32)
    ).astype(np.float32)
    pix = jnp.asarray(pix_np)
    np.asarray(pix[0])

    results = []
    for k in (128, 256):
        jit_large = jax.jit(
            lambda px, s, kk: fit_large(
                px, kk, s, metric="cie2000", fast=True
            ),
            static_argnums=(2,),
        )
        jit_chunk = jax.jit(
            lambda px, s, kk: fit_chunked(px, kk, s, metric="cie2000"),
            static_argnums=(2,),
        )

        (cp, ip), c_large = _timed(
            lambda: jax.tree.map(np.asarray, jit_large(pix, 17, k))
        )
        (cc, ic), c_chunk = _timed(
            lambda: jax.tree.map(np.asarray, jit_chunk(pix, 17, k))
        )
        # Warm re-runs (fresh seed defeats any caching of the result).
        (_, ip2), t_large = _timed(
            lambda: jax.tree.map(np.asarray, jit_large(pix, 33, k))
        )
        (_, ic2), t_chunk = _timed(
            lambda: jax.tree.map(np.asarray, jit_chunk(pix, 33, k))
        )
        # Centroid deviation between protocols (same seed runs): sort by
        # L* then compare — the two may converge to slightly different
        # local optima, so report the summary, not a bound.
        o1, o2 = np.argsort(cp[:, 0]), np.argsort(cc[:, 0])
        dev = float(np.abs(cp[o1] - cc[o2]).max())
        r = {
            "k": k,
            "pruned_ms_iter": round(t_large / max(int(ip2), 1) * 1e3, 2),
            "pruned_iters": int(ip2),
            "chunked_ms_iter": round(t_chunk / max(int(ic2), 1) * 1e3, 2),
            "chunked_iters": int(ic2),
            "speedup_per_iter": round(
                (t_chunk / max(int(ic2), 1))
                / (t_large / max(int(ip2), 1)),
                2,
            ),
            "compile_s_pruned": round(c_large, 1),
            "compile_s_chunked": round(c_chunk, 1),
            "max_centroid_dev_sorted": round(dev, 4),
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    with open("/tmp/exp_accum_prune.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/exp_accum_prune.json", file=sys.stderr)


if __name__ == "__main__":
    main()
