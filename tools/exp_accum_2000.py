"""Hardware decision: chunked-loop EXACT CIEDE2000 accumulator (round 4).

Round 2 rejected the EXACT cie2000 Pallas accumulator above k=64 because
its fully-unrolled trig bodies measured 130/351 s remote compiles at
k=128/256, so exact cie2000 full-res training stayed on the row-chunked
XLA trainer (46.4 ms/iter at 4K k=128) — the last kernel-matrix cell on
an XLA fallback (VERDICT round-3 task 1). Round 4 applies the quantize
kernel's rolled-cie2000 form to `_lloyd_acc_kernel`: the distance loop
becomes a fori over ACCUM_CHUNK_2000-trip fully-unrolled chunks and the
per-cluster reduction loop a fori over ACCUM_MASK_CHUNK-trip chunks with
`pl.ds` dynamic stores. This measures, on the real chip:

    full-res 8.3 Mpix EXACT cie2000 training at k in {128, 256}:
    fit_large(fast=False) [NEW chunked exact accumulator]
    vs fit_chunked [exact XLA row-chunked]
    — compile seconds (the bar: seconds-class, not 130/351 s),
    ms/iter, and final-centroid deviation between the two exact
    protocols (both exact; they differ only in f32 summation order).

Accept bar (VERDICT): seconds-class compile AND >= 2x/iter over
fit_chunked at k=128/256, else reject with numbers in STATUS.md.

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
    # Same blob generator as exp_accum_prune.py so rows are comparable.
    centers = rng.uniform(0, 100, (32, 3)).astype(np.float32)
    pix_np = (
        centers[rng.integers(0, 32, N)]
        + rng.normal(0, 3, (N, 3)).astype(np.float32)
    ).astype(np.float32)
    pix = jnp.asarray(pix_np)
    np.asarray(pix[0])

    results = []
    for k in (128, 256):
        jit_exact = jax.jit(
            lambda px, s, kk: fit_large(px, kk, s, metric="cie2000"),
            static_argnums=(2,),
        )
        jit_chunk = jax.jit(
            lambda px, s, kk: fit_chunked(px, kk, s, metric="cie2000"),
            static_argnums=(2,),
        )

        (ce, ie), c_exact = _timed(
            lambda: jax.tree.map(np.asarray, jit_exact(pix, 17, k))
        )
        (cc, ic), c_chunk = _timed(
            lambda: jax.tree.map(np.asarray, jit_chunk(pix, 17, k))
        )
        # Warm re-runs (fresh seed defeats host-copy caching).
        (_, ie2), t_exact = _timed(
            lambda: jax.tree.map(np.asarray, jit_exact(pix, 33, k))
        )
        (_, ic2), t_chunk = _timed(
            lambda: jax.tree.map(np.asarray, jit_chunk(pix, 33, k))
        )
        # Both protocols are EXACT cie2000 (same assignments up to f32
        # summation order), so same-seed centroid deviation should be
        # tiny — report it sorted by L*.
        o1, o2 = np.argsort(ce[:, 0]), np.argsort(cc[:, 0])
        dev = float(np.abs(ce[o1] - cc[o2]).max())
        r = {
            "k": k,
            "exact_pallas_ms_iter": round(
                t_exact / max(int(ie2), 1) * 1e3, 2
            ),
            "exact_pallas_iters": int(ie2),
            "chunked_xla_ms_iter": round(t_chunk / max(int(ic2), 1) * 1e3, 2),
            "chunked_xla_iters": int(ic2),
            "speedup_per_iter": round(
                (t_chunk / max(int(ic2), 1)) / (t_exact / max(int(ie2), 1)),
                2,
            ),
            "compile_s_exact_pallas": round(c_exact, 1),
            "compile_s_chunked_xla": round(c_chunk, 1),
            "max_centroid_dev_sorted": round(dev, 4),
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    with open("/tmp/exp_accum_2000.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/exp_accum_2000.json", file=sys.stderr)


if __name__ == "__main__":
    main()
