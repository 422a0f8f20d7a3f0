"""Hardware experiment: lloyd_accumulate traffic/flop variants (VERDICT #1).

Measures ms/iteration of a realistic device-resident Lloyd loop (update
centroids from the accumulator totals each iteration, like lloyd_pallas)
for every variant at 4K (8.29 Mpix):

    exact-f32   current default (12 B/px/iter)
    fast-f32    algebraic CIE94, no divides in the centroid loop
    exact-bf16  bf16 planes (6 B/px/iter), f32 accumulation
    fast-bf16   both

at k=8 and k=64, plus the assignment-mismatch fraction of each variant vs
exact-f32 (measured with one emit-index-free proxy: compare the resulting
counts). Prints a JSON line per measurement. Run ON TPU (no JAX_PLATFORMS
override); budget ~10-20 min of remote compiles on first run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 3840 * 2160
LOOP = 30


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.ops.kernels import lloyd_accumulate, pack_lab_planes
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    # Lab-ish distribution: L in [0, 100], a/b in [-60, 60]
    lab = np.stack(
        [
            rng.uniform(0, 100, N),
            rng.uniform(-60, 60, N),
            rng.uniform(-60, 60, N),
        ],
        axis=1,
    ).astype(np.float32)
    pix = jnp.asarray(lab)

    # per-call transport latency, measured in-run. Each rep reads back a
    # FRESH derived array — JAX caches the host copy of an already-read
    # Array, so re-reading the same one measures a cache hit (~0 ms).
    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    results = []
    for k in (8, 64):
        cents0 = jnp.asarray(lab[rng.choice(N, k, replace=False)])

        ref_counts = {}
        for name, dtype, fast in (
            ("exact-f32", None, False),
            ("fast-f32", None, True),
            ("exact-bf16", jnp.bfloat16, False),
            ("fast-bf16", jnp.bfloat16, True),
        ):
            planes, n_valid = pack_lab_planes(pix, dtype=dtype)
            planes = jax.device_put(planes)

            @jax.jit
            def loop(planes, cents):
                def body(i, c):
                    totals = lloyd_accumulate(
                        planes, c, n_valid, fast=fast
                    )
                    sums, counts = totals[:, :3], totals[:, 3]
                    return jnp.where(
                        (counts > 0)[:, None],
                        sums / jnp.maximum(counts, 1.0)[:, None],
                        c,
                    )

                return jax.lax.fori_loop(0, LOOP, body, cents)

            out = loop(planes, cents0)
            np.asarray(out)  # compile + settle
            t = min(_timed(lambda: np.asarray(loop(planes, cents0))) for _ in range(3))
            per_iter = max((t - lat) / LOOP, 0.0)

            # one single accumulate for count comparison vs exact-f32
            totals1 = np.asarray(
                lloyd_accumulate(planes, cents0, n_valid, fast=fast)
            )
            ref_counts[name] = totals1[:, 3]
            mismatch = (
                float(np.abs(totals1[:, 3] - ref_counts["exact-f32"]).sum())
                / N
            )

            r = {
                "variant": name,
                "k": k,
                "ms_per_iter": round(per_iter * 1e3, 4),
                "gpix_s": round(N / per_iter / 1e9, 2) if per_iter else None,
                "gb_s": round(
                    N * (6 if dtype is not None else 12) / per_iter / 1e9, 1
                )
                if per_iter
                else None,
                "count_shift_frac_vs_exact": round(mismatch, 7),
            }
            results.append(r)
            print(json.dumps(r), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
