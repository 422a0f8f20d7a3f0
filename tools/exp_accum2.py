"""Hardware experiment: Lloyd tile accumulator beyond k=64.

Full-resolution training at k > 64 currently routes to the row-chunked
XLA trainer (`models/kmeans.py::fit_chunked`) because the accumulator's
gate stopped at 64. The kernel's two Python loops unroll over any kp, so
this measures whether the gate can simply rise: per-iteration cost of

    lloyd_accumulate (+ the XLA centroid divide, negligible)
vs
    _assign_chunked + _update_chunked (one fit_chunked Lloyd iteration)

at 4K (8.3 Mpix) for k = 128 / 256 / 512, exact CIE94, plus a totals
cross-check (accumulator vs one-hot-matmul sums/counts, tolerance-based
— both reorder f32 sums). Compile seconds are part of the decision (the
kp=512 program is ~1024 unrolled trips and may crash the remote
compiler like the kp=512 quantize unroll did). Run ON TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 3840 * 2160
LOOP = 8


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.models.kmeans import _assign_chunked, _update_chunked
    from kmeans_tpu.ops.kernels import lloyd_accumulate, pack_lab_planes
    from kmeans_tpu.ops.colorspace import srgb8_to_lab_np
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(7)
    lab_np = srgb8_to_lab_np(
        rng.integers(0, 256, (N, 3), dtype=np.uint8)
    ).astype(np.float32)
    pixels = jnp.asarray(lab_np)
    planes, n_valid = pack_lab_planes(pixels)
    planes = jax.block_until_ready(planes)
    np.asarray(planes[0, 0, 0])

    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    results = []
    for k in (128, 256, 512):
        cents = jnp.asarray(
            srgb8_to_lab_np(rng.integers(0, 256, (k, 3), dtype=np.uint8))
        )

        # --- Pallas accumulator, LOOP iterations in one dispatch ---
        @jax.jit
        def acc_loop(planes, cents, k=k):
            def body(i, carry):
                c, acc = carry
                tot = lloyd_accumulate(planes, c, N)
                # feed totals back so iterations are not dead code
                newc = tot[:, :3] / jnp.maximum(tot[:, 3:4], 1.0)
                return newc, acc + tot[0, 0]

            c, acc = jax.lax.fori_loop(0, LOOP, body, (cents, jnp.float32(0.0)))
            return acc

        try:
            compile_s = _timed(lambda: np.asarray(acc_loop(planes, cents)))
            t = min(_timed(lambda: np.asarray(acc_loop(planes, cents))) for _ in range(3))
            acc_ms = max((t - lat) / LOOP, 1e-9) * 1e3
            r = {"case": f"accum-k{k}", "ms_per_iter": round(acc_ms, 3),
                 "compile_s": round(compile_s, 1)}
        except Exception as e:
            r = {"case": f"accum-k{k}", "error": repr(e)[:200]}
        results.append(r)
        print(json.dumps(r), flush=True)

        # --- XLA chunked trainer iteration (assign + update) ---
        @jax.jit
        def xla_loop(pixels, cents, k=k):
            def body(i, carry):
                c, acc = carry
                asg = _assign_chunked(pixels, c, None, "cie94")
                sums, counts = _update_chunked(pixels, asg, k, None)
                newc = sums / jnp.maximum(counts[:, None], 1.0)
                return newc, acc + sums[0, 0]

            c, acc = jax.lax.fori_loop(0, LOOP, body, (cents, jnp.float32(0.0)))
            return acc

        try:
            compile_s = _timed(lambda: np.asarray(xla_loop(pixels, cents)))
            t = min(_timed(lambda: np.asarray(xla_loop(pixels, cents))) for _ in range(3))
            xla_ms = max((t - lat) / LOOP, 1e-9) * 1e3
            r = {"case": f"xla-chunked-k{k}", "ms_per_iter": round(xla_ms, 3),
                 "compile_s": round(compile_s, 1)}
        except Exception as e:
            r = {"case": f"xla-chunked-k{k}", "error": repr(e)[:200]}
        results.append(r)
        print(json.dumps(r), flush=True)

        # --- totals cross-check (tolerance: both reorder f32 sums) ---
        try:
            tot = np.asarray(lloyd_accumulate(planes, cents, N))
            asg = _assign_chunked(pixels, cents, None, "cie94")
            sums, counts = _update_chunked(pixels, asg, k, None)
            sums, counts = np.asarray(sums), np.asarray(counts)
            count_exact = bool(np.array_equal(tot[:, 3], counts))
            rel = np.abs(tot[:, :3] - sums) / np.maximum(np.abs(sums), 1e-3)
            r = {"case": f"check-k{k}", "counts_equal": count_exact,
                 "max_rel_sum_err": float(rel.max())}
        except Exception as e:
            r = {"case": f"check-k{k}", "error": repr(e)[:200]}
        results.append(r)
        print(json.dumps(r), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
