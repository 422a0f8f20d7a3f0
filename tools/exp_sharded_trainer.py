"""Hardware cross-check: the sharded Pallas Lloyd trainer on a real TPU
mesh (VERDICT round-2 task 1's hardware leg).

This harness has ONE real chip, so the TPU mesh is 1x1 — the cross-shard
psum is exercised on the 8-device CPU mesh by tests/test_distributed.py;
what only hardware can validate is that the per-shard `lloyd_accumulate`
Mosaic kernel + psum protocol compiles and runs UNDER shard_map on the
real device, produces the same centroids as the single-chip `fit_large`,
and trains at the same per-iteration speed (the kernel should dominate;
shard_map must add ~nothing at mesh=1).

Measures end-to-end fit time and ms/iter (iterations returned by the
trainer; call latency subtracted) at 4K-scale N = 8.3 Mpix for
k in {8, 64, 256}:

    fit_large (single-chip)            — the round-2 baseline protocol
    fit_sharded(trainer="pallas")      — 1x1 TPU mesh
    fit_sharded(trainer="chunked")     — 1x1 TPU mesh (the fallback)

Run ON TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 3840 * 2160
LOOP = 1


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.models.kmeans import fit_large
    from kmeans_tpu.parallel.distributed import fit_sharded
    from kmeans_tpu.parallel.mesh import make_mesh
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(11)
    pixels_np = rng.uniform(0.0, 100.0, (N, 3)).astype(np.float32)
    pixels = jnp.asarray(pixels_np)
    weight = jnp.ones((N,), jnp.float32)
    np.asarray(pixels[0])  # settle upload

    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    mesh = make_mesh(jax.devices()[:1])

    single = jax.jit(
        lambda px, fi, k=None: fit_large(px, k, fi), static_argnums=(2,)
    )

    def sharded(trainer):
        def f(px, w, fi, k):
            return fit_sharded(mesh, px, w, k, fi, trainer=trainer)

        return jax.jit(f, static_argnums=(3,))

    sh_pallas = sharded("pallas")
    sh_chunked = sharded("chunked")

    results = []
    for k in (8, 64, 256):
        def run(fn, *args):
            compile_s = _timed(lambda: jax.block_until_ready(fn(*args)))
            best = 1e9
            iters = None
            for rep in range(3):
                t0 = time.perf_counter()
                c, it = fn(*args)
                c_np = np.asarray(c)
                dt = time.perf_counter() - t0
                best = min(best, dt)
                iters = int(np.asarray(it))
            return c_np, iters, best, compile_s

        c_single, it_s, t_s, comp_s = run(single, pixels, 0, k)
        c_pal, it_p, t_p, comp_p = run(sh_pallas, pixels, weight, 0, k)
        c_chk, it_c, t_c, comp_c = run(sh_chunked, pixels, weight, 0, k)
        agree_pal = float(np.abs(c_pal - c_single).max())
        agree_chk = float(np.abs(c_chk - c_single).max())
        for label, it, t, comp, agree in (
            ("single-fit_large", it_s, t_s, comp_s, 0.0),
            ("sharded-pallas-1x1", it_p, t_p, comp_p, agree_pal),
            ("sharded-chunked-1x1", it_c, t_c, comp_c, agree_chk),
        ):
            r = {
                "k": k, "trainer": label, "iters": it,
                "fit_ms": round((t - lat) * 1e3, 1),
                "ms_per_iter": round((t - lat) * 1e3 / max(it, 1), 2),
                "compile_s": round(comp, 1),
                "max_abs_dev_vs_single": round(agree, 6),
            }
            results.append(r)
            print(json.dumps(r), flush=True)

    with open("/tmp/exp_sharded_trainer.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/exp_sharded_trainer.json", file=sys.stderr)


if __name__ == "__main__":
    main()
