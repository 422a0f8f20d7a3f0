"""Hardware check: the fused Pallas kernel under shard_map (1-chip mesh).

Validates that `assign_fused_sharded` — each shard running
`fused_assign_packed` (Mosaic) on its local rows — lowers and executes on
real TPU hardware inside `jax.shard_map`, produces words bit-equal to the
single-chip kernel, and measures its device time against the XLA sharded
quantizer it replaces on TPU meshes.

Run: python tools/exp_sharded_fused.py [H W K]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from kmeans_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from kmeans_tpu.ops.colorspace import srgb8_to_lab
from kmeans_tpu.parallel.mesh import make_mesh
from kmeans_tpu.parallel.sharded_ops import (
    assign_fused_sharded,
    assign_indexed_sharded,
    unpack_fused_sharded,
)
from kmeans_tpu.utils.packing import unpack_nibbles
from kmeans_tpu.api import _assign_indexed_jit, _unpack_idx


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2160
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    pal = srgb8_to_lab(jnp.asarray(rng.integers(0, 256, (k, 3), np.uint8)))
    mesh = make_mesh(jax.devices(), data=1)
    d = mesh.shape["pixel"]

    for mode in ("replace", "dither"):
        # Correctness: sharded fused vs the single-chip fused kernel.
        words, bits = assign_fused_sharded(mesh, rgb, pal, mode=mode)
        idx = unpack_fused_sharded(np.asarray(words), h, w, k, d)
        single_words = _assign_indexed_jit(jnp.asarray(rgb), pal, mode)
        idx_single = _unpack_idx(np.asarray(single_words), h, w, k)
        eq = (idx == idx_single).mean()
        print(f"{mode}: bits={bits} match_vs_single_chip={eq:.8f}")

        # Timing: warm loop, fresh readback per rep (host copies cache).
        def run_fused():
            ws, _ = assign_fused_sharded(mesh, rgb, pal, mode=mode)
            return np.asarray(ws)

        def run_xla():
            p, _ = assign_indexed_sharded(mesh, rgb, pal, mode=mode)
            return np.asarray(p)

        for name, fn in (("fused", run_fused), ("xla", run_xla)):
            fn()  # warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                ts.append((time.perf_counter() - t0) * 1e3)
            print(f"  {name} sharded e2e best {min(ts):.1f} ms (n=3)")

        # Device-side: in-jit loop (the e2e numbers above are >90% wire
        # time on this tunnel). The acc-perturbed palette defeats CSE
        # across iterations, same pattern as bench.py's dev_loop.
        from kmeans_tpu.parallel.sharded_ops import (
            _assign_fused_jit,
            _assign_pack_jit,
        )
        from kmeans_tpu.parallel.sharded_ops import _row_sharded

        sharded, _ = _row_sharded(mesh, rgb)
        local_h = sharded.shape[0] // d
        LOOP = 12
        kp = int(pal.shape[0])

        @jax.jit
        def loop_fused(img, p):
            def body(i, acc):
                w = _assign_fused_jit(
                    img, p + acc * 0.0, jnp.int32(kp), mesh=mesh, mode=mode,
                    metric="cie94", fast=False, interpret=False,
                    local_h=local_h,
                )
                return acc + w[0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        @jax.jit
        def loop_xla(img, p):
            def body(i, acc):
                w = _assign_pack_jit(
                    img, p + acc * 0.0, mode, None, "cie94", 4 if kp <= 16 else 8
                )
                return acc + w[0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        for name, lp in (("fused", loop_fused), ("xla", loop_xla)):
            np.asarray(lp(sharded, pal))  # warm/compile
            best = min(
                _timed(lambda i=i: np.asarray(lp(sharded, pal) + i))
                for i in range(3)
            )
            print(f"  {name} device {best / LOOP * 1e3:.2f} ms/assign "
                  f"({LOOP}-loop, latency not subtracted)")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
