"""Hardware check: the fused meld kernel under shard_map (1-chip mesh).

Validates that `meld_fused_sharded` — each shard running
`fused_meld_packed` (Mosaic, in-kernel RGB24 pack) on its local rows —
lowers and executes on real TPU hardware inside `jax.shard_map`, produces
pixels bit-equal to the single-chip packed meld, and measures its device
time against the XLA sharded meld it replaces on TPU meshes.

Run: python tools/exp_sharded_meld.py [H W K]
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
    meld_fused_sharded,
    quantize_image_sharded,
    unpack_meld_sharded,
)
from kmeans_tpu.api import _meld_packed_jit, _unpack_meld


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

    # Correctness: sharded fused vs the single-chip fused kernel.
    words = meld_fused_sharded(mesh, rgb, pal)
    got = unpack_meld_sharded(np.asarray(words), h, w, k, d)
    single_words = _meld_packed_jit(jnp.asarray(rgb), pal)
    want = _unpack_meld(np.asarray(single_words), h, w, k)
    eq = (got == want).all(axis=-1).mean()
    print(f"meld k={k}: match_vs_single_chip={eq:.8f}")

    # Drift vs the XLA sharded meld (knife-edge blend ties).
    xla = np.asarray(quantize_image_sharded(mesh, rgb, pal, mode="meld"))
    frac = (got != xla).any(axis=-1).mean()
    print(f"meld k={k}: diff_pixel_frac_vs_xla={frac:.2e}")

    # Timing: fresh readback per rep (host copies cache).
    def run_fused():
        ws = meld_fused_sharded(mesh, rgb, pal)
        return np.asarray(ws)

    def run_xla():
        out = quantize_image_sharded(mesh, rgb, pal, mode="meld")
        return np.asarray(out)

    for name, fn in (("fused+rgb24", run_fused), ("xla sharded", run_xla)):
        fn()  # warm
        best = min(
            (lambda t0=time.perf_counter(): (fn(), time.perf_counter() - t0))()[1]
            for _ in range(5)
        )
        print(f"{name}: best {best*1e3:.1f} ms e2e (incl. readback)")


if __name__ == "__main__":
    main()
