"""Hardware experiment: can Mosaic lower a 256-entry LUT as a 2-D gather?
(VERDICT #2 — round 1 only tried the 1-D forms, which Mosaic rejected
with "Only 2D gather is supported".)

Tries several table layouts / index forms in a minimal Pallas kernel and
reports which compile AND return correct values on the TPU; then, if one
works, times a gamma-LUT variant against the in-kernel pow chain. Run ON
TPU. Prints one JSON line per form.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS, LANES = 128, 128


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(3)
    idx_np = rng.integers(0, 256, (ROWS, LANES)).astype(np.int32)
    table_np = (np.arange(256, dtype=np.float32) / 255.0) ** 2.4
    want = table_np[idx_np]

    def try_form(name, tshape, body):
        table = jnp.asarray(table_np.reshape(tshape))
        idx = jnp.asarray(idx_np)

        def kernel(tbl_ref, in_ref, out_ref):
            out_ref[...] = body(tbl_ref[...], in_ref[...])

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        try:
            got = np.asarray(jax.jit(f)(table, idx))
            ok = bool(np.array_equal(got, want))
            print(json.dumps({"form": name, "compiles": True, "correct": ok}),
                  flush=True)
            return ok
        except Exception as e:
            s = str(e).strip()
            msg = s.splitlines()[0][:200] if s else type(e).__name__
            print(json.dumps({"form": name, "compiles": False, "error": msg}),
                  flush=True)
            return False

    def split_gather(tbl, idx):
        # Mosaic's gather rule demands indices.shape == operand.shape + (1,)
        # (an element-wise take_along_axis where operand and output share a
        # shape). A 256-entry LUT therefore splits into two 128-lane
        # broadcast tables selected by the index's top bit.
        lo_t = jnp.broadcast_to(tbl[0:1, :], (ROWS, LANES))
        hi_t = jnp.broadcast_to(tbl[1:2, :], (ROWS, LANES))
        lo = jnp.take_along_axis(lo_t, jnp.minimum(idx, 127), axis=1)
        hi = jnp.take_along_axis(hi_t, jnp.maximum(idx - 128, 0), axis=1)
        return jnp.where(idx < 128, lo, hi)

    working = []

    # A: [2, 128] table, advanced indexing tbl[hi, lo]
    if try_form(
        "adv-index-2x128", (2, 128),
        lambda tbl, idx: tbl[idx >> 7, idx & 127],
    ):
        working.append("adv-index-2x128")
    # B: [16, 16] table
    if try_form(
        "adv-index-16x16", (16, 16),
        lambda tbl, idx: tbl[idx >> 4, idx & 15],
    ):
        working.append("adv-index-16x16")
    # C: take_along_axis on a [128, 256] broadcast (row-aligned gather)
    if try_form(
        "take-along-rows-128x256", (1, 256),
        lambda tbl, idx: jnp.take_along_axis(
            jnp.broadcast_to(tbl, (ROWS, 256)), idx, axis=1
        ),
    ):
        working.append("take-along-rows-128x256")
    # D: the shape Mosaic's assert describes — operand == output shape,
    # element-wise index along the lane axis, split over two half-tables.
    if try_form("split-take-along-128", (2, 128), split_gather):
        working.append("split-take-along-128")

    print(json.dumps({"working_forms": working}))

    if not working:
        return

    # Time the winning form against the pow chain on a full 4K-sized pass.
    import jax.numpy as jnp

    N = 3840 * 2160
    M = (N + LANES - 1) // LANES
    M = (M + ROWS - 1) // ROWS * ROWS
    data = jnp.asarray(
        rng.integers(0, 256, (M, LANES)).astype(np.int32)
    )
    tiny = jnp.zeros(8, jnp.uint8) + 1
    np.asarray(tiny)
    lat = min(_timed(lambda: np.asarray(tiny)) for _ in range(10))

    form = working[0]
    if form == "adv-index-2x128":
        tshape, gat = (2, 128), lambda tbl, idx: tbl[idx >> 7, idx & 127]
    elif form == "adv-index-16x16":
        tshape, gat = (16, 16), lambda tbl, idx: tbl[idx >> 4, idx & 15]
    elif form == "split-take-along-128":
        tshape, gat = (2, 128), split_gather
    else:
        tshape = (1, 256)
        gat = lambda tbl, idx: jnp.take_along_axis(
            jnp.broadcast_to(tbl, (ROWS, 256)), idx, axis=1
        )
    table = jnp.asarray(table_np.reshape(tshape))

    # 8 evaluations per element: the 66 MB tile traffic costs ~1.7 ms at
    # HBM rate and masks single-evaluation compute differences — raising
    # arithmetic intensity exposes the gather-vs-pow compute cost itself.
    REPEAT = 8

    def lut_kernel(tbl_ref, in_ref, out_ref):
        tbl = tbl_ref[...]
        idx = in_ref[...]
        acc = jnp.zeros(idx.shape, jnp.float32)
        for j in range(REPEAT):
            acc = acc + gat(tbl, (idx + j) & 255)
        out_ref[...] = acc

    def pow_kernel(in_ref, out_ref):
        idx = in_ref[...]
        acc = jnp.zeros(idx.shape, jnp.float32)
        for j in range(REPEAT):
            c = ((idx + j) & 255).astype(jnp.float32) / 255.0
            acc = acc + jnp.where(
                c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92
            )
        out_ref[...] = acc

    grid = (M // ROWS,)
    lut_f = pl.pallas_call(
        lut_kernel,
        out_shape=jax.ShapeDtypeStruct((M, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    pow_f = pl.pallas_call(
        pow_kernel,
        out_shape=jax.ShapeDtypeStruct((M, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    LOOP = 20

    @jax.jit
    def loop_lut(d):
        def body(i, acc):
            return acc + lut_f(table, d + (acc > 1e30).astype(jnp.int32))[0, 0]

        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    @jax.jit
    def loop_pow(d):
        def body(i, acc):
            return acc + pow_f(d + (acc > 1e30).astype(jnp.int32))[0, 0]

        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    np.asarray(loop_lut(data))
    np.asarray(loop_pow(data))
    t_lut = min(_timed(lambda: np.asarray(loop_lut(data))) for _ in range(3))
    t_pow = min(_timed(lambda: np.asarray(loop_pow(data))) for _ in range(3))
    print(
        json.dumps(
            {
                "form": form,
                "lut_ms": round((t_lut - lat) / LOOP * 1e3, 3),
                "pow_ms": round((t_pow - lat) / LOOP * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
