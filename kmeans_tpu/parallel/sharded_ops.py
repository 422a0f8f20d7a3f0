"""Sharded full-resolution ops: quantize across the mesh's pixel axis.

The output pass is embarrassingly parallel over pixels, so no collectives
are needed — rows are placed across devices with a `NamedSharding` and XLA
partitions the jitted quantize automatically. This lifts the single-chip
HBM bound on image size (the reference is capped at 8192x8192 by GPU
texture limits, `README.md:9-11`; a v5e pod slice can hold arbitrarily
large pixel buffers sharded row-wise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from kmeans_tpu.ops.quantize import quantize_image
from kmeans_tpu.parallel.mesh import PIXEL_AXIS


def quantize_image_sharded(
    mesh,
    rgba_u8,
    palette_lab,
    mode: str = "replace",
    k_active=None,
    metric: str = "cie94",
):
    """Quantize `[H, W, 4]` uint8 with rows sharded over the mesh's pixel
    axis. Rows are padded up to the shard count and sliced back, so any
    height works. Returns the output array (gather with np.asarray)."""
    rgba_u8 = jnp.asarray(rgba_u8)
    h = rgba_u8.shape[0]
    d = mesh.shape[PIXEL_AXIS]
    h_pad = (h + d - 1) // d * d
    padded = (
        jnp.pad(rgba_u8, ((0, h_pad - h), (0, 0), (0, 0))) if h_pad != h else rgba_u8
    )
    sharded = jax.device_put(
        padded, NamedSharding(mesh, P(PIXEL_AXIS, None, None))
    )
    out = quantize_image(
        sharded, jnp.asarray(palette_lab), mode=mode, k_active=k_active,
        metric=metric,
    )
    return out[:h]
