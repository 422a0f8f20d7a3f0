"""Device-mesh helpers.

The reference is single-device (`SURVEY.md` §2.3); its only concurrency is
one-host-thread-per-job (`core/examples/parallel.rs:36-51`). The TPU-native
scaling axes are:

- **data** ("dp"): independent frames / k-values sharded across devices;
- **pixel** ("sp"/context-parallel): one image's pixel axis sharded across
  devices, with `psum` combining the per-cluster (sum, count) partials and
  the seeding argmax — this workload's analogue of sequence parallelism.

`make_mesh` builds a 1-D or 2-D `jax.sharding.Mesh` over those axes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
PIXEL_AXIS = "pixel"


def make_mesh(devices=None, data: int = 1, pixel: int | None = None) -> Mesh:
    """Build a `(data, pixel)` mesh. With defaults, all devices go to the
    pixel axis (single-image scaling)."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if pixel is None:
        if n % data != 0:
            raise ValueError(f"{n} devices not divisible by data={data}")
        pixel = n // data
    if data * pixel != n:
        raise ValueError(f"mesh {data}x{pixel} != {n} devices")
    arr = np.array(devices).reshape(data, pixel)
    return Mesh(arr, (DATA_AXIS, PIXEL_AXIS))
