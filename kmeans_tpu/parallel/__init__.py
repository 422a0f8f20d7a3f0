"""Multi-device scaling: meshes, pixel-axis sharding, DP batching."""

from kmeans_tpu.parallel.distributed import fit_sharded, fit_sharded_batch
from kmeans_tpu.parallel.sharded_ops import quantize_image_sharded
from kmeans_tpu.parallel.mesh import DATA_AXIS, PIXEL_AXIS, make_mesh

__all__ = [
    "DATA_AXIS",
    "PIXEL_AXIS",
    "make_mesh",
    "fit_sharded",
    "fit_sharded_batch",
    "quantize_image_sharded",
]
