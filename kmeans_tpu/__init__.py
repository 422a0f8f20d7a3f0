"""kmeans_tpu: TPU-native image color quantization.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
redwarp/kmeans-gpu reference (see SURVEY.md): k-means palette extraction in
CIELAB with CIE94 distance, farthest-point seeding, three output modes
(replace / ordered dither / meld), octree/median-cut/Wu quantizers, and a
`palette` / `find` / `reduce` CLI — plus TPU-first extensions: fully
device-resident training (no per-iteration host syncs), batched
multi-k/multi-frame execution, multi-chip pixel sharding, shape/k/frame
bucketing for serving (`ImageProcessor(bucketing=True)` + `warmup`), an
HTTP daemon (`python -m kmeans_tpu.serve`), row-band streaming for
gigapixel images (`reduce_streamed` / `find_streamed` /
`palette_streamed`), selectable CIEDE2000 metric fused in the kernels
(`delta_e="2000"`), multi-restart training (`restarts=N`, vmapped with
device-side best-inertia selection), opt-in fast kernels (`fast=True`,
1.5x for k>16 palettes), and no 8192x8192 size cap.
"""

from kmeans_tpu.api import (
    Algorithm,
    ColorSpace,
    ImageProcessor,
    ReduceMode,
)
from kmeans_tpu.image import Image, borrowed_pixel, copied_pixel

__version__ = "0.1.0"

__all__ = [
    "Algorithm",
    "ColorSpace",
    "Image",
    "ImageProcessor",
    "ReduceMode",
    "borrowed_pixel",
    "copied_pixel",
    "__version__",
]
