"""Utilities: image IO (native codec + fallback), compile cache, profiling."""

from kmeans_tpu.utils.cache import enable_compilation_cache
from kmeans_tpu.utils.imageio import (
    HAVE_NATIVE,
    load_gif,
    load_image,
    save_gif,
    save_image,
)
from kmeans_tpu.utils.profiling import Timer, annotate, trace

__all__ = [
    "HAVE_NATIVE",
    "Timer",
    "annotate",
    "enable_compilation_cache",
    "load_gif",
    "load_image",
    "save_gif",
    "save_image",
    "trace",
]
