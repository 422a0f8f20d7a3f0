"""Build script for the native runtime extension.

Builds `kmeans_tpu/runtime/_imagio` (libpng/libjpeg/GIF codec) in place:

    python setup.py build_ext --inplace

The framework degrades gracefully without it (pure-Python PNG fallback in
`kmeans_tpu/utils/png_py.py`); JPEG and GIF require the extension.
"""

from setuptools import Extension, setup

setup(
    name="kmeans_tpu",
    version="0.1.0",
    packages=[
        "kmeans_tpu",
        "kmeans_tpu.ops",
        "kmeans_tpu.models",
        "kmeans_tpu.parallel",
        "kmeans_tpu.utils",
    ],
    ext_modules=[
        Extension(
            "kmeans_tpu.runtime._imagio",
            sources=["kmeans_tpu/runtime/_imagio.c"],
            libraries=["png", "jpeg", "z"],
            extra_compile_args=["-O2"],
        )
    ],
)
