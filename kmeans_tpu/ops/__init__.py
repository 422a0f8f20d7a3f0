"""Compute ops: color science, distance metrics, resize, dither/meld, Pallas kernels."""

from kmeans_tpu.ops.colorspace import (
    lab_to_srgb,
    lab_to_srgb8,
    linear_to_srgb,
    srgb8_to_lab,
    srgb_to_lab,
    srgb_to_linear,
)
from kmeans_tpu.ops.delta_e import distance_cie94, distance_cie94_sq, distance_cie2000
from kmeans_tpu.ops.resize import resize_bilinear, resize_uint8, shrunk_dimensions

__all__ = [
    "srgb_to_lab",
    "lab_to_srgb",
    "srgb8_to_lab",
    "lab_to_srgb8",
    "srgb_to_linear",
    "linear_to_srgb",
    "distance_cie94",
    "distance_cie94_sq",
    "distance_cie2000",
    "resize_bilinear",
    "resize_uint8",
    "shrunk_dimensions",
]
