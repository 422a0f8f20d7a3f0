"""sRGB <-> CIELAB color conversions (D65, Lindbloom constants).

TPU-native reimplementation of the reference WGSL converter kernels:

- sRGB -> Lab: reference `core/shaders/converters/rgb_to_lab.wgsl:5-80`
  (piecewise gamma expansion with threshold 0.04045, XYZ via the Lindbloom
  D65 matrix scaled x100, CIELAB f(t) with the classic 7.787*t + 16/116
  linear toe and epsilon 0.008856, white point 95.0489 / 100 / 108.8840).
- Lab -> sRGB: reference `core/shaders/converters/lab_to_rgb.wgsl:5-82`
  (exact inverse, sRGB gamma threshold 0.0031308).

These are pure elementwise jnp functions: XLA fuses them into neighbouring
kernels (distance computation, palette gather), so on TPU the conversion is
free of extra HBM round-trips — unlike the reference, which runs dedicated
conversion dispatches writing an intermediate Rgba32Float texture.

All math is float32 (TPU native); inputs may be any floating dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

# Lindbloom sRGB D65 matrices (see http://www.brucelindbloom.com/).
# Reference: rgb_to_lab.wgsl:5-9 (column-major mat3x3 -> row-major here).
# NOTE: the conversions below are written as explicit per-channel linear
# combinations rather than `@` matmuls: on TPU a jnp matmul routes through the
# MXU, which by default multiplies f32 as bf16 — the resulting ~0.4% error is
# catastrophically amplified by the XYZ->RGB cancellation for saturated
# colors. Elementwise VPU arithmetic keeps everything in full f32 (and is
# faster for a 3-wide channel axis anyway).
RGB_TO_XYZ = (
    (0.4124564, 0.3575761, 0.1804375),
    (0.2126729, 0.7151522, 0.0721750),
    (0.0193339, 0.1191920, 0.9503041),
)

# Reference: lab_to_rgb.wgsl:5-10.
XYZ_TO_RGB = (
    (3.2404542, -1.5371385, -0.4985314),
    (-0.9692660, 1.8760108, 0.0415560),
    (0.0556434, -0.2040259, 1.0572252),
)


def _mat3(m, v0, v1, v2):
    """Apply a 3x3 matrix to three channel planes, elementwise (no MXU)."""
    return tuple(m[i][0] * v0 + m[i][1] * v1 + m[i][2] * v2 for i in range(3))

# D65 reference white, x100 scale (rgb_to_lab.wgsl:44-46).
WHITE_POINT = (95.0489, 100.0, 108.8840)

# CIELAB toe constants (rgb_to_lab.wgsl:48-58).
_LAB_EPS = 0.008856
_LAB_SLOPE = 7.787
_LAB_OFFSET = 16.0 / 116.0


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """Piecewise sRGB gamma expansion (rgb_to_lab.wgsl:16-28). Input in [0,1]."""
    c = jnp.asarray(c, jnp.float32)
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Piecewise sRGB gamma compression (lab_to_rgb.wgsl:21-33)."""
    c = jnp.asarray(c, jnp.float32)
    # Clamp before the fractional pow to avoid NaN on tiny negatives produced
    # by the XYZ->RGB matrix for out-of-gamut Lab values.
    safe = jnp.maximum(c, 0.0)
    return jnp.where(c > 0.0031308, 1.055 * safe ** (1.0 / 2.4) - 0.055, 12.92 * c)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    """CIELAB cube-root with linear toe (rgb_to_lab.wgsl:48-58).

    Uses pow(t, 1/3) like the reference WGSL (`pow(x, 1.0/3.0)`), not
    jnp.cbrt — also keeps the Pallas kernel (no cbrt in Mosaic) bit-
    identical to this path. t >= 0 always (XYZ of non-negative linear RGB).
    """
    return jnp.where(
        t > _LAB_EPS, jnp.maximum(t, 0.0) ** (1.0 / 3.0), _LAB_SLOPE * t + _LAB_OFFSET
    )


def _lab_f_inv(t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `_lab_f` (lab_to_rgb.wgsl:42-58)."""
    t3 = t * t * t
    return jnp.where(t3 > _LAB_EPS, t3, (t - _LAB_OFFSET) / _LAB_SLOPE)


def srgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB [0,1] -> CIELAB. Last axis is the channel axis (size 3).

    Matches rgb_to_lab.wgsl `main` (rgb_to_lab.wgsl:62-80): gamma expansion,
    x100 scaling, XYZ matrix, white-point normalisation, f(t), L/a/b.
    """
    rgb = jnp.asarray(rgb, jnp.float32)
    lin = srgb_to_linear(rgb) * 100.0
    x, y, z = _mat3(RGB_TO_XYZ, lin[..., 0], lin[..., 1], lin[..., 2])
    fx = _lab_f(x / WHITE_POINT[0])
    fy = _lab_f(y / WHITE_POINT[1])
    fz = _lab_f(z / WHITE_POINT[2])
    l = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([l, a, b], axis=-1)


def lab_to_srgb(lab: jnp.ndarray) -> jnp.ndarray:
    """CIELAB -> sRGB in [0,1] (clipped). Inverse of `srgb_to_lab`.

    Matches lab_to_rgb.wgsl `main` (lab_to_rgb.wgsl:62-82).
    """
    lab = jnp.asarray(lab, jnp.float32)
    l, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (l + 16.0) / 116.0
    fx = a / 500.0 + fy
    fz = fy - b / 200.0
    x = _lab_f_inv(fx) * (WHITE_POINT[0] / 100.0)
    y = _lab_f_inv(fy) * (WHITE_POINT[1] / 100.0)
    z = _lab_f_inv(fz) * (WHITE_POINT[2] / 100.0)
    r, g, bl = _mat3(XYZ_TO_RGB, x, y, z)
    lin = jnp.stack([r, g, bl], axis=-1)
    return jnp.clip(linear_to_srgb(lin), 0.0, 1.0)


def srgb8_to_lab(rgb8: jnp.ndarray) -> jnp.ndarray:
    """uint8 sRGB -> Lab. Mirrors the Rgba8Unorm texture load (value/255)."""
    return srgb_to_lab(jnp.asarray(rgb8, jnp.float32) / 255.0)


def lab_to_srgb8(lab: jnp.ndarray) -> jnp.ndarray:
    """Lab -> uint8 sRGB with round-to-nearest, mirroring the Rgba8Unorm
    texture store conversion used by the reference output path
    (`core/src/structures.rs:368-479`)."""
    srgb = lab_to_srgb(lab)
    return jnp.round(srgb * 255.0).astype(jnp.uint8)


# ---------------------------------------------------------------------- #
# numpy mirrors — for tiny host-side work (palette sorting, fixed-color
# conversion) where an eager device dispatch would cost more than the math.
# Same formulas, float32.
# ---------------------------------------------------------------------- #

import numpy as _np


def srgb8_to_lab_np(rgb8: "_np.ndarray") -> "_np.ndarray":
    """uint8 sRGB -> Lab, numpy float32 (host-side mirror of srgb8_to_lab)."""
    c = _np.asarray(rgb8, _np.float32) / _np.float32(255.0)
    lin = _np.where(
        c > 0.04045,
        ((c + _np.float32(0.055)) / _np.float32(1.055)) ** _np.float32(2.4),
        c / _np.float32(12.92),
    ) * _np.float32(100.0)
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    planes = []
    for row, wp in zip(RGB_TO_XYZ, WHITE_POINT):
        t = (
            _np.float32(row[0]) * r + _np.float32(row[1]) * g + _np.float32(row[2]) * b
        ) / _np.float32(wp)
        planes.append(
            _np.where(
                t > _LAB_EPS,
                _np.maximum(t, 0) ** _np.float32(1.0 / 3.0),
                _np.float32(_LAB_SLOPE) * t + _np.float32(_LAB_OFFSET),
            )
        )
    fx, fy, fz = planes
    return _np.stack(
        [116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], axis=-1
    ).astype(_np.float32)
