"""Image container: dimensions + RGBA8 pixel buffer.

Python analogue of the reference's `Image<C: Container>` abstraction
(`core/src/image.rs:5-64`): a (width, height) pair plus a flat RGBA8 pixel
buffer. Where the Rust version distinguishes owned `Vec<RGBA8>` from borrowed
`&[RGBA8]` containers (`copied_pixel` / `borrowed_pixel`,
`core/src/image.rs:50-64`), numpy's view semantics make the distinction
unnecessary; both constructors are provided for API parity and differ only in
whether they copy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Image:
    """An RGBA8 image: `dimensions=(width, height)` and `pixels[H, W, 4]` uint8."""

    dimensions: tuple[int, int]
    pixels: np.ndarray  # [H, W, 4] uint8

    def __post_init__(self) -> None:
        w, h = self.dimensions
        px = np.asarray(self.pixels, dtype=np.uint8)
        if px.ndim == 1 or (px.ndim == 2 and px.shape[-1] == 4):
            px = px.reshape(h, w, 4)
        if px.shape != (h, w, 4):
            raise ValueError(
                f"pixel buffer shape {px.shape} does not match dimensions {(h, w, 4)}"
            )
        self.pixels = px

    @classmethod
    def new(cls, dimensions: tuple[int, int], pixels: np.ndarray) -> "Image":
        """`Image::new((width, height), rgba)` (`core/src/image.rs:13-20`)."""
        return cls(dimensions, pixels)

    @property
    def width(self) -> int:
        return self.dimensions[0]

    @property
    def height(self) -> int:
        return self.dimensions[1]

    def into_raw_pixels(self) -> np.ndarray:
        """Flat uint8 RGBA byte buffer (`core/src/image.rs:33-40`)."""
        return self.pixels.reshape(-1)


def copied_pixel(dimensions: tuple[int, int], rgba: np.ndarray) -> Image:
    """Owning constructor (`core/src/image.rs:50-56`)."""
    return Image(dimensions, np.array(rgba, dtype=np.uint8, copy=True))


def borrowed_pixel(dimensions: tuple[int, int], rgba: np.ndarray) -> Image:
    """Non-copying constructor (`core/src/image.rs:58-64`)."""
    return Image(dimensions, np.asarray(rgba, dtype=np.uint8))
