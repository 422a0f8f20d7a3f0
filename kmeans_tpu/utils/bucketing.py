"""Shape bucketing for serving — bounded executable counts on TPU.

Every distinct input shape costs a fresh XLA compilation (minutes over a
remote-compile tunnel). A serving deployment that accepts arbitrary user
images must therefore NOT compile per exact size: we round each dimension
up to a bucket from the geometric ladder {4, 5, 6, 7} * 2^k, pad the image
bottom/right, run the static-shaped executable, and crop the result.

Ladder properties:
- per-axis padding overhead < 25% (adjacent rungs differ by <= 5/4);
- O(log max_dim) rungs per axis, so the executable population is small and
  enumerable (a warmup pass can precompile all of them);
- padding at the bottom/right edge keeps every real pixel's (x, y)
  coordinate — ordered dithering stays exact after cropping.

Training correctness under padding is handled by the weighted-fit path
(`models.kmeans.fit(weight=...)` + `ops.resize.resize_to_canvas`): pad
pixels can never be chosen as seeds and contribute exact zeros to every
centroid update.
"""

from __future__ import annotations

import numpy as np

_MANTISSAS = (4, 5, 6, 7)


def next_bucket(n: int) -> int:
    """Smallest ladder value m * 2^k (m in {4,5,6,7}, k >= 0) that is >= n."""
    n = int(n)
    if n <= _MANTISSAS[0]:
        return _MANTISSAS[0]
    best = None
    k = 0
    while (_MANTISSAS[0] << k) < n:
        k += 1
    # Candidates live at exponent k (where 4*2^k >= n) and k-1 (where the
    # larger mantissas may already clear n).
    for kk in (k - 1, k):
        if kk < 0:
            continue
        for m in _MANTISSAS:
            v = m << kk
            if v >= n:
                best = v if best is None else min(best, v)
    return best


def bucket_shape(height: int, width: int) -> tuple[int, int]:
    """Bucketed (height, width) for an image."""
    return next_bucket(height), next_bucket(width)


def pad_to_bucket(pixels: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Zero-pad `[H, W, C]` bottom/right to its bucket shape.

    Returns (padded, H, W). Pad content is arbitrary (downstream consumers
    mask or crop it); zeros keep the host-side cost at one memset.
    """
    h, w = pixels.shape[0], pixels.shape[1]
    bh, bw = bucket_shape(h, w)
    if (bh, bw) == (h, w):
        return pixels, h, w
    padded = np.zeros((bh, bw) + pixels.shape[2:], dtype=pixels.dtype)
    padded[:h, :w] = pixels
    return padded, h, w


def bucket_frames(n: int) -> int:
    """Bucketed frame count for batched (GIF) pipelines. Counts 1-3 are
    their own buckets (padding a 1-frame batch 4x would be real wasted
    compute); larger counts use the ladder, bounding executables per
    (bucket shape, k, mode) to O(log max_frames)."""
    n = int(n)
    return n if n < 4 else next_bucket(n)


def bucket_k(k: int) -> int:
    """Padded cluster-axis size for serving: the next power of two >= k
    (min 4). All requests with k <= bucket share one executable — the
    active count travels as a traced `k_active` scalar and trailing
    clusters are masked. Compute scales with the bucket (worst case ~2x
    the exact-k cost), bounded at 7 buckets for k <= 256.
    """
    k = int(k)
    b = 4
    while b < k:
        b <<= 1
    return b


def pad_palette_k(palette_lab):
    """Pad a `[K, 3]` Lab palette's rows to `bucket_k(K)` (copies of row 0,
    masked downstream by `k_active`). Returns (padded, K)."""
    import jax.numpy as jnp

    k = palette_lab.shape[0]
    kp = bucket_k(k)
    if kp != k:
        palette_lab = jnp.concatenate(
            [palette_lab, jnp.broadcast_to(palette_lab[:1], (kp - k, 3))]
        )
    return palette_lab, k
