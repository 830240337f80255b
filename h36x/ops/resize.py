"""Bilinear image resize on device (jnp), matching torch's non-antialiased
`interpolate(..., mode="bilinear", align_corners=False)` sampling grid.

Used by the fused preprocessing path (crop -> resize -> normalize) of the
feature-extraction stage (reference src/dataset.py:141-152 resizes crops with
torchvision F.resize(antialias=False), which is bilinear align_corners=False).

Implemented as two separable 1-D interpolations expressed as small matmuls
(gather-free), which XLA fuses and the MXU executes: out = Wy @ img @ Wx^T.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    scale = in_size / out_size
    # align_corners=False pixel-center mapping: src = (dst + 0.5) * scale - 0.5
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), (1.0 - frac).astype(np.float32))
    np.add.at(mat, (rows, hi), frac.astype(np.float32))
    return mat


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear-resize the trailing two spatial axes of (..., H, W).

    Channels (if any) must be leading, e.g. (T, C, H, W) or (B, T, C, H, W).
    """
    in_h, in_w = img.shape[-2], img.shape[-1]
    wy = jnp.asarray(_interp_matrix(in_h, out_h))  # (out_h, in_h)
    wx = jnp.asarray(_interp_matrix(in_w, out_w))  # (out_w, in_w)
    x = img.astype(jnp.float32)
    # (..., H, W) -> (..., out_h, W): contract H against wy.
    x = jnp.einsum("oh,...hw->...ow", wy, x)
    # (..., out_h, W) -> (..., out_h, out_w): contract W against wx.
    x = jnp.einsum("pw,...ow->...op", wx, x)
    return x
