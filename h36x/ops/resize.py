"""Bilinear image resize on device (jnp), matching torch's non-antialiased
`interpolate(..., mode="bilinear", align_corners=False)` sampling grid.

A convenience wrapper over the SAME sampling-grid construction the
production extraction front end uses (h36x/ops/preprocess.py
crop_resize_matrix, of which a full-image resize is the no-crop special
case) — one grid implementation, no drift. Kept for whole-image resizes
(e.g. results-stage video downscaling oracles) where the channels-leading
(..., H, W) layout of decoded video is what arrives.

Implemented as two separable 1-D interpolations expressed as small matmuls
(gather-free), which XLA fuses and the MXU executes: out = Wy @ img @ Wx^T.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear matrix: the no-crop case of
    h36x.ops.preprocess.crop_resize_matrix (single shared grid impl)."""
    from h36x.ops.preprocess import crop_resize_matrix

    return crop_resize_matrix(0, in_size, in_size, out_size)


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
