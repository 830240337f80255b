"""Fused crop -> resize -> scale preprocessing on device.

The reference crops uint8 frames with tensor slicing and resizes on CPU
workers (reference src/dataset.py:141-152). Here the crop AND the bilinear
resize are folded into two small interpolation matrices per clip, computed on
host, so the device does

    out[b,t] = Wy[b] @ frames[b,t] @ Wx[b]^T        (per channel)

— one pair of MXU matmuls per frame, no gathers, no dynamic shapes. The crop
box only changes matrix *values*, never shapes, so every clip hits the same
compiled program. Normalization ((x/255 - mean)/std) fuses into the same jit.

Sampling grid parity: integer-pixel crop box (top, left, h, w) followed by
bilinear align_corners=False resize to out_size — identical math to
torchvision resize(antialias=False) on the cropped tensor.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ImageNet statistics (reference src/dataset.py:242-245)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def crop_resize_matrix(start: int, size: int, in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) matrix: crop [start, start+size) then bilinear
    resize to out_size (align_corners=False).

    Built from :func:`crop_resize_grid`'s (lo, hi, frac) so the sampling
    convention (half-pixel centers, the double clamp) lives in exactly one
    place — the matmul formulation and the production gather formulation
    can never desynchronize."""
    lo, hi, frac = crop_resize_grid(start, size, in_size, out_size)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo.astype(np.int64)), 1.0 - frac)
    np.add.at(mat, (rows, hi.astype(np.int64)), frac)
    return mat


def crop_resize_matrices(box, img_h: int, img_w: int, out_size: int = 224):
    """Host helper: box (top, left, h, w) -> (Wy (out,H), Wx (out,W))."""
    top, left, hh, ww = (int(v) for v in np.asarray(box).reshape(4))
    wy = crop_resize_matrix(top, hh, img_h, out_size)
    wx = crop_resize_matrix(left, ww, img_w, out_size)
    return wy, wx


def fused_crop_resize(frames: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray) -> jnp.ndarray:
    """Device: (…, T, H, W, C) uint8/float frames -> (…, T, out, out, C) in [0, 1].

    The einsum requires a time axis ('...thwc'); for single images use
    :func:`fused_crop_resize_gather` (genuinely rank-agnostic) or add a
    length-1 axis. wy/wx may carry leading batch dims matching the frames'
    leading dims (e.g. frames (B,T,H,W,C), wy (B,out,H), wx (B,out,W)).
    """
    x = frames.astype(jnp.float32)
    x = jnp.einsum("...oh,...thwc->...towc", wy, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("...pw,...towc->...topc", wx, x, preferred_element_type=jnp.float32)
    return x * (1.0 / 255.0)


def imagenet_normalize(video01: jnp.ndarray) -> jnp.ndarray:
    """(…, C=3 last) [0,1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (video01 - mean) / std


# ---------------------------------------------------------------------------
# Gather + lerp formulation (the production path)
#
# Each output row/column of a bilinear resize touches exactly two source
# rows/columns, so the matmul above does O(H) work per output where a gather
# does O(1): two row gathers + a lerp per axis. For a 224-crop out of a
# 1000x1000 H36M frame that is ~1000x fewer FLOPs (VPU-only, no MXU),
# leaving the MXU entirely to the ResNet. Sampling math is identical.
# ---------------------------------------------------------------------------


def crop_resize_grid(start: int, size: int, in_size: int, out_size: int):
    """Host: (lo, hi, frac) int32/int32/float32 arrays of shape (out_size,)."""
    scale = size / out_size
    src = start + (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, start, start + size - 1)
    src = np.clip(src, 0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1).astype(np.int32)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def crop_resize_grids(box, img_h: int, img_w: int, out_size: int = 224):
    """Host: box (top, left, h, w) -> (grid_y, grid_x) tuples for the op."""
    top, left, hh, ww = (int(v) for v in np.asarray(box).reshape(4))
    return (
        crop_resize_grid(top, hh, img_h, out_size),
        crop_resize_grid(left, ww, img_w, out_size),
    )


def _lerp_axis(x: jnp.ndarray, lo, hi, frac, axis: int) -> jnp.ndarray:
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = frac.shape[0]
    f = frac.reshape(shape)
    return a * (1.0 - f) + b * f


def fused_crop_resize_gather(frames: jnp.ndarray, grid_y, grid_x) -> jnp.ndarray:
    """Device: (..., H, W, C) frames -> (..., out, out, C) in [0, 1].

    grid_y/grid_x: (lo, hi, frac) arrays from :func:`crop_resize_grids`
    (unbatched — use jax.vmap for per-clip grids over a batch).
    """
    x = frames.astype(jnp.float32)
    x = _lerp_axis(x, grid_y[0], grid_y[1], grid_y[2], axis=-3)
    x = _lerp_axis(x, grid_x[0], grid_x[1], grid_x[2], axis=-2)
    return x * (1.0 / 255.0)
