"""Person-crop geometry: square crop from 2D joints, coordinate remapping.

Host-side numpy (these run inside the data pipeline, never on device).
Parity targets: reference src/dataset.py:75-115.
"""

from __future__ import annotations

import numpy as np


def compute_square_crop_from_2d(
    joints2d, img_h: int, img_w: int, scale: float = 1.6
) -> np.ndarray:
    """Square crop box (top, left, side, side) covering the 2D joints.

    The box is centered on the joint bounding box, has side = scale * max
    extent, is clamped into the image, and is rounded to integer pixels
    (reference src/dataset.py:75-104). Returns an int64 array (4,).
    """
    pts = np.asarray(joints2d, dtype=np.float64).reshape(-1, 2)

    x_min, y_min = pts.min(axis=0)
    x_max, y_max = pts.max(axis=0)

    cx = 0.5 * (x_min + x_max)
    cy = 0.5 * (y_min + y_max)

    w = max(x_max - x_min, 1.0)
    h = max(y_max - y_min, 1.0)
    side = scale * max(w, h)

    left = cx - 0.5 * side
    top = cy - 0.5 * side
    left = float(np.clip(left, 0.0, img_w - side))
    top = float(np.clip(top, 0.0, img_h - side))

    left_i = int(round(left))
    top_i = int(round(top))
    side_i = int(round(side))
    # When side exceeds an image dimension the clip above goes negative
    # (the reference then slices with wrapping negative indices —
    # src/dataset.py:94-103 latent edge case); clamp to a valid in-image box.
    left_i = max(0, left_i)
    top_i = max(0, top_i)
    side_i = max(1, min(side_i, img_w - left_i, img_h - top_i))
    return np.array([top_i, left_i, side_i, side_i], dtype=np.int64)


def adjust_joints2d_after_crop_and_resize(joints2d, box, out_size: int = 224):
    """Remap pixel joints into the cropped+resized frame.

    box = (top, left, h, w). Matches reference src/dataset.py:107-115.
    """
    top, left, hh, ww = (float(v) for v in np.asarray(box).reshape(4))
    j = np.asarray(joints2d, dtype=np.float32).copy()
    j[..., 0] = (j[..., 0] - left) * (out_size / ww)
    j[..., 1] = (j[..., 1] - top) * (out_size / hh)
    return j
