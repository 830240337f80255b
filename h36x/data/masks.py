"""Silhouette/mask utilities.

Ports of the reference's dormant mask helpers (src/datasets/
read_human_36m.py:126-217): bounding box over a silhouette stack, mask
cleanup keeping the largest contour, silhouette loading from H36M's
MATLAB-style .h5 masks, and pelvis-re-rooting of joint sets. Kept as part of
the inventory — useful for mask-supervised extensions.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def crop_from_silhouettes(silhouettes) -> Tuple[int, int, int, int]:
    """(x, y, w, h) bounding rect of the largest contour of the union mask
    over a silhouette stack (reference :126-147)."""
    import cv2

    union = np.asarray(silhouettes).any(axis=0)
    contours, _ = cv2.findContours(
        np.uint8(union) * 255, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
    )
    if not contours:
        raise ValueError("empty silhouette stack")
    # the reference ranks contours by point count (:139-144), which ties for
    # CHAIN_APPROX_SIMPLE rectangles; area is the robust ranking
    largest = max(contours, key=cv2.contourArea)
    return cv2.boundingRect(largest)


def clean_mask_to_crop(mask: np.ndarray, x: int, y: int, w: int, h: int) -> np.ndarray:
    """Crop a boolean mask and zero out everything but its largest contour
    (reference :149-167). Returns uint8 {0, 255}."""
    import cv2

    # >0 then scale: np.uint8(mask) * 255 would WRAP for uint8 {0,255}
    # inputs (255*255 == 1 mod 256), turning the mask near-black
    crop = (np.asarray(mask)[y : y + h, x : x + w] > 0).astype(np.uint8) * 255
    contours, _ = cv2.findContours(
        crop.copy(), cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
    )
    if not contours:
        return crop
    largest_i = max(range(len(contours)), key=lambda i: cv2.contourArea(contours[i]))
    out = np.dstack((crop, crop, crop))
    for i, cnt in enumerate(contours):
        if i != largest_i:
            cv2.drawContours(out, [cnt], 0, (0, 0, 0), -1)
    return cv2.split(out)[0]


def read_silhouettes(path: str, n_frames: Optional[int] = None) -> List[np.ndarray]:
    """H36M MATLAB .h5 mask file -> list of boolean masks (reference :203-217).
    Gated on h5py."""
    try:
        import h5py
    except ImportError as e:  # pragma: no cover - dependency gate
        raise RuntimeError("reading silhouette .h5 files needs h5py") from e

    masks = []
    with h5py.File(path, "r") as f:
        refs = f["Masks"]
        count = len(refs) if n_frames is None else n_frames
        for i in range(count):
            mask = np.array(f[refs[i, 0]], dtype=bool)
            masks.append(np.fliplr(np.rot90(mask, 3)))
    return masks


def reroot_joints(joints: np.ndarray, new_root: np.ndarray, in_meter: bool = False):
    """Offset a joint set onto a new root joint (reference compute_fua_joints,
    :113-124): joint 0 becomes new_root, the rest keep their offsets."""
    joints = np.asarray(joints, dtype=np.float64)
    out = np.empty_like(joints)
    out[0] = new_root
    out[1:] = new_root + joints[1:]
    if in_meter:
        out = out / 1000.0
    return out
