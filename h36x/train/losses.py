"""Losses and metrics for 3D pose training.

Definitions match the reference exactly:
  - training loss is 3D-MSE only (reference src/train.py:161-164, 253-255)
  - MPJPE = mean per-joint L2 distance, same units as the joints
    (reference src/train.py:43-46)
  - bone-length MSE over the 16 H36M edges (reference src/train.py:50-57) —
    defined and tracked but, like the reference, not added to the loss.
  - 2D reprojection MSE through the batch intrinsics K (the reference
    defines `--lambda-2d` and `project_with_K_torch`, src/train.py:84-110,
    291, but never adds the term — h36x actually wires it, default off).
"""

from __future__ import annotations

import jax.numpy as jnp

from h36x.geometry.camera import project_with_K
from h36x.geometry.skeleton import edge_index_arrays

_EDGE_SRC, _EDGE_DST = edge_index_arrays()


def mse3d(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all coordinates; the phase-1 training loss.

    Equals mean(mse3d_per_row(...)) — every row reduces the same element
    count — and the scalar forms are defined that way so the math lives in
    ONE place (the per-row variants the weighted eval steps consume)."""
    return jnp.mean(mse3d_per_row(pred, gt))


def mse2d_reproj(pred3d: jnp.ndarray, joints2d: jnp.ndarray,
                 K: jnp.ndarray) -> jnp.ndarray:
    """MSE in pixels² between GT 2D joints and predicted 3D joints projected
    through the (crop-adjusted) intrinsics K.

    pred3d: (B,T,J,3) camera-frame meters; joints2d: (B,T,J,2) pixels in the
    crop frame; K: (B,3,3) as produced by extraction. The units the
    reference's disabled 2D path would have used (src/train.py:84-110).
    """
    return jnp.mean((project_with_K(pred3d, K) - joints2d) ** 2)


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error: mean over (B,T,J) of ||pred-gt||_2."""
    return jnp.mean(mpjpe_per_row(pred, gt))


def bone_length_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """MSE between predicted and GT bone lengths over the H36M skeleton.

    pred, gt: (B, T, J, 3).
    """
    return jnp.mean(bone_length_per_row(pred, gt))


# --- per-row variants (shape (B,)); used by the weighted eval step so that
# padded tail rows can be masked out of dataset-level means exactly ---


def mse3d_per_row(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2, axis=(1, 2, 3))


def mpjpe_per_row(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1), axis=(1, 2))


def bone_lengths(joints: jnp.ndarray) -> jnp.ndarray:
    """(..., J, 3) -> (..., E) H36M bone lengths. The single skeleton-edge
    implementation — the phase-1 row metric and the phase-2 AR-window
    metric (h36x/train/step.py) both build on it, so an edge change cannot
    silently diverge the two."""
    src = jnp.asarray(_EDGE_SRC)
    dst = jnp.asarray(_EDGE_DST)
    return jnp.linalg.norm(
        jnp.take(joints, dst, axis=-2) - jnp.take(joints, src, axis=-2),
        axis=-1,
    )


def bone_length_per_row(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((bone_lengths(pred) - bone_lengths(gt)) ** 2, axis=(1, 2))
