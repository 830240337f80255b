"""Losses and metrics for 3D pose training.

Definitions match the reference exactly:
  - training loss is 3D-MSE only (reference src/train.py:161-164, 253-255)
  - MPJPE = mean per-joint L2 distance, same units as the joints
    (reference src/train.py:43-46)
  - bone-length MSE over the 16 H36M edges (reference src/train.py:50-57) —
    defined and tracked but, like the reference, not added to the loss.
"""

from __future__ import annotations

import jax.numpy as jnp

from h36x.geometry.skeleton import edge_index_arrays

_EDGE_SRC, _EDGE_DST = edge_index_arrays()


def mse3d(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all coordinates; the phase-1 training loss."""
    return jnp.mean((pred - gt) ** 2)


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error: mean over (B,T,J) of ||pred-gt||_2."""
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1))


def bone_length_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """MSE between predicted and GT bone lengths over the H36M skeleton.

    pred, gt: (B, T, J, 3).
    """
    src = jnp.asarray(_EDGE_SRC)
    dst = jnp.asarray(_EDGE_DST)
    pred_len = jnp.linalg.norm(
        jnp.take(pred, dst, axis=-2) - jnp.take(pred, src, axis=-2), axis=-1
    )
    gt_len = jnp.linalg.norm(
        jnp.take(gt, dst, axis=-2) - jnp.take(gt, src, axis=-2), axis=-1
    )
    return jnp.mean((pred_len - gt_len) ** 2)


# --- per-row variants (shape (B,)); used by the weighted eval step so that
# padded tail rows can be masked out of dataset-level means exactly ---


def mse3d_per_row(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2, axis=(1, 2, 3))


def mpjpe_per_row(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1), axis=(1, 2))


def bone_length_per_row(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    src = jnp.asarray(_EDGE_SRC)
    dst = jnp.asarray(_EDGE_DST)
    pred_len = jnp.linalg.norm(
        jnp.take(pred, dst, axis=-2) - jnp.take(pred, src, axis=-2), axis=-1
    )
    gt_len = jnp.linalg.norm(
        jnp.take(gt, dst, axis=-2) - jnp.take(gt, src, axis=-2), axis=-1
    )
    return jnp.mean((pred_len - gt_len) ** 2, axis=(1, 2))
