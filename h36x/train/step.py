"""Jitted train / eval steps, single-chip or sharded over a mesh.

One compiled program does forward + loss + backward + AdamW update + metrics
(reference equivalent: the body of src/train.py:131-193). Under a mesh the
batch arrives sharded over `data`; because parameters are replicated (or TP
sharded), XLA inserts the gradient all-reduce over ICI automatically — the
SPMD replacement for nn.DataParallel's scatter/gather.

Loss is 3D-MSE only, exactly as the reference trains (src/train.py:161-164);
MPJPE and bone-length are computed as metrics.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from h36x.train.losses import bone_length_loss, mpjpe, mse3d
from h36x.train.state import TrainState


def make_train_step(model, optimizer, donate: bool = True) -> Callable:
    """Build the jitted training step.

    Returns step(state, batch, rng) -> (state, metrics) where batch =
    (feats (B,T,F), joints3d (B,T,J,3), joints2d, K) and metrics is a dict of
    scalars {loss, l3d, mpjpe, bone}.
    """

    def loss_fn(params, feats, joints3d, rng):
        _, _, joints_pred, _ = model.apply(
            {"params": params}, feats, train=True, rngs={"dropout": rng}
        )
        l3d = mse3d(joints_pred, joints3d)
        return l3d, joints_pred

    def step(state: TrainState, batch, rng):
        feats, joints3d = batch[0], batch[1]
        (l3d, joints_pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, feats, joints3d, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics = {
            "loss": l3d,
            "l3d": l3d,
            "mpjpe": mpjpe(joints_pred, joints3d),
            "bone": bone_length_loss(joints_pred, joints3d),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(model, return_preds: bool = False) -> Callable:
    """Jitted eval step: (params, batch) -> metrics (and optionally preds)."""

    def step(params, batch):
        feats, joints3d = batch[0], batch[1]
        _, _, joints_pred, _ = model.apply({"params": params}, feats)
        l3d = mse3d(joints_pred, joints3d)
        metrics = {
            "loss": l3d,
            "l3d": l3d,
            "mpjpe": mpjpe(joints_pred, joints3d),
            "bone": bone_length_loss(joints_pred, joints3d),
        }
        if return_preds:
            return metrics, joints_pred
        return metrics

    return jax.jit(step)


def make_forward(model) -> Callable:
    """Jitted inference forward: (params, feats) -> joints_pred (B,T,J,3)."""

    @jax.jit
    def forward(params, feats):
        return model.apply({"params": params}, feats)[2]

    return forward
