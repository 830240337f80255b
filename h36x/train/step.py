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

from typing import Callable

import jax
import jax.numpy as jnp

from h36x.infer import phd_forward_train_fused
from h36x.train.losses import (
    bone_length_loss,
    bone_length_per_row,
    bone_lengths,
    mpjpe,
    mpjpe_per_row,
    mse2d_reproj,
    mse3d,
    mse3d_per_row,
)
from h36x.train.state import TrainState


def make_train_step(model, optimizer, donate: bool = True,
                    fused: bool = False, interpret: bool = False,
                    precise: bool = True, lambda_2d: float = 0.0,
                    scan_steps: int = 1, accum_steps: int = 1) -> Callable:
    """Build the jitted training step.

    Returns step(state, batch, rng) -> (state, metrics) where batch =
    (feats (B,T,F), joints3d (B,T,J,3), joints2d, K) and metrics is a dict of
    scalars {loss, l3d, l2d, mpjpe, bone}.

    fused=True runs the forward AND backward of every residual block as
    Pallas kernels at precise (3-pass f32) MXU precision
    (:func:`h36x.infer.phd_forward_train_fused`); dropout semantics match
    the flax path. interpret only applies to fused (CPU testing).

    lambda_2d > 0 adds the 2D reprojection term the reference's CLI
    advertises but never wires (src/train.py:291 defines --lambda-2d
    default 1e-6; :161-164 trains on 3D MSE only): loss = l3d +
    lambda_2d * MSE(project_with_K(joints_pred, K), joints2d). Default 0.0
    reproduces the reference's actual behavior exactly.

    scan_steps > 1 returns a MULTI-step program instead:
    step(state, batches, rng) -> (state, metrics, rng) where every batch
    leaf carries a leading step axis and a `lax.scan` applies `scan_steps`
    full optimizer updates in ONE dispatch. The scan body derives each
    step's dropout key by the same carried `split` the host loop uses, so
    the parameter trajectory is identical to dispatching the steps one by
    one — only the host round trips are gone. For a model this size a
    single update is a few ms, comparable to dispatch overhead; scanning
    k steps amortizes that overhead k-fold (the classic XLA remedy — the
    whole epoch body is traced once; no data-dependent Python in the loop).
    Metrics come back stacked (scan_steps,) per key.

    accum_steps > 1 (exclusive with scan_steps) is gradient accumulation:
    the same step(state, batches, rng) -> (state, metrics, rng) signature
    over a stacked group, but the scan accumulates gradients across the
    group and applies ONE optimizer update over their mean — effective
    batch = accum_steps * batch_size with the per-microbatch memory
    footprint. The reference has no such mode (its effective batch is
    bounded by GPU memory, src/train.py:301-321); on TPU it composes with
    the mesh: each microbatch still shards over `data`.
    """
    if scan_steps > 1 and accum_steps > 1:
        raise ValueError("scan_steps and accum_steps are mutually exclusive")

    if fused:

        def forward(params, feats, rng):
            _, joints_pred = phd_forward_train_fused(
                params, feats, rng,
                dropout=model.dropout, joints_num=model.joints_num,
                groups=model.groups, regressor_iters=model.regressor_iters,
                interpret=interpret, precise=precise,
            )
            return joints_pred

    else:

        def forward(params, feats, rng):
            return model.apply(
                {"params": params}, feats, train=True, rngs={"dropout": rng}
            )[2]

    def loss_fn(params, feats, joints3d, joints2d, K, rng):
        joints_pred = forward(params, feats, rng)
        l3d = mse3d(joints_pred, joints3d)
        if lambda_2d > 0.0:
            l2d = mse2d_reproj(joints_pred, joints2d, K)
            return l3d + lambda_2d * l2d, (l3d, l2d, joints_pred)
        return l3d, (l3d, jnp.zeros_like(l3d), joints_pred)

    def grads_and_metrics(params, batch, rng):
        """Shared by the plain step and the grad-accum scan body."""
        feats, joints3d, joints2d, K = batch[0], batch[1], batch[2], batch[3]
        (loss, (l3d, l2d, joints_pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, feats, joints3d, joints2d, K, rng)
        metrics = {
            "loss": loss,
            "l3d": l3d,
            "l2d": l2d,
            "mpjpe": mpjpe(joints_pred, joints3d),
            "bone": bone_length_loss(joints_pred, joints3d),
        }
        return grads, metrics

    def step(state: TrainState, batch, rng):
        grads, metrics = grads_and_metrics(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    donate_argnums = (0,) if donate else ()
    if accum_steps > 1:

        def accum(state: TrainState, batches, rng):
            def body(carry, batch):
                r, gacc = carry
                r, sub = jax.random.split(r)
                grads, m = grads_and_metrics(state.params, batch, sub)
                gacc = jax.tree.map(jnp.add, gacc, grads)
                return (r, gacc), m

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            n_micro = jax.tree.leaves(batches)[0].shape[0]
            (rng, gsum), metrics = jax.lax.scan(body, (rng, zeros), batches)
            grads = jax.tree.map(lambda g: g / n_micro, gsum)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            return TrainState(params, opt_state, state.step + 1), metrics, rng

        return jax.jit(accum, donate_argnums=donate_argnums)
    if scan_steps > 1:

        def multi(state: TrainState, batches, rng):
            def body(carry, batch):
                s, r = carry
                r, sub = jax.random.split(r)
                s, m = step(s, batch, sub)
                return (s, r), m

            (state, rng), metrics = jax.lax.scan(body, (state, rng), batches)
            return state, metrics, rng

        return jax.jit(multi, donate_argnums=donate_argnums)
    return jax.jit(step, donate_argnums=donate_argnums)


def make_future_train_step(
    model,
    optimizer,
    input_len: int = 15,
    pred_len: int = 25,
    lambda_joints: float = 1.0,
    donate: bool = True,
    scan_steps: int = 1,
    accum_steps: int = 1,
) -> Callable:
    """Phase-2 step: train the autoregressive predictor f_AR.

    The reference stubs this phase (config.py INPUT_LEN/PRED_LEN/
    CURRICULUM_STEPS are defined but unused); this implements the PHD
    paper's AR stage on top of the same model:

      loss = mse(phi_hat, stop_grad(phi))        over the curriculum window
           + lambda_joints * mse(joints_hat, gt) over the curriculum window

    phi_hat[t] is f_AR's one-step prediction of phi[t]. The curriculum
    horizon h (passed per step, typically min(1+epoch*pred_len//steps,
    pred_len)) masks the loss to frames [input_len, input_len + h): early
    epochs supervise short-range prediction only, later epochs the full
    horizon. f_movie / f_3D / input_proj stay frozen by the phase-2
    optimizer, so gradients only flow into f_AR.

    step(state, batch, rng, horizon:int32) -> (state, metrics).

    scan_steps / accum_steps mirror :func:`make_train_step`'s grouped
    dispatch modes (mutually exclusive): the returned step takes a stacked
    batch group and returns (state, stacked_metrics, rng); horizon stays a
    per-call arg (it only changes per epoch).
    """
    if scan_steps > 1 and accum_steps > 1:
        raise ValueError("scan_steps and accum_steps are mutually exclusive")

    def loss_fn(params, feats, joints3d, rng, horizon):
        phi, phi_hat, _, joints_hat = model.apply(
            {"params": params}, feats, predict_future=True,
            train=True, rngs={"dropout": rng},
        )
        t_len = phi.shape[1]
        if input_len >= t_len:
            # static at trace time: an empty AR window would mask the whole
            # loss to exactly 0 — zero gradients, val "mpjpe" 0.0 recorded
            # as a perfect new best — with nothing visibly wrong
            raise ValueError(
                f"optim.input_len={input_len} >= clip length {t_len}: the "
                "phase-2 AR window is empty; lower --optim.input-len or "
                "extract longer clips")
        t_idx = jnp.arange(t_len)
        mask = (t_idx >= input_len) & (t_idx < input_len + horizon)
        mask_f = mask.astype(phi.dtype)
        denom = jnp.maximum(mask_f.sum(), 1.0)

        # f32 MSE even under --model.dtype bfloat16: both operands are the
        # network's bf16 activations, so without the cast the loss (and its
        # gradient) would be quantized to bf16 — phase 1 avoids this only
        # because its f32 ground truth promotes the subtraction.
        phi_target = jax.lax.stop_gradient(phi).astype(jnp.float32)
        phi_hat32 = phi_hat.astype(jnp.float32)
        l_ar = jnp.sum(
            jnp.mean((phi_hat32 - phi_target) ** 2, axis=(0, 2)) * mask_f
        ) / denom
        l_j = jnp.sum(
            jnp.mean((joints_hat - joints3d) ** 2, axis=(0, 2, 3)) * mask_f
        ) / denom
        loss = l_ar + lambda_joints * l_j
        # mpjpe masked to the SAME AR window as the losses (and as the
        # phase-2 eval step) — an unmasked train mpjpe would average the
        # frozen input window too and not be comparable to val mpjpe
        mp = jnp.sum(
            jnp.mean(jnp.linalg.norm(
                joints_hat.astype(jnp.float32) - joints3d.astype(jnp.float32),
                axis=-1), axis=(0, 2)) * mask_f
        ) / denom
        return loss, (l_ar, l_j, mp)

    def grads_and_metrics(params, batch, rng, horizon):
        feats, joints3d = batch[0], batch[1]
        (loss, (l_ar, l_j, mp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, feats, joints3d, rng, horizon)
        metrics = {
            "loss": loss,
            "l_ar": l_ar,
            "l3d": l_j,
            "mpjpe": mp,
        }
        return grads, metrics

    def apply(state, grads):
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params, opt_state, state.step + 1)

    def step(state: TrainState, batch, rng, horizon):
        grads, metrics = grads_and_metrics(state.params, batch, rng, horizon)
        return apply(state, grads), metrics

    donate_argnums = (0,) if donate else ()
    if scan_steps > 1:

        def multi(state: TrainState, batches, rng, horizon):
            def body(carry, batch):
                s, r = carry
                r, sub = jax.random.split(r)
                s, m = step(s, batch, sub, horizon)
                return (s, r), m

            (state, rng), metrics = jax.lax.scan(body, (state, rng), batches)
            return state, metrics, rng

        return jax.jit(multi, donate_argnums=donate_argnums)
    if accum_steps > 1:

        def accum(state: TrainState, batches, rng, horizon):
            def body(carry, batch):
                r, gacc = carry
                r, sub = jax.random.split(r)
                grads, m = grads_and_metrics(state.params, batch, sub, horizon)
                return (r, jax.tree.map(jnp.add, gacc, grads)), m

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            n_micro = jax.tree.leaves(batches)[0].shape[0]
            (rng, gsum), metrics = jax.lax.scan(body, (rng, zeros), batches)
            grads = jax.tree.map(lambda g: g / n_micro, gsum)
            return apply(state, grads), metrics, rng

        return jax.jit(accum, donate_argnums=donate_argnums)
    return jax.jit(step, donate_argnums=donate_argnums)


def curriculum_horizon(epoch: int, pred_len: int = 25, steps: int = 25) -> int:
    """AR supervision horizon for an epoch: 1 -> pred_len over `steps` epochs
    (reference config.py:21 CURRICULUM_STEPS intent)."""
    if steps <= 0:
        return pred_len
    return min(pred_len, 1 + epoch * pred_len // steps)


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


def make_weighted_eval_step(model) -> Callable:
    """Eval step returning weighted per-batch SUMS instead of means.

    step(params, batch) where batch = (feats, joints3d, ..., weights) and
    weights is float32 (B,) with 0 on padded tail rows (train/loop.py pads
    short batches up to the mesh data axis). Returning sums + the weight
    total lets the host form exact dataset means: padded rows contribute
    nothing and small tail batches are not over-weighted the way
    average-of-batch-means is. The weight vector shards over `data` like
    every other batch row, so each metric reduction is a global (psum'd)
    scalar under pjit.
    """

    def step(params, batch):
        feats, joints3d, w = batch[0], batch[1], batch[-1]
        _, _, joints_pred, _ = model.apply({"params": params}, feats)
        l3d = jnp.vdot(w, mse3d_per_row(joints_pred, joints3d))
        return {
            "loss": l3d,
            "l3d": l3d,
            "mpjpe": jnp.vdot(w, mpjpe_per_row(joints_pred, joints3d)),
            "bone": jnp.vdot(w, bone_length_per_row(joints_pred, joints3d)),
            "n": jnp.sum(w),
        }

    return jax.jit(step)


def make_weighted_future_eval_step(model, input_len: int = 15,
                                   pred_len: int = 25,
                                   lambda_joints: float = 1.0) -> Callable:
    """Phase-2 validation step: score the AR path, not the frozen one.

    Phase 2 trains only f_AR; everything the plain eval step scores
    (joints from f_3D(f_movie(x))) is frozen, so validating with it makes
    the val metric constant — epoch 1 would always be "best" and early
    stopping would fire blindly. This step runs predict_future=True,
    masks metrics to the full prediction window
    [input_len, input_len + pred_len) (no curriculum at eval), and returns
    the same weighted-SUM contract as :func:`make_weighted_eval_step`:
    loss = l_ar + lambda_joints * l3d over AR-window frames, mpjpe/bone on
    the AR-predicted joints, all per-row-weighted so padded rows vanish.
    """

    def step(params, batch):
        feats, joints3d, w = batch[0], batch[1], batch[-1]
        phi, phi_hat, _, joints_hat = model.apply(
            {"params": params}, feats, predict_future=True
        )
        if input_len >= phi.shape[1]:
            raise ValueError(
                f"optim.input_len={input_len} >= clip length {phi.shape[1]}: "
                "the phase-2 AR window is empty; eval metrics would be a "
                "fake 0.0")
        t_idx = jnp.arange(phi.shape[1])
        mask = ((t_idx >= input_len) & (t_idx < input_len + pred_len))
        mask_f = mask.astype(jnp.float32)
        denom = jnp.maximum(mask_f.sum(), 1.0)

        def window_mean(per_frame):  # (B, T) -> (B,) mean over AR window
            return jnp.sum(per_frame * mask_f, axis=1) / denom

        phi32 = jax.lax.stop_gradient(phi).astype(jnp.float32)
        l_ar_row = window_mean(
            jnp.mean((phi_hat.astype(jnp.float32) - phi32) ** 2, axis=2))
        jh = joints_hat.astype(jnp.float32)
        j3 = joints3d.astype(jnp.float32)
        l3d_row = window_mean(jnp.mean((jh - j3) ** 2, axis=(2, 3)))
        mpjpe_row = window_mean(
            jnp.mean(jnp.linalg.norm(jh - j3, axis=-1), axis=2))
        bone_row = window_mean(
            jnp.mean((bone_lengths(jh) - bone_lengths(j3)) ** 2, axis=2))
        return {
            "loss": jnp.vdot(w, l_ar_row + lambda_joints * l3d_row),
            "l3d": jnp.vdot(w, l3d_row),
            "mpjpe": jnp.vdot(w, mpjpe_row),
            "bone": jnp.vdot(w, bone_row),
            "n": jnp.sum(w),
        }

    return jax.jit(step)


def make_forward(model) -> Callable:
    """Jitted inference forward: (params, feats) -> joints_pred (B,T,J,3)."""

    @jax.jit
    def forward(params, feats):
        return model.apply({"params": params}, feats)[2]

    return forward
