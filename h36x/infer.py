"""Fused inference engine for the PHD model (the serving path).

Runs the exact computation of PHDFor3DJoints.apply in eval mode, but with
the hot ops lowered to Pallas TPU kernels reading the flax param tree
directly:

  - every ResidualBlock -> two fused GN+ReLU+causal-conv kernels
    (:mod:`h36x.ops.pallas_temporal`), activations stay in VMEM between
    norm and conv;
  - the iterative joint regressor -> one fused kernel holding all MLP
    weights in VMEM for the 3 refinement rounds
    (:mod:`h36x.ops.pallas_regressor`).

Precision contract: with precise=False the kernels' matmuls run at the
MXU's default single-pass path (~1e-3-relative agreement with model.apply,
a few mm absolute on metre-scale joints); precise=True (the fused training
path) runs 3-pass bf16-split matmuls at ~1e-6 relative. For bit-level
parity work (e.g. the 0.1 mm criterion in h36x-parity) use
`use_pallas=False` or model.apply.

Measured reality check (v5e, in-jit loops, B=64/T=40/latent=1024 — see
DESIGN.md "Pallas vs XLA on the PHD model"): XLA's conv-as-one-GEMM
formulation (h36x/ops/causal_conv.py) beats the fused kernels at default
numerics (serving 1.22 vs 1.45 ms; train step 4.6 vs 10.6 ms), and the
fused precise training step is at parity with XLA under
default_matmul_precision('highest') (14.6 vs 14.0 ms). The fused paths
stay correct, tested and selectable (--fused / use_pallas), but the
production default is XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from h36x.ops.pallas_regressor import _reference_forward, fused_joint_regressor
from h36x.ops.pallas_temporal import (
    fused_residual_block,
    reference_gn_relu_cconv,
)


def sorted_blocks(net_params: dict):
    """Residual-block names in execution order (block0, block1, ... —
    numeric suffix sort, shared by the batch, masked and streaming paths
    so the ordering invariant lives in exactly one place)."""
    return sorted(net_params.keys(), key=lambda n: int(n.removeprefix("block")))


def _temporal_net(x, net_params, groups, use_pallas, interpret, tile_o):
    blocks = sorted_blocks(net_params)
    for name in blocks:
        p = net_params[name]
        if use_pallas:
            x = fused_residual_block(
                x, p, groups=groups, tile_o=tile_o, interpret=interpret
            )
        else:
            h = reference_gn_relu_cconv(
                x, p["gn1"]["scale"], p["gn1"]["bias"],
                p["conv1"]["kernel"], p["conv1"]["bias"], groups=groups,
            )
            x = reference_gn_relu_cconv(
                h, p["gn2"]["scale"], p["gn2"]["bias"],
                p["conv2"]["kernel"], p["conv2"]["bias"],
                residual=x, groups=groups,
            )
    return x


def _temporal_net_masked(x, net_params, groups, valid_len):
    """XLA-path temporal net with GroupNorm statistics masked to
    [0, valid_len) — required for fixed-shape autoregressive rollout (GN is
    the block's one non-causal op). Outputs at t >= valid_len are invalid."""
    blocks = sorted_blocks(net_params)
    for name in blocks:
        p = net_params[name]
        h = reference_gn_relu_cconv(
            x, p["gn1"]["scale"], p["gn1"]["bias"],
            p["conv1"]["kernel"], p["conv1"]["bias"], groups=groups,
            valid_len=valid_len,
        )
        x = reference_gn_relu_cconv(
            h, p["gn2"]["scale"], p["gn2"]["bias"],
            p["conv2"]["kernel"], p["conv2"]["bias"],
            residual=x, groups=groups, valid_len=valid_len,
        )
    return x


def _regressor(phi, reg_params, joints_num, use_pallas, interpret, iters=3):
    b, t, d = phi.shape
    out_dim = joints_num * 3
    w1 = reg_params["fc1"]["kernel"]
    b1 = reg_params["fc1"]["bias"]
    w2 = reg_params["fc2"]["kernel"]
    b2 = reg_params["fc2"]["bias"]
    w3 = reg_params["fc3"]["kernel"]
    b3 = reg_params["fc3"]["bias"]
    phi2d = phi.reshape(b * t, d)
    if use_pallas:
        y = fused_joint_regressor(
            phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, 256, interpret
        )
    else:
        y = _reference_forward(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim)
    return y.reshape(b, t, joints_num, 3)


def phd_forward_fused(
    params: dict,
    feats: jnp.ndarray,
    predict_future: bool = False,
    *,
    joints_num: int = 17,
    groups: int = 32,
    use_pallas: bool = True,
    interpret: bool = False,
    tile_o: int | None = None,
    regressor_iters: int = 3,
):
    """Eval-mode PHD forward over precomputed features.

    params: the flax param tree of PHDFor3DJoints. Returns
    (phi, phi_hat, joints_phi, joints_hat|None) like the model.
    regressor_iters must match the checkpoint's training config
    (ModelConfig.regressor_iters) — a mismatch runs silently with
    systematically wrong joints.
    """
    x = feats @ params["input_proj"]["kernel"] + params["input_proj"]["bias"]
    phi = _temporal_net(x, params["f_movie"], groups, use_pallas, interpret, tile_o)
    ar_out = _temporal_net(phi, params["f_AR"], groups, use_pallas, interpret, tile_o)
    phi_hat = jnp.concatenate(
        [jnp.zeros_like(ar_out[:, :1]), ar_out[:, :-1]], axis=1
    )
    joints_phi = _regressor(phi, params["f_3D"], joints_num, use_pallas,
                            interpret, iters=regressor_iters)
    joints_hat: Optional[jnp.ndarray] = None
    if predict_future:
        joints_hat = _regressor(
            phi_hat, params["f_3D"], joints_num, use_pallas, interpret,
            iters=regressor_iters,
        )
    return phi, phi_hat, joints_phi, joints_hat


def _regressor_train(phi, reg_params, rng, dropout, iters, joints_num):
    """Training-mode regressor: XLA GEMMs with the per-iteration dropout of
    the flax JointRegressor (reference src/model.py:95-116 keeps dropout
    inside the refinement loop, which the VMEM-resident fused kernel cannot
    express without per-iteration mask inputs — and these three GEMMs are a
    small fraction of the step's FLOPs)."""
    b, t, d = phi.shape
    out_dim = joints_num * 3
    w1 = reg_params["fc1"]["kernel"]
    b1 = reg_params["fc1"]["bias"]
    w2 = reg_params["fc2"]["kernel"]
    b2 = reg_params["fc2"]["bias"]
    w3 = reg_params["fc3"]["kernel"]
    b3 = reg_params["fc3"]["bias"]
    phi2d = phi.reshape(b * t, d)
    keep = 1.0 - dropout
    y = jnp.zeros((b * t, out_dim), dtype=phi2d.dtype)
    for _ in range(iters):
        h = jax.nn.relu(jnp.concatenate([phi2d, y], axis=-1) @ w1 + b1)
        if dropout > 0.0:
            rng, sub = jax.random.split(rng)
            h = h * jax.random.bernoulli(sub, keep, h.shape).astype(h.dtype) / keep
        h = jax.nn.relu(h @ w2 + b2)
        y = y + h @ w3 + b3
    return y.reshape(b, t, joints_num, 3)


def phd_forward_train_fused(
    params: dict,
    feats: jnp.ndarray,
    rng,
    *,
    dropout: float = 0.5,
    joints_num: int = 17,
    groups: int = 32,
    regressor_iters: int = 3,
    interpret: bool = False,
    tile_o: int | None = None,
    precise: bool = True,
):
    """Training forward for the phase-1 loss path (feats -> f_movie -> f_3D)
    with every residual block running as two fused Pallas kernels at precise
    (3-pass bf16-split, ~1e-6 relative) MXU precision, dropout applied
    between them exactly where flax ResidualBlock places it. Differentiable:
    the kernels' custom_vjp backward is Pallas too (h36x/ops/pallas_temporal).
    f_AR is skipped — the phase-1 loss never reads it (XLA DCEs it in the
    flax step as well; reference hot loop: src/train.py:131-193).

    Returns (phi, joints)."""
    x = feats @ params["input_proj"]["kernel"] + params["input_proj"]["bias"]
    keep = 1.0 - dropout
    for name in sorted_blocks(params["f_movie"]):
        p = params["f_movie"][name]
        mask = None
        if dropout > 0.0:
            rng, sub = jax.random.split(rng)
            shape = x.shape[:2] + (p["conv1"]["kernel"].shape[-1],)
            mask = (jax.random.bernoulli(sub, keep, shape).astype(x.dtype)
                    / keep)
        x = fused_residual_block(
            x, p, groups=groups, dropout_mask=mask, tile_o=tile_o,
            interpret=interpret, precise=precise,
        )
    joints = _regressor_train(
        x, params["f_3D"], rng, dropout, regressor_iters, joints_num
    )
    return x, joints


def make_fused_forward(joints_num: int = 17, groups: int = 32,
                       use_pallas: bool = True, interpret: bool = False,
                       regressor_iters: int = 3):
    """jit-compiled (params, feats) -> joints (B,T,J,3) via the fused path."""

    @jax.jit
    def forward(params, feats):
        return phd_forward_fused(
            params, feats, joints_num=joints_num, groups=groups,
            use_pallas=use_pallas, interpret=interpret,
            regressor_iters=regressor_iters,
        )[2]

    return forward
