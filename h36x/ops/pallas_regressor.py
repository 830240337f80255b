"""Pallas TPU kernel: fused iterative-error-feedback joint regressor.

The HMR-style regressor (h36x.models.phd.JointRegressor, reference
src/model.py:83-116) runs 3 refinement rounds of a 3-layer MLP:

    y = 0
    repeat 3x:  y += W3 @ relu(W2 @ relu(W1 @ [phi; y]))

XLA executes this as 9 separate GEMMs whose activations round-trip HBM. The
full weight set (W1 (D+P, H), W2 (H, H), W3 (H, P)) is ~6-13 MB — it fits
VMEM — so this kernel keeps weights AND the per-tile activations on-chip for
all 3 rounds: one HBM read of phi, one HBM write of y, 9 MXU matmuls.

The 51-wide output is padded to P=64 lanes (zero weight columns/rows), the
caller slices back. The concat is algebraic: [phi; y] @ W1 =
phi @ W1[:D] + y @ W1[D:], so no concatenation is materialized.

Differentiable via jax.custom_vjp with the reference jnp computation
providing the backward (training uses dropout inside the MLP and stays on
the XLA path anyway; this kernel is the inference/serving hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_PAD = 64  # joints_num*3 = 51 padded to a multiple of the VPU lane half


def _kernel(phi_ref, w1p_ref, w1y_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            out_ref, *, iters: int):
    phi = phi_ref[:]  # (TILE_N, D)
    y = jnp.zeros((phi.shape[0], P_PAD), dtype=jnp.float32)
    phi_w1 = jnp.dot(phi, w1p_ref[:], preferred_element_type=jnp.float32)
    for _ in range(iters):
        h = phi_w1 + jnp.dot(
            y, w1y_ref[:], preferred_element_type=jnp.float32
        ) + b1_ref[:]
        h = jnp.maximum(h, 0.0)
        h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
        h = jnp.maximum(h, 0.0)
        y = y + jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:]
    out_ref[:] = y


def _pad_cols(w, width):
    return jnp.pad(w, ((0, 0), (0, width - w.shape[1])))


def _fused_forward(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, tile_n):
    n, d = phi2d.shape
    hidden = w2.shape[0]
    n_pad = (n + tile_n - 1) // tile_n * tile_n
    phi_p = jnp.pad(phi2d, ((0, n_pad - n), (0, 0)))

    # Split W1 into the phi rows and the y rows; pad y-dims to P_PAD.
    w1p = w1[:d]
    w1y = jnp.pad(w1[d:], ((0, P_PAD - (w1.shape[0] - d)), (0, 0)))
    w3p = _pad_cols(w3, P_PAD)
    b3p = jnp.pad(b3, (0, P_PAD - b3.shape[0]))

    grid = (n_pad // tile_n,)
    out = pl.pallas_call(
        functools.partial(_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((n_pad, P_PAD), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P_PAD, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, P_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, P_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(
        phi_p, w1p, w1y, b1[None, :], w2, b2[None, :], w3p, b3p[None, :]
    )
    return out[:n, :out_dim]


def _reference_forward(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim):
    """jnp mirror of the regressor loop (used for autodiff + testing)."""
    n = phi2d.shape[0]
    y = jnp.zeros((n, out_dim), dtype=phi2d.dtype)
    for _ in range(iters):
        inp = jnp.concatenate([phi2d, y], axis=-1)
        h = jax.nn.relu(inp @ w1 + b1)
        h = jax.nn.relu(h @ w2 + b2)
        y = y + h @ w3 + b3
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_joint_regressor(
    phi2d, w1, b1, w2, b2, w3, b3, iters: int = 3, out_dim: int = 51,
    tile_n: int = 256, interpret: bool = False,
):
    """Fused regressor: phi2d (N, D) -> (N, out_dim) f32.

    Weights follow the flax JointRegressor layout: w1 ((D+out_dim), H),
    w2 (H, H), w3 (H, out_dim), biases 1-D.
    """
    if interpret:
        # interpret mode routes through the same pallas program on CPU
        return _fused_interpret(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, tile_n)
    return _fused_forward(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, tile_n)


def _fused_interpret(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, tile_n):
    n, d = phi2d.shape
    hidden = w2.shape[0]
    n_pad = (n + tile_n - 1) // tile_n * tile_n
    phi_p = jnp.pad(phi2d, ((0, n_pad - n), (0, 0)))
    w1p = w1[:d]
    w1y = jnp.pad(w1[d:], ((0, P_PAD - (w1.shape[0] - d)), (0, 0)))
    w3p = _pad_cols(w3, P_PAD)
    b3p = jnp.pad(b3, (0, P_PAD - b3.shape[0]))
    out = pl.pallas_call(
        functools.partial(_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((n_pad, P_PAD), jnp.float32),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
            pl.BlockSpec((d, hidden), lambda i: (0, 0)),
            pl.BlockSpec((P_PAD, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, P_PAD), lambda i: (0, 0)),
            pl.BlockSpec((1, P_PAD), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_n, P_PAD), lambda i: (i, 0)),
        interpret=True,
    )(phi_p, w1p, w1y, b1[None, :], w2, b2[None, :], w3p, b3p[None, :])
    return out[:n, :out_dim]


def _fwd(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, tile_n, interpret):
    out = fused_joint_regressor(
        phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, tile_n, interpret
    )
    return out, (phi2d, w1, b1, w2, b2, w3, b3)


def _bwd(iters, out_dim, tile_n, interpret, residuals, g):
    phi2d, w1, b1, w2, b2, w3, b3 = residuals
    _, vjp = jax.vjp(
        lambda *a: _reference_forward(*a, iters, out_dim),
        phi2d, w1, b1, w2, b2, w3, b3,
    )
    return vjp(g.astype(phi2d.dtype))


fused_joint_regressor.defvjp(_fwd, _bwd)
