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

Differentiable via jax.custom_vjp with a Pallas backward as well
(:func:`_bwd_kernel`): the per-tile backward recomputes the forward
activations in VMEM and backprops the whole unrolled loop on-chip, emitting
per-tile weight-grad partials that the caller sums. Grads match jax.grad of
the jnp reference to ~1e-7 relative. (The flax training path keeps dropout
inside the MLP and uses the XLA model; this kernel pair is for serving and
for dropout-free fused training.)
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


def _fused_forward(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, tile_n,
                   interpret=False):
    n, d = phi2d.shape
    hidden = w2.shape[0]
    n_pad = (n + tile_n - 1) // tile_n * tile_n
    phi_p = jnp.pad(phi2d, ((0, n_pad - n), (0, 0)))

    # Split W1 into the phi rows and the y rows; pad y-dims to P_PAD.
    w1p = w1[:d]
    w1y = jnp.pad(w1[d:], ((0, P_PAD - (w1.shape[0] - d)), (0, 0)))
    w3p = _pad_cols(w3, P_PAD)
    b3p = jnp.pad(b3, (0, P_PAD - b3.shape[0]))

    # interpret mode (CPU tests) runs the SAME program; it only drops the
    # VMEM placement hints, which the interpreter does not model
    kw = dict(memory_space=pltpu.VMEM) if not interpret else {}
    grid = (n_pad // tile_n,)
    out = pl.pallas_call(
        functools.partial(_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((n_pad, P_PAD), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), **kw),
            pl.BlockSpec((d, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((P_PAD, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((hidden, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((hidden, P_PAD), lambda i: (0, 0), **kw),
            pl.BlockSpec((1, P_PAD), lambda i: (0, 0), **kw),
        ],
        out_specs=pl.BlockSpec((tile_n, P_PAD), lambda i: (i, 0), **kw),
        interpret=interpret,
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
    if out_dim > P_PAD:
        raise ValueError(
            f"fused_joint_regressor pads the iterate to P_PAD={P_PAD} lanes "
            f"but out_dim={out_dim} exceeds it (joints_num > {P_PAD // 3}); "
            "use the jnp regressor path for larger joint sets")
    return _fused_forward(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim,
                          tile_n, interpret=interpret)


def _bwd_kernel(phi_ref, w1p_ref, w1y_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                b3_ref, g_ref, dphi_ref, dw1p_ref, dw1y_ref, db1_ref, dw2_ref,
                db2_ref, dw3_ref, db3_ref, *, iters: int):
    """Per-tile backward: recompute the forward activations in VMEM, then
    backprop the unrolled refinement loop entirely on-chip. Weight grads
    accumulate in-place across grid revisits (constant output index maps),
    so HBM holds ONE copy of each grad — materializing grid_n partials and
    summing host-side moved ~20x the bytes on an HBM-bound chip."""
    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    phi = phi_ref[:]
    g = g_ref[:]  # (TILE_N, P_PAD)

    # -- forward recompute, stashing per-iteration activations -------------
    phi_w1 = dot(phi, w1p_ref[:])
    ys = []
    h1s = []
    h2s = []
    y = jnp.zeros((phi.shape[0], P_PAD), dtype=jnp.float32)
    for _ in range(iters):
        ys.append(y)
        h1 = jnp.maximum(phi_w1 + dot(y, w1y_ref[:]) + b1_ref[:], 0.0)
        h2 = jnp.maximum(dot(h1, w2_ref[:]) + b2_ref[:], 0.0)
        h1s.append(h1)
        h2s.append(h2)
        y = y + dot(h2, w3_ref[:]) + b3_ref[:]

    # -- backward through the unrolled loop --------------------------------
    dw1y = jnp.zeros(dw1y_ref.shape, jnp.float32)
    db1 = jnp.zeros(db1_ref.shape, jnp.float32)
    dw2 = jnp.zeros(dw2_ref.shape, jnp.float32)
    db2 = jnp.zeros(db2_ref.shape, jnp.float32)
    dw3 = jnp.zeros(dw3_ref.shape, jnp.float32)
    db3 = jnp.zeros(db3_ref.shape, jnp.float32)

    dy = g.astype(jnp.float32)
    dphi_w1 = jnp.zeros_like(phi_w1)
    for it in reversed(range(iters)):
        # y_{it+1} = y_it + h2 @ w3 + b3
        dw3 = dw3 + dot(h2s[it].T, dy)
        db3 = db3 + jnp.sum(dy, axis=0, keepdims=True)
        dh2 = dot(dy, w3_ref[:].T) * (h2s[it] > 0)
        dw2 = dw2 + dot(h1s[it].T, dh2)
        db2 = db2 + jnp.sum(dh2, axis=0, keepdims=True)
        dh1 = dot(dh2, w2_ref[:].T) * (h1s[it] > 0)
        dphi_w1 = dphi_w1 + dh1  # grad into phi @ w1p (shared across iters)
        dw1y = dw1y + dot(ys[it].T, dh1)
        db1 = db1 + jnp.sum(dh1, axis=0, keepdims=True)
        dy = dy + dot(dh1, w1y_ref[:].T)  # y_it feeds h1 AND the identity

    dw1p = dot(phi.T, dphi_w1)
    dphi = dot(dphi_w1, w1p_ref[:].T)

    dphi_ref[:] = dphi
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1p_ref[:] = dw1p
        dw1y_ref[:] = dw1y
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2
        dw3_ref[:] = dw3
        db3_ref[:] = db3

    @pl.when(i > 0)
    def _accum():
        dw1p_ref[:] += dw1p
        dw1y_ref[:] += dw1y
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2
        dw3_ref[:] += dw3
        db3_ref[:] += db3


def _fused_backward(phi2d, w1, b1, w2, b2, w3, b3, g, iters, out_dim, tile_n,
                    interpret):
    n, d = phi2d.shape
    hidden = w2.shape[0]
    n_pad = (n + tile_n - 1) // tile_n * tile_n
    grid_n = n_pad // tile_n
    phi_p = jnp.pad(phi2d.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    g_p = jnp.pad(
        _pad_cols(g.astype(jnp.float32), P_PAD), ((0, n_pad - n), (0, 0))
    )
    w1p = w1[:d]
    w1y = jnp.pad(w1[d:], ((0, P_PAD - (w1.shape[0] - d)), (0, 0)))
    w3p = _pad_cols(w3, P_PAD)
    b3p = jnp.pad(b3, (0, P_PAD - b3.shape[0]))

    kw = dict(memory_space=pltpu.VMEM) if not interpret else {}
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, iters=iters),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),       # dphi
            jax.ShapeDtypeStruct((d, hidden), jnp.float32),      # dw1p
            jax.ShapeDtypeStruct((P_PAD, hidden), jnp.float32),  # dw1y
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),      # db1
            jax.ShapeDtypeStruct((hidden, hidden), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),      # db2
            jax.ShapeDtypeStruct((hidden, P_PAD), jnp.float32),  # dw3
            jax.ShapeDtypeStruct((1, P_PAD), jnp.float32),       # db3
        ),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), **kw),
            pl.BlockSpec((d, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((P_PAD, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((hidden, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((hidden, P_PAD), lambda i: (0, 0), **kw),
            pl.BlockSpec((1, P_PAD), lambda i: (0, 0), **kw),
            pl.BlockSpec((tile_n, P_PAD), lambda i: (i, 0), **kw),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), **kw),
            # constant index maps: one VMEM-resident block revisited across
            # the grid, accumulated in-kernel (init at i==0)
            pl.BlockSpec((d, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((P_PAD, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((hidden, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), **kw),
            pl.BlockSpec((hidden, P_PAD), lambda i: (0, 0), **kw),
            pl.BlockSpec((1, P_PAD), lambda i: (0, 0), **kw),
        ),
        interpret=interpret,
    )(phi_p, w1p, w1y, b1[None, :], w2, b2[None, :], w3p, b3p[None, :], g_p)

    dphi_p, dw1p, dw1y, db1, dw2, db2, dw3, db3 = outs
    dphi = dphi_p[:n].astype(phi2d.dtype)
    dw1 = jnp.concatenate(
        [dw1p, dw1y[: w1.shape[0] - d]], axis=0
    ).astype(w1.dtype)
    db1s = db1[0].astype(b1.dtype)
    dw2s = dw2.astype(w2.dtype)
    db2s = db2[0].astype(b2.dtype)
    dw3s = dw3[:, :out_dim].astype(w3.dtype)
    db3s = db3[0, :out_dim].astype(b3.dtype)
    return dphi, dw1, db1s, dw2s, db2s, dw3s, db3s


def _fwd(phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, tile_n, interpret):
    out = fused_joint_regressor(
        phi2d, w1, b1, w2, b2, w3, b3, iters, out_dim, tile_n, interpret
    )
    return out, (phi2d, w1, b1, w2, b2, w3, b3)


def _bwd_vmem_bytes(d, hidden, tile_n, iters):
    """Rough VMEM footprint of the fused backward at one grid cell."""
    weights = (d * hidden + P_PAD * hidden + hidden * hidden + hidden * P_PAD) * 4
    acts = iters * 2 * tile_n * hidden * 4 + tile_n * (d + hidden) * 4
    outs = (tile_n * d + d * hidden + P_PAD * hidden + hidden * hidden
            + hidden * P_PAD + 2 * hidden + P_PAD) * 4
    return weights + acts + outs


_BWD_VMEM_BUDGET = 11 * 1024 * 1024  # conservative share of the ~16MB VMEM


def _bwd(iters, out_dim, tile_n, interpret, residuals, g):
    phi2d, w1, b1, w2, b2, w3, b3 = residuals
    d, hidden = phi2d.shape[1], w2.shape[0]
    bwd_tile = min(tile_n, 128)
    if interpret or _bwd_vmem_bytes(d, hidden, bwd_tile, iters) <= _BWD_VMEM_BUDGET:
        return _fused_backward(
            phi2d, w1, b1, w2, b2, w3, b3, g, iters, out_dim, bwd_tile, interpret
        )
    # Full-size configs exceed VMEM for the single-kernel backward (weights
    # + per-iteration activations + weight-grad buffers); fall back to the
    # XLA vjp of the reference computation.
    _, vjp = jax.vjp(
        lambda *a: _reference_forward(*a, iters, out_dim),
        phi2d, w1, b1, w2, b2, w3, b3,
    )
    return vjp(g.astype(phi2d.dtype))


fused_joint_regressor.defvjp(_fwd, _bwd)
