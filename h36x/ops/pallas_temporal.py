"""Pallas TPU kernel: fused GroupNorm -> ReLU -> causal temporal conv.

One half of the PHD residual block (h36x.models.phd.ResidualBlock, reference
src/model.py:35-56). Per grid cell the kernel holds one sample's full
(T, D) activation in VMEM, computes the per-group statistics in-register,
normalizes + ReLUs, and contracts the K time-shifted views against a
(K, D, TILE_O) weight tile on the MXU — the normalized activation never
returns to HBM between the norm and the conv. An optional residual tile is
added in-kernel, so a full ResidualBlock is exactly two kernel launches.

Grid: (B, D_out / TILE_O); the (T, D) input block is re-read per output tile
(T*D is ~160 KB for the training config — cheap), weights stream one tile
per cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, w_ref, cb_ref, res_ref, out_ref,
            *, groups: int, eps: float, k_taps: int, has_residual: bool):
    x = x_ref[0].astype(jnp.float32)  # (T, D)
    t_len, d = x.shape

    # Group statistics over (T, D/G) per group. Mosaic rejects lane-splitting
    # reshapes, so the group reduce/broadcast runs as two matmuls against a
    # one-hot channel->group selector built from iota (D, G).
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (d, groups), 0) // (d // groups)
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (d, groups), 1)
    sel = (ch_group == grp_ids).astype(jnp.float32)  # (D, G)
    cnt = float(t_len * (d // groups))

    s1 = jnp.sum(x, axis=0, keepdims=True)  # (1, D)
    mean_g = jnp.dot(s1, sel, preferred_element_type=jnp.float32) / cnt  # (1, G)
    mean_ch = jnp.dot(mean_g, sel.T, preferred_element_type=jnp.float32)  # (1, D)
    # two-pass variance (E[(x-mean)^2]) — the E[x^2]-E[x]^2 form cancels
    # catastrophically in f32 for large activations
    centered = x - mean_ch
    s2 = jnp.sum(centered * centered, axis=0, keepdims=True)
    var_g = jnp.dot(s2, sel, preferred_element_type=jnp.float32) / cnt
    rstd_ch = jnp.dot(
        jax.lax.rsqrt(var_g + eps), sel.T, preferred_element_type=jnp.float32
    )
    xn = centered * rstd_ch
    xn = xn * scale_ref[:] + bias_ref[:]
    xn = jnp.maximum(xn, 0.0)

    # Causal conv: tap k multiplies xn shifted right by (k_taps-1-k) with
    # edge replication on the left (reference src/model.py:29-33 semantics).
    acc = jnp.zeros_like(out_ref[0], dtype=jnp.float32)
    for k in range(k_taps):
        shift = k_taps - 1 - k
        if shift == 0:
            xs = xn
        else:
            # left edge pad: rows [0]*shift + rows [0 : T-shift]
            head = jnp.broadcast_to(xn[0:1], (shift, d))
            xs = jnp.concatenate([head, xn[: t_len - shift]], axis=0)
        acc = acc + jnp.dot(xs, w_ref[k], preferred_element_type=jnp.float32)
    acc = acc + cb_ref[:]
    if has_residual:
        acc = acc + res_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_gn_relu_cconv_p(x, scale, bias, kernel, conv_bias, residual,
                           groups, eps, tile_o, interpret):
    """Positional custom_vjp core (jax.custom_vjp takes no kwargs)."""
    b, t_len, d = x.shape
    k_taps, _, d_out = kernel.shape
    tile_o = min(tile_o, d_out)
    if d_out % tile_o != 0:
        raise ValueError(f"d_out={d_out} not divisible by tile_o={tile_o}")
    has_residual = residual is not None
    if residual is None:
        residual = jnp.zeros((b, t_len, d_out), dtype=x.dtype)

    grid = (b, d_out // tile_o)
    return pl.pallas_call(
        functools.partial(
            _kernel, groups=groups, eps=eps, k_taps=k_taps,
            has_residual=has_residual,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_len, d_out), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t_len, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_taps, d, tile_o), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_o), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_len, tile_o), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_len, tile_o), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, scale[None, :], bias[None, :], kernel, conv_bias[None, :], residual)


def _fused_fwd(x, scale, bias, kernel, conv_bias, residual,
               groups, eps, tile_o, interpret):
    out = _fused_gn_relu_cconv_p(
        x, scale, bias, kernel, conv_bias, residual, groups, eps, tile_o,
        interpret,
    )
    return out, (x, scale, bias, kernel, conv_bias, residual)


def _fused_bwd(groups, eps, tile_o, interpret, resids, g):
    x, scale, bias, kernel, conv_bias, residual = resids
    diff_res = residual is not None
    args = (x, scale, bias, kernel, conv_bias) + ((residual,) if diff_res else ())

    def ref(*a):
        res = a[5] if diff_res else None
        return reference_gn_relu_cconv(
            a[0], a[1], a[2], a[3], a[4], res, groups=groups, eps=eps
        )

    _, vjp = jax.vjp(ref, *args)
    grads = vjp(g.astype(x.dtype))
    if not diff_res:
        grads = grads + (None,)
    return grads


_fused_gn_relu_cconv_p.defvjp(_fused_fwd, _fused_bwd)


def fused_gn_relu_cconv(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    kernel: jnp.ndarray,
    conv_bias: jnp.ndarray,
    residual: jnp.ndarray | None = None,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    tile_o: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, T, D), scale/bias (D,), kernel (K, D, O), conv_bias (O,),
    residual optional (B, T, O). Returns (B, T, O) in x.dtype.

    Differentiable: pallas_call has no autodiff rule, so a custom_vjp routes
    the backward through the jnp reference computation (XLA) while the
    forward stays on the fused kernel."""
    return _fused_gn_relu_cconv_p(
        x, scale, bias, kernel, conv_bias, residual, groups, eps, tile_o,
        interpret,
    )


def reference_gn_relu_cconv(x, scale, bias, kernel, conv_bias, residual=None,
                            groups: int = 32, eps: float = 1e-5,
                            valid_len=None):
    """jnp mirror (GN -> ReLU -> causal conv [+ residual]) for testing/vjp.

    valid_len (optional, traced scalar): GroupNorm statistics are computed
    over frames [0, valid_len) only. GN is the one non-causal piece of the
    block, so autoregressive rollout over a fixed-shape buffer must mask its
    statistics to the frames that exist; outputs at t >= valid_len are
    garbage and must not be read.
    """
    from h36x.ops.causal_conv import causal_conv1d

    b, t_len, d = x.shape
    xg = x.reshape(b, t_len, groups, d // groups)
    if valid_len is None:
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
    else:
        mask = (jnp.arange(t_len) < valid_len).astype(x.dtype)[None, :, None, None]
        cnt = valid_len * (d // groups)
        mean = jnp.sum(xg * mask, axis=(1, 3), keepdims=True) / cnt
        var = jnp.sum(((xg - mean) ** 2) * mask, axis=(1, 3), keepdims=True) / cnt
    xn = ((xg - mean) / jnp.sqrt(var + eps)).reshape(b, t_len, d)
    xn = jax.nn.relu(xn * scale + bias)
    out = causal_conv1d(xn, kernel, conv_bias)
    if residual is not None:
        out = out + residual
    return out


def fused_residual_block(x, params, *, groups: int = 32, dropout_mask=None,
                         tile_o: int = 256, interpret: bool = False):
    """Full ResidualBlock via two fused kernels (eval path, no dropout).

    params: flax ResidualBlock param dict {gn1, conv1, gn2, conv2}.
    """
    h = fused_gn_relu_cconv(
        x, params["gn1"]["scale"], params["gn1"]["bias"],
        params["conv1"]["kernel"], params["conv1"]["bias"],
        groups=groups, tile_o=tile_o, interpret=interpret,
    )
    if dropout_mask is not None:
        h = h * dropout_mask
    return fused_gn_relu_cconv(
        h, params["gn2"]["scale"], params["gn2"]["bias"],
        params["conv2"]["kernel"], params["conv2"]["bias"],
        residual=x, groups=groups, tile_o=tile_o, interpret=interpret,
    )
