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
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot32(a, b, precise: bool):
    """MXU matmul. precise=False is the single-pass default (~1e-3 relative,
    the serving contract); precise=True splits both operands into bf16
    high/low parts and runs 3 passes (~1e-6 relative, the training path —
    Precision.HIGHEST compiles on this toolchain but is silently lossy)."""
    if not precise:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)  # noqa: E731
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _kernel(x_ref, scale_ref, bias_ref, w_ref, cb_ref, res_ref, out_ref,
            *, groups: int, eps: float, k_taps: int, has_residual: bool,
            precise: bool = False):
    x = x_ref[0].astype(jnp.float32)  # (T, D)
    t_len, d = x.shape

    # Group statistics over (T, D/G) per group. Mosaic rejects lane-splitting
    # reshapes, so the group reduce/broadcast runs as two matmuls against a
    # one-hot channel->group selector built from iota (D, G).
    # lax.div, NOT jnp //: traced-operand // emits a jit-wrapped closed_call
    # that breaks Mosaic lowering when many pallas_calls share one jit
    # (CLAUDE.md gotcha; iota >= 0 so trunc == floor)
    ch_group = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (d, groups), 0),
        jnp.int32(d // groups))
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (d, groups), 1)
    sel = (ch_group == grp_ids).astype(jnp.float32)  # (D, G)
    cnt = float(t_len * (d // groups))

    s1 = jnp.sum(x, axis=0, keepdims=True)  # (1, D)
    mean_g = _dot32(s1, sel, precise) / cnt  # (1, G)
    mean_ch = _dot32(mean_g, sel.T, precise)  # (1, D)
    # two-pass variance (E[(x-mean)^2]) — the E[x^2]-E[x]^2 form cancels
    # catastrophically in f32 for large activations
    centered = x - mean_ch
    s2 = jnp.sum(centered * centered, axis=0, keepdims=True)
    var_g = _dot32(s2, sel, precise) / cnt
    rstd_ch = _dot32(jax.lax.rsqrt(var_g + eps), sel.T, precise)
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
            # left edge pad: rows [0]*shift + rows [0 : T-shift]. For
            # clips shorter than the shift (T <= K-2) every row clamps to
            # row 0 — the unclamped t_len-shift would go negative and
            # Python-slice to the wrong row count.
            head_n = min(shift, t_len)
            head = jnp.broadcast_to(xn[0:1], (head_n, d))
            if t_len > shift:
                xs = jnp.concatenate([head, xn[: t_len - shift]], axis=0)
            else:
                xs = head
        acc = acc + _dot32(xs, w_ref[k], precise)
    acc = acc + cb_ref[:]
    if has_residual:
        acc = acc + res_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _fwd_tile_o(d: int, d_out: int, t_len: int, k_taps: int, precise: bool):
    """Largest output tile whose weight block (+ bf16 hi/lo copies in precise
    mode) fits VMEM. Bigger tiles win: at the training config the full-width
    tile keeps all 12 MB of weights resident per sample and runs within ~11%
    of XLA's one-GEMM formulation, vs 2.5x slower at tile 256."""
    mult = 3 if precise else 1
    budget = (11 if precise else 13.5) * 1024 * 1024
    for tile in (d_out, 512, 256, 128, 64, 32):
        if tile > d_out or d_out % tile != 0:
            continue
        w_bytes = mult * k_taps * d * tile * 4
        act_bytes = (t_len * d * (3 if precise else 1) + 2 * t_len * tile) * 4
        if w_bytes + act_bytes <= budget:
            return tile
    # last resort must still DIVIDE d_out (the caller raises otherwise):
    # largest power-of-two divisor <= 32, degrading to 1 for odd widths
    return math.gcd(d_out, 32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused_gn_relu_cconv_p(x, scale, bias, kernel, conv_bias, residual,
                           groups, eps, tile_o, interpret, precise):
    """Positional custom_vjp core (jax.custom_vjp takes no kwargs)."""
    b, t_len, d = x.shape
    k_taps, _, d_out = kernel.shape
    if tile_o is None:
        tile_o = _fwd_tile_o(d, d_out, t_len, k_taps, precise)
    tile_o = min(tile_o, d_out)
    if d_out % tile_o != 0:
        raise ValueError(f"d_out={d_out} not divisible by tile_o={tile_o}")
    has_residual = residual is not None
    if has_residual:
        res_spec = pl.BlockSpec((1, t_len, tile_o), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
    else:
        # the kernel never reads the ref when has_residual=False — feed a
        # (1,1,d_out) dummy with a constant index map instead of streaming
        # a full (B,T,D_out) zeros tensor through HBM for nothing
        residual = jnp.zeros((1, 1, d_out), dtype=x.dtype)
        res_spec = pl.BlockSpec((1, 1, tile_o), lambda i, j: (0, 0, j),
                                memory_space=pltpu.VMEM)

    grid = (b, d_out // tile_o)
    return pl.pallas_call(
        functools.partial(
            _kernel, groups=groups, eps=eps, k_taps=k_taps,
            has_residual=has_residual, precise=precise,
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
            res_spec,
        ],
        out_specs=pl.BlockSpec((1, t_len, tile_o), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, scale[None, :], bias[None, :], kernel, conv_bias[None, :], residual)


def _fused_fwd(x, scale, bias, kernel, conv_bias, residual,
               groups, eps, tile_o, interpret, precise):
    out = _fused_gn_relu_cconv_p(
        x, scale, bias, kernel, conv_bias, residual, groups, eps, tile_o,
        interpret, precise,
    )
    return out, (x, scale, bias, kernel, conv_bias, residual)


def _bwd_kernel(x_ref, scale_ref, bias_ref, w_ref, g_ref,
                dx_ref, dw_ref, dscale_ref, dbias_ref,
                *, groups_tile: int, eps: float, k_taps: int,
                precise: bool):
    """Per-(channel-tile, sample) backward of GN -> ReLU -> causal conv.

    The grid is (D/TILE_I, B) with B minor: the weight/scale/bias gradient
    blocks are indexed by the channel tile only, so consecutive grid steps
    revisit them and accumulate the per-sample partials in VMEM (init at
    b == 0). Each channel tile holds whole GroupNorm groups, so the GN
    statistics and their backward are tile-local; the forward activations
    are recomputed in-register from the (T, TILE_I) input block.
    """
    b_idx = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (T, TI)
    g = g_ref[0].astype(jnp.float32)  # (T, O)
    t_len, ti = x.shape
    gsize = ti // groups_tile

    # -- recompute GN + ReLU (selector-matmul group reduce, as forward) ----
    ch_group = jax.lax.div(  # lax.div, not //: see the forward kernel note
        jax.lax.broadcasted_iota(jnp.int32, (ti, groups_tile), 0),
        jnp.int32(gsize))
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (ti, groups_tile), 1)
    sel = (ch_group == grp_ids).astype(jnp.float32)  # (TI, G)
    cnt = float(t_len * gsize)

    def grp_mean(v_rows):  # (1, TI) summed-over-time rows -> per-channel mean
        m_g = _dot32(v_rows, sel, precise) / cnt
        return _dot32(m_g, sel.T, precise)

    mean_ch = grp_mean(jnp.sum(x, axis=0, keepdims=True))
    centered = x - mean_ch
    var_g = _dot32(
        jnp.sum(centered * centered, axis=0, keepdims=True), sel, precise
    ) / cnt
    rstd_ch = _dot32(jax.lax.rsqrt(var_g + eps), sel.T, precise)
    xhat = centered * rstd_ch
    a = xhat * scale_ref[:] + bias_ref[:]
    r = jnp.maximum(a, 0.0)

    # -- dr: transpose of the edge-replicated causal conv ------------------
    # forward: y[t] = sum_k W[k] . r[max(t - s_k, 0)], s_k = K-1-k, so
    # dr[j>0] = sum_k (g @ W[k]^T)[j + s_k]  and  dr[0] collects every tap
    # that read the replicated left edge: rows 0..s_k of g @ W[k]^T.
    dr = jnp.zeros_like(x)
    for k in range(k_taps):
        s = k_taps - 1 - k
        m = _dot32(g, w_ref[k].T, precise)
        if s == 0:
            dr = dr + m
        else:
            head = jnp.sum(m[: s + 1], axis=0, keepdims=True)
            tail = jnp.zeros((s, ti), jnp.float32)
            dr = dr + jnp.concatenate([head, m[s + 1 :], tail], axis=0)

    da = dr * (a > 0)
    dscale = jnp.sum(xhat * da, axis=0, keepdims=True)
    dbias = jnp.sum(da, axis=0, keepdims=True)

    # -- GN backward (per group): dx = rstd*(dxh - E[dxh] - xhat*E[dxh*xhat])
    dxh = da * scale_ref[:]
    m1_ch = grp_mean(jnp.sum(dxh, axis=0, keepdims=True))
    m2_ch = grp_mean(jnp.sum(dxh * xhat, axis=0, keepdims=True))
    dx_ref[0] = (rstd_ch * (dxh - m1_ch - xhat * m2_ch)).astype(dx_ref.dtype)

    # -- dW partials: dW[k] = shift_k(r)^T @ g ------------------------------
    dws = []
    for k in range(k_taps):
        s = k_taps - 1 - k
        if s == 0:
            xs = r
        else:
            head = jnp.broadcast_to(r[0:1], (s, ti))
            xs = jnp.concatenate([head, r[: t_len - s]], axis=0)
        dws.append(_dot32(xs.T, g, precise))

    @pl.when(b_idx == 0)
    def _init():
        for k in range(k_taps):
            dw_ref[k] = dws[k]
        dscale_ref[:] = dscale
        dbias_ref[:] = dbias

    @pl.when(b_idx > 0)
    def _accum():
        for k in range(k_taps):
            dw_ref[k] += dws[k]
        dscale_ref[:] += dscale
        dbias_ref[:] += dbias


def _bwd_tile_i(d: int, groups: int, t_len: int, d_out: int, k_taps: int,
                precise: bool = False):
    """Pick the input-channel tile for the Pallas backward, or None if no
    configuration fits VMEM (callers then fall back to the XLA vjp).
    precise mode keeps bf16 hi/lo copies of every dot operand live, so its
    working set is budgeted ~2x larger."""
    if t_len <= k_taps:
        return None
    gsize = d // groups
    # Mosaic's scoped-vmem stack accounting runs well past this static
    # estimate (measured: est 10.9M -> 16.3M actual at tile 256 precise),
    # so the budget is deliberately conservative.
    budget = (7 if precise else 11) * 1024 * 1024
    mult = 2 if precise else 1
    for tile_i in (256, 128, 64, 32):
        if d % tile_i != 0 or tile_i % gsize != 0:
            continue
        # weight tile (+ hi/lo copies) + resident dW accumulator block
        w_bytes = (mult + 1) * k_taps * tile_i * d_out * 4
        act_bytes = (10 * t_len * tile_i + 2 * t_len * d_out) * 4 * mult
        if w_bytes + act_bytes <= budget:
            return tile_i
    return None


def _pallas_backward(x, scale, bias, kernel, g, groups, eps, tile_i,
                     interpret, precise):
    b, t_len, d = x.shape
    k_taps, _, d_out = kernel.shape
    grid = (d // tile_i, b)
    kw = dict(memory_space=pltpu.VMEM) if not interpret else {}
    dx, dw, dscale, dbias = pl.pallas_call(
        functools.partial(
            _bwd_kernel, groups_tile=tile_i // (d // groups), eps=eps,
            k_taps=k_taps, precise=precise,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_len, d), jnp.float32),
            jax.ShapeDtypeStruct((k_taps, d, d_out), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t_len, tile_i), lambda i, j: (j, 0, i), **kw),
            pl.BlockSpec((1, tile_i), lambda i, j: (0, i), **kw),
            pl.BlockSpec((1, tile_i), lambda i, j: (0, i), **kw),
            pl.BlockSpec((k_taps, tile_i, d_out), lambda i, j: (0, i, 0), **kw),
            pl.BlockSpec((1, t_len, d_out), lambda i, j: (j, 0, 0), **kw),
        ],
        out_specs=(
            pl.BlockSpec((1, t_len, tile_i), lambda i, j: (j, 0, i), **kw),
            pl.BlockSpec((k_taps, tile_i, d_out), lambda i, j: (0, i, 0), **kw),
            pl.BlockSpec((1, tile_i), lambda i, j: (0, i), **kw),
            pl.BlockSpec((1, tile_i), lambda i, j: (0, i), **kw),
        ),
        interpret=interpret,
    )(x, scale[None, :], bias[None, :], kernel, g)
    return dx, dw, dscale[0], dbias[0]


def _fused_bwd(groups, eps, tile_o, interpret, precise, resids, g):
    x, scale, bias, kernel, conv_bias, residual = resids
    diff_res = residual is not None
    b, t_len, d = x.shape
    k_taps, _, d_out = kernel.shape

    tile_i = _bwd_tile_i(d, groups, t_len, d_out, k_taps, precise)
    if tile_i is not None:
        dx, dw, dscale, dbias = _pallas_backward(
            x, scale, bias, kernel, g, groups, eps, tile_i, interpret, precise
        )
        dcb = jnp.sum(g, axis=(0, 1))
        dres = g.astype(x.dtype) if diff_res else None
        return (
            dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype), dw.astype(kernel.dtype),
            dcb.astype(conv_bias.dtype), dres,
        )

    # No VMEM-feasible tiling (or degenerate T): XLA vjp of the reference.
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
    tile_o: int | None = None,
    interpret: bool = False,
    precise: bool = False,
) -> jnp.ndarray:
    """x (B, T, D), scale/bias (D,), kernel (K, D, O), conv_bias (O,),
    residual optional (B, T, O). Returns (B, T, O) in x.dtype.

    Differentiable: the custom_vjp backward is itself a Pallas kernel
    (:func:`_bwd_kernel`; XLA-vjp fallback when no channel tiling fits VMEM).
    precise=False runs single-pass MXU matmuls (~1e-3 relative — serving);
    precise=True runs 3-pass bf16-split matmuls (~1e-6 relative — training,
    where gradients must match the XLA step)."""
    return _fused_gn_relu_cconv_p(
        x, scale, bias, kernel, conv_bias, residual, groups, eps, tile_o,
        interpret, precise,
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
                         tile_o: int | None = None, interpret: bool = False,
                         precise: bool = False):
    """Full ResidualBlock via two fused kernels (dropout_mask, if given, is
    applied between them — the training placement).

    params: flax ResidualBlock param dict {gn1, conv1, gn2, conv2}.
    """
    h = fused_gn_relu_cconv(
        x, params["gn1"]["scale"], params["gn1"]["bias"],
        params["conv1"]["kernel"], params["conv1"]["bias"],
        groups=groups, tile_o=tile_o, interpret=interpret, precise=precise,
    )
    if dropout_mask is not None:
        h = h * dropout_mask
    return fused_gn_relu_cconv(
        h, params["gn2"]["scale"], params["gn2"]["bias"],
        params["conv2"]["kernel"], params["conv2"]["bias"],
        residual=x, groups=groups, tile_o=tile_o, interpret=interpret,
        precise=precise,
    )
