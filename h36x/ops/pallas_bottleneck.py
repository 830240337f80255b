"""Pallas TPU kernel: fused ResNet bottleneck block (inference).

Why: the ResNet-50 body is HBM-bandwidth-bound on TPU v5e, not MXU-bound —
measured 14.5 GB moved per 256-frame batch at 702 GB/s achieved (~86% of
the chip's ceiling), 47 TF/s (~29% MFU). XLA fuses BN/ReLU into conv
epilogues but still round-trips every intermediate activation through HBM:
a stride-1 bottleneck moves ~2x more bytes than its input+output. This
kernel runs the WHOLE block per grid cell with every intermediate resident
in VMEM:

    out = relu( relu(conv3x3(relu(x@W1+b1)) + b2) @ W3 + b3 + res )

where res is x itself (identity blocks) or x@Wp+bp (projection), and the
frozen BatchNorms are folded into the conv weights/biases on the host
(:func:`fold_bn_params`) — inference-only, exactly the reference's eval()
backbone (reference src/preprocess_resnet_features.py:207-218).

Layout and tiling: activations are flattened to (H*W, C) rows. The grid is
(B, H/R): each cell computes R image rows; its input is the R-row center
block plus two one-row halo blocks fetched through CLAMPED BlockSpec index
maps (at the image edges the clamp fetches a duplicate row whose
contributions are exactly the ones the y-validity masks zero). The 3x3
SAME conv is 9 row-shifted GEMMs over the (R+2)-row strip: a shift of
s = dy*W + dx moves rows on the sublane axis; x-boundary wrap entries are
killed by an iota column mask and y-boundary entries by a global-row mask.
Only stride-1 blocks are fused (13 of ResNet-50's 16); the three stride-2
transition blocks stay on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn_params(conv_kernel, bn_scale, bn_bias, bn_mean, bn_var,
                   eps: float = 1e-5):
    """Fold a frozen BatchNorm into the preceding conv.

    BN(conv(x)) = conv(x) * (gamma/sqrt(var+eps)) + (beta - mean*gamma/...)
    so the conv kernel's output channels scale by g and a bias appears.
    Returns (kernel', bias'), f32.
    """
    g = np.asarray(bn_scale, np.float32) / np.sqrt(
        np.asarray(bn_var, np.float32) + eps
    )
    kernel = np.asarray(conv_kernel, np.float32) * g  # broadcast over out ch
    bias = np.asarray(bn_bias, np.float32) - np.asarray(bn_mean, np.float32) * g
    return kernel, bias


def fold_bottleneck(block_params, block_stats, eps: float = 1e-5):
    """flax Bottleneck {conv1,bn1,...} -> folded weight dict for the kernel.

    1x1 kernels are squeezed to (C_in, C_out); the 3x3 stays (3, 3, C, C).
    """
    out = {}
    for conv, bn, name in (("conv1", "bn1", "w1"), ("conv2", "bn2", "w2"),
                           ("conv3", "bn3", "w3")):
        k, b = fold_bn_params(
            block_params[conv]["kernel"], block_params[bn]["scale"],
            block_params[bn]["bias"], block_stats[bn]["mean"],
            block_stats[bn]["var"], eps,
        )
        if name != "w2":
            k = k.reshape(k.shape[2], k.shape[3])  # (1,1,I,O) -> (I,O)
        out[name] = k
        out[name.replace("w", "b")] = b
    if "downsample_conv" in block_params:
        k, b = fold_bn_params(
            block_params["downsample_conv"]["kernel"],
            block_params["downsample_bn"]["scale"],
            block_params["downsample_bn"]["bias"],
            block_stats["downsample_bn"]["mean"],
            block_stats["downsample_bn"]["var"], eps,
        )
        out["wp"] = k.reshape(k.shape[2], k.shape[3])
        out["bp"] = b
    return out


def _kernel(*refs, rows: int, w_img: int, n_strips: int, has_proj: bool):
    """One (sample, strip) cell: `rows` image rows of the block output.

    With n_strips > 1 the arg list carries two one-row halo blocks; with a
    single strip the halo rows are faked from the strip itself (their only
    consumers are the y-masked entries at the image's top/bottom rows).
    """
    if n_strips > 1:
        (prev_ref, x_ref, next_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         w3_ref, b3_ref, wp_ref, bp_ref, out_ref, im2col_ref) = refs
    else:
        (x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         w3_ref, b3_ref, wp_ref, bp_ref, out_ref, im2col_ref) = refs
    j = pl.program_id(1)
    f32 = jnp.float32
    rw = rows * w_img
    x = x_ref[0]  # (RW, C_in) center strip

    # 1x1 conv + ReLU over center + halos (halo `a` rows are recomputed
    # here instead of exchanged — one W-row GEMM, cheaper than a DMA dance).
    if n_strips > 1:
        # halo blocks hold g image rows (g*W % 8 == 0); the adjacent row is
        # the last/first W elements
        xa = jnp.concatenate(
            [prev_ref[0][-w_img:], x, next_ref[0][:w_img]], axis=0
        )
    else:
        xa = jnp.concatenate([x[:w_img], x, x[rw - w_img:]], axis=0)
    a = jnp.dot(xa, w1_ref[:], preferred_element_type=f32) + b1_ref[:]
    a = jnp.maximum(a, 0.0).astype(x.dtype)  # ((R+2)W, C_mid)

    c_mid = a.shape[1]
    # lax.rem/div, not jnp % and //: the jnp versions wrap their bodies in
    # jit (closed_call), which trips a lowering-cache KeyError when many
    # pallas_calls with different shapes share one enclosing jit.
    idx = jax.lax.broadcasted_iota(jnp.int32, (rw, c_mid), 0)
    w_arr = jnp.full((), w_img, jnp.int32)
    col = jax.lax.rem(idx, jax.lax.broadcast(w_arr, (rw, c_mid)))
    row = jax.lax.div(idx, jax.lax.broadcast(w_arr, (rw, c_mid)))
    zrow = jnp.zeros((1, c_mid), a.dtype)
    # The 9 masked shifted views concatenate on the LANE axis into one
    # (RW, 9*C_mid) operand for a single MXU contraction of depth 9*C_mid —
    # 9 small sequential GEMMs (depth C_mid) measured 0.64-0.93x of XLA's
    # conv; the im2col-style single GEMM is what XLA itself does.
    views = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            start = w_img + dy * w_img + dx  # strip row for output row 0
            if start < 0:  # only (dy,dx)=(-1,-1): row -1 is x-masked anyway
                shifted = jnp.concatenate([zrow, a[: rw - 1]], axis=0)
            elif start + rw > (rows + 2) * w_img:  # only (1,1), x-masked
                shifted = jnp.concatenate([a[start:], zrow], axis=0)
            else:
                shifted = a[start : start + rw]
            if dx == 1:  # x = W-1 has no right neighbor
                shifted = jnp.where(col == w_img - 1,
                                    jnp.zeros_like(shifted), shifted)
            elif dx == -1:  # x = 0 has no left neighbor
                shifted = jnp.where(col == 0,
                                    jnp.zeros_like(shifted), shifted)
            if dy == -1:  # global y = 0 has no row above
                bad = (j == 0) & (row == 0)
                shifted = jnp.where(bad, jnp.zeros_like(shifted), shifted)
            elif dy == 1:  # global y = H-1 has no row below
                bad = (j == n_strips - 1) & (row == rows - 1)
                shifted = jnp.where(bad, jnp.zeros_like(shifted), shifted)
            views.append(shifted)
    # Mosaic cannot lane-concat vectors whose sublane offsets differ (the
    # shifted views carry their slice offsets in their layouts), so the
    # views are staged through a VMEM scratch: stores relayout, and the
    # reload is one canonical (RW, 9*C_mid) operand.
    for k, v in enumerate(views):
        im2col_ref[:, k * c_mid:(k + 1) * c_mid] = v
    acc = jnp.dot(im2col_ref[:], w2_ref[:], preferred_element_type=f32)
    b = jnp.maximum(acc + b2_ref[:], 0.0).astype(x.dtype)

    c = jnp.dot(b, w3_ref[:], preferred_element_type=f32) + b3_ref[:]
    if has_proj:
        res = jnp.dot(x, wp_ref[:], preferred_element_type=f32) + bp_ref[:]
    else:
        res = x.astype(f32)
    out_ref[0] = jnp.maximum(c + res, 0.0).astype(out_ref.dtype)


def _halo_granularity(w: int) -> int:
    """Smallest power-of-two g with (g*W) % 8 == 0 (Mosaic sublane rule for
    the halo blocks); g <= 8 always exists."""
    g = 1
    while (g * w) % 8 != 0:
        g *= 2
    return g


def _strip_rows(h: int, w: int, c_in: int, c_mid: int, c_out: int,
                itemsize: int = 2) -> int:
    """Largest HALO-LEGAL divisor R of H whose working set fits VMEM.

    Weights are resident regardless of the strip height, so they come off
    the budget first; striping only shrinks the activation tensors.
    `itemsize` is x.dtype's byte width — weights and activations are cast
    to x.dtype (fused_bottleneck), so an f32 call doubles both vs bf16.
    Candidates that Mosaic cannot tile (rows not a multiple of the halo
    granularity, unless single-strip) are skipped — picking purely by VMEM
    fit used to select e.g. rows=7 for 28x28 f32 and then fail the halo
    check downstream even though rows=4 is legal and fits."""
    budget = 14 * 1024 * 1024
    weights = (9 * c_mid * c_mid + c_in * c_mid + c_mid * c_out
               + (c_in * c_out if c_in != c_out else 0)) * itemsize
    if weights >= budget:
        # striping only shrinks activations; no R can help
        raise ValueError(
            f"fused_bottleneck weights alone need {weights / 1e6:.1f} MB of "
            f"VMEM at itemsize={itemsize} (C_in={c_in}, C_mid={c_mid}, "
            f"C_out={c_out}) — cast x to bfloat16 or use the XLA path")
    halo_g = _halo_granularity(w)
    for rows in sorted({d for d in range(1, h + 1) if h % d == 0},
                       reverse=True):
        if rows != h and rows % halo_g != 0:
            continue  # multi-strip needs halo blocks of g rows
        rw = rows * w
        tensors = (
            (rw + 2 * w) * c_in * itemsize   # xa strip (x.dtype)
            + (rw + 2 * w) * c_mid * itemsize  # a
            + 3 * rw * c_mid * 4             # acc f32 + masks + shifted
            + rw * 9 * c_mid * itemsize      # im2col scratch
            + 2 * rw * c_out * 4             # c + res f32
            + rw * c_out * itemsize          # out
        )
        # Mosaic's stack accounting runs ~2.1x past the static activation
        # estimate (measured 24.0M vs 11.3M at layer1_0 full-image); 2.5x
        # is the safety factor. Weight blocks are exact.
        if weights + 2.5 * tensors <= budget:
            return rows
    raise ValueError(
        f"fused_bottleneck: no halo-legal strip height of H={h} (W={w}, "
        f"halo granularity {halo_g}) fits the VMEM budget at "
        f"itemsize={itemsize} — cast x to bfloat16 or use the XLA path")


def fused_bottleneck(x, folded, *, h: int, w: int, interpret: bool = False,
                     force_rows: int | None = None):
    """x (B, H*W, C_in) bf16/f32 -> (B, H*W, C_out); stride-1 blocks only.

    folded: dict from :func:`fold_bottleneck` (numpy/jnp f32 leaves).
    bf16 is the production path; the deep f32 layers (14x14 C_mid>=256,
    7x7) exceed VMEM / halo-legal striping and raise with that advice.
    """
    b, hw, c_in = x.shape
    assert hw == h * w, (hw, h, w)
    has_proj = "wp" in folded
    c_mid = folded["w1"].shape[1]
    c_out = folded["w3"].shape[1]
    dt = x.dtype

    if force_rows:
        rows = force_rows
    elif interpret:
        # CPU emulation has no VMEM: one full-image strip, no halo logic
        rows = h
    else:
        rows = _strip_rows(h, w, c_in, c_mid, c_out, jnp.dtype(dt).itemsize)
    n_strips = h // rows
    # halo granularity: smallest g with (g*W) % 8 == 0 that divides `rows`
    halo_g = 1
    while (halo_g * w) % 8 != 0 and halo_g <= rows:
        halo_g *= 2

    w1 = jnp.asarray(folded["w1"], dt)
    w2 = jnp.asarray(folded["w2"], dt).reshape(9 * c_mid, c_mid)
    w3 = jnp.asarray(folded["w3"], dt)
    b1 = jnp.asarray(folded["b1"], jnp.float32).reshape(1, -1)
    b2 = jnp.asarray(folded["b2"], jnp.float32).reshape(1, -1)
    b3 = jnp.asarray(folded["b3"], jnp.float32).reshape(1, -1)
    if has_proj:
        wp = jnp.asarray(folded["wp"], dt)
        bp = jnp.asarray(folded["bp"], jnp.float32).reshape(1, -1)
    else:  # minimal placeholders: the kernel never reads them, and a
        # full-size zero wp would still occupy (C_in x C_out) VMEM
        wp = jnp.zeros((8, 128), dt)
        bp = jnp.zeros((1, 128), jnp.float32)

    if n_strips > 1 and (rows % halo_g != 0 or (halo_g * w) % 8 != 0):
        raise ValueError(
            f"H={h} W={w}: no Mosaic-legal halo block for rows={rows}"
        )

    kw = dict(memory_space=pltpu.VMEM) if not interpret else {}
    weight_specs = [
        pl.BlockSpec((c_in, c_mid), lambda i, j: (0, 0), **kw),
        pl.BlockSpec((1, c_mid), lambda i, j: (0, 0), **kw),
        pl.BlockSpec((9 * c_mid, c_mid), lambda i, j: (0, 0), **kw),
        pl.BlockSpec((1, c_mid), lambda i, j: (0, 0), **kw),
        pl.BlockSpec((c_mid, c_out), lambda i, j: (0, 0), **kw),
        pl.BlockSpec((1, c_out), lambda i, j: (0, 0), **kw),
        pl.BlockSpec((c_in, c_out) if has_proj else (8, 128),
                     lambda i, j: (0, 0), **kw),
        pl.BlockSpec((1, c_out) if has_proj else (1, 128),
                     lambda i, j: (0, 0), **kw),
    ]
    center_spec = pl.BlockSpec((1, rows * w, c_in), lambda i, j: (i, j, 0),
                               **kw)
    weights = (w1, b1, w2, b2, w3, b3, wp, bp)
    if n_strips > 1:
        # Halo blocks hold halo_g image rows, addressed in halo_g-row units;
        # clamped index maps duplicate an edge block at the image borders
        # (the entries read from it are exactly the y-masked ones).
        hb = h // halo_g          # number of halo-granularity blocks
        rpg = rows // halo_g      # strip length in halo blocks
        in_specs = [
            pl.BlockSpec((1, halo_g * w, c_in),
                         lambda i, j: (i, jnp.maximum(j * rpg - 1, 0), 0),
                         **kw),
            center_spec,
            pl.BlockSpec((1, halo_g * w, c_in),
                         lambda i, j: (i, jnp.minimum(j * rpg + rpg, hb - 1), 0),
                         **kw),
            *weight_specs,
        ]
        args = (x, x, x, *weights)
    else:
        in_specs = [center_spec, *weight_specs]
        args = (x, *weights)

    return pl.pallas_call(
        functools.partial(_kernel, rows=rows, w_img=w, n_strips=n_strips,
                          has_proj=has_proj),
        out_shape=jax.ShapeDtypeStruct((b, hw, c_out), dt),
        grid=(b, n_strips),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows * w, c_out), lambda i, j: (i, j, 0),
                               **kw),
        scratch_shapes=[pltpu.VMEM((rows * w, 9 * c_mid), dt)],
        interpret=interpret,
    )(*args)


def fold_resnet50(variables, eps: float = 1e-5):
    """Full ResNet-50 variables -> {block_name: folded dict} for the fused
    body, plus the folded stem (kernel', bias')."""
    params, stats = variables["params"], variables["batch_stats"]
    folded = {}
    for name in params:
        if name.startswith("layer"):
            folded[name] = fold_bottleneck(params[name], stats[name], eps)
    stem_k, stem_b = fold_bn_params(
        params["conv1"]["kernel"], params["bn1"]["scale"],
        params["bn1"]["bias"], stats["bn1"]["mean"], stats["bn1"]["var"], eps,
    )
    return folded, (stem_k, stem_b)


def resnet50_fused_forward(x, folded, stem, *, interpret: bool = False):
    """Headless ResNet-50 forward with fused stride-1 bottleneck kernels.

    x: (N, H, W, 3) normalized bf16/f32 input. Stem conv, max pool and the
    three stride-2 transition blocks run on XLA (folded-BN: conv+bias+relu
    only); every stride-1 block is one fused kernel call. Returns (N, 2048)
    f32 pooled features. Matches ResNet50(dtype=x.dtype).apply at the
    numerics of the input dtype.
    """
    dt = x.dtype
    stem_k, stem_b = stem
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(stem_k, dt), window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(stem_b, dt)
    y = jnp.maximum(y, 0.0)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )

    n = y.shape[0]
    for stage, num_blocks in enumerate((3, 4, 6, 3), start=1):
        for block in range(num_blocks):
            f = folded[f"layer{stage}_{block}"]
            if stage > 1 and block == 0:
                # stride-2 transition on XLA (conv+bias, BN folded)
                a = jnp.maximum(
                    y @ jnp.asarray(f["w1"], dt) + jnp.asarray(f["b1"], dt),
                    0.0,
                )
                m = jax.lax.conv_general_dilated(
                    a, jnp.asarray(f["w2"], dt), window_strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + jnp.asarray(f["b2"], dt)
                m = jnp.maximum(m, 0.0)
                c = m @ jnp.asarray(f["w3"], dt) + jnp.asarray(f["b3"], dt)
                res = y[:, ::2, ::2, :] @ jnp.asarray(f["wp"], dt) \
                    + jnp.asarray(f["bp"], dt)
                y = jnp.maximum(c + res, 0.0)
            else:
                side = y.shape[1]
                flat = y.reshape(n, side * side, y.shape[-1])
                out = fused_bottleneck(flat, f, h=side, w=side,
                                       interpret=interpret)
                y = out.reshape(n, side, side, out.shape[-1])
    return jnp.mean(y, axis=(1, 2)).astype(jnp.float32)
