"""Optimized ResNet-50 inference engine (XLA path, frozen weights).

Three TPU-first transforms over the plain flax forward, all weight-side
(the math is identical; tested against model.apply):

1. **BatchNorm folding** — every frozen BN becomes a scale on the previous
   conv's kernel plus a bias (h36x.ops.pallas_bottleneck.fold_bn_params),
   removing all BN elementwise work.
2. **ImageNet normalize folded into the stem conv** — (x/255 - mean)/std is
   per-channel affine, so it folds into conv1's kernel and bias. The
   (N, 224, 224, 3) u8 input goes straight into the conv after a cast; the
   full-size normalized f32/bf16 intermediate (the single biggest tensor in
   the program) is never materialized.
3. **Space-to-depth stem** — the 7x7/stride-2 conv over 3 channels puts a
   3-deep contraction on the MXU (2% lane utilization). Rewriting the input
   as (112, 112, 12) 2x2 blocks turns it into a 4x4/stride-1 conv over 12
   channels with padding (2,1): output (y,x) of the original conv reads
   input rows 2y-3..2y+3, i.e. s2d rows y-2..y+1 at both phases, so
   k2[a+2, b+2, (dy,dx,c), o] = K[2a+dy+3, 2b+dx+3, c, o] (zero where the
   index falls outside the 7x7 support).

The stride-2 transition blocks and all stride-1 bottlenecks run as folded
XLA convs (measured faster than the fused Pallas bottleneck kernel on this
toolchain). Measured end-to-end vs the flax forward: +2% at batch 256,
-25% at batch ~1000 (the 12-channel s2d stem pads to 128 lanes and the 6-D
transpose materializes); extraction therefore defaults to the flax path —
see DESIGN.md "backbone ceiling" for the full accounting.

Reference behavior reproduced: torchvision resnet50.eval() minus fc
(reference src/preprocess_resnet_features.py:207-218) over ImageNet-
normalized 224x224 crops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from h36x.ops.pallas_bottleneck import fold_resnet50
from h36x.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD


def fold_stem_s2d(stem_kernel, stem_bias, hw: int = 224):
    """Folded stem (7,7,3,64)+bias -> s2d kernel (4,4,12,64) + a positional
    bias MAP (hw/2, hw/2, 64) with the u8->ImageNet normalization folded in.

    normalize(x) = x*s + t is affine, so the scale s folds into the kernel.
    The offset t cannot fold into a scalar bias: the original conv
    zero-pads the NORMALIZED image, so border outputs see t at fewer taps
    than interior ones. Both versions are affine in x with identical linear
    parts, hence the exact bias is itself the original conv applied to the
    normalized ZERO image — a (hw/2, hw/2, O) map that differs from the
    constant interior value only in the 2-pixel border band.
    """
    k = np.asarray(stem_kernel, np.float32)
    b = np.asarray(stem_bias, np.float32)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)

    s = 1.0 / (255.0 * std)
    t = -mean / std
    k_scaled = k * s[None, None, :, None]

    k2 = np.zeros((4, 4, 12, k.shape[3]), np.float32)
    for a in range(-2, 2):
        for bb in range(-2, 2):
            for dy in range(2):
                for dx in range(2):
                    ky = 2 * a + dy + 3
                    kx = 2 * bb + dx + 3
                    if 0 <= ky < 7 and 0 <= kx < 7:
                        for c in range(3):
                            k2[a + 2, bb + 2, dy * 6 + dx * 3 + c, :] = \
                                k_scaled[ky, kx, c, :]

    zero_norm = np.broadcast_to(t, (1, hw, hw, 3)).astype(np.float32)
    bias_map = jax.lax.conv_general_dilated(
        jnp.asarray(zero_norm), jnp.asarray(k), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bias_map = np.asarray(bias_map)[0] + b  # (hw/2, hw/2, O)
    return k2, bias_map


def space_to_depth(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C), 2x2 blocks flattened (dy, dx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def fold_resnet50_opt(variables, hw: int = 224):
    """Full variables -> (folded_blocks, (k2, stem_bias_map)) for
    :func:`resnet50_opt_forward`."""
    folded, (stem_k, stem_b) = fold_resnet50(variables)
    return folded, fold_stem_s2d(stem_k, stem_b, hw)


def resnet50_opt_forward(frames_u8, folded, stem2, *, dtype=jnp.bfloat16):
    """(N, 224, 224, 3) RAW u8 frames -> (N, 2048) f32 pooled features.

    Normalization is inside the stem weights; the only elementwise work on
    the full-resolution tensor is the u8->dtype cast feeding the s2d view.
    """
    k2, bias_map = stem2
    x = space_to_depth(frames_u8.astype(dtype))
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(k2, dtype), window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(bias_map, dtype)[None]
    y = jnp.maximum(y, 0.0)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )

    for stage, num_blocks in enumerate((3, 4, 6, 3), start=1):
        for block in range(num_blocks):
            f = folded[f"layer{stage}_{block}"]
            stride2 = stage > 1 and block == 0
            a = jnp.maximum(
                y @ jnp.asarray(f["w1"], dtype) + jnp.asarray(f["b1"], dtype),
                0.0,
            )
            m = jax.lax.conv_general_dilated(
                a, jnp.asarray(f["w2"], dtype),
                window_strides=(2, 2) if stride2 else (1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(f["b2"], dtype)
            m = jnp.maximum(m, 0.0)
            c = m @ jnp.asarray(f["w3"], dtype) + jnp.asarray(f["b3"], dtype)
            if "wp" in f:
                xin = y[:, ::2, ::2, :] if stride2 else y
                res = xin @ jnp.asarray(f["wp"], dtype) \
                    + jnp.asarray(f["bp"], dtype)
            else:
                res = y
            y = jnp.maximum(c + res, 0.0)
    return jnp.mean(y, axis=(1, 2)).astype(jnp.float32)
