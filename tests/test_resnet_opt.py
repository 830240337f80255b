"""Optimized ResNet-50 inference engine vs the flax forward: BN folding,
normalize-in-stem, space-to-depth stem rewrite (h36x/ops/resnet_opt.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from h36x.models.resnet import ResNet50, init_resnet_params
from h36x.ops.preprocess import imagenet_normalize
from h36x.ops.resnet_opt import (
    fold_resnet50_opt,
    fold_stem_s2d,
    resnet50_opt_forward,
    space_to_depth,
)
from tests.test_pallas_bottleneck import _randomize_stats


def test_space_to_depth_layout(rng):
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    out = np.asarray(space_to_depth(jnp.asarray(x)))
    assert out.shape == (1, 2, 2, 12)
    # (dy, dx, c) flattening: block (0,0) channel for dy=1,dx=0,c=2
    assert out[0, 0, 0, 1 * 6 + 0 * 3 + 2] == x[0, 1, 0, 2]


def test_s2d_stem_matches_conv7x7(rng):
    """s2d 4x4 conv over u8 == normalize -> 7x7/2 conv (pre-BN-fold stem)."""
    frames = rng.integers(0, 256, size=(2, 32, 32, 3)).astype(np.uint8)
    k = (rng.normal(size=(7, 7, 3, 64)) * 0.05).astype(np.float32)
    b = rng.normal(size=(64,)).astype(np.float32)

    v = imagenet_normalize(jnp.asarray(frames, jnp.float32) / 255.0)
    want = jax.lax.conv_general_dilated(
        v, jnp.asarray(k), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b

    k2, bias_map = fold_stem_s2d(k, b, hw=32)
    x = space_to_depth(jnp.asarray(frames, jnp.float32))
    got = jax.lax.conv_general_dilated(
        x, jnp.asarray(k2), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias_map[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_full_engine_matches_flax(rng):
    model = ResNet50()  # f32: isolates the transform from bf16 noise
    variables = init_resnet_params(model, jax.random.key(0), input_hw=64)
    variables = _randomize_stats(variables, rng)
    frames = rng.integers(0, 256, size=(2, 64, 64, 3)).astype(np.uint8)

    v = imagenet_normalize(jnp.asarray(frames, jnp.float32) / 255.0)
    want = np.asarray(model.apply(variables, v))

    folded, stem2 = fold_resnet50_opt(jax.device_get(variables), hw=64)
    got = np.asarray(
        resnet50_opt_forward(jnp.asarray(frames), folded, stem2,
                             dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
