"""ResNet-50 feature backbone in flax (NHWC, TPU-native).

Replaces the reference's torchvision backbone (reference
src/preprocess_resnet_features.py:207-209: resnet50 IMAGENET1K_V2 minus the fc
head, global-average-pooled to 2048-D). The architecture is the standard
ResNet-v1.5 used by torchvision — 7x7/2 stem, 3x3/2 max pool, bottleneck
stages [3,4,6,3] with the stride on the 3x3 conv — so a torchvision
state_dict converts weight-for-weight (:mod:`h36x.models.torch_import`).

Inference-only usage: BatchNorm always runs with running statistics (the
backbone is frozen for feature extraction, matching the reference's eval()
mode). All convs run in the module dtype (bfloat16 on TPU) with f32 params.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

STAGE_SIZES = (3, 4, 6, 3)  # ResNet-50


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride here: v1.5) -> 1x1 with 4x expansion."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        needs_proj = x.shape[-1] != self.features * 4 or self.strides != 1
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn3")(y)
        if needs_proj:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=True, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Headless ResNet-50: (N, 224, 224, 3) -> (N, 2048) pooled features."""

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = STAGE_SIZES

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1); pad with -inf so the border
        # max is over real pixels only.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage, num_blocks in enumerate(self.stage_sizes):
            features = 64 * (2**stage)
            for block in range(num_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(features, strides=strides, dtype=self.dtype,
                               name=f"layer{stage + 1}_{block}")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x.astype(jnp.float32)


def init_resnet_params(model: ResNet50, rng, input_hw: int = 224):
    """Initialize all variables (params + batch_stats) for the backbone."""
    variables = model.init(rng, jnp.zeros((1, input_hw, input_hw, 3), model.dtype))
    return variables


def count_params(variables) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(variables["params"]))
