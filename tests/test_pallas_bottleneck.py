"""Fused bottleneck kernel (interpret mode on CPU) vs the flax ResNet
blocks: BN folding, single-block equivalence (identity + projection),
3x3 boundary handling, and the full fused ResNet-50 forward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h36x.models.resnet import Bottleneck, ResNet50, init_resnet_params
from h36x.ops.pallas_bottleneck import (
    fold_bottleneck,
    fold_resnet50,
    fused_bottleneck,
    resnet50_fused_forward,
)


def _randomize_stats(variables, rng):
    """Fresh-init BN stats are mean=0/var=1; randomize so folding bugs show."""
    def rand(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if name == "mean":
            return rng.normal(0.0, 0.05, leaf.shape).astype(np.float32)
        return rng.uniform(0.8, 1.3, leaf.shape).astype(np.float32)

    stats = jax.tree_util.tree_map_with_path(
        rand, jax.device_get(variables["batch_stats"])
    )
    return {"params": variables["params"], "batch_stats": stats}


class TestFusedBottleneck:
    @pytest.mark.parametrize("cin,width,h", [(64, 16, 8), (256, 64, 8)])
    def test_identity_or_projection_block(self, rng, cin, width, h):
        block = Bottleneck(width, strides=1)
        x = jnp.asarray(rng.normal(size=(2, h, h, cin)).astype(np.float32))
        variables = block.init(jax.random.key(0), x)
        variables = _randomize_stats(variables, rng)
        want = block.apply(variables, x)

        folded = fold_bottleneck(
            jax.device_get(variables["params"]),
            jax.device_get(variables["batch_stats"]),
        )
        assert ("wp" in folded) == (cin != width * 4)
        got = fused_bottleneck(
            x.reshape(2, h * h, cin), folded, h=h, w=h, interpret=True
        ).reshape(2, h, h, width * 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_boundary_pixels_exact(self, rng):
        """Edge/corner pixels exercise every zero-fill + column-mask path of
        the row-shifted 3x3; compare the full map, not just the interior."""
        block = Bottleneck(16, strides=1)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 64)).astype(np.float32))
        variables = _randomize_stats(block.init(jax.random.key(1), x), rng)
        want = np.asarray(block.apply(variables, x))
        folded = fold_bottleneck(
            jax.device_get(variables["params"]),
            jax.device_get(variables["batch_stats"]),
        )
        got = np.asarray(fused_bottleneck(
            x.reshape(1, 16, 64), folded, h=4, w=4, interpret=True
        )).reshape(1, 4, 4, 64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_full_resnet50_fused_forward(self, rng):
        model = ResNet50()  # f32 so the comparison isolates the kernels
        variables = init_resnet_params(model, jax.random.key(0), input_hw=64)
        variables = _randomize_stats(variables, rng)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        want = np.asarray(model.apply(variables, x))

        folded, stem = fold_resnet50(jax.device_get(variables))
        got = np.asarray(
            resnet50_fused_forward(x, folded, stem, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_multi_strip_halo_path(self, rng):
        """Force 4 strips on a 16x8 image (halo blocks + clamped index maps
        + strip-local y masks) and compare against the flax block."""
        block = Bottleneck(16, strides=1)
        x = jnp.asarray(rng.normal(size=(2, 16, 8, 64)).astype(np.float32))
        variables = _randomize_stats(block.init(jax.random.key(2), x), rng)
        want = np.asarray(block.apply(variables, x))
        folded = fold_bottleneck(
            jax.device_get(variables["params"]),
            jax.device_get(variables["batch_stats"]),
        )
        got = np.asarray(fused_bottleneck(
            x.reshape(2, 128, 64), folded, h=16, w=8, interpret=True,
            force_rows=4,
        )).reshape(2, 16, 8, 64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_multi_strip_coarse_halo(self, rng):
        """W=4 needs 2-row halo blocks (g*W % 8); rows=4 over H=8."""
        block = Bottleneck(16, strides=1)
        x = jnp.asarray(rng.normal(size=(1, 8, 4, 64)).astype(np.float32))
        variables = _randomize_stats(block.init(jax.random.key(3), x), rng)
        want = np.asarray(block.apply(variables, x))
        folded = fold_bottleneck(
            jax.device_get(variables["params"]),
            jax.device_get(variables["batch_stats"]),
        )
        got = np.asarray(fused_bottleneck(
            x.reshape(1, 32, 64), folded, h=8, w=4, interpret=True,
            force_rows=4,
        )).reshape(1, 8, 4, 64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_strip_rows_scales_with_itemsize():
    """The VMEM budget must use the real element width: fused_bottleneck
    casts weights AND activations to x.dtype, so an f32 call (itemsize 4)
    may only get a strip height <= the bf16 one, never a taller strip that
    would overflow VMEM. Every returned height must also be halo-legal
    (single strip, or a multiple of the halo granularity) — picking purely
    by fit used to return rows=7 for 28x28 f32 and fail downstream."""
    from h36x.ops.pallas_bottleneck import _halo_granularity, _strip_rows

    for (h, w, ci, cm, co) in ((56, 56, 256, 64, 256),
                               (28, 28, 512, 128, 512)):
        r2 = _strip_rows(h, w, ci, cm, co, itemsize=2)
        r4 = _strip_rows(h, w, ci, cm, co, itemsize=4)
        assert r4 <= r2, (h, r2, r4)
        assert 1 <= r4 and h % r4 == 0
        for r in (r2, r4):
            assert r == h or r % _halo_granularity(w) == 0, (h, w, r)
    # 14x14 f32: the only halo-legal height (the full image) exceeds the
    # budget — the actionable error must fire, not a cryptic halo failure
    assert _strip_rows(14, 14, 1024, 256, 1024, itemsize=2) == 14
    with pytest.raises(ValueError, match="bfloat16"):
        _strip_rows(14, 14, 1024, 256, 1024, itemsize=4)


def test_strip_rows_rejects_unfittable_f32_weights():
    """layer4-scale channels at f32: resident weights alone exceed VMEM —
    a clear error beats a cryptic halo failure downstream."""
    import pytest as _pytest

    from h36x.ops.pallas_bottleneck import _strip_rows

    assert _strip_rows(7, 7, 2048, 512, 2048, itemsize=2) >= 1
    with _pytest.raises(ValueError, match="bfloat16"):
        _strip_rows(7, 7, 2048, 512, 2048, itemsize=4)
