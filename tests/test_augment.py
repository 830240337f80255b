"""Augmentation suite: hflip joint math, temporal reverse, color jitter
properties, HSV round-trip, determinism (reference src/dataset.py:158-207)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h36x.data.augment import (
    _adjust_brightness,
    _adjust_contrast,
    _adjust_hue,
    _adjust_saturation,
    _hsv_to_rgb,
    _rgb_to_hsv,
    color_jitter,
    hflip_joints,
    hflip_video,
    reverse_joints,
    reverse_time,
)
from h36x.geometry.skeleton import H36M_FLIP_PAIRS


class TestHflip:
    def test_video_mirror(self, rng):
        v = jnp.asarray(rng.random((2, 4, 6, 3)).astype(np.float32))
        out = hflip_video(v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(v)[:, :, ::-1, :])

    def test_joints_and_K(self, rng):
        T = 3
        j3d = rng.normal(size=(T, 17, 3)).astype(np.float32)
        j2d = rng.normal(size=(T, 17, 2)).astype(np.float32) * 100
        K = np.array([[500, 0, 100], [0, 500, 120], [0, 0, 1]], np.float32)
        f3, f2, Kf = hflip_joints(j3d, j2d, K, width=224)

        assert Kf[0, 2] == 224 - 100
        # x mirrored / negated with pair swap
        for a, b in H36M_FLIP_PAIRS:
            np.testing.assert_allclose(f2[:, a, 0], 224 - j2d[:, b, 0])
            np.testing.assert_allclose(f3[:, a, 0], -j3d[:, b, 0])
            np.testing.assert_allclose(f3[:, a, 1:], j3d[:, b, 1:])
        # unpaired joints keep identity
        np.testing.assert_allclose(f3[:, 0, 0], -j3d[:, 0, 0])
        np.testing.assert_allclose(f2[:, 0, 1], j2d[:, 0, 1])

    def test_involution(self, rng):
        j3d = rng.normal(size=(2, 17, 3)).astype(np.float32)
        j2d = rng.normal(size=(2, 17, 2)).astype(np.float32)
        K = np.eye(3, dtype=np.float32)
        a3, a2, aK = hflip_joints(j3d, j2d, K, width=224)
        b3, b2, bK = hflip_joints(a3, a2, aK, width=224)
        np.testing.assert_allclose(b3, j3d, rtol=1e-6)
        np.testing.assert_allclose(b2, j2d, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(bK, K, rtol=1e-6)

    def test_does_not_mutate(self, rng):
        j3d = rng.normal(size=(2, 17, 3)).astype(np.float32)
        j2d = rng.normal(size=(2, 17, 2)).astype(np.float32)
        K = np.eye(3, dtype=np.float32)
        c3, c2, cK = j3d.copy(), j2d.copy(), K.copy()
        hflip_joints(j3d, j2d, K, width=224)
        np.testing.assert_array_equal(j3d, c3)
        np.testing.assert_array_equal(j2d, c2)
        np.testing.assert_array_equal(K, cK)


class TestTemporalReverse:
    def test_video_and_joints(self, rng):
        v = jnp.asarray(rng.random((4, 2, 2, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(reverse_time(v)), np.asarray(v)[::-1])
        j3d = rng.normal(size=(4, 17, 3)).astype(np.float32)
        j2d = rng.normal(size=(4, 17, 2)).astype(np.float32)
        r3, r2 = reverse_joints(j3d, j2d)
        np.testing.assert_array_equal(r3, j3d[::-1])
        np.testing.assert_array_equal(r2, j2d[::-1])


class TestColorOps:
    def test_hsv_roundtrip(self, rng):
        v = jnp.asarray(rng.random((5, 6, 3)).astype(np.float32))
        h, s, val = _rgb_to_hsv(v)
        back = _hsv_to_rgb(h, s, val)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), rtol=1e-4, atol=1e-5)

    def test_brightness_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        v = rng.random((1, 4, 4, 3)).astype(np.float32)
        got = np.asarray(_adjust_brightness(jnp.asarray(v), 1.2))
        np.testing.assert_allclose(got, np.clip(v * 1.2, 0, 1), rtol=1e-6)

    def test_saturation_zero_is_grayscale(self, rng):
        v = jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))
        out = np.asarray(_adjust_saturation(v, 0.0))
        np.testing.assert_allclose(out[..., 0], out[..., 1], rtol=1e-5)
        np.testing.assert_allclose(out[..., 1], out[..., 2], rtol=1e-5)

    def test_contrast_one_is_identity(self, rng):
        v = jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_adjust_contrast(v, 1.0)), np.asarray(v), rtol=1e-5, atol=1e-6
        )

    def test_hue_zero_is_identity(self, rng):
        v = jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_adjust_hue(v, 0.0)), np.asarray(v), rtol=1e-4, atol=1e-5
        )

    def test_hue_full_cycle_is_identity(self, rng):
        v = jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_adjust_hue(v, 1.0)), np.asarray(v), rtol=1e-3, atol=1e-4
        )


class TestColorJitter:
    def test_deterministic_per_key(self, rng):
        v = jnp.asarray(rng.random((3, 8, 8, 3)).astype(np.float32))
        a = np.asarray(color_jitter(v, jax.random.key(5)))
        b = np.asarray(color_jitter(v, jax.random.key(5)))
        c = np.asarray(color_jitter(v, jax.random.key(6)))
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_output_in_range_and_changed(self, rng):
        v = jnp.asarray(rng.random((3, 8, 8, 3)).astype(np.float32))
        out = np.asarray(color_jitter(v, jax.random.key(0)))
        assert out.shape == v.shape
        assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6
        assert not np.allclose(out, np.asarray(v))

    def test_same_factors_for_all_frames(self, rng):
        """One factor set per clip: two identical frames stay identical."""
        frame = rng.random((1, 8, 8, 3)).astype(np.float32)
        v = jnp.asarray(np.concatenate([frame, frame], axis=0))
        out = np.asarray(color_jitter(v, jax.random.key(3)))
        np.testing.assert_allclose(out[0], out[1], rtol=1e-5, atol=1e-6)

    def test_jits(self, rng):
        v = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
        f = jax.jit(color_jitter)
        out = f(v, jax.random.key(0))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(color_jitter(v, jax.random.key(0))),
            rtol=1e-5, atol=1e-6,
        )
