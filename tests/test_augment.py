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


class TestYIQHue:
    """Lane-friendly hue rotation (_adjust_hue_yiq) — the device default."""

    def test_zero_shift_identity(self, rng):
        from h36x.data.augment import _adjust_hue_yiq

        v = jnp.asarray(rng.random((2, 4, 4, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(_adjust_hue_yiq(v, 0.0)),
                                   np.asarray(v), rtol=1e-5, atol=1e-6)

    def test_gray_pixels_invariant(self, rng):
        from h36x.data.augment import _adjust_hue_yiq

        g = rng.random((5, 1, 1, 1)).astype(np.float32)
        v = jnp.asarray(np.repeat(g, 3, axis=-1))
        out = np.asarray(_adjust_hue_yiq(v, 0.04))
        np.testing.assert_allclose(out, np.asarray(v), rtol=1e-4, atol=1e-5)

    def test_preserves_luma(self, rng):
        from h36x.data.augment import _GRAY, _adjust_hue_yiq

        # interior pixels (away from clipping) keep Y exactly
        v = jnp.asarray((rng.random((64, 3)) * 0.5 + 0.25).astype(np.float32))
        out = _adjust_hue_yiq(v, 0.05)
        np.testing.assert_allclose(np.asarray(out @ _GRAY),
                                   np.asarray(v @ _GRAY), rtol=5e-3, atol=5e-3)

    def test_close_to_hsv_at_jitter_strength(self, rng):
        """Within visual tolerance of the exact HSV shift for |shift|<=0.05
        (the production jitter strength, reference src/dataset.py:190)."""
        from h36x.data.augment import _adjust_hue, _adjust_hue_yiq

        v = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
        for shift in (-0.05, 0.03, 0.05):
            a = np.asarray(_adjust_hue_yiq(v, shift))
            b = np.asarray(_adjust_hue(v, shift))
            assert np.abs(a - b).mean() < 0.08, shift
            # both move pixels in the same direction, comparable magnitude
            da = np.abs(a - np.asarray(v)).mean()
            db = np.abs(b - np.asarray(v)).mean()
            assert 0.3 < da / max(db, 1e-6) < 3.0

    def test_color_jitter_yiq_jits_and_in_range(self, rng):
        from h36x.data.augment import color_jitter

        v = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
        out = jax.jit(lambda v, k: color_jitter(v, k))(v, jax.random.key(1))
        out = np.asarray(out)
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert not np.allclose(out, np.asarray(v))


def test_np_hue_cv2_matches_numpy(rng):
    cv2 = pytest.importorskip("cv2")
    from h36x.data.augment import _np_hue, _np_hue_cv2

    v = rng.random((3, 16, 16, 3)).astype(np.float32)
    for shift in (-0.05, 0.02, 0.05):
        np.testing.assert_allclose(
            _np_hue_cv2(v, shift), _np_hue(v, shift), rtol=1e-4, atol=1e-5
        )


class TestJitterBatchingEquivalence:
    def test_batched_equals_per_frame(self, rng):
        """The dedup scheduler's video-keyed mode jitters all first-seen
        frames in ONE jitter_u8 call; every op's statistics are per-frame,
        so the batched call must be byte-identical to per-frame calls
        (both backends — the native kernel treats frames as independent
        work items, the numpy chain reduces over (H, W) only)."""
        from h36x.data.augment import jitter_u8, sample_jitter_params

        frames = rng.integers(0, 256, size=(5, 16, 16, 3)).astype(np.uint8)
        params = sample_jitter_params(np.random.default_rng(11))
        batched = jitter_u8(frames, params)
        for t in range(frames.shape[0]):
            np.testing.assert_array_equal(
                batched[t], jitter_u8(frames[t : t + 1], params)[0], str(t)
            )
