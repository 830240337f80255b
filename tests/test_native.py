"""Native C++ runtime library: build, crop+resize parity vs cv2, hflip,
b/c/s jitter parity vs the numpy implementation."""

import numpy as np
import pytest

from h36x import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library could not be built")
    return native.load()


class TestCropResize:
    def test_matches_cv2(self, lib, rng):
        import cv2

        frames = rng.integers(0, 256, size=(4, 60, 70, 3)).astype(np.uint8)
        top, left, side, out = 5, 8, 40, 16
        got = native.crop_resize_clip(frames, top, left, side, out)
        assert got.shape == (4, 16, 16, 3)
        for t in range(4):
            crop = frames[t, top : top + side, left : left + side]
            want = cv2.resize(crop, (out, out), interpolation=cv2.INTER_LINEAR)
            # cv2 uses fixed-point arithmetic; allow small rounding skew
            diff = np.abs(got[t].astype(int) - want.astype(int))
            assert diff.max() <= 2
            assert (diff > 1).mean() < 0.01

    def test_identity_crop(self, lib, rng):
        frames = rng.integers(0, 256, size=(2, 16, 16, 3)).astype(np.uint8)
        got = native.crop_resize_clip(frames, 0, 0, 16, 16)
        np.testing.assert_array_equal(got, frames)

    def test_bad_box_raises(self, lib, rng):
        frames = rng.integers(0, 256, size=(1, 10, 10, 3)).astype(np.uint8)
        with pytest.raises(ValueError):
            native.crop_resize_clip(frames, 5, 5, 10, 8)

    def test_threading_matches_single(self, lib, rng):
        frames = rng.integers(0, 256, size=(8, 50, 50, 3)).astype(np.uint8)
        a = native.crop_resize_clip(frames, 2, 3, 40, 24, n_threads=1)
        b = native.crop_resize_clip(frames, 2, 3, 40, 24, n_threads=8)
        np.testing.assert_array_equal(a, b)


class TestHflip:
    def test_matches_numpy(self, lib, rng):
        frames = rng.integers(0, 256, size=(3, 7, 9, 3)).astype(np.uint8)
        got = native.hflip_clip(frames)
        np.testing.assert_array_equal(got, frames[:, :, ::-1, :])
        # input untouched
        assert not np.array_equal(got, frames) or frames.shape[2] == 1


class TestBcsJitter:
    def test_brightness_exact(self, lib, rng):
        frames = rng.integers(0, 200, size=(2, 8, 8, 3)).astype(np.uint8)
        got = native.bcs_jitter_clip(frames, fb=1.2, fc=1.0, fs=1.0, order=[0])
        want = np.clip(np.rint(frames.astype(np.float32) * 1.2), 0, 255)
        np.testing.assert_allclose(got.astype(float), want, atol=1)

    def test_saturation_zero_grayscale(self, lib, rng):
        frames = rng.integers(0, 256, size=(1, 6, 6, 3)).astype(np.uint8)
        got = native.bcs_jitter_clip(frames, 1.0, 1.0, 0.0, order=[2])
        assert np.abs(got[..., 0].astype(int) - got[..., 1].astype(int)).max() <= 1
        assert np.abs(got[..., 1].astype(int) - got[..., 2].astype(int)).max() <= 1

    def test_unknown_op_rejected(self, lib, rng):
        """A full sample_jitter_params ordering includes hue (op 3); the
        b/c/s-only native kernel must reject it, not silently run it as a
        second saturation pass."""
        frames = rng.integers(0, 255, size=(1, 4, 4, 3)).astype(np.uint8)
        with pytest.raises(ValueError, match="unknown op"):
            native.bcs_jitter_clip(frames, 1.1, 1.1, 1.1, order=[0, 1, 2, 3])

    def test_contrast_blends_toward_mean(self, lib):
        frames = np.zeros((1, 4, 4, 3), np.uint8)
        frames[0, :2] = 200  # half bright, half dark
        got = native.bcs_jitter_clip(frames, 1.0, 0.0, 1.0, order=[1])
        # fc=0 -> every pixel equals the mean gray
        assert got.std() < 1.5
