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


class TestFullJitter:
    """h36x_jitter_clip_u8: the fused 4-op kernel both extraction schedulers
    route the jittered variant through (augment.jitter_u8)."""

    @pytest.fixture(autouse=True)
    def _needs_full_jitter(self, lib):
        # a stale ABI-1 .so is a supported degraded state (numpy fallback),
        # not a failure: skip rather than error on RuntimeError
        if not native.jitter_available():
            pytest.skip("native lib lacks the full-jitter kernel (ABI < 2)")

    def _numpy_oracle(self, u8, params):
        from h36x.data.augment import apply_jitter_params

        v = apply_jitter_params(u8.astype(np.float32) * (1.0 / 255.0), params)
        return np.clip(np.rint(v * 255.0), 0, 255).astype(np.uint8)

    def test_matches_numpy_chain_all_orderings(self, lib, rng):
        """Native f32 chain vs the numpy/cv2 chain: within 1 u8 everywhere
        (residual = cv2-vs-_np_hue hue delta and the contrast gray-mean's
        summation order at rint boundaries), and almost all pixels exact."""
        from h36x.data.augment import sample_jitter_params

        u8 = rng.integers(0, 256, size=(4, 32, 32, 3)).astype(np.uint8)
        for seed in range(12):  # 12 seeds cover every op position in order
            params = sample_jitter_params(np.random.default_rng(seed))
            got = native.jitter_clip_u8(u8, params)
            want = self._numpy_oracle(u8, params)
            d = np.abs(got.astype(int) - want.astype(int))
            assert d.max() <= 1, (seed, list(params[0]), d.max())
            assert (d > 0).mean() < 1e-3, (seed, (d > 0).mean())

    def test_hue_only_matches_np_hue_exactly(self, lib, rng):
        """The kernel mirrors augment._np_hue's HSV math op-for-op; with no
        cv2 in the chain the match is bit-exact after quantization."""
        from h36x.data.augment import _np_hue

        u8 = rng.integers(0, 256, size=(2, 16, 16, 3)).astype(np.uint8)
        # * (1/255), not / 255: the production u8->f32 conversion multiplies
        # (augment.jitter_u8), and the two round differently in f32
        v01 = u8.astype(np.float32) * (1.0 / 255.0)
        for shift in (-0.05, -0.01, 0.0, 0.03, 0.05):
            params = (np.array([3]), 1.0, 1.0, 1.0, shift)
            got = native.jitter_clip_u8(u8, params)
            want = np.clip(
                np.rint(_np_hue(v01, shift) * 255.0), 0, 255
            ).astype(np.uint8)
            np.testing.assert_array_equal(got, want, err_msg=str(shift))

    def test_thread_count_deterministic(self, lib, rng):
        """Frames are independent work items: the output must not depend on
        n_threads (the dedup store's byte-parity relies on this)."""
        from h36x.data.augment import sample_jitter_params

        u8 = rng.integers(0, 256, size=(9, 24, 24, 3)).astype(np.uint8)
        params = sample_jitter_params(np.random.default_rng(7))
        a = native.jitter_clip_u8(u8, params, n_threads=1)
        b = native.jitter_clip_u8(u8, params, n_threads=8)
        np.testing.assert_array_equal(a, b)

    def test_input_not_mutated(self, lib, rng):
        from h36x.data.augment import sample_jitter_params

        u8 = rng.integers(0, 256, size=(2, 8, 8, 3)).astype(np.uint8)
        orig = u8.copy()
        native.jitter_clip_u8(u8, sample_jitter_params(np.random.default_rng(0)))
        np.testing.assert_array_equal(u8, orig)

    def test_unknown_op_rejected(self, lib, rng):
        u8 = rng.integers(0, 255, size=(1, 4, 4, 3)).astype(np.uint8)
        with pytest.raises(ValueError, match="unknown op"):
            native.jitter_clip_u8(u8, (np.array([0, 4]), 1.0, 1.0, 1.0, 0.0))

    def test_jitter_u8_router_consistent(self, lib, rng):
        """augment.jitter_u8 must hand back exactly what the backend it
        picked produces — both schedulers depend on it for byte parity."""
        from h36x.data.augment import jitter_u8, sample_jitter_params

        u8 = rng.integers(0, 256, size=(3, 16, 16, 3)).astype(np.uint8)
        params = sample_jitter_params(np.random.default_rng(3))
        np.testing.assert_array_equal(
            jitter_u8(u8, params), native.jitter_clip_u8(u8, params)
        )
