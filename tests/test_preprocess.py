"""Fused crop/resize/normalize op: exactness vs naive crop-then-resize and
vs torch's bilinear interpolate (align_corners=False) as an oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from h36x.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    crop_resize_matrices,
    fused_crop_resize,
    imagenet_normalize,
)
from h36x.ops.resize import resize_bilinear


class TestCropResizeMatrix:
    def test_rows_sum_to_one(self):
        wy, wx = crop_resize_matrices([10, 20, 50, 60], img_h=100, img_w=120, out_size=32)
        np.testing.assert_allclose(wy.sum(axis=1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(wx.sum(axis=1), 1.0, rtol=1e-5)

    def test_support_inside_crop(self):
        wy, wx = crop_resize_matrices([10, 20, 50, 60], img_h=100, img_w=120, out_size=32)
        assert wy[:, :10].sum() == 0 and wy[:, 60:].sum() == 0
        assert wx[:, :20].sum() == 0 and wx[:, 80:].sum() == 0

    def test_identity_when_no_crop_no_resize(self):
        wy, wx = crop_resize_matrices([0, 0, 16, 16], img_h=16, img_w=16, out_size=16)
        np.testing.assert_allclose(wy, np.eye(16), atol=1e-6)
        np.testing.assert_allclose(wx, np.eye(16), atol=1e-6)


class TestFusedCropResize:
    def test_matches_torch_interpolate(self, rng):
        """crop-then-resize via torch F.interpolate == our fused matrices."""
        torch = pytest.importorskip("torch")
        frames = rng.integers(0, 256, size=(3, 40, 48, 3)).astype(np.uint8)
        box = (4, 6, 30, 30)  # top, left, h, w
        out_size = 16

        wy, wx = crop_resize_matrices(box, 40, 48, out_size)
        got = np.asarray(
            fused_crop_resize(jnp.asarray(frames), jnp.asarray(wy), jnp.asarray(wx))
        )

        crop = frames[:, box[0] : box[0] + box[2], box[1] : box[1] + box[3], :]
        t = torch.from_numpy(np.transpose(crop, (0, 3, 1, 2))).float()
        t = torch.nn.functional.interpolate(
            t, size=(out_size, out_size), mode="bilinear", align_corners=False
        )
        want = np.transpose(t.numpy(), (0, 2, 3, 1)) / 255.0
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_batched_per_clip_matrices(self, rng):
        frames = rng.integers(0, 256, size=(2, 3, 24, 24, 3)).astype(np.uint8)
        boxes = [(0, 0, 20, 20), (2, 2, 16, 16)]
        wys = np.stack([crop_resize_matrices(b, 24, 24, 8)[0] for b in boxes])
        wxs = np.stack([crop_resize_matrices(b, 24, 24, 8)[1] for b in boxes])
        got = np.asarray(
            fused_crop_resize(jnp.asarray(frames), jnp.asarray(wys), jnp.asarray(wxs))
        )
        assert got.shape == (2, 3, 8, 8, 3)
        for b in range(2):
            wy, wx = crop_resize_matrices(boxes[b], 24, 24, 8)
            single = np.asarray(
                fused_crop_resize(jnp.asarray(frames[b]), jnp.asarray(wy), jnp.asarray(wx))
            )
            np.testing.assert_allclose(got[b], single, rtol=1e-5)

    def test_range_01(self, rng):
        frames = rng.integers(0, 256, size=(2, 10, 12, 3)).astype(np.uint8)
        wy, wx = crop_resize_matrices((0, 0, 10, 12), 10, 12, 8)
        out = np.asarray(fused_crop_resize(jnp.asarray(frames), jnp.asarray(wy), jnp.asarray(wx)))
        assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6


class TestGatherPath:
    def test_matches_matrix_formulation(self, rng):
        from h36x.ops.preprocess import crop_resize_grids, fused_crop_resize_gather

        frames = rng.integers(0, 256, size=(3, 40, 48, 3)).astype(np.uint8)
        box = (4, 6, 30, 30)
        wy, wx = crop_resize_matrices(box, 40, 48, 16)
        want = np.asarray(
            fused_crop_resize(jnp.asarray(frames), jnp.asarray(wy), jnp.asarray(wx))
        )
        gy, gx = crop_resize_grids(box, 40, 48, 16)
        got = np.asarray(
            fused_crop_resize_gather(
                jnp.asarray(frames),
                tuple(jnp.asarray(g) for g in gy),
                tuple(jnp.asarray(g) for g in gx),
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grid_support_inside_crop(self):
        from h36x.ops.preprocess import crop_resize_grid

        lo, hi, frac = crop_resize_grid(10, 50, 100, 32)
        assert lo.min() >= 10 and hi.max() <= 59
        assert frac.min() >= 0 and frac.max() < 1


class TestResizeBilinear:
    def test_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        img = rng.normal(size=(2, 3, 20, 24)).astype(np.float32)  # NCHW
        out = np.asarray(resize_bilinear(jnp.asarray(img), 11, 13))
        t = torch.nn.functional.interpolate(
            torch.from_numpy(img), size=(11, 13), mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(out, t, rtol=1e-4, atol=1e-5)


class TestNormalize:
    def test_imagenet_normalize(self, rng):
        v = rng.random((2, 4, 4, 3)).astype(np.float32)
        out = np.asarray(imagenet_normalize(jnp.asarray(v)))
        want = (v - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(out, want, rtol=1e-5)
