"""Reference-style PreprocessedClips API, mask utilities, decode fallback."""

import numpy as np
import pytest

from h36x.data.masks import clean_mask_to_crop, crop_from_silhouettes, reroot_joints


class TestMasks:
    def test_crop_from_silhouettes(self):
        masks = np.zeros((2, 20, 30), bool)
        masks[0, 5:10, 8:20] = True
        masks[1, 6:12, 10:22] = True
        x, y, w, h = crop_from_silhouettes(masks)
        assert (x, y) == (8, 5)
        assert w >= 13 and h >= 6

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            crop_from_silhouettes(np.zeros((1, 5, 5), bool))

    def test_clean_mask_keeps_largest(self):
        mask = np.zeros((20, 20), bool)
        mask[2:10, 2:10] = True  # big blob
        mask[15:17, 15:17] = True  # small blob
        out = clean_mask_to_crop(mask, 0, 0, 20, 20)
        assert out[5, 5] == 255
        assert out[16, 16] == 0

    def test_clean_mask_accepts_uint8_255(self):
        """uint8 {0,255} masks must not wrap (255*255 == 1 mod 256)."""
        mask = np.zeros((20, 20), np.uint8)
        mask[2:10, 2:10] = 255
        out = clean_mask_to_crop(mask, 0, 0, 20, 20)
        assert out[5, 5] == 255 and out.dtype == np.uint8

    def test_reroot(self):
        joints = np.array([[0.0, 0, 0], [1, 0, 0], [0, 2, 0]])
        out = reroot_joints(joints, np.array([10.0, 10, 10]))
        np.testing.assert_allclose(out[0], [10, 10, 10])
        np.testing.assert_allclose(out[1], [11, 10, 10])
        out_m = reroot_joints(joints, np.array([1000.0, 0, 0]), in_meter=True)
        np.testing.assert_allclose(out_m[0], [1, 0, 0])


class TestPreprocessedClips:
    @pytest.fixture
    def tree(self, tmp_path, rng):
        """Tiny ingested tree with a real (synthesized) mp4."""
        cv2 = pytest.importorskip("cv2")
        import pickle

        cam_dir = tmp_path / "S1" / "Walking_0" / "cam_0"
        cam_dir.mkdir(parents=True)
        h, w, n = 64, 64, 24
        vw = cv2.VideoWriter(
            str(cam_dir / "clip.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h)
        )
        for i in range(n):
            frame = np.full((h, w, 3), i * 10 % 255, np.uint8)
            vw.write(frame)
        vw.release()
        j3d = rng.normal(size=(n, 17, 3)).astype(np.float32) * 100
        j2d = (rng.random((n, 17, 2)) * 40 + 10).astype(np.float32)
        with open(cam_dir / "gt_poses.pkl", "wb") as f:
            pickle.dump({"2d": j2d, "3d": j3d}, f)
        with open(cam_dir / "camera_wext.pkl", "wb") as f:
            pickle.dump({"f": np.array([100.0, 100.0]), "c": np.array([27.0, 32.0]),
                         "k": np.zeros(5), "rt": np.eye(3), "t": np.zeros(3)}, f)
        return tmp_path

    def test_plain_item(self, tree):
        from h36x.data.clips import PreprocessedClips

        ds = PreprocessedClips(str(tree), subjects=[1], seq_len=4, stride=2,
                               frame_skip=2, resize=32)
        assert len(ds) > 0
        video, j3d, j2d, K, box = ds[0]
        assert video.shape == (4, 32, 32, 3)
        assert video.dtype == np.float32
        assert j3d.shape == (4, 17, 3)
        assert j2d.shape == (4, 17, 2)
        assert K.shape == (3, 3)
        assert box.shape == (4,)
        # ImageNet normalization applied: uniform frames go negative-ish
        assert video.min() < 0

    def test_augmented_variants(self, tree):
        from h36x.data.clips import PreprocessedClips

        ds = PreprocessedClips(str(tree), subjects=[1], seq_len=4, stride=2,
                               frame_skip=2, resize=32, augment=True)
        variants = ds[0]
        assert len(variants) == 4
        v0, j0, _, K0 = variants[0]
        v_hf, j_hf, _, K_hf = variants[2]
        v_tr, j_tr, _, _ = variants[3]
        np.testing.assert_allclose(v_hf, v0[:, :, ::-1, :], rtol=1e-5)
        np.testing.assert_allclose(v_tr, v0[::-1], rtol=1e-5)
        np.testing.assert_allclose(j_tr, j0[::-1], rtol=1e-6)
        assert K_hf[0, 2] != K0[0, 2]

    def test_shim_variants_match_extraction_path(self, tree):
        """Shared-oracle check for the reference-API shim: the variants
        PreprocessedClips(augment=True) returns must equal what the
        extraction pipeline computes for the same clip — the shim flips
        AFTER normalization and skips the u8 re-quantization of the
        jittered pixels, both of which must be identity-level differences
        (flip commutes with per-channel normalize; quantization is
        bounded by 1/510 pre-normalize). Closes the gap where only the
        extraction path had the involution test."""
        from h36x.data.augment import make_clip_variants_u8
        from h36x.data.clips import ClipDataset, PreprocessedClips
        from h36x.extract.pipeline import crop_resize_host
        from h36x.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

        seed = 3
        shim = PreprocessedClips(str(tree), subjects=[1], seq_len=4,
                                 stride=2, frame_skip=2, resize=32,
                                 augment=True, jitter_seed=seed)
        variants = shim[1]

        # extraction-path pixels for the same clip (global index 1)
        raw = ClipDataset(str(tree), subjects=[1], seq_len=4, stride=2,
                          frame_skip=2)
        frames, _j3, j2d_raw, _cam, _ci = raw[1]
        small, _box = crop_resize_host(frames, j2d_raw, 32)
        rng = np.random.default_rng(seed * 1_000_003 + 1)
        px = make_clip_variants_u8(small, rng)  # (orig, cjitter, hflip) u8

        def norm(u8):
            return (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

        # orig / hflip / trev: exact (same bytes, same order of operations
        # up to float associativity)
        np.testing.assert_allclose(variants[0][0], norm(px[0]), atol=1e-6)
        np.testing.assert_allclose(variants[2][0], norm(px[2]), atol=1e-6)
        np.testing.assert_allclose(variants[3][0], norm(px[0][::-1]),
                                   atol=1e-6)
        # cjitter: identical factors (same rng keying); the extraction path
        # re-quantizes to u8 for transfer — max error 1/510 pre-normalize,
        # /min(std) after
        atol = (1.0 / 510.0) / float(np.min(IMAGENET_STD)) + 1e-6
        np.testing.assert_allclose(variants[1][0], norm(px[1]), atol=atol)

    def test_decode_scan_fallback_matches_seek(self, tree):
        from h36x.data.clips import _decode_scan, _decode_seek

        mp4 = next((tree / "S1" / "Walking_0" / "cam_0").glob("*.mp4"))
        a = _decode_seek(str(mp4), 2, 6, 2)
        b = _decode_scan(str(mp4), 2, 6, 2)
        np.testing.assert_array_equal(a, b)
