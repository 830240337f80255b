"""Results stage + viz: evaluate_test, NPZ dumps (field-name parity with
reference results.py:227-236 / teste.py:82-89), video pad/trim, viewers
render off-screen."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h36x.data.features import FeatureClipDataset
from h36x.models.phd import PHDFor3DJoints
from h36x.train.results import (
    dump_debug_batch,
    evaluate_test,
    find_video_path,
    pad_or_trim_video,
    resize_video_hw,
)
from tests.helpers import make_synthetic_store


@pytest.fixture
def store(tmp_path):
    make_synthetic_store(tmp_path, n_shards=2, clips_per_shard=4, n_vars=1,
                         seq_len=6, feat_dim=32, subjects=(9,))
    return tmp_path


@pytest.fixture(scope="module")
def model_params():
    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 6, 32)))["params"]
    return model, params


class TestEvaluateTest:
    def test_metrics_finite_and_consistent(self, store, model_params):
        model, params = model_params
        ds = FeatureClipDataset(store, subjects=[9], test_set=True)
        loss, mp, l3d, l2d = evaluate_test(model, params, ds, batch_size=4)
        assert np.isfinite(loss) and np.isfinite(mp)
        assert l3d == loss and l2d == 0.0


class TestVideoHelpers:
    def test_pad_or_trim(self, rng):
        v = rng.integers(0, 255, size=(5, 4, 4, 3)).astype(np.uint8)
        assert pad_or_trim_video(v, 5).shape[0] == 5
        assert pad_or_trim_video(v, 3).shape[0] == 3
        padded = pad_or_trim_video(v, 8)
        assert padded.shape[0] == 8
        np.testing.assert_array_equal(padded[5], v[-1])

    def test_resize(self, rng):
        v = rng.integers(0, 255, size=(2, 32, 32, 3)).astype(np.uint8)
        out = resize_video_hw(v, 16)
        assert out.shape == (2, 16, 16, 3)
        assert resize_video_hw(v, None) is v

    def test_find_video_path(self, tmp_path):
        d = tmp_path / "S9" / "Walking_0" / "cam_0"
        d.mkdir(parents=True)
        (d / "S9_Walking_0_cam_0.mp4").write_bytes(b"x")
        meta = {"subject": 9, "action": "Walking_0", "cam": "cam_0"}
        assert find_video_path(str(tmp_path), meta).endswith(".mp4")
        meta_bare = {"subject": 9, "action": "Walking_0", "cam": "0"}
        assert find_video_path(str(tmp_path), meta_bare).endswith(".mp4")
        with pytest.raises(FileNotFoundError):
            find_video_path(str(tmp_path), {"subject": 1, "action": "X", "cam": "0"})


class TestDebugBatchDump:
    def test_npz_fields(self, store, tmp_path):
        ds = FeatureClipDataset(store, subjects=[9], test_set=True)
        out = tmp_path / "debug_batch.npz"
        dump_debug_batch(ds, str(out), batch_size=4)
        data = np.load(out, allow_pickle=True)
        # field-name parity with reference teste.py:82-89
        assert set(data.files) == {"video", "joints3d", "joints2d", "cam_K", "meta"}
        assert data["joints3d"].shape == (4, 6, 17, 3)
        assert data["cam_K"].shape == (4, 3, 3)
        assert isinstance(data["meta"][0], dict)


class TestViewers:
    def test_to_uint8_rgb_roundtrip(self, rng):
        from h36x.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
        from h36x.viz import to_uint8_rgb

        img = rng.random((3, 8, 8)).astype(np.float32)
        # [0,1] path
        out = to_uint8_rgb(img)
        assert out.shape == (8, 8, 3) and out.dtype == np.uint8
        # normalized path inverts ImageNet normalization
        norm = (img.transpose(1, 2, 0) - IMAGENET_MEAN) / IMAGENET_STD
        out2 = to_uint8_rgb(norm.transpose(2, 0, 1) * 1.0 + 3.0 - 3.0)
        np.testing.assert_allclose(
            out2.astype(np.float32) / 255.0, img.transpose(1, 2, 0), atol=0.01
        )

    def test_animations_build(self, rng):
        from h36x.viz import (
            plot_batch_sample,
            plot_batch_sample_2d_2dproj_3d,
            plot_batch_sample_2d_2dproj_3d_no_video,
        )

        B, T = 1, 3
        video = rng.random((B, T, 3, 16, 16)).astype(np.float32)
        j3d = rng.normal(size=(B, T, 17, 3)).astype(np.float32)
        j3d[..., 2] += 5.0
        j2d = rng.random((B, T, 17, 2)).astype(np.float32) * 16
        K = np.tile(np.eye(3, dtype=np.float32) * 8, (B, 1, 1))
        a1 = plot_batch_sample(video, j3d, show=False)
        a2 = plot_batch_sample_2d_2dproj_3d(video, j3d, j2d, K, show=False)
        a3 = plot_batch_sample_2d_2dproj_3d_no_video(j3d, j2d, K, show=False)
        # K=None degrades to GT-2D in BOTH reprojection viewers (an NPZ with
        # video+joints2d but no intrinsics used to crash the video variant)
        a4 = plot_batch_sample_2d_2dproj_3d(video, j3d, j2d, None, show=False)
        a5 = plot_batch_sample_2d_2dproj_3d_no_video(j3d, j2d, None,
                                                     show=False)
        for anim in (a1, a2, a3, a4, a5):
            assert anim is not None
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_animation_save_gif_and_html(self, rng, tmp_path):
        """save= writes a real artifact headlessly (pillow gif, html) and
        rejects extensions it cannot honor — the TPU-host path where
        plt.show() renders nothing."""
        import matplotlib.pyplot as plt
        import pytest

        from h36x.viz import plot_sequence_3d
        from h36x.viz.anim import save_animation

        j3d = rng.normal(size=(1, 3, 17, 3)).astype(np.float32)
        gif = tmp_path / "seq.gif"
        plot_sequence_3d(j3d, show=False, save=str(gif), fps=5)
        from PIL import Image

        with Image.open(gif) as im:
            assert im.n_frames == 3
        html = tmp_path / "seq.html"
        anim = plot_sequence_3d(j3d, show=False, save=str(html), fps=5)
        assert html.stat().st_size > 0
        with pytest.raises(ValueError, match="extension"):
            save_animation(anim, str(tmp_path / "seq.webm"))
        plt.close("all")

    def test_show_batch_cli_save(self, rng, tmp_path):
        from h36x.cli.show_batch import main as show_main

        npz = tmp_path / "b.npz"
        np.savez(
            npz,
            joints3d=rng.normal(size=(1, 3, 17, 3)).astype(np.float32),
            joints2d=(rng.random((1, 3, 17, 2)) * 16).astype(np.float32),
            K=np.tile(np.eye(3, dtype=np.float32) * 8, (1, 1, 1)),
        )
        out = tmp_path / "b.gif"
        show_main([str(npz), "--mode", "features", "--save", str(out),
                   "--fps", "5"])
        assert out.stat().st_size > 0
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_plot_raw_sequence_with_camera(self, rng, tmp_path):
        """read_pkl.py parity viewer over raw ingested pickles: picks up
        the sibling camera_wext.pkl for the reprojection panel and saves
        headlessly."""
        import pickle

        import matplotlib.pyplot as plt

        from h36x.viz.anim import plot_raw_sequence

        with open(tmp_path / "gt_poses.pkl", "wb") as f:
            pickle.dump({"3d": rng.normal(size=(12, 17, 3)) * 100,
                         "2d": rng.random((12, 17, 2)) * 50}, f)
        with open(tmp_path / "camera_wext.pkl", "wb") as f:
            pickle.dump({"f": np.array([90.0, 90.0]),
                         "c": np.array([25.0, 25.0]),
                         "k": np.zeros(5), "rt": np.eye(3),
                         "t": np.zeros(3)}, f)
        gif = tmp_path / "raw.gif"
        anim = plot_raw_sequence(str(tmp_path / "gt_poses.pkl"),
                                 frame_skip=4, show=False, save=str(gif))
        assert anim is not None and gif.stat().st_size > 0
        plt.close("all")


def test_evaluate_test_mesh_dp_matches_single_device(tmp_path):
    """Results-stage eval sharded over an 8-device data mesh must produce
    the same exact dataset means as the single-device path, including a
    ragged tail batch (weight-0 padded rows)."""
    import jax

    from h36x.parallel.mesh import make_mesh
    from tests.helpers import make_synthetic_store

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    store = tmp_path / "store"
    store.mkdir()
    make_synthetic_store(store, n_shards=2, clips_per_shard=7, n_vars=1,
                         seq_len=6, feat_dim=32, subjects=(9,))
    ds = FeatureClipDataset(store, subjects=[9], test_set=True)
    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 6, 32)))["params"]

    want = evaluate_test(model, params, ds, batch_size=4)
    got = evaluate_test(model, params, ds, batch_size=4,
                        mesh=make_mesh(data=8, model=1))
    np.testing.assert_allclose(got[:2], want[:2], rtol=1e-5)


def test_evaluate_test_exact_with_short_tail(tmp_path):
    """evaluate_test must equal the exact dataset mean when the final batch
    is short (10 rows, batch 4 -> tail of 2)."""
    import jax
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.losses import mpjpe, mse3d
    from tests.helpers import make_synthetic_store

    store = tmp_path / "store"
    store.mkdir()
    make_synthetic_store(store, n_shards=1, clips_per_shard=10, n_vars=1,
                         seq_len=8, feat_dim=32, subjects=(9,))
    ds = FeatureClipDataset(str(store), subjects=[9], test_set=True)
    assert len(ds) == 10

    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, joints_num=17,
                           number_blocks=1)
    feats, j3d, _, _, _ = ds.get_batch(list(range(10)))
    params = model.init(jax.random.key(0), jnp.asarray(feats[:2]))["params"]

    loss, mp, _, _ = evaluate_test(model, params, ds, batch_size=4)
    pred = model.apply({"params": params}, jnp.asarray(feats))[2]
    np.testing.assert_allclose(loss, float(mse3d(pred, jnp.asarray(j3d))),
                               rtol=1e-5)
    np.testing.assert_allclose(mp, float(mpjpe(pred, jnp.asarray(j3d))),
                               rtol=1e-5)
