"""Full-pipeline integration: synthetic mp4 tree in the ingested layout ->
extract CLI -> train CLI -> results CLI, exercising real video decode,
host crop/resize, the backbone, the shard store, training and the NPZ dump.
"""

import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ingested_tree(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("ingested")
    h = w = 64
    n_frames = 40  # 20 subsampled frames at skip 2
    for subject, action in ((1, "Walking_0"), (5, "Eating_0"), (9, "Posing_0")):
        cam_dir = root / f"S{subject}" / action / "cam_0"
        cam_dir.mkdir(parents=True)
        vw = cv2.VideoWriter(
            str(cam_dir / f"S{subject}_{action}_cam_0.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h),
        )
        for i in range(n_frames):
            frame = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
            vw.write(frame)
        vw.release()
        j3d = rng.normal(size=(n_frames, 17, 3)).astype(np.float32) * 100
        j2d = (rng.random((n_frames, 17, 2)) * 40 + 12).astype(np.float32)
        with open(cam_dir / "gt_poses.pkl", "wb") as f:
            pickle.dump({"2d": j2d, "3d": j3d}, f)
        with open(cam_dir / "camera_wext.pkl", "wb") as f:
            pickle.dump(
                {"f": np.array([90.0, 90.0]), "c": np.array([30.0, 33.0]),
                 "k": np.zeros(5), "rt": np.eye(3), "t": np.zeros(3)}, f,
            )
    return root


def test_extract_train_results(ingested_tree, tmp_path, capsys):
    from h36x.cli.extract import main as extract_main
    from h36x.cli.train import main as train_main
    from h36x.cli.results import main as results_main

    features = tmp_path / "features"
    extract_main([
        "--root", str(ingested_tree), "--out", str(features),
        "--seq-len", "8", "--stride", "4", "--frame-skip", "2",
        "--resize", "32", "--batch-size", "2", "--num-workers", "2",
        "--augment", "true", "--shard-size", "2", "--shuffle-pool", "50",
        "--subjects", "1", "5", "9", "--verify-after", "true",
    ])
    out = capsys.readouterr().out
    assert "clips/s" in out or "Done" in out
    assert "[verify-after]" in out  # read-back CRC scan of the new store
    assert (features / "index.json").exists()

    runs = tmp_path / "runs"
    train_main([
        "--train-root", str(features),
        "--train-subjects", "1",
        "--val-subjects", "5",
        "--outdir", str(runs),
        "--optim.epochs", "1",
        "--optim.batch-size", "4",
        "--optim.log-every", "0",
        "--model.latent-dim", "64",
        "--model.num-blocks", "1",
        "--data.seq-len", "8",
    ])
    assert (runs / "best.msgpack").exists()

    out_npz = tmp_path / "result.npz"
    results_main([
        "--features-root", str(features),
        "--preprocessed-root", str(ingested_tree),
        "--model-path", str(runs / "best.msgpack"),
        "--out", str(out_npz),
        "--seq-len", "8", "--batch-size", "2", "--save-n", "2",
        "--video-size", "32", "--subjects", "9",
        "--latent-dim", "64", "--num-blocks", "1",
    ])
    out = capsys.readouterr().out
    assert "Test metrics" in out and "mpjpe (mm)" in out

    data = np.load(out_npz, allow_pickle=True)
    assert set(data.files) >= {
        "video", "joints3d", "predicted3djoints", "joints2d", "K", "meta",
        "test_metrics",
    }
    assert data["video"].shape == (2, 8, 32, 32, 3)
    assert data["predicted3djoints"].shape == (2, 8, 17, 3)
    assert np.isfinite(data["test_metrics"]).all()
