"""Parity CLI: converted torch checkpoint + feature NPZ -> metrics and
prediction-delta verdict (self-consistency round trip)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h36x.models.phd import PHDFor3DJoints
from h36x.train.step import make_forward
from tests.test_phd_import import _fake_phd_state_dict


@pytest.fixture
def artifacts(tmp_path, rng):
    torch = pytest.importorskip("torch")

    latent, feature, blocks = 64, 32, 2
    sd = _fake_phd_state_dict(rng, latent=latent, feature=feature)
    ckpt_path = tmp_path / "best.pt"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()},
                "epoch": 3}, ckpt_path)

    feats = rng.normal(size=(2, 6, feature)).astype(np.float32)
    j3d = rng.normal(size=(2, 6, 17, 3)).astype(np.float32) * 0.1

    # reference predictions := what the converted model itself produces
    # (self-consistency; with real torch artifacts this would be the
    # reference's own dump)
    from h36x.models.torch_import import convert_torch_phd

    params = jax.tree.map(jnp.asarray, convert_torch_phd(sd))
    model = PHDFor3DJoints(latent_dim=latent, feature_dim=feature, number_blocks=blocks)
    pred = np.asarray(make_forward(model)(params, jnp.asarray(feats)))

    npz = tmp_path / "debug_batch.npz"
    np.savez_compressed(npz, video=feats, joints3d=j3d, joints2d=np.zeros((2, 6, 17, 2)),
                        cam_K=np.tile(np.eye(3), (2, 1, 1)), predicted3djoints=pred,
                        meta=np.array([{}, {}], dtype=object))
    return npz, ckpt_path


def test_parity_pass(artifacts, capsys):
    from h36x.cli.parity import main

    npz, ckpt = artifacts
    main(["--npz", str(npz), "--torch-ckpt", str(ckpt),
          "--latent-dim", "64", "--num-blocks", "2"])
    out = capsys.readouterr().out
    assert "mpjpe" in out
    assert "PASS" in out


def test_parity_fail_exits_nonzero(artifacts, tmp_path, rng, capsys):
    from h36x.cli.parity import main

    npz, ckpt = artifacts
    data = dict(np.load(npz, allow_pickle=True))
    data["predicted3djoints"] = data["predicted3djoints"] + 0.05  # 50 mm off
    bad = tmp_path / "bad.npz"
    np.savez_compressed(bad, **data)
    with pytest.raises(SystemExit):
        main(["--npz", str(bad), "--torch-ckpt", str(ckpt),
              "--latent-dim", "64", "--num-blocks", "2"])
    assert "FAIL" in capsys.readouterr().out


@pytest.fixture
def full_chain_artifacts(tmp_path, rng):
    """Tiny ingested tree + fake torchvision ResNet sd + fake PHD ckpt +
    a reference-style NPZ naming two of the tree's clips."""
    torch = pytest.importorskip("torch")
    cv2 = pytest.importorskip("cv2")
    import pickle

    from tests.test_resnet import _fake_torchvision_state_dict

    h = w = 48
    n_frames = 24  # 12 subsampled at skip 2
    root = tmp_path / "ingested"
    # TWO cameras with different GT: identical (subject, action, start)
    # triples, so the runbook's store lookup must disambiguate by cam —
    # resolving the wrong camera would show up as a nonzero GT delta.
    j3d = None
    for cam in ("cam_0", "cam_1"):
        cam_dir = root / "S1" / "Walking_0" / cam
        cam_dir.mkdir(parents=True)
        vw = cv2.VideoWriter(str(cam_dir / "v.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h))
        for _ in range(n_frames):
            vw.write(rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8))
        vw.release()
        cam_j3d = rng.normal(size=(n_frames, 17, 3)).astype(np.float32) * 100
        cam_j2d = (rng.random((n_frames, 17, 2)) * 30 + 9).astype(np.float32)
        if cam == "cam_0":
            j3d = cam_j3d
        with open(cam_dir / "gt_poses.pkl", "wb") as f:
            pickle.dump({"2d": cam_j2d, "3d": cam_j3d}, f)
        with open(cam_dir / "camera_wext.pkl", "wb") as f:
            pickle.dump({"f": np.array([90.0, 90.0]),
                         "c": np.array([24.0, 24.0]),
                         "k": np.zeros(5), "rt": np.eye(3), "t": np.zeros(3)},
                        f)

    resnet_sd = _fake_torchvision_state_dict(rng)
    resnet_path = tmp_path / "resnet50.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in resnet_sd.items()},
               resnet_path)

    phd_sd = _fake_phd_state_dict(rng, latent=64, feature=2048, blocks=(1, 3))
    phd_path = tmp_path / "best.pt"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in phd_sd.items()}},
               phd_path)

    # reference-style NPZ naming clips (start 0 and 2 at stride 2, seq 6)
    seq_len, stride = 6, 2
    meta, gts = [], []
    for start in (0, 2):
        orig_idx = np.arange(start, start + seq_len) * 2
        meta.append({"subject": 1, "action": "Walking_0", "cam": "cam_0",
                     "start": start})
        gts.append(j3d[orig_idx] / 1000.0)  # store units are meters
    npz = tmp_path / "reference_batch.npz"
    np.savez_compressed(npz, joints3d=np.stack(gts),
                        meta=np.array(meta, dtype=object))
    return dict(root=root, resnet=resnet_path, phd=phd_path, npz=npz,
                seq_len=seq_len, stride=stride, workdir=tmp_path / "work")


def test_parity_full_chain_runbook(full_chain_artifacts, capsys):
    """--full drives state_dict -> extraction -> store lookup -> converted
    PHD -> MPJPE, end to end on synthetic artifacts (the exact command the
    real pretrained-parity run will use)."""
    from h36x.cli.parity import main

    a = full_chain_artifacts
    args = ["--full", "--npz", str(a["npz"]),
            "--resnet-state-dict", str(a["resnet"]),
            "--clips-root", str(a["root"]),
            "--torch-ckpt", str(a["phd"]),
            "--workdir", str(a["workdir"]),
            "--stride", str(a["stride"]), "--resize", "32",
            "--batch-size", "2", "--num-workers", "2",
            "--latent-dim", "64", "--num-blocks", "1"]
    main(args)
    out = capsys.readouterr().out
    assert "extracting features" in out
    assert "GT-joints delta store-vs-npz: 0.0000 mm" in out
    assert "mpjpe vs NPZ GT" in out

    # second run: reuses the store, and with reference predictions present
    # the delta check engages (self-consistency -> PASS)
    import jax
    import jax.numpy as jnp

    from h36x.config import ExtractConfig  # noqa: F401
    from h36x.data.features import FeatureClipDataset
    from h36x.models.torch_import import load_torch_phd
    from h36x.train.step import make_forward

    store = FeatureClipDataset(a["workdir"] / "features", test_set=True)
    by_key = {}
    for i in range(len(store)):
        *_, m = store[i]
        by_key[(m["subject"], m["start"], m["cam"])] = i
    rows = [by_key[(1, 0, "cam_0")], by_key[(1, 2, "cam_0")]]
    feats, gt, *_ = store.get_batch(rows)
    params = jax.tree.map(jnp.asarray, load_torch_phd(a["phd"]))
    model = PHDFor3DJoints(latent_dim=64, feature_dim=2048, number_blocks=1)
    pred = np.asarray(make_forward(model)(params, jnp.asarray(feats)))
    data = dict(np.load(a["npz"], allow_pickle=True))
    np.savez_compressed(a["npz"], predicted3djoints=pred, **data)

    main(args)
    out = capsys.readouterr().out
    assert "reusing existing feature store" in out
    assert "PASS" in out
