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
