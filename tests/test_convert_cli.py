"""Artifact conversion CLI: torch shard store -> h36x store, torch
checkpoint -> params msgpack; both consumable downstream."""

import numpy as np
import pytest


@pytest.fixture
def torch_store(tmp_path, rng):
    torch = pytest.importorskip("torch")
    rows, t = 4, 5
    src = tmp_path / "torch_store"
    src.mkdir()
    for sid in range(2):
        shard = {
            "feats": torch.randn(rows, t, 16),
            "joints3d": torch.randn(rows, t, 17, 3),
            "joints2d": torch.randn(rows, t, 17, 2),
            "K": torch.randn(rows, 3, 3),
            "meta": [{"subject": 1, "action": "A", "cam": "cam_0",
                      "start": r, "end": r + t, "aug": "orig"} for r in range(rows)],
            "n_vars": 1,
        }
        torch.save(shard, src / f"shard_{sid:05d}.pt")
    index = {
        "clips": [
            {"shard_id": s, "row": r, "subject": 1, "action": "A",
             "cam": "cam_0", "start": r, "end": r + t}
            for s in range(2) for r in range(rows)
        ],
        "n_shards": 2, "n_clips": 8, "n_variants": 1, "aug_names": ["orig"],
        "seq_len": t, "frame_skip": 2, "feat_dtype": "float32",
        "variants_grouped": True,
    }
    torch.save(index, src / "index.pt")
    return src


def test_shard_store_conversion(torch_store, tmp_path):
    from h36x.cli.convert import main
    from h36x.data.features import FeatureClipDataset
    from h36x.data.shards import load_torch_shard

    dst = tmp_path / "h36x_store"
    main(["--torch-shards", str(torch_store), "--out", str(dst)])

    assert (dst / "index.json").exists()
    ds = FeatureClipDataset(dst, subjects=[1])
    assert len(ds) == 8
    # values survive byte-exact
    ref = load_torch_shard(torch_store, 0)
    feats, j3d, _, K = ds[0]
    np.testing.assert_array_equal(feats, ref["feats"][0])
    np.testing.assert_allclose(j3d, ref["joints3d"][0] / 1000.0, rtol=1e-6)


def test_checkpoint_conversion(tmp_path, rng):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from h36x.cli.convert import main
    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.checkpoint import load_params_only
    from tests.test_phd_import import _fake_phd_state_dict

    sd = _fake_phd_state_dict(rng)
    ckpt = tmp_path / "best.pt"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, ckpt)

    main(["--torch-ckpt", str(ckpt), "--out", str(tmp_path / "runs"), "--name", "best"])

    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=2)
    template = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 4, 32)))["params"]
    )
    params = load_params_only(tmp_path / "runs" / "best.msgpack", template)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.zeros((1, 4, 32)))[2]
    assert out.shape == (1, 4, 17, 3)

    # the manifest records the shape-inferred architecture so consumer CLIs
    # resolve it exactly like an h36x-train checkpoint's
    from h36x.train.checkpoint import load_recorded_model_config

    rec = load_recorded_model_config(tmp_path / "runs" / "best.msgpack")
    assert rec["latent_dim"] == 64 and rec["feature_dim"] == 32
    assert rec["num_blocks"] == 2 and rec["ar_num_blocks"] == 3
    assert rec["joints_num"] == 17 and rec["kernel_size"] == 3
    assert rec["groups"] == 32 and rec["regressor_iters"] == 3  # flags


def test_checkpoint_conversion_nondefault_invisible_flags(tmp_path, rng):
    """--groups/--regressor-iters are shape-invisible: convert must record
    what the user says the torch run used."""
    torch = pytest.importorskip("torch")

    from h36x.cli.convert import main
    from h36x.train.checkpoint import load_recorded_model_config
    from tests.test_phd_import import _fake_phd_state_dict

    sd = _fake_phd_state_dict(rng)
    ckpt = tmp_path / "best.pt"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, ckpt)
    main(["--torch-ckpt", str(ckpt), "--out", str(tmp_path / "runs"),
          "--groups", "16", "--regressor-iters", "2"])
    rec = load_recorded_model_config(tmp_path / "runs" / "best.msgpack")
    assert rec["groups"] == 16 and rec["regressor_iters"] == 2
