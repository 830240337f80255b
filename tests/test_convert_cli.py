"""Artifact conversion CLI: torch shard store <-> h36x store, torch
checkpoint <-> h36x checkpoint; both directions consumable downstream.

The reverse direction (--to-torch-*) reproduces the reference formats:
shard layout /root/reference/src/dataset_features.py:16-27 (loaded with
weights_only=True) and the state_dict /root/reference/src/results.py:184-186
loads with strict=True."""

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


def test_reverse_shard_export_roundtrip(torch_store, tmp_path):
    """torch -> h36x -> torch: every array byte-identical, meta and index
    records preserved, and both .pt artifacts load under weights_only=True
    (the reference loader's mode, dataset_features.py:50,107)."""
    torch = pytest.importorskip("torch")
    from h36x.cli.convert import main

    mid = tmp_path / "h36x_store"
    back = tmp_path / "torch_again"
    main(["--torch-shards", str(torch_store), "--out", str(mid)])
    main(["--to-torch-shards", str(mid), "--out", str(back)])

    for sid in range(2):
        a = torch.load(torch_store / f"shard_{sid:05d}.pt",
                       map_location="cpu", weights_only=True)
        b = torch.load(back / f"shard_{sid:05d}.pt",
                       map_location="cpu", weights_only=True)
        for k in ("feats", "joints3d", "joints2d", "K"):
            np.testing.assert_array_equal(a[k].numpy(), b[k].numpy(),
                                          err_msg=f"shard {sid} {k}")
        assert a["meta"] == b["meta"]
        assert a["n_vars"] == b["n_vars"]
    ia = torch.load(torch_store / "index.pt", map_location="cpu",
                    weights_only=True)
    ib = torch.load(back / "index.pt", map_location="cpu", weights_only=True)
    for key in ("clips", "n_shards", "n_clips", "n_variants", "aug_names",
                "seq_len", "frame_skip", "feat_dtype", "variants_grouped"):
        assert ia[key] == ib[key], key


def test_native_store_exports_to_torch(tmp_path, rng):
    """An h36x-native store (written by write_shard, not converted) exports
    to a torch store whose arrays are byte-identical to the shard bytes."""
    torch = pytest.importorskip("torch")
    from h36x.cli.convert import main
    from h36x.data.shards import write_index, write_shard, shard_path

    src = tmp_path / "native"
    src.mkdir()
    rows, t = 3, 4
    arrays = {
        "feats": rng.normal(size=(rows, t, 16)).astype(np.float32),
        "joints3d": rng.normal(size=(rows, t, 17, 3)).astype(np.float32),
        "joints2d": rng.normal(size=(rows, t, 17, 2)).astype(np.float32),
        "K": rng.normal(size=(rows, 3, 3)).astype(np.float32),
    }
    meta = [{"subject": 9, "action": "B", "cam": "cam_1", "start": r,
             "end": r + t, "aug": "orig"} for r in range(rows)]
    write_shard(shard_path(src, 0), arrays, meta, n_vars=1)
    clips = [{"shard_id": 0, "row": r, "subject": 9, "action": "B",
              "cam": "cam_1", "start": r, "end": r + t} for r in range(rows)]
    write_index(src, clips, n_shards=1, n_clips=rows, n_variants=1,
                aug_names=["orig"], seq_len=t, frame_skip=2,
                feat_dtype="float32")

    dst = tmp_path / "torch_out"
    main(["--to-torch-shards", str(src), "--out", str(dst)])
    shard = torch.load(dst / "shard_00000.pt", map_location="cpu",
                       weights_only=True)
    for k, v in arrays.items():
        np.testing.assert_array_equal(shard[k].numpy(), v, err_msg=k)
    assert shard["meta"] == meta and shard["n_vars"] == 1
    idx = torch.load(dst / "index.pt", map_location="cpu", weights_only=True)
    assert idx["clips"] == clips
    assert idx["n_variants"] == 1 and idx["feat_dtype"] == "float32"


def test_checkpoint_reverse_export_from_trainstate(tmp_path, rng):
    """h36x TrainState msgpack -> best.pt: reference key layout (strict=True
    compatible keyset), values bitwise, and converting BACK reproduces the
    flax params bitwise (torch -> h36x -> torch closure)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from h36x.cli.convert import main
    from h36x.models.phd import PHDFor3DJoints
    from h36x.models.torch_import import convert_torch_phd, export_phd_to_torch
    from h36x.train.checkpoint import save_checkpoint
    from h36x.train.state import create_train_state, make_optimizer
    from tests.test_phd_import import _fake_phd_state_dict

    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=2)
    opt, _ = make_optimizer(lr=1e-3)
    state = create_train_state(model, opt, jax.random.key(3),
                               jnp.zeros((1, 4, 32)))
    save_checkpoint(tmp_path / "runs", "last", state, epoch=0, best_val=1.0)

    out_pt = tmp_path / "best.pt"
    main(["--to-torch-ckpt", str(tmp_path / "runs" / "last.msgpack"),
          "--out", str(out_pt)])

    sd = torch.load(out_pt, map_location="cpu", weights_only=True)
    # exact reference keyset => load_state_dict(strict=True) compatible
    assert set(sd) == set(_fake_phd_state_dict(rng))
    expect = export_phd_to_torch(jax.device_get(state.params))
    for k, v in expect.items():
        np.testing.assert_array_equal(sd[k].numpy(), np.asarray(v),
                                      err_msg=k)
    # closure: convert the export back; params must match bitwise
    back = convert_torch_phd({k: v.numpy() for k, v in sd.items()})
    host = jax.device_get(state.params)
    flat_a = jax.tree_util.tree_flatten_with_path(host)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


def test_checkpoint_reverse_export_from_orbax(tmp_path, rng):
    """--to-torch-ckpt accepts an outdir/last slot reference to an orbax
    save (load_params_raw's directory branch)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from h36x.cli.convert import main
    from h36x.models.phd import PHDFor3DJoints
    from h36x.models.torch_import import export_phd_to_torch
    from h36x.train.checkpoint import save_checkpoint_orbax
    from h36x.train.state import create_train_state, make_optimizer

    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=2)
    opt, _ = make_optimizer(lr=1e-3)
    state = create_train_state(model, opt, jax.random.key(4),
                               jnp.zeros((1, 4, 32)))
    save_checkpoint_orbax(tmp_path / "runs", "last", state, epoch=0,
                          best_val=1.0)
    out_pt = tmp_path / "best.pt"
    main(["--to-torch-ckpt", str(tmp_path / "runs" / "last"),
          "--out", str(out_pt)])
    sd = torch.load(out_pt, map_location="cpu", weights_only=True)
    expect = export_phd_to_torch(jax.device_get(state.params))
    for k, v in expect.items():
        np.testing.assert_array_equal(sd[k].numpy(), np.asarray(v),
                                      err_msg=k)


def test_checkpoint_reverse_export_rejects_non_params(tmp_path):
    from h36x.cli.convert import export_checkpoint

    bad = tmp_path / "junk.msgpack"
    from flax import serialization

    bad.write_bytes(serialization.msgpack_serialize({"not_a_model": np.zeros(3)}))
    with pytest.raises(SystemExit, match="does not hold PHD model params"):
        export_checkpoint(str(bad), str(tmp_path / "out.pt"))


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
