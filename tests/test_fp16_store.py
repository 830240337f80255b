"""--save-fp16: the half-precision feature store, end to end.

The reference's on-disk contract is float32 features (torch .pt shards,
/root/reference/src/dataset_features.py:16-27); --save-fp16 halves the
dominant store bytes (features are ~97% of a shard). These tests make the
flag as trusted as the f32 default: write -> read -> train, scheduler byte
parity, CRC/merge/resume integration, and a trajectory comparison vs an f32
store of the same features (mirroring the --data.feed-dtype harness,
tests/test_loop_e2e.py::test_fit_bf16_feed_dtype_tracks_f32).
"""

import dataclasses

import numpy as np
import pytest

from h36x.data.features import FeatureClipDataset
from h36x.data import shards as shard_store
from h36x.extract.pipeline import run_extract
from tests.helpers import make_synthetic_store
from tests.test_dedup import FakeOverlapDataset, _cfg, _rows, fake_backbone  # noqa: F401


def test_fp16_write_read_roundtrip(tmp_path, fake_backbone):  # noqa: F811
    """An fp16 store holds f16 bytes on disk, reads back as the feed dtype,
    and its values are exactly the f32 run's features rounded to f16."""
    ds = FakeOverlapDataset()
    run_extract(_cfg(tmp_path / "f32"), dataset=ds)
    run_extract(_cfg(tmp_path / "f16", save_fp16=True), dataset=ds)

    idx16 = shard_store.load_index(tmp_path / "f16")
    assert idx16["feat_dtype"] == "float16"
    raw = shard_store.read_shard(shard_store.shard_path(tmp_path / "f16", 0))
    assert raw["feats"].dtype == np.float16
    assert raw["joints3d"].dtype == np.float32  # only features are halved

    rows32 = _rows(tmp_path / "f32")
    rows16 = _rows(tmp_path / "f16")
    assert rows32.keys() == rows16.keys()
    for key in rows32:
        f32, f16 = rows32[key][0], rows16[key][0]
        assert f16.dtype == np.float32  # default feed dtype upcasts on read
        np.testing.assert_array_equal(f16, f32.astype(np.float16), err_msg=str(key))
        # joints/K/box stay f32-exact
        for a, b in zip(rows32[key][1:], rows16[key][1:]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # disk: the feature payload halves (joints/meta are a small constant)
    n32 = sum(p.stat().st_size for p in (tmp_path / "f32").glob("shard_*.h36x"))
    n16 = sum(p.stat().st_size for p in (tmp_path / "f16").glob("shard_*.h36x"))
    assert n16 < 0.62 * n32, (n16, n32)


def test_fp16_dedup_matches_per_clip(tmp_path, fake_backbone):  # noqa: F811
    """Scheduler byte parity must hold under fp16 too: the dedup cache holds
    rows already rounded to f16, so assembly-time reuse cannot introduce a
    second rounding."""
    ds = FakeOverlapDataset(smooth=False)  # drifting boxes: partial cache hits
    run_extract(_cfg(tmp_path / "legacy", dedup=False, save_fp16=True),
                dataset=ds)
    run_extract(_cfg(tmp_path / "dedup", dedup=True, save_fp16=True),
                dataset=ds)
    want = _rows(tmp_path / "legacy")
    got = _rows(tmp_path / "dedup")
    assert want.keys() == got.keys()
    for key in want:
        for a, b in zip(want[key], got[key]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(key))


def test_fp16_store_trains(tmp_path, fake_backbone):  # noqa: F811
    """write -> read -> train: a few optimizer steps on an fp16 store."""
    import jax
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.state import create_train_state, make_optimizer
    from h36x.train.step import make_train_step

    run_extract(_cfg(tmp_path / "out", save_fp16=True),
                dataset=FakeOverlapDataset())
    out = FeatureClipDataset(tmp_path / "out", augment=True)
    feats, j3d, j2d, K = out.get_batch(list(range(4)))
    assert feats.dtype == np.float32
    # the fake backbone's rows are O(1e3); standardize so a short lr=1e-3
    # run descends (real ResNet features are O(1) — this is test plumbing,
    # not a store transform)
    feats = (feats - feats.mean()) / feats.std()

    model = PHDFor3DJoints(latent_dim=64, feature_dim=feats.shape[-1],
                           number_blocks=1, dropout=0.0)
    optimizer, _ = make_optimizer(lr=1e-3)
    state = create_train_state(model, optimizer, jax.random.key(0),
                               jnp.zeros((1,) + feats.shape[1:]))
    step = make_train_step(model, optimizer, donate=False)
    losses = []
    for i in range(25):
        state, m = step(state, (feats, j3d, j2d, K), jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_fp16_verify_store_and_merge(tmp_path, fake_backbone):  # noqa: F811
    """Integrity surfaces on fp16 stores: CRC verify passes clean / catches
    a bit flip; merge joins fp16 parts and refuses an fp16+f32 mix."""
    ds = FakeOverlapDataset()
    run_extract(_cfg(tmp_path / "a", save_fp16=True, partition="0/2"),
                dataset=ds)
    run_extract(_cfg(tmp_path / "b", save_fp16=True, partition="1/2"),
                dataset=ds)
    rep = shard_store.verify_store(tmp_path / "a")
    assert not rep["errors"] and rep["arrays_checked"] > 0

    merged = tmp_path / "merged"
    shard_store.merge_stores([tmp_path / "a", tmp_path / "b"], merged,
                             move=False)
    idx = shard_store.load_index(merged)
    assert idx["feat_dtype"] == "float16"
    assert len(_rows(merged)) == len(ds) * 4  # every clip x variant present
    rep = shard_store.verify_store(merged)
    assert not rep["errors"]

    # flip one byte mid-shard: CRC must catch it on the fp16 payload
    shard = next(merged.glob("shard_*.h36x"))
    blob = bytearray(shard.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    shard.write_bytes(bytes(blob))
    rep = shard_store.verify_store(merged)
    assert rep["errors"]

    # dtype mix refused at merge validation, before any rename
    run_extract(_cfg(tmp_path / "c", save_fp16=False, partition="1/2"),
                dataset=ds)
    with pytest.raises(ValueError, match="feat_dtype"):
        shard_store.merge_stores([tmp_path / "a", tmp_path / "c"],
                                 tmp_path / "merged2", move=False)


def test_fp16_resume_refuses_flip(tmp_path, fake_backbone):  # noqa: F811
    """A store started fp16 must refuse to resume as f32 (and vice versa) —
    mixed-precision rows in one store would be silent corruption."""
    class Flaky(FakeOverlapDataset):
        def __init__(self, fail_at, **kw):
            super().__init__(**kw)
            self.fail_at = fail_at

        def clip_annotations(self, i):
            if self.fail_at is not None and i == self.fail_at:
                raise RuntimeError("simulated annotation crash")
            return super().clip_annotations(i)

    cfg = _cfg(tmp_path / "out", shard_size=2, shuffle_pool=2,
               save_fp16=True, frames_per_dispatch=12)
    with pytest.raises(RuntimeError, match="simulated annotation crash"):
        run_extract(cfg, dataset=Flaky(fail_at=5))
    assert (tmp_path / "out" / "progress.json").exists()

    flipped = dataclasses.replace(cfg, resume=True, save_fp16=False)
    with pytest.raises(ValueError, match="resume config mismatch"):
        run_extract(flipped, dataset=Flaky(fail_at=None))

    # the honest resume still lands byte-identical to a clean fp16 run
    summary = run_extract(dataclasses.replace(cfg, resume=True),
                          dataset=Flaky(fail_at=None))
    assert summary["n_clips"] == len(FakeOverlapDataset())
    run_extract(_cfg(tmp_path / "clean", shard_size=2, shuffle_pool=2,
                     save_fp16=True), dataset=FakeOverlapDataset())
    got, clean = _rows(tmp_path / "out"), _rows(tmp_path / "clean")
    assert got.keys() == clean.keys()
    for key in got:
        np.testing.assert_array_equal(got[key][0], clean[key][0],
                                      err_msg=str(key))


def test_fit_fp16_store_tracks_f32(tmp_path):
    """Trajectory comparison: training from an fp16 store must track the f32
    store of the SAME features (they differ only by f16 rounding, ~1e-3
    relative) — the same harness that qualified --data.feed-dtype."""
    from h36x.config import TrainConfig
    from h36x.data.sampler import MixedShardBatchSampler, SequentialBatchSampler
    from h36x.train.loop import fit

    def build(root, feat_dtype):
        root.mkdir()
        make_synthetic_store(root, n_shards=2, clips_per_shard=8, n_vars=4,
                             seq_len=8, feat_dim=32, subjects=(1, 5),
                             feat_dtype=feat_dtype)
        return root

    def run(store, outdir):
        cfg = TrainConfig()
        cfg.outdir = str(outdir)
        cfg.data.seq_len = 8
        cfg.model.feature_dim = 32
        cfg.model.latent_dim = 64
        cfg.model.num_blocks = 1
        cfg.optim.epochs = 2
        cfg.optim.batch_size = 8
        cfg.optim.lr = 1e-3
        cfg.optim.log_every = 0
        cfg.mesh.data = -1
        cfg.mesh.model = 1
        cfg.train_root = str(store)
        cfg.val_root = str(store)
        train_set = FeatureClipDataset(store, subjects=[1], augment=True)
        val_set = FeatureClipDataset(store, subjects=[5])
        train_sampler = MixedShardBatchSampler(
            train_set, batch_size=cfg.optim.batch_size, shards_per_batch=2,
            drop_last=True, seed=0)
        val_sampler = SequentialBatchSampler(val_set,
                                             batch_size=cfg.optim.batch_size)
        return fit(cfg, train_set, val_set, train_sampler, val_sampler)

    _, best32 = run(build(tmp_path / "s32", "float32"), tmp_path / "r32")
    _, best16 = run(build(tmp_path / "s16", "float16"), tmp_path / "r16")
    assert np.isfinite(best16)
    assert abs(best16 - best32) < 0.15 * max(abs(best32), 1e-6)
