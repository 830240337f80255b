"""End-to-end: full fit() over a synthetic shard store on the CPU mesh —
training runs, loss falls, checkpoints land, resume works, early stop fires.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from h36x.config import TrainConfig
from h36x.data.features import FeatureClipDataset
from h36x.data.sampler import MixedShardBatchSampler, SequentialBatchSampler
from h36x.train.loop import fit
from tests.helpers import make_synthetic_store


@pytest.fixture
def cfg(tmp_path):
    store = tmp_path / "store"
    store.mkdir()
    make_synthetic_store(
        store, n_shards=2, clips_per_shard=8, n_vars=4, seq_len=8, feat_dim=32,
        subjects=(1, 5),
    )
    cfg = TrainConfig()
    cfg.outdir = str(tmp_path / "runs")
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
    return cfg


def _datasets(cfg):
    train_set = FeatureClipDataset(cfg.train_root, subjects=[1], augment=True)
    val_set = FeatureClipDataset(cfg.val_root, subjects=[5])
    train_sampler = MixedShardBatchSampler(
        train_set, batch_size=cfg.optim.batch_size, shards_per_batch=2,
        drop_last=True, seed=0,
    )
    val_sampler = SequentialBatchSampler(val_set, batch_size=cfg.optim.batch_size)
    return train_set, val_set, train_sampler, val_sampler


def test_fit_steps_per_dispatch_matches_default(cfg, tmp_path):
    """fit with steps_per_dispatch=2 (scan dispatch, incl. a short tail
    group — 3 batches/epoch here) must reproduce the default run's metrics:
    identical batches, identical rng discipline inside the scan."""
    import dataclasses as _dc
    import json

    cfg1 = _dc.replace(cfg, outdir=str(tmp_path / "r1"))
    fit(cfg1, *_datasets(cfg))
    cfg2 = _dc.replace(cfg, outdir=str(tmp_path / "r2"))
    cfg2.optim = _dc.replace(cfg.optim, steps_per_dispatch=2)
    fit(cfg2, *_datasets(cfg))

    rows1 = [json.loads(l) for l in
             (tmp_path / "r1" / "metrics.jsonl").read_text().splitlines()]
    rows2 = [json.loads(l) for l in
             (tmp_path / "r2" / "metrics.jsonl").read_text().splitlines()]
    assert len(rows1) == len(rows2) == 2
    for want, got in zip(rows1, rows2):
        for key in ("train_loss", "train_mpjpe", "val_loss", "val_mpjpe"):
            np.testing.assert_allclose(got[key], want[key], rtol=1e-4,
                                       err_msg=key)


def test_stacked_batches_handle_ragged_tail(cfg):
    """A short final batch (drop_last=False samplers) must not break group
    stacking — it flushes the current group and rides its own."""
    import jax

    from h36x.parallel.mesh import batch_sharding, make_mesh
    from h36x.train.loop import _batches

    train_set = FeatureClipDataset(cfg.train_root, subjects=[1], augment=True)
    sampler = SequentialBatchSampler(train_set, batch_size=5)  # ragged tail
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    groups = list(_batches(train_set, sampler, batch_sharding(mesh), stack=2))
    sizes = [g[0].shape for g in groups]
    n_rows = sum(s[0] * s[1] for s in sizes)
    assert n_rows == len(train_set)
    assert all(s[1] == 5 for s in sizes[:-1])
    assert sizes[-1][1] == len(train_set) % 5  # tail in its own group


def test_fit_end_to_end(cfg, tmp_path, capsys):
    state, best_val = fit(cfg, *_datasets(cfg))
    assert np.isfinite(best_val)
    out = capsys.readouterr().out
    assert "Epoch 1/2" in out and "Epoch 2/2" in out

    runs = tmp_path / "runs"
    assert (runs / "last.msgpack").exists()
    assert (runs / "last.json").exists()
    assert (runs / "best.msgpack").exists()

    import json
    lines = (runs / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2  # one record per epoch
    rec = json.loads(lines[0])
    assert {"epoch", "lr", "train_loss", "val_mpjpe", "epoch_seconds"} <= set(rec)

    # resume continues from epoch 2 (i.e. does nothing more at epochs=2);
    # `last` records the POST-epoch best_val (unlike the reference's
    # last.pt, whose pre-update value could let a resumed run overwrite
    # `best` with a worse model)
    cfg.resume = str(runs)
    state2, best2 = fit(cfg, *_datasets(cfg))
    out = capsys.readouterr().out
    assert "Resumed" in out and "Epoch" not in out.split("Resumed")[1]
    assert np.isfinite(best2)


def test_fit_orbax_backend_and_resume(cfg, tmp_path, capsys):
    """fit() with ckpt_backend=orbax writes OCDBT dirs instead of msgpack
    and resume autodetects them (including cross-backend: an orbax run can
    resume from a msgpack run's outdir and vice versa)."""
    cfg.ckpt_backend = "orbax"
    _, best_val = fit(cfg, *_datasets(cfg))
    assert np.isfinite(best_val)

    import json

    runs = tmp_path / "runs"
    # saves land in epoch-parity slot dirs; the manifest's "dir" points at
    # the live one (crash-atomic: force=True never rmtree's the live slot)
    last_manifest = json.loads((runs / "last.json").read_text())
    best_manifest = json.loads((runs / "best.json").read_text())
    assert (runs / last_manifest["dir"]).is_dir()
    assert (runs / best_manifest["dir"]).is_dir()
    assert not (runs / "last.msgpack").exists()

    cfg.resume = str(runs)
    cfg.ckpt_backend = "msgpack"  # cross-backend resume
    _, best2 = fit(cfg, *_datasets(cfg))
    out = capsys.readouterr().out
    assert "Resumed" in out
    assert np.isfinite(best2)


def test_fit_multislice_matches_plain_dp(cfg, tmp_path):
    """--mesh.slices 2 trains on a (slice, data, model) mesh with rows
    sharded over slice x data; since params replicate over `slice`, the
    trajectory must equal the plain DP run bit-for-bit in expectation
    (same global batches, same reduction math — only collective routing
    differs)."""
    import dataclasses

    state_dp, best_dp = fit(cfg, *_datasets(cfg))

    cfg2 = dataclasses.replace(cfg, outdir=str(tmp_path / "runs_ms"))
    cfg2.mesh = dataclasses.replace(cfg.mesh, slices=2, data=4, model=1)
    state_ms, best_ms = fit(cfg2, *_datasets(cfg2))

    np.testing.assert_allclose(best_ms, best_dp, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_ms.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_fit_multislice_bad_batch_raises(cfg, tmp_path):
    import dataclasses

    cfg.mesh = dataclasses.replace(cfg.mesh, slices=3)  # 8 % 3 != 0
    with pytest.raises(ValueError, match="divisible by slices"):
        fit(cfg, *_datasets(cfg))


def test_fit_rejects_unknown_ckpt_backend(cfg):
    cfg.ckpt_backend = "zarr"
    with pytest.raises(ValueError, match="ckpt_backend"):
        fit(cfg, *_datasets(cfg))


def test_phase2_fit(cfg, capsys):
    """Phase-2 curriculum training runs through the same loop."""
    cfg.optim.phase = 2
    cfg.optim.input_len = 2
    cfg.optim.pred_len = 4
    cfg.optim.curriculum_steps = 2
    state, best = fit(cfg, *_datasets(cfg))
    out = capsys.readouterr().out
    assert "AR horizon 1" in out  # epoch 0 curriculum
    assert "AR horizon 3" in out  # epoch 1
    assert np.isfinite(best)

    # phase-2 validation scores the AR path (which trains), so the val
    # metric must MOVE across epochs — a constant metric means eval is
    # looking at the frozen modules and early-stop would fire blindly
    import json

    rows = [json.loads(l) for l in
            (Path(cfg.outdir) / "metrics.jsonl").read_text().splitlines()]
    assert rows[0]["val_mpjpe"] != rows[1]["val_mpjpe"]


def test_phase2_rejects_fused(cfg):
    """--optim.fused only implements the phase-1 step; phase 2 must refuse
    loudly instead of silently training the XLA path while the user
    believes they chose (and are timing) the Pallas step."""
    cfg.optim.phase = 2
    cfg.optim.input_len = 2
    cfg.optim.pred_len = 4
    cfg.optim.fused = True
    with pytest.raises(ValueError, match="fused.*phase-1"):
        fit(cfg, *_datasets(cfg))


def test_phase2_warm_start_from_phase1(cfg, tmp_path, capsys):
    """init_from inherits phase-1 weights into a phase-2 run (the optimizer
    states are phase-specific, so resume cannot cross phases — init_from
    rebuilds the phase-2 optimizer around the restored params)."""
    import jax

    cfg.optim.epochs = 1
    state1, _ = fit(cfg, *_datasets(cfg))
    capsys.readouterr()

    cfg2 = cfg
    cfg2.optim.phase = 2
    cfg2.optim.input_len = 2
    cfg2.optim.pred_len = 4
    cfg2.outdir = str(tmp_path / "runs2")
    cfg2.init_from = str(tmp_path / "runs" / "best.msgpack")
    state2, _ = fit(cfg2, *_datasets(cfg2))
    out = capsys.readouterr().out
    assert "Initialized model weights from" in out
    # frozen modules kept the phase-1 weights through the phase-2 epoch
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state1.params["f_movie"])),
        jax.tree.leaves(jax.device_get(state2.params["f_movie"])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_stopping(cfg, capsys):
    cfg.optim.epochs = 6
    cfg.optim.early_stop_patience = 1
    cfg.optim.lr = 0.0  # no learning -> no improvement after epoch 1
    fit(cfg, *_datasets(cfg))
    out = capsys.readouterr().out
    assert "Early stopping" in out


def test_early_stop_min_delta_discounts_tiny_improvements(cfg, capsys):
    """--optim.early-stop-min-delta: an improvement smaller than the delta
    must not reset patience (loop.py `improved` gate). With an absurd
    delta every post-first epoch counts as no-improvement, so patience=1
    stops the run at epoch 2 even though val genuinely improves."""
    cfg.optim.epochs = 6
    cfg.optim.early_stop_patience = 1
    cfg.optim.early_stop_min_delta = 1e9
    fit(cfg, *_datasets(cfg))
    out = capsys.readouterr().out
    assert "Early stopping at epoch 2" in out

    import json
    rows = [json.loads(l) for l in
            (Path(cfg.outdir) / "metrics.jsonl").read_text().splitlines()]
    assert len(rows) == 2


def test_profile_dir_writes_trace_on_first_epoch(cfg, tmp_path):
    """--profile-dir wires maybe_trace around the run's first epoch."""
    cfg.optim.epochs = 1
    cfg.profile_dir = str(tmp_path / "trace")
    fit(cfg, *_datasets(cfg))
    assert any(Path(cfg.profile_dir).rglob("*")), "no trace files written"


def test_evaluate_masks_padded_tail_rows(tmp_path):
    """evaluate() must equal the exact dataset-level mean even when the last
    batch is short and padded up to the mesh data axis (round-1 VERDICT: the
    old average-of-batch-means over-weighted duplicated tail rows)."""
    import jax
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints
    from h36x.parallel.mesh import batch_sharding, make_mesh
    from h36x.train.loop import evaluate
    from h36x.train.losses import mpjpe, mse3d
    from h36x.train.step import make_weighted_eval_step

    store = tmp_path / "store"
    store.mkdir()
    # 1 shard x 5 clips x 2 variants = 10 rows; batch 4 -> tail batch of 2
    make_synthetic_store(
        store, n_shards=1, clips_per_shard=5, n_vars=2, seq_len=8, feat_dim=32,
        subjects=(1,),
    )
    ds = FeatureClipDataset(str(store), subjects=[1], augment=True)
    assert len(ds) == 10

    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, joints_num=17,
                           number_blocks=1)
    feats_all, j3d_all = [], []
    for i in range(len(ds)):
        b = ds.get_batch([i])
        feats_all.append(b[0][0])
        j3d_all.append(b[1][0])
    feats_all = jnp.asarray(np.stack(feats_all))
    j3d_all = jnp.asarray(np.stack(j3d_all))
    params = model.init(jax.random.key(0), feats_all[:2])["params"]

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    got = evaluate(
        make_weighted_eval_step(model), params, ds,
        SequentialBatchSampler(ds, batch_size=4), batch_sharding(mesh),
    )

    pred = model.apply({"params": params}, feats_all)[2]
    np.testing.assert_allclose(got["loss"], float(mse3d(pred, j3d_all)), rtol=1e-5)
    np.testing.assert_allclose(got["mpjpe"], float(mpjpe(pred, j3d_all)), rtol=1e-5)


def test_fit_bf16_feed_dtype_tracks_f32(cfg, tmp_path):
    """--data.feed-dtype bfloat16 halves the feature transfer bytes; the
    run must train normally and track the f32-feed run's trajectory
    (features lose ~3 decimal digits, so per-epoch losses agree loosely,
    not bitwise)."""

    def datasets(feed_dtype):
        train_set = FeatureClipDataset(cfg.train_root, subjects=[1],
                                       augment=True, feed_dtype=feed_dtype)
        val_set = FeatureClipDataset(cfg.val_root, subjects=[5],
                                     feed_dtype=feed_dtype)
        train_sampler = MixedShardBatchSampler(
            train_set, batch_size=cfg.optim.batch_size, shards_per_batch=2,
            drop_last=True, seed=0,
        )
        val_sampler = SequentialBatchSampler(val_set,
                                             batch_size=cfg.optim.batch_size)
        return train_set, val_set, train_sampler, val_sampler

    import dataclasses as _dc

    cfg32 = _dc.replace(cfg, outdir=str(tmp_path / "runs32"))
    _, best32 = fit(cfg32, *datasets("float32"))
    cfg16 = _dc.replace(cfg, outdir=str(tmp_path / "runs16"),
                        data=_dc.replace(cfg.data, feed_dtype="bfloat16"))
    _, best16 = fit(cfg16, *datasets("bfloat16"))
    assert np.isfinite(best16)
    # same data, same seeds: the bf16 feed may not derail the optimization
    assert abs(best16 - best32) < 0.15 * max(abs(best32), 1e-6)


@pytest.mark.parametrize("backend,model_ax", [
    ("msgpack", 1), ("orbax", 1),
    ("orbax", 2),  # the riskiest combo: TP-sharded params + orbax restore
])
def test_resume_trajectory_matches_uninterrupted(cfg, tmp_path, backend,
                                                 model_ax):
    """Preemption transparency: a 4-epoch run interrupted mid-epoch-2 and
    resumed must land BITWISE on the uninterrupted 4-epoch run's params
    and per-epoch metrics (straight reruns are bitwise identical on this
    backend, so equality is the honest bar — any slack would be
    semantics). Load-bearing pieces: per-epoch fold_in rng, sampler
    set_epoch, restored patience, msgpack f32 exactness, and the cosine
    schedule keyed on the FULL epoch budget — a first draft trained the
    interrupted leg with epochs=2 and diverged 9e-4 through T_max
    alone, exactly the class of bug this test exists to catch."""
    import dataclasses as _dc
    import json

    cfg = _dc.replace(cfg, ckpt_backend=backend,
                      mesh=_dc.replace(cfg.mesh, model=model_ax))

    def opt():
        return _dc.replace(cfg.optim, epochs=4, early_stop_patience=0)

    straight = _dc.replace(cfg, outdir=str(tmp_path / "straight"),
                           optim=opt())
    state_a, best_a = fit(straight, *_datasets(cfg))

    class Interrupted(Exception):
        pass

    part1 = _dc.replace(cfg, outdir=str(tmp_path / "resumed"), optim=opt())
    train_set, val_set, sampler, val_sampler = _datasets(cfg)
    real_set_epoch = sampler.set_epoch

    def dying_set_epoch(e):
        if e == 2:  # epochs 0-1 committed; the preemption lands here
            raise Interrupted()
        real_set_epoch(e)

    sampler.set_epoch = dying_set_epoch
    with pytest.raises(Interrupted):
        fit(part1, train_set, val_set, sampler, val_sampler)

    part2 = _dc.replace(cfg, outdir=str(tmp_path / "resumed"), optim=opt(),
                        resume=str(tmp_path / "resumed"))
    state_b, best_b = fit(part2, *_datasets(cfg))

    np.testing.assert_array_equal(best_b, best_a)
    leaves_a = jax.tree_util.tree_leaves_with_path(
        jax.device_get(state_a.params))
    leaves_b = jax.tree_util.tree_leaves_with_path(
        jax.device_get(state_b.params))
    assert len(leaves_a) == len(leaves_b)
    for (ka, a), (kb, b) in zip(leaves_a, leaves_b):
        assert ka == kb
        np.testing.assert_array_equal(
            b, a,
            err_msg=f"resumed params diverged at {jax.tree_util.keystr(ka)}")

    rows_a = [json.loads(l) for l in
              (tmp_path / "straight" / "metrics.jsonl").read_text().splitlines()]
    rows_b = [json.loads(l) for l in
              (tmp_path / "resumed" / "metrics.jsonl").read_text().splitlines()]
    assert [r["epoch"] for r in rows_a] == [0, 1, 2, 3]
    assert [r["epoch"] for r in rows_b] == [0, 1, 2, 3]
    for want, got in zip(rows_a, rows_b):
        for key in ("lr", "train_loss", "val_mpjpe"):
            np.testing.assert_array_equal(
                got[key], want[key],
                err_msg=f"epoch {want['epoch']} {key}")


def test_phase2_resume_trajectory_matches_uninterrupted(cfg, tmp_path):
    """Phase-2 preemption transparency: the AR curriculum run interrupted
    before epoch 2 and resumed must land bitwise on the straight run —
    the curriculum horizon is keyed on the absolute epoch, so a resume
    that restarted it (or re-counted it from the resume point) would
    train later epochs at the wrong horizon."""
    import dataclasses as _dc

    def opt():
        return _dc.replace(cfg.optim, epochs=4, early_stop_patience=0,
                           phase=2, input_len=2, pred_len=4,
                           curriculum_steps=3)

    straight = _dc.replace(cfg, outdir=str(tmp_path / "straight"),
                           optim=opt())
    state_a, best_a = fit(straight, *_datasets(cfg))

    class Interrupted(Exception):
        pass

    part1 = _dc.replace(cfg, outdir=str(tmp_path / "resumed"), optim=opt())
    train_set, val_set, sampler, val_sampler = _datasets(cfg)
    real_set_epoch = sampler.set_epoch

    def dying_set_epoch(e):
        if e == 2:
            raise Interrupted()
        real_set_epoch(e)

    sampler.set_epoch = dying_set_epoch
    with pytest.raises(Interrupted):
        fit(part1, train_set, val_set, sampler, val_sampler)

    part2 = _dc.replace(cfg, outdir=str(tmp_path / "resumed"), optim=opt(),
                        resume=str(tmp_path / "resumed"))
    state_b, best_b = fit(part2, *_datasets(cfg))

    np.testing.assert_array_equal(best_b, best_a)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(state_a.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(state_b.params)),
    ):
        assert ka == kb
        np.testing.assert_array_equal(
            b, a,
            err_msg=f"phase-2 resume diverged at {jax.tree_util.keystr(ka)}")


def test_stop_after_epochs_then_resume_is_bitwise(cfg, tmp_path):
    """--optim.stop-after-epochs bounds THIS invocation while the schedule
    keeps targeting the full budget: two bounded legs (2 + 2) must land
    bitwise on the straight 4-epoch run — the flag is only honest if it is
    indistinguishable from a preemption."""
    import dataclasses as _dc

    def opt(**kw):
        return _dc.replace(cfg.optim, epochs=4, early_stop_patience=0, **kw)

    straight = _dc.replace(cfg, outdir=str(tmp_path / "straight"),
                           optim=opt())
    state_a, best_a = fit(straight, *_datasets(cfg))

    bounded = _dc.replace(cfg, outdir=str(tmp_path / "legs"),
                          optim=opt(stop_after_epochs=2))
    fit(bounded, *_datasets(cfg))
    leg2 = _dc.replace(bounded, resume=str(tmp_path / "legs"))
    state_b, best_b = fit(leg2, *_datasets(cfg))

    np.testing.assert_array_equal(best_b, best_a)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(state_a.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(state_b.params)),
    ):
        assert ka == kb
        np.testing.assert_array_equal(
            b, a, err_msg=f"bounded legs diverged at {jax.tree_util.keystr(ka)}")
