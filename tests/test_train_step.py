"""Train-state / step semantics: loss decreases on a synthetic problem, f_AR
stays frozen (reference src/train.py:373-376), cosine LR schedule, checkpoint
round-trip + resume (src/train.py:399-409, 437-451)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h36x.models.phd import PHDFor3DJoints
from h36x.train import checkpoint as ckpt
from h36x.train.state import (
    cosine_lr,
    create_train_state,
    make_optimizer,
    set_learning_rate,
)
from h36x.train.step import make_eval_step, make_forward, make_train_step


@pytest.fixture(scope="module")
def setup():
    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1, dropout=0.0)
    optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=True)
    state = create_train_state(
        model, optimizer, jax.random.key(0), jnp.zeros((2, 6, 32))
    )
    return model, optimizer, state


def synth_batch(rng, b=4, t=6, f=32):
    feats = rng.normal(size=(b, t, f)).astype(np.float32)
    joints3d = rng.normal(size=(b, t, 17, 3)).astype(np.float32) * 0.1
    joints2d = rng.normal(size=(b, t, 17, 2)).astype(np.float32)
    K = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    return tuple(jnp.asarray(x) for x in (feats, joints3d, joints2d, K))


class TestCosineLR:
    def test_endpoints(self):
        assert cosine_lr(0, 1e-4, 50) == pytest.approx(1e-4)
        assert cosine_lr(50, 1e-4, 50) == pytest.approx(0.0)
        assert cosine_lr(25, 1e-4, 50) == pytest.approx(5e-5)

    def test_monotone_decreasing(self):
        vals = [cosine_lr(e, 1.0, 50) for e in range(51)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))


class TestTrainStep:
    def test_loss_decreases(self, setup, rng):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, donate=False)
        batch = synth_batch(rng)
        key = jax.random.key(1)
        losses = []
        for i in range(30):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7

    def test_far_params_frozen(self, setup, rng):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, donate=False)
        batch = synth_batch(rng)
        far_before = jax.device_get(state.params["f_AR"])
        other_before = jax.device_get(state.params["input_proj"])
        state2, _ = step(state, batch, jax.random.key(2))
        far_after = jax.device_get(state2.params["f_AR"])
        other_after = jax.device_get(state2.params["input_proj"])
        for a, b in zip(jax.tree.leaves(far_before), jax.tree.leaves(far_after)):
            np.testing.assert_array_equal(a, b)
        changed = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(other_before), jax.tree.leaves(other_after))
        )
        assert changed

    def test_unfrozen_optimizer_updates_far(self, rng):
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1, dropout=0.0)
        optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=False)
        state = create_train_state(model, optimizer, jax.random.key(0), jnp.zeros((2, 6, 32)))
        step = make_train_step(model, optimizer, donate=False)
        batch = synth_batch(rng)
        far_before = jax.tree.leaves(jax.device_get(state.params["f_AR"]))
        state2, _ = step(state, batch, jax.random.key(2))
        far_after = jax.tree.leaves(jax.device_get(state2.params["f_AR"]))
        assert any(not np.allclose(a, b) for a, b in zip(far_before, far_after))

    def test_set_learning_rate_changes_step_size(self, setup, rng):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, donate=False)
        batch = synth_batch(rng)
        set_learning_rate(state.opt_state, 0.0, freeze_ar=True)
        p_before = jax.device_get(state.params["input_proj"]["kernel"])
        state2, _ = step(state, batch, jax.random.key(3))
        p_after = jax.device_get(state2.params["input_proj"]["kernel"])
        np.testing.assert_allclose(p_before, p_after, atol=1e-8)

    def test_step_counter(self, setup, rng):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, donate=False)
        batch = synth_batch(rng)
        s1, _ = step(state, batch, jax.random.key(0))
        s2, _ = step(s1, batch, jax.random.key(1))
        assert int(s2.step) == int(state.step) + 2

    def test_lambda_2d_adds_reprojection_term(self, rng):
        """lambda_2d > 0 adds exactly lambda * pixel-MSE of the projected
        prediction (numpy pinhole oracle); lambda_2d=0 reproduces the
        reference's 3D-only loss (src/train.py:161-164) bit-for-bit."""
        model = PHDFor3DJoints(
            latent_dim=64, feature_dim=32, number_blocks=1, dropout=0.0
        )
        optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=True)
        state = create_train_state(
            model, optimizer, jax.random.key(0), jnp.zeros((2, 6, 32))
        )
        feats, joints3d, joints2d, _ = synth_batch(rng)
        # realistic intrinsics + 3D points in front of the camera
        K = np.tile(
            np.array([[500.0, 0, 112], [0, 500.0, 112], [0, 0, 1]], np.float32),
            (feats.shape[0], 1, 1),
        )
        joints3d = jnp.asarray(
            np.abs(np.asarray(joints3d)) + np.array([0, 0, 2.0], np.float32)
        )
        batch = (feats, joints3d, joints2d, jnp.asarray(K))

        lam = 1e-6
        base = make_train_step(model, optimizer, donate=False)
        with2d = make_train_step(model, optimizer, donate=False, lambda_2d=lam)
        _, m0 = base(state, batch, jax.random.key(1))
        _, m1 = with2d(state, batch, jax.random.key(1))

        pred = np.asarray(make_forward(model)(state.params, feats))
        proj = pred @ np.asarray(K)[:, None].transpose(0, 1, 3, 2)
        pix = proj[..., :2] / np.clip(proj[..., 2:3], 1e-6, None)
        l2d_oracle = ((pix - np.asarray(joints2d)) ** 2).mean()

        assert float(m0["l2d"]) == 0.0
        np.testing.assert_allclose(float(m1["l2d"]), l2d_oracle, rtol=1e-4)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m0["loss"]) + lam * l2d_oracle, rtol=1e-4
        )


class TestScanSteps:
    """Multi-step scan dispatch (scan_steps > 1) must reproduce the
    one-step-per-dispatch trajectory exactly: same rng split discipline,
    so same dropout masks, same updates."""

    def _states(self, dropout):
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32,
                               number_blocks=1, dropout=dropout)
        optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=True)
        make_state = lambda: create_train_state(  # noqa: E731
            model, optimizer, jax.random.key(0), jnp.zeros((2, 6, 32))
        )
        return model, optimizer, make_state

    @pytest.mark.parametrize("dropout", [0.0, 0.5])
    def test_matches_sequential(self, rng, dropout):
        model, optimizer, make_state = self._states(dropout)
        k = 4
        batches = [synth_batch(rng) for _ in range(k)]

        step = make_train_step(model, optimizer, donate=False)
        s1, key = make_state(), jax.random.key(7)
        seq_metrics = []
        for b in batches:
            key, sub = jax.random.split(key)
            s1, m = step(s1, b, sub)
            seq_metrics.append(m)

        mstep = make_train_step(model, optimizer, donate=False, scan_steps=k)
        stacked = tuple(jnp.stack(xs) for xs in zip(*batches))
        s2, metrics, _ = mstep(make_state(), stacked, jax.random.key(7))

        assert int(s2.step) == int(s1.step) == k
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)
        for i, m in enumerate(seq_metrics):
            for name in ("loss", "mpjpe"):
                np.testing.assert_allclose(
                    float(metrics[name][i]), float(m[name]), rtol=1e-5)

    def test_short_tail_group_retraces(self, rng):
        """A final group shorter than scan_steps is just a shorter scan —
        same callable, new shape, jit re-traces and the math still works."""
        model, optimizer, make_state = self._states(0.0)
        mstep = make_train_step(model, optimizer, donate=False, scan_steps=3)
        s = make_state()
        full = tuple(jnp.stack(xs) for xs in
                     zip(*[synth_batch(rng) for _ in range(3)]))
        tail = tuple(x[:2] for x in full)
        s, m_full, key = mstep(s, full, jax.random.key(0))
        s, m_tail, _ = mstep(s, tail, key)
        assert m_full["loss"].shape == (3,) and m_tail["loss"].shape == (2,)
        assert int(s.step) == 5
        assert all(np.isfinite(np.asarray(m_tail["loss"])))


class TestGradAccum:
    """accum_steps=a must equal ONE optimizer step on the concatenated
    batch: the loss is a mean over rows, so the mean of equal-size
    microbatch gradients is the big-batch gradient."""

    def test_matches_big_batch(self, rng):
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32,
                               number_blocks=1, dropout=0.0)
        optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=True)
        make_state = lambda: create_train_state(  # noqa: E731
            model, optimizer, jax.random.key(0), jnp.zeros((2, 6, 32))
        )
        micros = [synth_batch(rng, b=4) for _ in range(3)]
        big = tuple(jnp.concatenate(xs) for xs in zip(*micros))

        step = make_train_step(model, optimizer, donate=False)
        s1, m1 = step(make_state(), big, jax.random.key(5))

        astep = make_train_step(model, optimizer, donate=False, accum_steps=3)
        stacked = tuple(jnp.stack(xs) for xs in zip(*micros))
        s2, m2, _ = astep(make_state(), stacked, jax.random.key(5))

        assert int(s2.step) == 1  # one optimizer update for the group
        # f32 summation-order noise in near-zero grads gets amplified by
        # AdamW's 1/sqrt(v) normalizer — tolerance reflects that, not math
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-6)
        # metrics are per-microbatch; their mean is the big-batch value
        np.testing.assert_allclose(float(jnp.mean(m2["loss"])),
                                   float(m1["loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(jnp.mean(m2["mpjpe"])),
                                   float(m1["mpjpe"]), rtol=1e-5)

    def test_exclusive_with_scan(self):
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1)
        optimizer, _ = make_optimizer(lr=1e-3)
        with pytest.raises(ValueError, match="mutually exclusive"):
            make_train_step(model, optimizer, scan_steps=2, accum_steps=2)

    def test_fit_grad_accum_runs(self, tmp_path):
        """Loop-level smoke: grad_accum=2 trains through fit and records
        one optimizer step per 2 batches."""
        import dataclasses as _dc

        from h36x.config import TrainConfig
        from h36x.data.features import FeatureClipDataset
        from h36x.data.sampler import (
            MixedShardBatchSampler,
            SequentialBatchSampler,
        )
        from h36x.train.loop import fit
        from tests.helpers import make_synthetic_store

        store = tmp_path / "store"
        store.mkdir()
        make_synthetic_store(store, n_shards=2, clips_per_shard=8, n_vars=4,
                             seq_len=8, feat_dim=32, subjects=(1, 5))
        cfg = TrainConfig()
        cfg.outdir = str(tmp_path / "runs")
        cfg.data.seq_len = 8
        cfg.model.feature_dim = 32
        cfg.model.latent_dim = 64
        cfg.model.num_blocks = 1
        cfg.optim = _dc.replace(cfg.optim, epochs=1, batch_size=8,
                                log_every=0, grad_accum=2)
        cfg.train_root = cfg.val_root = str(store)
        train_set = FeatureClipDataset(str(store), subjects=[1], augment=True)
        val_set = FeatureClipDataset(str(store), subjects=[5])
        ts = MixedShardBatchSampler(train_set, batch_size=8,
                                    shards_per_batch=2, drop_last=True, seed=0)
        vs = SequentialBatchSampler(val_set, batch_size=8)
        state, best = fit(cfg, train_set, val_set, ts, vs)
        assert np.isfinite(best)
        n_batches = len(train_set) // 8
        assert int(state.step) == (n_batches + 1) // 2


class TestEval:
    def test_eval_metrics_match_manual(self, setup, rng):
        model, _, state = setup
        eval_step = make_eval_step(model)
        batch = synth_batch(rng)
        metrics = jax.device_get(eval_step(state.params, batch))
        fwd = make_forward(model)
        pred = np.asarray(fwd(state.params, batch[0]))
        gt = np.asarray(batch[1])
        np.testing.assert_allclose(
            metrics["l3d"], ((pred - gt) ** 2).mean(), rtol=1e-5
        )
        np.testing.assert_allclose(
            metrics["mpjpe"], np.linalg.norm(pred - gt, axis=-1).mean(), rtol=1e-5
        )


class TestCheckpoint:
    def test_roundtrip(self, setup, tmp_path, rng):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, donate=False)
        batch = synth_batch(rng)
        state, _ = step(state, batch, jax.random.key(0))

        ckpt.save_checkpoint(tmp_path, "last", state, epoch=3, best_val=0.123,
                             config={"note": "test"})
        template = create_train_state(model, optimizer, jax.random.key(9), jnp.zeros((2, 6, 32)))
        restored, manifest = ckpt.load_checkpoint(tmp_path, "last", template)

        assert manifest["epoch"] == 3
        assert manifest["best_val"] == pytest.approx(0.123)
        assert manifest["config"]["note"] == "test"
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_training_continues(self, setup, tmp_path, rng):
        """A restored state must produce the identical next step as the
        original (bitwise optimizer-state fidelity)."""
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, donate=False)
        batch = synth_batch(rng)
        state, _ = step(state, batch, jax.random.key(0))
        ckpt.save_checkpoint(tmp_path, "last", state, 0, 1.0)
        template = create_train_state(model, optimizer, jax.random.key(9), jnp.zeros((2, 6, 32)))
        restored, _ = ckpt.load_checkpoint(tmp_path, "last", template)

        s_a, m_a = step(state, batch, jax.random.key(5))
        s_b, m_b = step(restored, batch, jax.random.key(5))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_orbax_backend_roundtrip_and_autodetect(self, setup, tmp_path, rng):
        """The orbax backend must round-trip the exact TrainState (params +
        optimizer state + step) and load_checkpoint must autodetect an orbax
        directory when no .msgpack exists — so a resume works regardless of
        which backend wrote the checkpoint."""
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, donate=False)
        batch = synth_batch(rng)
        state, _ = step(state, batch, jax.random.key(0))

        ckpt.save_checkpoint_orbax(tmp_path, "last", state, epoch=4,
                                   best_val=0.321, config={"note": "orbax"})
        assert (tmp_path / "last.0").is_dir()  # epoch-parity slot
        assert not (tmp_path / "last.msgpack").exists()

        template = create_train_state(
            model, optimizer, jax.random.key(9), jnp.zeros((2, 6, 32))
        )
        restored, manifest = ckpt.load_checkpoint(tmp_path, "last", template)
        assert manifest["epoch"] == 4
        assert manifest["backend"] == "orbax"
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # identical next step from the restored state (optimizer fidelity)
        s_a, m_a = step(state, batch, jax.random.key(5))
        s_b, m_b = step(restored, batch, jax.random.key(5))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-6)

        # per-epoch overwrite (the "last" policy) must not fail, and the
        # PREVIOUS epoch's slot must survive the new save (crash window
        # safety: a kill during the epoch-5 save leaves epoch 4 resumable)
        ckpt.save_checkpoint_orbax(tmp_path, "last", s_a, epoch=5,
                                   best_val=0.3, config={})
        assert (tmp_path / "last.1").is_dir()
        assert (tmp_path / "last.0").is_dir()  # epoch-4 slot intact
        _, manifest = ckpt.load_checkpoint(tmp_path, "last", template)
        assert manifest["epoch"] == 5
        assert manifest["dir"] == "last.1"

    def test_orbax_best_same_parity_epochs_alternate_slots(self, setup,
                                                           tmp_path, rng):
        """`best` saves happen on improvement epochs, which can share
        parity (epoch 0 then epoch 2): consecutive saves must still
        alternate slots so force=True never rmtree's the live slot."""
        import json

        model, optimizer, state = setup
        ckpt.save_checkpoint_orbax(tmp_path, "best", state, epoch=0,
                                   best_val=0.9)
        m1 = json.loads((tmp_path / "best.json").read_text())
        ckpt.save_checkpoint_orbax(tmp_path, "best", state, epoch=2,
                                   best_val=0.5)
        m2 = json.loads((tmp_path / "best.json").read_text())
        assert m1["dir"] != m2["dir"]
        assert (tmp_path / m1["dir"]).is_dir()  # previous save intact
        assert (tmp_path / m2["dir"]).is_dir()

        # a fresh process (counter reset) seeds from the manifest and
        # still avoids the live slot
        ckpt._slot_counters.clear()
        ckpt.save_checkpoint_orbax(tmp_path, "best", state, epoch=4,
                                   best_val=0.4)
        m3 = json.loads((tmp_path / "best.json").read_text())
        assert m3["dir"] != m2["dir"]

    def test_orbax_manifest_without_dir_raises(self, setup, tmp_path, rng):
        """backend=orbax manifest + missing orbax dir (crashed save,
        partial sync) must raise, NOT fall back to a stale sibling
        .msgpack with the newer manifest (epoch/params mispairing)."""
        import shutil

        model, optimizer, state = setup
        ckpt.save_checkpoint(tmp_path, "last", state, epoch=1, best_val=0.9)
        ckpt.save_checkpoint_orbax(tmp_path, "last", state, epoch=2,
                                   best_val=0.8)
        shutil.rmtree(tmp_path / "last.0")  # the live orbax slot vanishes
        template = create_train_state(model, optimizer, jax.random.key(9),
                                      jnp.zeros((2, 6, 32)))
        with pytest.raises(FileNotFoundError, match="stale msgpack"):
            ckpt.load_checkpoint(tmp_path, "last", template)

    def test_manifest_backend_wins_over_stale_msgpack(self, setup, tmp_path,
                                                      rng):
        """After a backend switch, a STALE .msgpack from the old backend
        must not shadow the newer orbax directory: the shared manifest's
        'backend' field decides."""
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, donate=False)
        s1, _ = step(state, synth_batch(rng), jax.random.key(0))
        ckpt.save_checkpoint(tmp_path, "last", s1, epoch=10, best_val=0.5)
        s2, _ = step(s1, synth_batch(rng), jax.random.key(1))
        ckpt.save_checkpoint_orbax(tmp_path, "last", s2, epoch=20,
                                   best_val=0.4)
        assert (tmp_path / "last.msgpack").exists()  # stale file remains

        template = create_train_state(model, optimizer, jax.random.key(9),
                                      jnp.zeros((2, 6, 32)))
        restored, manifest = ckpt.load_checkpoint(tmp_path, "last", template)
        assert manifest["epoch"] == 20  # the newer (orbax) checkpoint
        for a, b in zip(jax.tree.leaves(s2.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_params_only_orbax_directory(self, setup, tmp_path, rng):
        """Every params-only consumer (predict/export/results/serve/
        init_from) must load orbax-trained checkpoints too."""
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, donate=False)
        state, _ = step(state, synth_batch(rng), jax.random.key(0))
        ckpt.save_checkpoint_orbax(tmp_path, "best", state, 0, 1.0)

        template = jax.device_get(state.params)
        params = ckpt.load_params_only(tmp_path / "best", template)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_checkpoint_raises(self, setup, tmp_path):
        model, optimizer, state = setup
        with pytest.raises(FileNotFoundError, match="neither"):
            ckpt.load_checkpoint(tmp_path, "last", state)

    def test_load_params_only(self, setup, tmp_path):
        model, optimizer, state = setup
        ckpt.save_checkpoint(tmp_path, "best", state, 0, 1.0)
        params = ckpt.load_params_only(
            tmp_path / "best.msgpack", jax.device_get(state.params)
        )
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFusedTrainStep:
    """--fused training: Pallas forward+backward residual blocks (precise
    3-pass MXU) must reproduce the XLA step."""

    def test_matches_xla_step_no_dropout(self, setup, rng):
        """Params are compared through plain SGD, NOT AdamW: the adaptive
        normalizer divides by sqrt(v)+eps, so on near-zero-gradient
        coordinates it amplifies the Pallas-vs-XLA grad agreement (~5e-6
        rel) unboundedly — a previous AdamW-based version of this assert
        was tolerance-borderline and only passed when an earlier test's
        in-place set_learning_rate happened to shrink the step. With SGD
        the param diff is exactly lr * grad diff."""
        import optax

        model, _, _ = setup
        sgd = optax.sgd(1e-2)
        state = create_train_state(model, sgd, jax.random.key(0),
                                   jnp.zeros((2, 6, 32)))
        batch = synth_batch(rng)
        key = jax.random.key(2)

        xla_step = make_train_step(model, sgd, donate=False)
        fused_step = make_train_step(model, sgd, donate=False,
                                     fused=True, interpret=True)
        s_x, m_x = xla_step(state, batch, key)
        s_f, m_f = fused_step(state, batch, key)

        np.testing.assert_allclose(float(m_f["loss"]), float(m_x["loss"]),
                                   rtol=1e-5)
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s_x.params)),
            jax.tree.leaves(jax.device_get(s_f.params)),
        ):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_fused_loss_decreases_with_dropout(self, rng):
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1,
                               dropout=0.3)
        optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=True)
        state = create_train_state(model, optimizer, jax.random.key(0),
                                   jnp.zeros((2, 6, 32)))
        step = make_train_step(model, optimizer, donate=False, fused=True,
                               interpret=True)
        batch = synth_batch(rng)
        key = jax.random.key(1)
        losses = []
        for _ in range(15):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


class TestMixedPrecision:
    """bf16 compute dtype: f32 params, f32 GN statistics, bf16 matmuls."""

    def test_bf16_params_stay_f32(self):
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1,
                               dropout=0.0, dtype=jnp.bfloat16)
        params = model.init(jax.random.key(0), jnp.zeros((2, 6, 32)))["params"]
        for leaf in jax.tree.leaves(params):
            assert leaf.dtype == jnp.float32

    def test_bf16_step_trains_and_tracks_f32(self, rng):
        batch = synth_batch(rng)
        key = jax.random.key(3)
        results = {}
        for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
            model = PHDFor3DJoints(latent_dim=64, feature_dim=32,
                                   number_blocks=1, dropout=0.0, dtype=dt)
            optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=True)
            state = create_train_state(model, optimizer, jax.random.key(0),
                                       jnp.zeros((2, 6, 32)))
            step = make_train_step(model, optimizer, donate=False)
            losses = []
            k = key
            for _ in range(20):
                k, sub = jax.random.split(k)
                state, m = step(state, batch, sub)
                losses.append(float(m["loss"]))
            results[name] = losses
            assert losses[-1] < losses[0]
            assert np.isfinite(losses).all()
        # same init => same trajectory within bf16 noise
        np.testing.assert_allclose(results["bf16"][0], results["f32"][0],
                                   rtol=2e-2)
        np.testing.assert_allclose(results["bf16"][-1], results["f32"][-1],
                                   rtol=0.25)

    def test_build_model_dtype_flag(self):
        from h36x.config import TrainConfig
        from h36x.train.loop import build_model

        cfg = TrainConfig()
        cfg.model.dtype = "bfloat16"
        assert build_model(cfg).dtype == jnp.bfloat16
        cfg.model.dtype = "float32"
        assert build_model(cfg).dtype is None
