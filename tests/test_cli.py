"""CLI stage entry points: config parsing and end-to-end smoke runs."""

import numpy as np
import pytest

from h36x.config import ExtractConfig, TrainConfig, parse_into
from tests.helpers import make_synthetic_store


class TestConfigParsing:
    def test_dotted_overrides(self):
        cfg = parse_into(
            TrainConfig(),
            [
                "--optim.lr", "0.01",
                "--optim.batch-size", "8",
                "--model.latent-dim", "256",
                "--mesh.model", "2",
                "--train-root", "/data",
                "--train-subjects", "1", "5",
            ],
        )
        assert cfg.optim.lr == 0.01
        assert cfg.optim.batch_size == 8
        assert cfg.model.latent_dim == 256
        assert cfg.mesh.model == 2
        assert cfg.train_root == "/data"
        assert cfg.train_subjects == [1, 5]

    def test_defaults_preserved_and_isolated(self):
        base = TrainConfig()
        cfg = parse_into(base, ["--optim.lr", "0.5"])
        assert cfg.optim.lr == 0.5
        assert base.optim.lr != 0.5  # no mutation of the input config

    def test_bool_flags(self):
        cfg = parse_into(ExtractConfig(), ["--augment", "true", "--save-fp16", "0"])
        assert cfg.augment is True
        assert cfg.save_fp16 is False


class TestTrainCLI:
    def test_one_epoch_run(self, tmp_path, capsys):
        store = tmp_path / "store"
        store.mkdir()
        make_synthetic_store(store, n_shards=2, clips_per_shard=8, n_vars=4,
                             seq_len=8, feat_dim=32, subjects=(1, 5))
        from h36x.cli.train import main

        main([
            "--train-root", str(store),
            "--outdir", str(tmp_path / "runs"),
            "--optim.epochs", "1",
            "--optim.batch-size", "8",
            "--optim.log-every", "0",
            "--model.feature-dim", "32",
            "--model.latent-dim", "64",
            "--model.num-blocks", "1",
            "--data.seq-len", "8",
        ])
        out = capsys.readouterr().out
        assert "Phase-1 training" in out
        assert (tmp_path / "runs" / "last.msgpack").exists()

    def test_missing_root_exits(self):
        from h36x.cli.train import main

        with pytest.raises(SystemExit):
            main([])


class TestDebugBatchCLI:
    def test_dump(self, tmp_path, capsys):
        store = tmp_path / "store"
        store.mkdir()
        make_synthetic_store(store, n_shards=1, clips_per_shard=4, n_vars=1,
                             seq_len=6, feat_dim=16, subjects=(9,))
        from h36x.cli.debug_batch import main

        main(["--root", str(store), "--out", str(tmp_path / "dbg.npz"),
              "--batch-size", "3"])
        data = np.load(tmp_path / "dbg.npz", allow_pickle=True)
        assert data["joints3d"].shape[0] == 3


class TestPredictCLI:
    @pytest.fixture
    def served_store(self, tmp_path):
        """Synthetic test-subject store + a bare-params checkpoint."""
        import jax
        import jax.numpy as jnp
        from flax import serialization

        from h36x.models.phd import PHDFor3DJoints
        from tests.helpers import make_synthetic_store

        store = tmp_path / "store"
        store.mkdir()
        make_synthetic_store(store, n_shards=1, clips_per_shard=6, n_vars=1,
                             seq_len=8, feat_dim=32, subjects=(9,))
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, joints_num=17,
                               number_blocks=1, groups=8)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 32)))["params"]
        ckpt_path = tmp_path / "best.msgpack"
        ckpt_path.write_bytes(
            serialization.msgpack_serialize(jax.device_get(params))
        )
        return store, ckpt_path

    def test_batch_rollout(self, served_store, tmp_path, capsys):
        from h36x.cli.predict import main as predict_main

        store, ckpt_path = served_store
        out = tmp_path / "pred.npz"
        predict_main([
            "--features-root", str(store), "--model-path", str(ckpt_path),
            "--out", str(out), "--subjects", "9", "--clips", "3",
            "--forecast", "4", "--latent-dim", "64", "--num-blocks", "1",
            "--groups", "8",
        ])
        assert "Saved predictions" in capsys.readouterr().out
        data = np.load(out, allow_pickle=True)
        assert data["predicted3djoints"].shape == (3, 8, 17, 3)
        assert data["future3djoints"].shape == (3, 4, 17, 3)
        assert np.isfinite(data["predicted3djoints"]).all()

    def test_streaming_with_freeze(self, served_store, tmp_path, capsys):
        from h36x.cli.predict import main as predict_main

        store, ckpt_path = served_store
        out = tmp_path / "stream.npz"
        predict_main([
            "--features-root", str(store), "--model-path", str(ckpt_path),
            "--out", str(out), "--subjects", "9", "--clips", "2",
            "--streaming", "--freeze", "--latent-dim", "64",
            "--num-blocks", "1", "--groups", "8",
        ])
        text = capsys.readouterr().out
        assert "frozen-stats" in text
        data = np.load(out, allow_pickle=True)
        assert data["predicted3djoints"].shape == (2, 8, 17, 3)
        assert np.isfinite(data["predicted3djoints"]).all()


class TestModelConfigResolution:
    """CLIs reconstruct the trained architecture from the checkpoint
    manifest (h36x/cli/common.py) instead of trusting hand-typed flags —
    the reference re-types these constants on every entry point
    (src/results.py:175-187)."""

    @pytest.fixture
    def manifest_ckpt(self, tmp_path):
        """Checkpoint saved THROUGH save_checkpoint with a non-default
        architecture recorded in its manifest (as h36x-train does)."""
        import jax
        import jax.numpy as jnp

        from h36x.models.phd import PHDFor3DJoints
        from h36x.train import checkpoint as ckpt
        from h36x.train.state import create_train_state, make_optimizer

        store = tmp_path / "store"
        store.mkdir()
        make_synthetic_store(store, n_shards=1, clips_per_shard=6, n_vars=1,
                             seq_len=8, feat_dim=32, subjects=(9,))
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, joints_num=17,
                               number_blocks=1, groups=8)
        optimizer, _ = make_optimizer(lr=1e-3)
        state = create_train_state(model, optimizer, jax.random.key(0),
                                   jnp.zeros((1, 8, 32)))
        cfg = {"model": {"latent_dim": 64, "feature_dim": 32,
                         "num_blocks": 1, "groups": 8},
               "data": {"seq_len": 8}}
        ckpt.save_checkpoint(tmp_path, "best", state, 0, 1.0, cfg)
        return store, tmp_path / "best.msgpack"

    def test_load_recorded_model_config_paths(self, manifest_ckpt, tmp_path):
        from h36x.train.checkpoint import load_recorded_model_config

        _, ckpt_path = manifest_ckpt
        rec = load_recorded_model_config(ckpt_path)
        assert rec["latent_dim"] == 64 and rec["groups"] == 8
        # orbax-style references: outdir/best and a slot dir outdir/best.0
        assert load_recorded_model_config(tmp_path / "best")["num_blocks"] == 1
        assert load_recorded_model_config(tmp_path / "best.0")["num_blocks"] == 1
        # no manifest at all -> {}; empty path must not probe './.json'
        assert load_recorded_model_config(tmp_path / "nope.msgpack") == {}
        assert load_recorded_model_config("") == {}
        # the full-config reader (h36x-serve derives wire T from data.seq_len)
        from h36x.train.checkpoint import load_recorded_config

        assert load_recorded_config(ckpt_path)["data"]["seq_len"] == 8

    def test_resolver_precedence_and_conflict(self, manifest_ckpt):
        from h36x.cli.common import resolve_model_config

        _, ckpt_path = manifest_ckpt
        # no flags: recorded wins over defaults; unrecorded fields default
        mc = resolve_model_config(ckpt_path, {})
        assert mc["latent_dim"] == 64 and mc["groups"] == 8
        assert mc["regressor_iters"] == 3  # not recorded -> default
        # agreeing flag passes; contradicting flag raises
        assert resolve_model_config(ckpt_path,
                                    {"latent_dim": 64})["latent_dim"] == 64
        with pytest.raises(SystemExit, match="contradict"):
            resolve_model_config(ckpt_path, {"groups": 32})
        # the deliberate-override escape hatch
        mc = resolve_model_config(ckpt_path, {"groups": 32},
                                  ignore_recorded=True)
        assert mc["groups"] == 32

    def test_build_model_from_arch_covers_every_field(self):
        """Every ARCH_FIELDS entry must reach the constructed module: the
        hand-copied constructor subsets this builder replaced drifted twice
        into shape-invisible bugs (parity dropping groups/regressor_iters,
        results --fused dropping joints_num — review findings, round 4). A
        new ARCH_FIELDS entry that build_model_from_arch forgets to thread
        through fails here, not silently at serve time."""
        from h36x.cli.common import ARCH_FIELDS, build_model_from_arch

        # all non-default values so a dropped field cannot pass by accident
        mc = {f: 3 + i for i, f in enumerate(ARCH_FIELDS)}
        model = build_model_from_arch(mc)
        attr = {"num_blocks": "number_blocks", "ar_num_blocks": "ar_blocks"}
        for f in ARCH_FIELDS:
            assert getattr(model, attr.get(f, f)) == mc[f], f
        # the feature_dim override (data-authoritative call sites)
        assert build_model_from_arch(mc, feature_dim=99).feature_dim == 99

    def test_predict_cli_auto_resolves(self, manifest_ckpt, tmp_path, capsys):
        """No model flags: latent_dim=64/num_blocks=1 must come from the
        manifest (the default 1024/2 template would fail the param
        restore), and groups=8 (shape-invisible) must be applied too."""
        from h36x.cli.predict import main as predict_main

        store, ckpt_path = manifest_ckpt
        out = tmp_path / "pred.npz"
        predict_main([
            "--features-root", str(store), "--model-path", str(ckpt_path),
            "--out", str(out), "--subjects", "9", "--clips", "2",
            "--forecast", "0",
        ])
        text = capsys.readouterr().out
        assert "Model config from checkpoint manifest" in text
        data = np.load(out, allow_pickle=True)
        assert data["predicted3djoints"].shape == (2, 8, 17, 3)

    def test_predict_cli_conflicting_flag_exits(self, manifest_ckpt, tmp_path):
        from h36x.cli.predict import main as predict_main

        store, ckpt_path = manifest_ckpt
        with pytest.raises(SystemExit, match="contradict"):
            predict_main([
                "--features-root", str(store), "--model-path", str(ckpt_path),
                "--out", str(tmp_path / "x.npz"), "--subjects", "9",
                "--clips", "1", "--num-blocks", "2",
            ])


class TestDoctorCLI:
    def test_env_only(self, capsys):
        from h36x.cli.doctor import main

        main([])
        out = capsys.readouterr().out
        assert "[ok] jax backend" in out
        assert "all required checks passed" in out

    def test_store_and_ckpt_checks(self, tmp_path, capsys):
        from h36x.cli.doctor import main

        store = tmp_path / "store"
        store.mkdir()
        make_synthetic_store(store, n_shards=2, clips_per_shard=4, n_vars=1,
                             seq_len=6, feat_dim=16, subjects=(1,))
        main(["--root", str(store)])
        out = capsys.readouterr().out
        assert "shard 0 reads ok" in out

        # a missing shard file is a required-check failure
        (store / "shard_00001.h36x").unlink()
        with pytest.raises(SystemExit, match="problems"):
            main(["--root", str(store)])

        with pytest.raises(SystemExit, match="problems"):
            main(["--ckpt", str(tmp_path / "nope.msgpack")])

    def test_converted_checkpoint_manifest(self, tmp_path, capsys):
        """h36x-convert manifests carry {converted_from, format} instead of
        epoch/step/best_val — doctor must describe them, not KeyError-fail
        a perfectly loadable artifact."""
        import json

        from h36x.cli.doctor import main

        (tmp_path / "best.msgpack").write_bytes(b"\x00" * 128)
        (tmp_path / "best.json").write_text(json.dumps(
            {"converted_from": "ref/last.pt", "format": "torch"}))
        main(["--ckpt", str(tmp_path / "best.msgpack")])
        out = capsys.readouterr().out
        assert "converted from ref/last.pt (torch)" in out

    def test_dedup_estimate(self, tmp_path, capsys):
        """--dedup-estimate predicts the unique-frame scheduler's ratio from
        pose pickles alone: constant joints -> every window shares one box
        -> unique (frame, box) pairs == subsampled frames per video."""
        import pickle

        from h36x.cli.doctor import main

        rng = np.random.default_rng(3)
        n_frames = 40  # 20 subsampled at skip 2
        for subject, action in ((1, "Walking_0"), (1, "Eating_0")):
            cam_dir = tmp_path / f"S{subject}" / action / "cam_0"
            cam_dir.mkdir(parents=True)
            (cam_dir / "video.mp4").write_bytes(b"")  # probe never decodes
            j3d = rng.normal(size=(n_frames, 17, 3)).astype(np.float32)
            j2d = np.tile(
                (rng.random((1, 17, 2)) * 40 + 12).astype(np.float32),
                (n_frames, 1, 1),
            )
            with open(cam_dir / "gt_poses.pkl", "wb") as f:
                pickle.dump({"2d": j2d, "3d": j3d}, f)
            with open(cam_dir / "camera_wext.pkl", "wb") as f:
                pickle.dump(
                    {"f": np.array([90.0, 90.0]), "c": np.array([30.0, 33.0]),
                     "k": np.zeros(5), "rt": np.eye(3), "t": np.zeros(3)}, f,
                )

        main(["--dedup-estimate", str(tmp_path),
              "--seq-len", "8", "--stride", "2", "--frame-skip", "2"])
        out = capsys.readouterr().out
        assert "[ok] dedup estimate" in out
        # 2 videos x 7 windows each; constant joints -> one box per video
        assert "14 clips / 2 videos" in out
        assert "100% of consecutive windows share a box" in out
        # unique (frame, box) = 20 subsampled frames/video = 40 of 14*8=112
        assert "unique (frame, box) = 40/112" in out
        # passes = (112 + 2*40)/112 = 12/7 -> 3/(12/7) = 1.75x, and with
        # one box/video already, --crop-scope video guarantees the same
        assert "~1.75x device dedup" in out
        assert "guarantees 1.75x" in out
        # re-keyed jitter is cached too: 3*112/(3*40) = 2.8x
        assert "--jitter-key video|frame -> 2.80x" in out

    def test_preflight_happy_raw_tree(self, tmp_path, rng, capsys):
        """--preflight on a complete synthetic raw drop: counts every
        ingestable (sequence, camera) cell, forecasts clips/store/RAM/time
        from the pose lengths, prints the launch plan, exits 0."""
        from h36x.cli.doctor import main
        from tests.test_ingest import _write_metadata_xml

        _write_metadata_xml(tmp_path / "metadata.xml", rng)
        sbj = 1
        for trial in (1, 2):
            seq = f"Seq_2_{trial}_S{sbj}"
            vids = tmp_path / f"S{sbj}" / "Videos"
            p2 = tmp_path / f"S{sbj}" / "MyPoseFeatures" / "D2_Positions"
            p3 = tmp_path / f"S{sbj}" / "MyPoseFeatures" / "D3_Positions_mono"
            for d in (vids, p2, p3):
                d.mkdir(parents=True, exist_ok=True)
            for cam in range(1, 5):
                (vids / f"{seq}.{cam}.mp4").write_bytes(b"fakemp4")
                np.savez_compressed(
                    p2 / f"{seq}.{cam}.npz",
                    Pose=rng.normal(size=(1, 10, 64)).astype(np.float32))
                np.savez_compressed(
                    p3 / f"{seq}.{cam}.npz",
                    Pose=rng.normal(size=(1, 10, 96)).astype(np.float32))
        main(["--preflight", str(tmp_path),
              "--seq-len", "4", "--stride", "2", "--frame-skip", "2"])
        out = capsys.readouterr().out
        assert "metadata.xml parses" in out
        assert "subjects present: S1" in out
        # 8 complete cells; official grid for 1 subject = 15x2x4 = 120
        assert "cells with video+poses: 8/120" in out
        assert "all pose files readable" in out
        # 10 frames -> 5 subsampled -> (5-4)//2+1 = 1 clip per cell
        assert "forecast: 8 clips (80 raw frames) x 4 variants = 32 rows" in out
        assert "shuffle-pool host RAM" in out
        assert "h36x-ingest --source-dir" in out
        assert "h36x-extract --root" in out
        assert "all required checks passed" in out

    def test_preflight_fails_without_metadata(self, tmp_path, capsys):
        from h36x.cli.doctor import main

        (tmp_path / "S1").mkdir()
        with pytest.raises(SystemExit, match="metadata.xml"):
            main(["--preflight", str(tmp_path)])

    def test_preflight_fails_on_cdf_only_without_spacepy(self, tmp_path, rng,
                                                         capsys):
        """CDF-only pose files with spacepy absent must FAIL loudly with the
        cdf_to_npz instruction — before hours are burned, not nine layers
        into the ingest."""
        pytest.importorskip("cv2")
        try:
            import spacepy  # noqa: F401

            pytest.skip("spacepy present; the gate cannot fire here")
        except ImportError:
            pass
        from h36x.cli.doctor import main
        from tests.test_ingest import _write_metadata_xml

        _write_metadata_xml(tmp_path / "metadata.xml", rng)
        seq = "Seq_2_1_S1"
        vids = tmp_path / "S1" / "Videos"
        p2 = tmp_path / "S1" / "MyPoseFeatures" / "D2_Positions"
        p3 = tmp_path / "S1" / "MyPoseFeatures" / "D3_Positions_mono"
        for d in (vids, p2, p3):
            d.mkdir(parents=True, exist_ok=True)
        for cam in range(1, 5):
            (vids / f"{seq}.{cam}.mp4").write_bytes(b"fakemp4")
            (p2 / f"{seq}.{cam}.cdf").write_bytes(b"\x00" * 64)
            (p3 / f"{seq}.{cam}.cdf").write_bytes(b"\x00" * 64)
        with pytest.raises(SystemExit, match="cdf"):
            main(["--preflight", str(tmp_path),
                  "--seq-len", "4", "--stride", "2"])
        out = capsys.readouterr().out
        assert "cdf_to_npz" in out

    def test_preflight_fails_with_no_cells(self, tmp_path, rng):
        from h36x.cli.doctor import main
        from tests.test_ingest import _write_metadata_xml

        _write_metadata_xml(tmp_path / "metadata.xml", rng)
        (tmp_path / "S1").mkdir()  # subject dir but no Videos/poses
        with pytest.raises(SystemExit, match="cells"):
            main(["--preflight", str(tmp_path)])

        with pytest.raises(SystemExit, match="problems"):
            main(["--dedup-estimate", str(tmp_path / "empty")])
