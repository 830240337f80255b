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
