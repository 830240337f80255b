"""Edge-case robustness: corrupt/truncated shards, empty stores, cams
filtering, feed buffering, checkpoint manifest integrity."""

import numpy as np
import pytest

from h36x.data import shards as shard_store
from h36x.data.features import FeatureClipDataset
from tests.helpers import make_synthetic_store


class TestShardCorruption:
    def test_truncated_payload(self, tmp_path, rng):
        make_synthetic_store(tmp_path, n_shards=1, clips_per_shard=2, n_vars=1)
        path = shard_store.shard_path(tmp_path, 0)
        data = path.read_bytes()
        path.write_bytes(data[: len(data) // 2])
        # memmap of a truncated file raises on construction or on access
        with pytest.raises(Exception):
            shard = shard_store.read_shard(path, mmap=False)
            np.asarray(shard["feats"]).sum()

    def test_truncated_header(self, tmp_path):
        p = tmp_path / "shard_00000.h36x"
        p.write_bytes(shard_store.MAGIC + b"\xff\xff\xff\x7f")  # huge header len
        with pytest.raises(Exception):
            shard_store.read_shard(p)

    def test_empty_file(self, tmp_path):
        p = tmp_path / "shard_00000.h36x"
        p.write_bytes(b"")
        with pytest.raises(ValueError):
            shard_store.read_shard(p)


class TestIngestCamsFilter:
    def test_scan_clips_cam_filter(self, tmp_path, rng):
        import pickle

        for cam in range(3):
            d = tmp_path / "S1" / "Act_0" / f"cam_{cam}"
            d.mkdir(parents=True)
            (d / "v.mp4").write_bytes(b"x")
            with open(d / "gt_poses.pkl", "wb") as f:
                pickle.dump({"2d": np.zeros((20, 17, 2), np.float32),
                             "3d": np.zeros((20, 17, 3), np.float32)}, f)
            with open(d / "camera_wext.pkl", "wb") as f:
                pickle.dump({"f": np.ones(2), "c": np.ones(2)}, f)

        from h36x.data.clips import scan_clips

        all_clips, _, _ = scan_clips(str(tmp_path), [1], seq_len=4, stride=2,
                                     frame_skip=2)
        cams_0_2, _, _ = scan_clips(str(tmp_path), [1], seq_len=4, stride=2,
                                    frame_skip=2, cams=[0, 2])
        assert len(cams_0_2) == len(all_clips) * 2 // 3
        assert {c.cam for c in cams_0_2} == {"cam_0", "cam_2"}

    def test_max_clips(self, tmp_path, rng):
        import pickle

        d = tmp_path / "S1" / "Act_0" / "cam_0"
        d.mkdir(parents=True)
        (d / "v.mp4").write_bytes(b"x")
        with open(d / "gt_poses.pkl", "wb") as f:
            pickle.dump({"2d": np.zeros((100, 17, 2), np.float32),
                         "3d": np.zeros((100, 17, 3), np.float32)}, f)
        with open(d / "camera_wext.pkl", "wb") as f:
            pickle.dump({"f": np.ones(2), "c": np.ones(2)}, f)

        from h36x.data.clips import scan_clips

        clips, _, _ = scan_clips(str(tmp_path), [1], seq_len=4, stride=1,
                                 frame_skip=2, max_clips=5)
        assert len(clips) == 5


class TestFeedBuffering:
    def test_large_buffer(self):
        from h36x.parallel.feed import prefetch_to_device

        batches = [(np.full((2,), i, np.float32),) for i in range(20)]
        out = list(prefetch_to_device(iter(batches), buffer_size=8))
        assert [int(b[0][0]) for b in out] == list(range(20))

    def test_empty_iterator(self):
        from h36x.parallel.feed import prefetch_to_device

        assert list(prefetch_to_device(iter([]))) == []


class TestCheckpointManifest:
    def test_manifest_readable_standalone(self, tmp_path):
        import json

        import jax
        import jax.numpy as jnp

        from h36x.models.phd import PHDFor3DJoints
        from h36x.train import checkpoint as ckpt
        from h36x.train.state import create_train_state, make_optimizer

        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1)
        optimizer, _ = make_optimizer(lr=1e-3)
        state = create_train_state(model, optimizer, jax.random.key(0),
                                   jnp.zeros((1, 4, 32)))
        ckpt.save_checkpoint(tmp_path, "last", state, epoch=7, best_val=0.5,
                             config={"optim": {"lr": 1e-3}})
        with open(tmp_path / "last.json") as f:
            manifest = json.load(f)
        assert manifest["epoch"] == 7
        assert manifest["step"] == 0
        assert manifest["config"]["optim"]["lr"] == 1e-3

    def test_missing_manifest_degrades_not_crashes(self, tmp_path, capsys):
        """A msgpack without <name>.json (crash between blob write and
        manifest write, or a hand-copied artifact) restores the params
        with neutral counters instead of FileNotFoundError."""
        import jax
        import jax.numpy as jnp

        from h36x.models.phd import PHDFor3DJoints
        from h36x.train import checkpoint as ckpt
        from h36x.train.state import create_train_state, make_optimizer

        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1)
        optimizer, _ = make_optimizer(lr=1e-3)
        state = create_train_state(model, optimizer, jax.random.key(0),
                                   jnp.zeros((1, 4, 32)))
        ckpt.save_checkpoint(tmp_path, "last", state, epoch=7, best_val=0.5,
                             config={})
        (tmp_path / "last.json").unlink()  # simulate the crash window
        restored, manifest = ckpt.load_checkpoint(tmp_path, "last", state)
        # epoch records "last epoch COMPLETED" (fit resumes at epoch+1), so
        # the neutral restart value is -1: epoch 0 must run, not be skipped
        assert manifest["manifest_missing"] and manifest["epoch"] == -1
        assert "no manifest" in capsys.readouterr().out
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_msgpack_manifest_refuses_stale_orbax_dir(self, tmp_path):
        """A manifest recording backend=msgpack whose .msgpack is missing
        must raise, not fall through to a legacy orbax <name>/ dir from an
        older run (old params would pair with the newer manifest)."""
        import jax
        import jax.numpy as jnp
        import pytest

        from h36x.models.phd import PHDFor3DJoints
        from h36x.train import checkpoint as ckpt
        from h36x.train.state import create_train_state, make_optimizer

        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1)
        optimizer, _ = make_optimizer(lr=1e-3)
        state = create_train_state(model, optimizer, jax.random.key(0),
                                   jnp.zeros((1, 4, 32)))
        ckpt.save_checkpoint(tmp_path, "last", state, epoch=3, best_val=0.5,
                             config={})
        (tmp_path / "last.msgpack").unlink()  # deleted / partial sync
        (tmp_path / "last").mkdir()  # stale legacy orbax layout
        with pytest.raises(FileNotFoundError, match="backend=msgpack"):
            ckpt.load_checkpoint(tmp_path, "last", state)

    def test_unknown_frozen_module_raises(self):
        """A typo'd/renamed PHASE_FROZEN prefix must fail loudly, not train
        the supposedly frozen weights."""
        import pytest

        from h36x.train.state import _freeze_labels

        params = {"f_AR": {"w": 0}, "f_movie": {"w": 0}}
        with pytest.raises(ValueError, match="f_ar"):
            _freeze_labels(params, ("f_ar",))


class TestFeatureStoreDtypes:
    def test_float16_store_reads_as_f32(self, tmp_path, rng):
        rows, t, f = 3, 4, 8
        arrays = {
            "feats": rng.normal(size=(rows, t, f)).astype(np.float16),
            "joints3d": rng.normal(size=(rows, t, 17, 3)).astype(np.float32),
            "joints2d": rng.normal(size=(rows, t, 17, 2)).astype(np.float32),
            "K": np.tile(np.eye(3, dtype=np.float32), (rows, 1, 1)),
        }
        meta = [{"subject": 1, "action": "A", "cam": "c", "start": 0,
                 "end": t, "aug": "orig"}] * rows
        shard_store.write_shard(shard_store.shard_path(tmp_path, 0), arrays, meta, 1)
        shard_store.write_index(
            tmp_path,
            [{"shard_id": 0, "row": r, "subject": 1, "action": "A",
              "cam": "c", "start": 0, "end": t} for r in range(rows)],
            n_shards=1, n_clips=rows, n_variants=1, aug_names=["orig"],
            seq_len=t, frame_skip=2, feat_dtype="float16",
        )
        ds = FeatureClipDataset(tmp_path)
        feats, *_ = ds[1]
        assert feats.dtype == np.float32
        np.testing.assert_allclose(feats, arrays["feats"][1].astype(np.float32))
        batch = ds.get_batch([0, 2])
        assert batch[0].dtype == np.float32


_KILL_CHILD_SRC = '''
"""Fault-injection child: save orbax checkpoints in a tight loop until
SIGKILLed (tests/test_robustness.py::TestSigkillDuringOrbaxSave)."""
import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")  # env vars do not beat the plugin

import numpy as np

from h36x.train.checkpoint import save_checkpoint_orbax
from h36x.train.state import TrainState

outdir = Path(sys.argv[1])
n = int(sys.argv[2])
start = 0
mpath = outdir / "last.json"
if mpath.exists():  # resume where the previous (killed) process stopped
    start = json.loads(mpath.read_text())["epoch"] + 1
e = start
while True:
    state = TrainState(
        params={"w": np.full((n,), float(e), np.float32)},
        opt_state={"m": np.full((n,), -float(e), np.float32)},
        step=np.asarray(e, np.int32),
    )
    save_checkpoint_orbax(outdir, "last", state, epoch=e, best_val=float(e))
    print(f"SAVED {e}", flush=True)
    e += 1
'''


class TestSigkillDuringOrbaxSave:
    """True fault injection for the orbax slot scheme: SIGKILL a process
    that is saving checkpoints back-to-back, at a random point, three times
    in a row (each round resumes the epoch counter from the survivor
    manifest). Invariant under ANY kill point: load_checkpoint succeeds and
    the restored params/opt_state/manifest all describe the SAME committed
    epoch — i.e. the manifest pointer only ever names an intact slot.
    Rounds 2-3 also exercise the slot-counter reseeding: if a fresh process
    targeted the live slot, its first save would rmtree the only good
    checkpoint and a kill mid-save would leave a dangling manifest."""

    N = 1_000_000  # 4 MB per leaf: saves take real time, kills land mid-save

    def test_kill_resume_kill(self, tmp_path):
        import os
        import signal
        import subprocess
        import sys as _sys
        import time

        import numpy as np

        from h36x.train.checkpoint import load_checkpoint
        from h36x.train.state import TrainState

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        child = tmp_path / "kill_child.py"
        child.write_text(_KILL_CHILD_SRC)
        outdir = tmp_path / "ckpt"
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env.pop("XLA_FLAGS", None)

        template = TrainState(
            params={"w": np.zeros((self.N,), np.float32)},
            opt_state={"m": np.zeros((self.N,), np.float32)},
            step=np.asarray(0, np.int32),
        )
        rng = np.random.default_rng(0)
        last_epoch = -1
        for rnd in range(3):
            proc = subprocess.Popen(
                [_sys.executable, str(child), str(outdir), str(self.N)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            try:
                # wait for >= 2 commits this round, then strike at random;
                # the merged stderr also carries absl warnings (orbax
                # removing the previous kill's unfinalized tmp dir), so
                # count SAVED lines rather than asserting on each line
                saves = 0
                while saves < 2:
                    line = proc.stdout.readline()
                    assert line != "", "child exited before committing twice"
                    if line.startswith("SAVED"):
                        saves += 1
                time.sleep(float(rng.uniform(0.0, 0.5)))
            finally:
                proc.send_signal(signal.SIGKILL)
                proc.wait(timeout=30)

            state, manifest = load_checkpoint(outdir, "last", template)
            e = manifest["epoch"]
            assert e >= last_epoch + 2  # this round's commits are visible
            last_epoch = e
            assert manifest["best_val"] == float(e)
            assert manifest["backend"] == "orbax"
            assert (outdir / manifest["dir"]).is_dir()
            # params, opt_state and step must all come from epoch e's save
            assert float(np.asarray(state.params["w"])[0]) == float(e)
            assert float(np.asarray(state.opt_state["m"])[0]) == -float(e)
            assert int(np.asarray(state.step)) == e


class TestCheckpointIntegrity:
    """save_checkpoint records sha256/nbytes of the msgpack blob; doctor
    --ckpt recomputes them, so blob corruption or a blob/manifest mispair
    is one command to diagnose instead of a resume-time stack trace."""

    def _save(self, tmp_path):
        import jax.numpy as jnp

        from h36x.train.checkpoint import save_checkpoint
        from h36x.train.state import TrainState

        state = TrainState(params={"w": np.arange(64, dtype=np.float32)},
                           opt_state={"m": np.zeros(64, np.float32)},
                           step=jnp.asarray(7, jnp.int32))
        save_checkpoint(tmp_path, "last", state, epoch=3, best_val=0.5)
        return tmp_path / "last.msgpack"

    def test_doctor_verifies_clean_checkpoint(self, tmp_path, capsys):
        from h36x.cli.doctor import main as doctor_main

        path = self._save(tmp_path)
        doctor_main(["--ckpt", str(path)])
        out = capsys.readouterr().out
        assert "sha256 verified" in out

    def test_doctor_catches_corrupted_blob(self, tmp_path, capsys):
        import pytest

        from h36x.cli.doctor import main as doctor_main

        path = self._save(tmp_path)
        blob = bytearray(path.read_bytes())
        blob[len(blob) // 2] ^= 0x01
        path.write_bytes(blob)
        with pytest.raises(SystemExit, match="problems"):
            doctor_main(["--ckpt", str(path)])
        assert "sha256 mismatch" in capsys.readouterr().out

    def test_doctor_catches_truncation(self, tmp_path, capsys):
        import pytest

        from h36x.cli.doctor import main as doctor_main

        path = self._save(tmp_path)
        path.write_bytes(path.read_bytes()[:-16])
        with pytest.raises(SystemExit, match="problems"):
            doctor_main(["--ckpt", str(path)])
        assert "size mismatch" in capsys.readouterr().out

    def test_legacy_manifest_without_hash_still_ok(self, tmp_path, capsys):
        import json

        from h36x.cli.doctor import main as doctor_main

        path = self._save(tmp_path)
        man = tmp_path / "last.json"
        rec = json.loads(man.read_text())
        rec.pop("sha256")
        rec.pop("nbytes")
        man.write_text(json.dumps(rec))
        doctor_main(["--ckpt", str(path)])
        assert "sha256" not in capsys.readouterr().out
