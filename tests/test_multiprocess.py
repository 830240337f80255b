"""TRUE multi-process SPMD: 2 Python processes x 2 virtual CPU devices,
jax.distributed + gloo CPU collectives (the multi-host code path a TPU pod
takes, with gloo standing in for DCN — SURVEY.md §5 comm backend).

Unlike tests/test_parallel.py (single-process simulation of the same
shardings), this actually crosses a process boundary: each worker owns only
its local_batch_slice rows, builds the global array with
make_global_batch, and the gradient reduction's final hop rides the
inter-process collective. The result must match a single-process run of the
identical steps.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same 3 steps, unsharded, in this (8-device conftest) process."""
    import jax
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.state import create_train_state, make_optimizer
    from h36x.train.step import make_train_step

    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1,
                           dropout=0.0)
    optimizer, _ = make_optimizer(lr=1e-3, freeze_ar=True)
    state = create_train_state(model, optimizer, jax.random.key(0),
                               jnp.zeros((2, 6, 32)))
    step = make_train_step(model, optimizer, donate=False)

    losses = []
    for i in range(3):
        rng = np.random.default_rng(i)
        batch = tuple(jnp.asarray(x) for x in (
            rng.normal(size=(8, 6, 32)).astype(np.float32),
            (rng.normal(size=(8, 6, 17, 3)) * 0.1).astype(np.float32),
            rng.normal(size=(8, 6, 17, 2)).astype(np.float32),
            np.tile(np.eye(3, dtype=np.float32), (8, 1, 1)),
        ))
        state, metrics = step(state, batch, jax.random.key(3))
        losses.append(float(metrics["loss"]))

    # same trailing scan_steps=2 grouped dispatch as the workers
    from h36x.train.step import make_train_step as _mts

    mstep = _mts(model, optimizer, donate=False, scan_steps=2)

    def synth(seed):
        r = np.random.default_rng(seed)
        return (
            r.normal(size=(8, 6, 32)).astype(np.float32),
            (r.normal(size=(8, 6, 17, 3)) * 0.1).astype(np.float32),
            r.normal(size=(8, 6, 17, 2)).astype(np.float32),
            np.tile(np.eye(3, dtype=np.float32), (8, 1, 1)),
        )

    stacked = tuple(jnp.asarray(np.stack([a, b]))
                    for a, b in zip(synth(100), synth(101)))
    state, mm, _ = mstep(state, stacked, jax.random.key(9))
    scan_losses = [float(v) for v in jax.device_get(mm["loss"])]
    checksum = float(
        sum(float(jnp.sum(jnp.abs(p))) for p in
            jax.tree.leaves(jax.device_get(state.params)))
    )
    return losses, scan_losses, checksum


def _run_train_cli(outdir, store, dist_flags, port=None, timeout=600):
    """Launch `python -m h36x.cli.train` subprocess(es) on the tiny store."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    common = [
        sys.executable, "-m", "h36x.cli.train",
        "--train-root", str(store),
        "--outdir", str(outdir),
        "--train-subjects", "1",
        "--val-subjects", "9",
        "--optim.epochs", "2",
        "--optim.batch-size", "8",
        "--optim.log-every", "0",
        "--model.feature-dim", "32",
        "--model.latent-dim", "64",
        "--model.num-blocks", "1",
        "--model.dropout", "0.0",
        "--data.seq-len", "8",
    ]
    procs = [
        subprocess.Popen(common + flags, env=env, cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for flags in dist_flags
    ]
    logs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"train CLI failed:\n{log[-4000:]}"
    return logs


def _params_checksums(msgpack_path):
    """Leaf-name -> |sum| map restored without a template."""
    from flax import serialization

    tree = serialization.msgpack_restore(msgpack_path.read_bytes())
    leaves, _ = jax.tree_util.tree_flatten_with_path(tree["params"])
    return {jax.tree_util.keystr(k): float(np.sum(np.abs(v)))
            for k, v in leaves}


def test_train_cli_two_processes_matches_single(tmp_path):
    """End-to-end `h36x-train --dist.*`: 2 processes x 2 CPU devices with
    gloo collectives must produce the same metrics.jsonl and final params
    as one process with the same 4-device world (same global batches, same
    seeds; only the process boundary differs)."""
    store = tmp_path / "store"
    store.mkdir()
    from tests.helpers import make_synthetic_store

    make_synthetic_store(store, n_shards=2, clips_per_shard=8, n_vars=4,
                         seq_len=8, feat_dim=32, subjects=(1, 9))

    sp_out = tmp_path / "sp"
    _run_train_cli(sp_out, store, [[
        "--dist.platform", "cpu", "--dist.local-devices", "4",
    ]])

    port = _free_port()
    mp_out = tmp_path / "mp"
    # --mesh.slices 2 puts each process's 2 devices on one slice of a
    # (slice=2, data=2, model=1) mesh — the multislice (DCN) topology with
    # the slice axis spanning the process boundary. Batch rows shard over
    # slice x data = all 4 devices, so the numbers must STILL match the
    # plain 4-device DP run (multislice changes the collective routing,
    # not the math).
    logs = _run_train_cli(mp_out, store, [
        ["--dist.platform", "cpu", "--dist.local-devices", "2",
         "--dist.collectives", "gloo", "--dist.num-processes", "2",
         "--dist.coordinator", f"localhost:{port}",
         "--dist.process-id", str(pid),
         "--mesh.slices", "2"]
        for pid in range(2)
    ], timeout=900)
    # rank 0 logs, rank 1 stays quiet
    assert "Phase-1 training" in logs[0]
    assert "Phase-1 training" not in logs[1]
    assert "global devices: 4" in logs[0]

    sp_rows = [json.loads(l) for l in
               (sp_out / "metrics.jsonl").read_text().splitlines()]
    mp_rows = [json.loads(l) for l in
               (mp_out / "metrics.jsonl").read_text().splitlines()]
    assert len(sp_rows) == len(mp_rows) == 2
    for want, got in zip(sp_rows, mp_rows):
        for key in ("train_loss", "train_mpjpe", "val_loss", "val_mpjpe"):
            np.testing.assert_allclose(got[key], want[key], rtol=1e-4,
                                       err_msg=key)

    want = _params_checksums(sp_out / "last.msgpack")
    got = _params_checksums(mp_out / "last.msgpack")
    assert want.keys() == got.keys()
    for name in want:
        np.testing.assert_allclose(got[name], want[name], rtol=1e-4,
                                   err_msg=name)


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "mp_result.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers pin their own platform/device count via jax.config
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", str(out)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    assert all(f"mp_worker {i}/2 ok" in logs[i] for i in range(2))

    got = json.loads(out.read_text())
    assert got["devices"] == 4

    want_losses, want_scan, want_checksum = _single_process_reference()
    np.testing.assert_allclose(got["losses"], want_losses, rtol=1e-5)
    np.testing.assert_allclose(got["scan_losses"], want_scan, rtol=1e-5)
    np.testing.assert_allclose(got["checksum"], want_checksum, rtol=1e-4)


def test_two_process_resume_matches_straight_run(tmp_path):
    """Preemption transparency holds across the process boundary: a
    2-process run bounded to 2 of 3 epochs (--optim.stop-after-epochs)
    and resumed by a FRESH pair of processes must reproduce the straight
    2-process 3-epoch run's final params exactly — rank-0 writes the
    checkpoint, both ranks restore it, and the per-epoch rng / sampler /
    cosine schedule all key off the absolute epoch."""
    store = tmp_path / "store"
    store.mkdir()
    from tests.helpers import make_synthetic_store

    make_synthetic_store(store, n_shards=2, clips_per_shard=8, n_vars=4,
                         seq_len=8, feat_dim=32, subjects=(1, 9))

    def dist_flags(port, extra):
        return [
            ["--dist.platform", "cpu", "--dist.local-devices", "2",
             "--dist.collectives", "gloo", "--dist.num-processes", "2",
             "--dist.coordinator", f"localhost:{port}",
             "--dist.process-id", str(pid)] + extra
            for pid in range(2)
        ]

    straight = tmp_path / "straight"
    _run_train_cli(straight, store,
                   dist_flags(_free_port(), ["--optim.epochs", "3"]),
                   timeout=900)

    legs = tmp_path / "legs"
    _run_train_cli(legs, store,
                   dist_flags(_free_port(), ["--optim.epochs", "3",
                                             "--optim.stop-after-epochs",
                                             "2"]),
                   timeout=900)
    logs = _run_train_cli(legs, store,
                          dist_flags(_free_port(), ["--optim.epochs", "3",
                                                    "--resume", str(legs)]),
                          timeout=900)
    assert "Resumed" in logs[0]

    want = _params_checksums(straight / "last.msgpack")
    got = _params_checksums(legs / "last.msgpack")
    assert want.keys() == got.keys()
    for name in want:
        # gloo all-reduce order is fixed for a fixed topology, so the
        # resumed run reproduces the straight run's sums exactly
        np.testing.assert_array_equal(got[name], want[name], err_msg=name)

    s_rows = [json.loads(l) for l in
              (straight / "metrics.jsonl").read_text().splitlines()]
    l_rows = [json.loads(l) for l in
              (legs / "metrics.jsonl").read_text().splitlines()]
    assert [r["epoch"] for r in s_rows] == [0, 1, 2]
    assert [r["epoch"] for r in l_rows] == [0, 1, 2]
    for want_r, got_r in zip(s_rows, l_rows):
        np.testing.assert_array_equal(got_r["val_mpjpe"], want_r["val_mpjpe"])
