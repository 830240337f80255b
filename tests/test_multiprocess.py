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
    checksum = float(
        sum(float(jnp.sum(jnp.abs(p))) for p in
            jax.tree.leaves(jax.device_get(state.params)))
    )
    return losses, checksum


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

    want_losses, want_checksum = _single_process_reference()
    np.testing.assert_allclose(got["losses"], want_losses, rtol=1e-5)
    np.testing.assert_allclose(got["checksum"], want_checksum, rtol=1e-4)
