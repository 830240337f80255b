"""Golden phase-2 trajectory: freeze the h36x-defined AR training semantics.

Phase 1 has f64 torch-oracle parity (tests/test_trajectory_parity.py); phase 2
has no reference to compare against — the reference never trains f_AR
(/root/reference/src/model.py:133-137 defines it, src/train.py never optimizes
it; config.py INPUT_LEN/PRED_LEN/CURRICULUM_STEPS are dead). So the phase-2
semantics are h36x-defined and guarded here the way extraction bytes are
pinned: a committed golden loss/metric trajectory plus a parameter
fingerprint, making future refactors of make_future_train_step /
make_weighted_future_eval_step provably behavior-preserving.

Regenerate ONLY when a semantic change is intended:
    python -m tests.test_phase2_golden regen
"""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp

from h36x.models.phd import PHDFor3DJoints
from h36x.train.state import create_train_state, make_optimizer
from h36x.train.step import (
    curriculum_horizon,
    make_future_train_step,
    make_weighted_future_eval_step,
)

GOLDEN = pathlib.Path(__file__).parent / "golden"
N_STEPS = 8


def _param_fingerprint(params):
    """Order-stable per-leaf summary: (mean, std, absmax) per leaf, flattened.

    Far more diagnostic than a single checksum — a regression points at the
    leaf that moved — while staying tiny on disk.
    """
    rows = []
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(params)[0],
        key=lambda kv: jax.tree_util.keystr(kv[0]),
    ):
        x = np.asarray(leaf, np.float64)
        rows.append([x.mean(), x.std(), np.abs(x).max()])
    return np.asarray(rows, np.float64)


def _run_trajectory():
    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1,
                           dropout=0.0)
    optimizer, _ = make_optimizer(lr=1e-3, phase=2)
    state = create_train_state(model, optimizer, jax.random.key(20260819),
                               jnp.zeros((2, 20, 32)))

    rng = np.random.default_rng(20260819)
    feats = jnp.asarray(rng.normal(size=(4, 20, 32)).astype(np.float32))
    j3d = jnp.asarray((rng.normal(size=(4, 20, 17, 3)) * 0.1).astype(np.float32))
    j2d = jnp.asarray(rng.normal(size=(4, 20, 17, 2)).astype(np.float32))
    K = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (4, 1, 1)))
    batch = (feats, j3d, j2d, K)

    step = make_future_train_step(model, optimizer, input_len=5, pred_len=10,
                                  donate=False)
    traj = {k: [] for k in ("loss", "l_ar", "l3d", "mpjpe")}
    key = jax.random.key(7)
    for i in range(N_STEPS):
        # exercise the curriculum: horizon grows across the trajectory
        h = jnp.int32(curriculum_horizon(i, pred_len=10, steps=4))
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub, h)
        for k in traj:
            traj[k].append(float(m[k]))

    eval_step = make_weighted_future_eval_step(model, input_len=5, pred_len=10)
    w = jnp.ones((4,), jnp.float32).at[-1].set(0.0)  # pinned: padded row drops
    em = eval_step(state.params, (feats, j3d, j2d, K, w))

    out = {k: np.asarray(v, np.float64) for k, v in traj.items()}
    out["eval"] = np.asarray(
        [float(em["loss"]), float(em["l3d"]), float(em["mpjpe"]),
         float(em["bone"]), float(em["n"])], np.float64)
    out["fingerprint"] = _param_fingerprint(jax.device_get(state.params))
    return out


def test_phase2_golden_trajectory():
    path = GOLDEN / "phase2_traj_v1.npz"
    assert path.exists(), (
        "golden fixture missing; run `python -m tests.test_phase2_golden regen`")
    golden = np.load(path)
    got = _run_trajectory()
    assert set(golden.files) == set(got)
    for key in golden.files:
        np.testing.assert_allclose(
            got[key], golden[key], rtol=2e-4, atol=1e-7,
            err_msg=f"phase-2 semantic drift in '{key}' — if intended, "
                    "regenerate via `python -m tests.test_phase2_golden regen`")


def test_trajectory_is_nontrivial():
    """Guard the guard: the pinned trajectory must actually train (loss falls
    across the curriculum) and the fingerprint must cover every param leaf."""
    golden = np.load(GOLDEN / "phase2_traj_v1.npz")
    loss = golden["loss"]
    assert loss[-1] < loss[0]
    assert np.all(np.isfinite(loss))
    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 20, 32)))["params"]
    n_leaves = len(jax.tree.leaves(params))
    assert golden["fingerprint"].shape == (n_leaves, 3)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        # match the platform the suite runs on (conftest forces CPU); the
        # axon sitecustomize registers the TPU plugin, so update in-process
        jax.config.update("jax_platforms", "cpu")
        GOLDEN.mkdir(exist_ok=True)
        out = _run_trajectory()
        np.savez(GOLDEN / "phase2_traj_v1.npz", **out)
        print("wrote", GOLDEN / "phase2_traj_v1.npz")
        for k, v in out.items():
            print(f"  {k}: shape={v.shape}")
    else:
        print("usage: python -m tests.test_phase2_golden regen")
