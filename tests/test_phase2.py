"""Phase-2 (AR predictor) training: freezing, curriculum, loss masking,
and the distributed/profiling helpers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h36x.models.phd import PHDFor3DJoints
from h36x.train.state import PHASE_FROZEN, create_train_state, make_optimizer
from h36x.train.step import curriculum_horizon, make_future_train_step


@pytest.fixture(scope="module")
def setup():
    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1,
                           dropout=0.0)
    optimizer, frozen = make_optimizer(lr=1e-3, phase=2)
    state = create_train_state(model, optimizer, jax.random.key(0),
                               jnp.zeros((2, 20, 32)))
    return model, optimizer, state, frozen


def batch(rng, b=4, t=20, f=32):
    return (
        jnp.asarray(rng.normal(size=(b, t, f)).astype(np.float32)),
        jnp.asarray((rng.normal(size=(b, t, 17, 3)) * 0.1).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, t, 17, 2)).astype(np.float32)),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))),
    )


class TestCurriculum:
    def test_schedule(self):
        assert curriculum_horizon(0, 25, 25) == 1
        assert curriculum_horizon(12, 25, 25) == 13
        assert curriculum_horizon(25, 25, 25) == 25
        assert curriculum_horizon(100, 25, 25) == 25
        assert curriculum_horizon(0, 25, 0) == 25

    def test_phase_tables(self):
        assert PHASE_FROZEN[1] == ("f_AR",)
        assert set(PHASE_FROZEN[2]) == {"f_movie", "f_3D", "input_proj"}


class TestPhase2Step:
    def test_only_far_updates(self, setup, rng):
        model, optimizer, state, frozen = setup
        step = make_future_train_step(model, optimizer, input_len=5,
                                      pred_len=10, donate=False)
        b = batch(rng)
        s2, metrics = step(state, b, jax.random.key(1), jnp.int32(5))
        assert np.isfinite(float(metrics["loss"]))

        for mod in ("f_movie", "f_3D", "input_proj"):
            for a, c in zip(jax.tree.leaves(jax.device_get(state.params[mod])),
                            jax.tree.leaves(jax.device_get(s2.params[mod]))):
                np.testing.assert_array_equal(a, c)
        changed = any(
            not np.allclose(a, c)
            for a, c in zip(jax.tree.leaves(jax.device_get(state.params["f_AR"])),
                            jax.tree.leaves(jax.device_get(s2.params["f_AR"])))
        )
        assert changed

    def test_lambda_joints_zero_ignores_joint_gt(self, setup, rng):
        """--optim.lambda-future weights the future-joint term: at 0 the
        loss is the AR term alone and the update is independent of the
        joint ground truth; at the default 1 it is not."""
        model, optimizer, state, _ = setup
        feats, j3d, j2d, K = batch(rng)
        j3d_b = j3d + 0.5  # a large joint-gt perturbation
        key, h = jax.random.key(3), jnp.int32(10)

        step0 = make_future_train_step(model, optimizer, input_len=5,
                                       pred_len=10, lambda_joints=0.0,
                                       donate=False)
        sa, ma = step0(state, (feats, j3d, j2d, K), key, h)
        sb, mb = step0(state, (feats, j3d_b, j2d, K), key, h)
        np.testing.assert_allclose(float(ma["loss"]), float(ma["l_ar"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=1e-6)
        for a, b in zip(jax.tree.leaves(jax.device_get(sa.params["f_AR"])),
                        jax.tree.leaves(jax.device_get(sb.params["f_AR"]))):
            np.testing.assert_array_equal(a, b)

        step1 = make_future_train_step(model, optimizer, input_len=5,
                                       pred_len=10, lambda_joints=1.0,
                                       donate=False)
        sc, mc = step1(state, (feats, j3d, j2d, K), key, h)
        sd, md = step1(state, (feats, j3d_b, j2d, K), key, h)
        assert abs(float(mc["loss"]) - float(md["loss"])) > 1e-4
        np.testing.assert_allclose(float(mc["loss"]),
                                   float(mc["l_ar"]) + float(mc["l3d"]),
                                   rtol=1e-5)
        assert any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(jax.device_get(sc.params["f_AR"])),
                            jax.tree.leaves(jax.device_get(sd.params["f_AR"])))
        )

    def test_loss_decreases(self, setup, rng):
        model, optimizer, state, _ = setup
        step = make_future_train_step(model, optimizer, input_len=5,
                                      pred_len=10, donate=False)
        b = batch(rng)
        losses = []
        key = jax.random.key(0)
        for _ in range(25):
            key, sub = jax.random.split(key)
            state, m = step(state, b, sub, jnp.int32(10))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_horizon_masks_loss(self, setup, rng):
        """With horizon h, frames beyond input_len+h contribute nothing:
        a gt perturbation outside the window leaves the loss unchanged."""
        model, optimizer, state, _ = setup
        step = make_future_train_step(model, optimizer, input_len=5,
                                      pred_len=10, donate=False)
        feats, j3d, j2d, K = batch(rng)
        h = jnp.int32(3)  # window = frames [5, 8)
        _, m1 = step(state, (feats, j3d, j2d, K), jax.random.key(1), h)
        j3d_mod = j3d.at[:, 10:].add(100.0)  # outside the window
        _, m2 = step(state, (feats, j3d_mod, j2d, K), jax.random.key(1), h)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
        j3d_in = j3d.at[:, 6].add(100.0)  # inside the window
        _, m3 = step(state, (feats, j3d_in, j2d, K), jax.random.key(1), h)
        assert float(m3["loss"]) != pytest.approx(float(m1["loss"]), rel=1e-3)


class TestDistributedHelpers:
    def test_weighted_future_eval_scores_the_ar_path(self, setup, rng):
        """The phase-2 eval step must respond to f_AR (the module phase 2
        trains); the plain eval step does not, which is exactly why it
        cannot drive phase-2 early stopping."""
        import jax

        from h36x.train.step import (
            make_weighted_eval_step,
            make_weighted_future_eval_step,
        )

        model, _, state, _ = setup
        b = batch(rng)
        w = jnp.ones(b[0].shape[0], jnp.float32)
        wb = (*b, w)

        fstep = make_weighted_future_eval_step(model, input_len=5, pred_len=10)
        base = fstep(state.params, wb)
        assert float(base["n"]) == b[0].shape[0]
        assert np.isfinite(float(base["loss"]))

        bumped = jax.tree.map(lambda x: x, state.params)
        bumped["f_AR"] = jax.tree.map(lambda x: x + 0.05, bumped["f_AR"])
        moved = fstep(bumped, wb)
        assert float(moved["mpjpe"]) != float(base["mpjpe"])

        # the plain (phase-1) eval metric is blind to the same change
        pstep = make_weighted_eval_step(model)
        np.testing.assert_allclose(
            float(pstep(bumped, wb)["mpjpe"]),
            float(pstep(state.params, wb)["mpjpe"]), rtol=1e-6)

        # padded rows with weight 0 contribute nothing
        w0 = w.at[-1].set(0.0)
        part = fstep(state.params, (*b, w0))
        assert float(part["n"]) == b[0].shape[0] - 1

    def test_grouped_dispatch_modes(self, setup, rng):
        """Phase-2 gets the same scan/accum grouped modes as phase 1:
        scan reproduces sequential steps; accum applies one update."""
        model, optimizer, state, _ = setup
        h = jnp.int32(5)
        batches = [batch(rng) for _ in range(2)]
        stacked = tuple(jnp.stack(xs) for xs in zip(*batches))

        step = make_future_train_step(model, optimizer, input_len=5,
                                      pred_len=10, donate=False)
        s1, key = state, jax.random.key(3)
        for b in batches:
            key, sub = jax.random.split(key)
            s1, m1 = step(s1, b, sub, h)

        mstep = make_future_train_step(model, optimizer, input_len=5,
                                       pred_len=10, donate=False,
                                       scan_steps=2)
        s2, metrics, _ = mstep(state, stacked, jax.random.key(3), h)
        assert metrics["loss"].shape == (2,)
        np.testing.assert_allclose(float(metrics["loss"][-1]),
                                   float(m1["loss"]), rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-5, atol=1e-7)

        astep = make_future_train_step(model, optimizer, input_len=5,
                                       pred_len=10, donate=False,
                                       accum_steps=2)
        s3, m3, _ = astep(state, stacked, jax.random.key(3), h)
        assert int(s3.step) == int(state.step) + 1
        assert np.all(np.isfinite(np.asarray(m3["loss"])))

    def test_local_batch_slice(self):
        from h36x.parallel.distributed import local_batch_slice

        s = local_batch_slice(32, process_id=1, process_count=4)
        assert (s.start, s.stop) == (8, 16)
        with pytest.raises(ValueError):
            local_batch_slice(30, process_id=0, process_count=4)

    def test_make_global_batch_single_host(self, rng):
        from h36x.parallel.distributed import make_global_batch
        from h36x.parallel.mesh import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh()
        local = {"x": rng.normal(size=(16, 4)).astype(np.float32)}
        out = make_global_batch(local, mesh, global_batch=16)
        assert out["x"].shape == (16, 4)
        np.testing.assert_allclose(np.asarray(out["x"]), local["x"], rtol=1e-6)


class TestProfilingHooks:
    def test_maybe_trace_noop(self):
        from h36x.utils.profiling import maybe_trace

        with maybe_trace(None):
            pass

    def test_trace_writes(self, tmp_path):
        from h36x.utils.profiling import maybe_trace, step_annotation

        with maybe_trace(str(tmp_path)):
            with step_annotation("unit-test-step"):
                jnp.ones((4, 4)).sum().block_until_ready()
        assert any(tmp_path.rglob("*")), "no trace files written"
