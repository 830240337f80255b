"""Serving: AR rollout semantics and the streaming predictor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h36x.infer import _regressor, _temporal_net
from h36x.models.phd import PHDFor3DJoints
from h36x.serve import StreamingPredictor, make_rollout_fn


@pytest.fixture(scope="module")
def setup():
    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1,
                           groups=8)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 10, 32)).astype(np.float32)
    params = jax.device_get(
        model.init(jax.random.key(0), jnp.asarray(feats))["params"]
    )
    return model, params, feats


class TestRollout:
    def test_context_joints_match_model(self, setup):
        model, params, feats = setup
        rollout = make_rollout_fn(steps=3, groups=8)
        ctx, fut = rollout(params, jnp.asarray(feats))
        want = model.apply({"params": params}, jnp.asarray(feats))[2]
        np.testing.assert_allclose(np.asarray(ctx), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
        assert fut.shape == (2, 3, 17, 3)

    def test_one_step_matches_phi_hat_semantics(self, setup):
        """Rollout step 0 must decode f_AR(phi)[:, -1] — the model's
        next-strip prediction extended one step past the window."""
        model, params, feats = setup
        rollout = make_rollout_fn(steps=1, groups=8)
        _, fut = rollout(params, jnp.asarray(feats))

        x = jnp.asarray(feats) @ params["input_proj"]["kernel"] + params["input_proj"]["bias"]
        phi = _temporal_net(x, params["f_movie"], 8, False, False, 256)
        ar = _temporal_net(phi, params["f_AR"], 8, False, False, 256)
        want = _regressor(ar[:, -1:], params["f_3D"], 17, False, False)
        np.testing.assert_allclose(np.asarray(fut), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_multi_step_prefix_consistency(self, setup):
        """Earlier rollout frames must not change when rolling out further
        (causality of the AR extension)."""
        _, params, feats = setup
        _, fut2 = make_rollout_fn(steps=2, groups=8)(params, jnp.asarray(feats))
        _, fut5 = make_rollout_fn(steps=5, groups=8)(params, jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(fut5[:, :2]), np.asarray(fut2),
                                   rtol=1e-4, atol=1e-5)

    def test_future_depends_on_context(self, setup):
        _, params, feats = setup
        rollout = make_rollout_fn(steps=2, groups=8)
        _, a = rollout(params, jnp.asarray(feats))
        _, b = rollout(params, jnp.asarray(feats + 1.0))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestStreaming:
    def test_warm_window_matches_batch_forward(self, setup):
        model, params, feats = setup
        window = 10
        sp = StreamingPredictor(params, window=window, feature_dim=32, groups=8)
        last = None
        for t in range(window):
            last = sp.push(feats[0, t])
        assert sp.warm
        want = np.asarray(
            model.apply({"params": params}, jnp.asarray(feats[:1]))[2]
        )[0, -1]
        np.testing.assert_allclose(last, want, rtol=1e-4, atol=1e-5)

    def test_cold_start_edge_semantics(self, setup):
        """First push fills the window with the first frame — the prediction
        equals a batch forward over a constant window."""
        model, params, feats = setup
        sp = StreamingPredictor(params, window=10, feature_dim=32, groups=8)
        first = sp.push(feats[0, 0])
        const = np.broadcast_to(feats[0, 0], (1, 10, 32))
        want = np.asarray(
            model.apply({"params": params}, jnp.asarray(const.copy()))[2]
        )[0, -1]
        np.testing.assert_allclose(first, want, rtol=1e-4, atol=1e-5)

    def test_forecast_shape_and_determinism(self, setup):
        _, params, feats = setup
        sp = StreamingPredictor(params, window=10, feature_dim=32, groups=8)
        for t in range(10):
            sp.push(feats[0, t])
        f1 = sp.forecast(4)
        f2 = sp.forecast(4)
        assert f1.shape == (4, 17, 3)
        np.testing.assert_array_equal(f1, f2)

    def test_forecast_before_push_raises(self, setup):
        _, params, _ = setup
        sp = StreamingPredictor(params, window=10, feature_dim=32, groups=8)
        with pytest.raises(RuntimeError):
            sp.forecast(2)
