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


def _frozen_oracle_forward(params, window_feats, freeze_feats, groups, eps=1e-5):
    """Independent torch-free oracle: full forward over `window_feats` with
    each GroupNorm using statistics computed from the `freeze_feats` window
    (the frozen-stats model). Plain numpy, built from the model definition —
    not from h36x.serve internals."""
    def proj(f):
        return f @ np.asarray(params["input_proj"]["kernel"]) + np.asarray(
            params["input_proj"]["bias"])

    def gn_stats(x, g):
        t, d = x.shape
        xg = x.reshape(t, g, d // g)
        mu = xg.mean(axis=(0, 2))
        var = ((xg - mu[None, :, None]) ** 2).mean(axis=(0, 2))
        return mu, 1.0 / np.sqrt(var + eps)

    def gn_apply(x, mu, rstd, scale, bias, g):
        d = x.shape[-1]
        rep = d // g
        xn = (x - np.repeat(mu, rep)) * np.repeat(rstd, rep)
        return np.maximum(xn * np.asarray(scale) + np.asarray(bias), 0.0)

    def cconv(x, kern, bias):
        k = kern.shape[0]
        xp = np.concatenate([np.repeat(x[:1], k - 1, axis=0), x], axis=0)
        t = x.shape[0]
        out = np.zeros((t, kern.shape[2]), dtype=np.float64)
        for i in range(k):
            out += xp[i:i + t] @ np.asarray(kern[i], dtype=np.float64)
        return out + np.asarray(bias)

    # stats come from the freeze-time window; activations from the current one
    xs = proj(freeze_feats).astype(np.float64)
    x = proj(window_feats).astype(np.float64)
    names = sorted(params["f_movie"], key=lambda n: int(n.removeprefix("block")))
    for name in names:
        p = params["f_movie"][name]
        mu1, r1 = gn_stats(xs, groups)
        hs = gn_apply(xs, mu1, r1, p["gn1"]["scale"], p["gn1"]["bias"], groups)
        c1s = cconv(hs, np.asarray(p["conv1"]["kernel"]), p["conv1"]["bias"])
        mu2, r2 = gn_stats(c1s, groups)

        h = gn_apply(x, mu1, r1, p["gn1"]["scale"], p["gn1"]["bias"], groups)
        c1 = cconv(h, np.asarray(p["conv1"]["kernel"]), p["conv1"]["bias"])
        g2 = gn_apply(c1, mu2, r2, p["gn2"]["scale"], p["gn2"]["bias"], groups)
        x = cconv(g2, np.asarray(p["conv2"]["kernel"]), p["conv2"]["bias"]) + x

        gs = gn_apply(c1s, mu2, r2, p["gn2"]["scale"], p["gn2"]["bias"], groups)
        xs = cconv(gs, np.asarray(p["conv2"]["kernel"]), p["conv2"]["bias"]) + xs

    # regressor on the last frame
    phi = x[-1]
    y = np.zeros(17 * 3)
    for _ in range(3):
        h = np.maximum(np.concatenate([phi, y]) @ np.asarray(
            params["f_3D"]["fc1"]["kernel"], dtype=np.float64
        ) + params["f_3D"]["fc1"]["bias"], 0.0)
        h = np.maximum(h @ np.asarray(params["f_3D"]["fc2"]["kernel"],
                                      dtype=np.float64)
                       + params["f_3D"]["fc2"]["bias"], 0.0)
        y = y + h @ np.asarray(params["f_3D"]["fc3"]["kernel"],
                               dtype=np.float64) + params["f_3D"]["fc3"]["bias"]
    return y.reshape(17, 3)


class TestFrozenStreaming:
    def test_freeze_with_kernel_size_one(self):
        """kernel_size=1 blocks have EMPTY tap history — the slice must be
        (0, D), not the whole window (-(K-1) == -0 pitfall)."""
        model = PHDFor3DJoints(latent_dim=32, feature_dim=16, number_blocks=1,
                               groups=4, kernel_size=1)
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(1, 6, 16)).astype(np.float32)
        params = jax.device_get(
            model.init(jax.random.key(0), jnp.asarray(feats))["params"]
        )
        sp = StreamingPredictor(params, window=6, feature_dim=16, groups=4)
        for t in range(6):
            sp.push(feats[0, t])
        sp.freeze()
        for st in sp._frozen[1].values():
            assert st["h"].shape[0] == 0 and st["g"].shape[0] == 0
        out = sp.push(rng.normal(size=(16,)).astype(np.float32))
        assert out.shape == (17, 3) and np.isfinite(out).all()

    def test_frozen_push_matches_frozen_stats_oracle(self, setup):
        """After freeze(), each O(1) push must equal a full-window forward of
        the frozen-stats model (GN statistics pinned at the freeze window,
        conv history = real frames). Window > receptive field so the oracle's
        left edge padding cannot reach the newest frame."""
        _, params, _ = setup
        rng = np.random.default_rng(5)
        window, extra = 12, 4
        stream = rng.normal(size=(window + extra, 32)).astype(np.float32)

        sp = StreamingPredictor(params, window=window, feature_dim=32, groups=8)
        for t in range(window):
            sp.push(stream[t])
        sp.freeze()
        assert sp.frozen

        for m in range(extra):
            got = sp.push(stream[window + m])
            cur = stream[m + 1: window + m + 1]
            want = _frozen_oracle_forward(
                params, cur, stream[:window], groups=8
            )
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_unfreeze_returns_to_exact(self, setup):
        model, params, feats = setup
        rng = np.random.default_rng(6)
        stream = rng.normal(size=(14, 32)).astype(np.float32)
        sp = StreamingPredictor(params, window=10, feature_dim=32, groups=8)
        for t in range(10):
            sp.push(stream[t])
        sp.freeze()
        sp.push(stream[10])
        sp.unfreeze()
        got = sp.push(stream[11])
        want = np.asarray(
            model.apply({"params": params},
                        jnp.asarray(stream[2:12][None]))[2]
        )[0, -1]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_frozen_step_flops_are_window_independent(self, setup):
        """The compiled frozen step must cost a small fraction of the exact
        (full-window) step — the point of the O(1) path. Uses a model whose
        regressor is proportionate (the module fixture's 1024-wide regressor
        would dominate both paths at latent=64 and mask the temporal-net
        savings being measured)."""
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=1,
                               groups=8, regressor_hidden=64)
        rng = np.random.default_rng(7)
        params = jax.device_get(
            model.init(jax.random.key(0), jnp.zeros((1, 8, 32)))["params"]
        )
        sp = StreamingPredictor(params, window=64, feature_dim=32, groups=8)
        sp.push(rng.normal(size=32).astype(np.float32))
        sp.freeze()
        stats, state = sp._frozen
        from h36x.serve import _frozen_step_jit, _step_jit

        feat = jnp.zeros(32, dtype=jnp.float32)
        statics = dict(groups=8, joints_num=17, use_pallas=False)
        full = _step_jit.lower(
            params, sp._xbuf, feat, **statics).compile().cost_analysis()
        froz = _frozen_step_jit.lower(
            params, sp._xbuf, stats, state, feat, **statics
        ).compile().cost_analysis()
        if not (full and froz and full.get("flops") and froz.get("flops")):
            pytest.skip("cost_analysis unavailable on this backend")
        assert froz["flops"] < full["flops"] / 5

    def test_freeze_before_push_raises(self, setup):
        _, params, _ = setup
        sp = StreamingPredictor(params, window=10, feature_dim=32, groups=8)
        with pytest.raises(RuntimeError):
            sp.freeze()

    def test_forecast_still_works_after_freeze(self, setup):
        _, params, feats = setup
        sp = StreamingPredictor(params, window=10, feature_dim=32, groups=8)
        for t in range(10):
            sp.push(feats[0, t])
        sp.freeze()
        sp.push(feats[1, 0])
        f = sp.forecast(3)
        assert f.shape == (3, 17, 3)
        assert np.all(np.isfinite(f))


class TestRegressorIters:
    """A non-default regressor_iters must flow through every serving
    entry point — the refinement count is a model hyperparameter, and a
    silent fallback to 3 would produce systematically wrong joints."""

    def test_threads_through_fused_forward_and_rollout(self):
        from h36x.infer import make_fused_forward

        model4 = PHDFor3DJoints(latent_dim=64, feature_dim=32,
                                number_blocks=1, groups=8, regressor_iters=4)
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(2, 10, 32)).astype(np.float32)
        params = jax.device_get(
            model4.init(jax.random.key(0), jnp.asarray(feats))["params"]
        )
        want = np.asarray(model4.apply({"params": params},
                                       jnp.asarray(feats))[2])

        got = np.asarray(make_fused_forward(
            groups=8, use_pallas=False, regressor_iters=4
        )(params, jnp.asarray(feats)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        # negative control: the (previously hard-wired) default of 3
        # rounds must NOT reproduce a 4-round model
        got3 = np.asarray(make_fused_forward(
            groups=8, use_pallas=False
        )(params, jnp.asarray(feats)))
        assert np.abs(got3 - want).max() > 1e-4

        ctx, _ = make_rollout_fn(steps=2, groups=8, regressor_iters=4)(
            params, jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(ctx), want,
                                   rtol=1e-4, atol=1e-5)

    def test_threads_through_streaming(self):
        model4 = PHDFor3DJoints(latent_dim=64, feature_dim=32,
                                number_blocks=1, groups=8, regressor_iters=4)
        rng = np.random.default_rng(2)
        feats = rng.normal(size=(1, 6, 32)).astype(np.float32)
        params = jax.device_get(
            model4.init(jax.random.key(0), jnp.asarray(feats))["params"]
        )
        want = np.asarray(model4.apply({"params": params},
                                       jnp.asarray(feats))[2])
        sp = StreamingPredictor(params, window=6, feature_dim=32, groups=8,
                                regressor_iters=4)
        for t in range(6):
            last = sp.push(feats[0, t])
        np.testing.assert_allclose(last, want[0, -1], rtol=1e-4, atol=1e-5)
