"""PHD model tests: shapes, causality, GroupNorm/conv semantics vs numpy
oracles, parameter counts, and the phi_hat shift.

Oracle functions re-derive the documented reference semantics
(reference src/model.py:18-178) independently in numpy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h36x.models.phd import (
    CausalConv1d,
    CausalTemporalNet,
    JointRegressor,
    PHDFor3DJoints,
)
from h36x.ops.causal_conv import causal_conv1d


def np_causal_conv(x, w, b):
    """Oracle: left edge-pad k-1, then valid conv. x (B,T,D), w (K,D,O)."""
    k = w.shape[0]
    xp = np.concatenate([np.repeat(x[:, :1], k - 1, axis=1), x], axis=1)
    B, T = x.shape[0], x.shape[1]
    out = np.zeros((B, T, w.shape[2]), dtype=np.float64)
    for t in range(T):
        for tap in range(k):
            out[:, t] += xp[:, t + tap] @ w[tap]
    return out + b


def np_groupnorm(x, groups, gamma, beta, eps=1e-5):
    """Oracle: per-sample stats over (time, channels-in-group). x (B,T,C)."""
    B, T, C = x.shape
    g = x.reshape(B, T, groups, C // groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    out = (g - mean) / np.sqrt(var + eps)
    return out.reshape(B, T, C) * gamma + beta


class TestCausalConvOp:
    def test_matches_numpy_oracle(self, rng):
        x = rng.normal(size=(2, 9, 16)).astype(np.float32)
        w = rng.normal(size=(3, 16, 8)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        got = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        want = np_causal_conv(x, w, b)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_causality(self, rng):
        """Changing a future frame must not change past outputs."""
        x = rng.normal(size=(1, 12, 32)).astype(np.float32)
        w = rng.normal(size=(3, 32, 32)).astype(np.float32)
        y1 = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w)))
        x2 = x.copy()
        x2[:, 7:] += 100.0
        y2 = np.asarray(causal_conv1d(jnp.asarray(x2), jnp.asarray(w)))
        np.testing.assert_allclose(y1[:, :7], y2[:, :7], rtol=1e-5)
        assert not np.allclose(y1[:, 7:], y2[:, 7:])

    def test_left_edge_padding_is_replicate(self, rng):
        """Output at t=0 must be the first frame fed through all taps
        (edge padding replicates x[0], not zeros)."""
        x = rng.normal(size=(1, 5, 4)).astype(np.float32)
        w = rng.normal(size=(3, 4, 4)).astype(np.float32)
        y = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w)))
        want0 = x[:, 0] @ (w[0] + w[1] + w[2])
        np.testing.assert_allclose(y[:, 0], want0, rtol=1e-4, atol=1e-5)

    def test_kernel_size_one(self, rng):
        x = rng.normal(size=(2, 6, 8)).astype(np.float32)
        w = rng.normal(size=(1, 8, 8)).astype(np.float32)
        y = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w)))
        np.testing.assert_allclose(y, x @ w[0], rtol=1e-4, atol=1e-5)


class TestModules:
    def test_causal_conv_module_shapes(self, rng):
        m = CausalConv1d(features=64)
        x = jnp.asarray(rng.normal(size=(2, 10, 32)), dtype=jnp.float32)
        params = m.init(jax.random.key(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 10, 64)
        assert params["params"]["kernel"].shape == (3, 32, 64)

    def test_temporal_net_groupnorm_matches_oracle(self, rng):
        """One block, weights forced to known values, vs numpy composition."""
        net = CausalTemporalNet(latent_dim=64, num_blocks=1, dropout=0.0)
        x = jnp.asarray(rng.normal(size=(2, 7, 64)), dtype=jnp.float32)
        variables = net.init(jax.random.key(0), x)
        p = variables["params"]["block0"]

        out = np.asarray(net.apply(variables, x))

        xn = np.asarray(x, dtype=np.float64)
        h = np_groupnorm(xn, 32, np.asarray(p["gn1"]["scale"]), np.asarray(p["gn1"]["bias"]))
        h = np.maximum(h, 0)
        h = np_causal_conv(h, np.asarray(p["conv1"]["kernel"]), np.asarray(p["conv1"]["bias"]))
        h = np_groupnorm(h, 32, np.asarray(p["gn2"]["scale"]), np.asarray(p["gn2"]["bias"]))
        h = np.maximum(h, 0)
        h = np_causal_conv(h, np.asarray(p["conv2"]["kernel"]), np.asarray(p["conv2"]["bias"]))
        want = h + xn
        np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-4)

    def test_regressor_zero_weights_outputs_zero(self, rng):
        """With all-zero MLP weights, y stays at the zero initial estimate."""
        reg = JointRegressor(latent_dim=32, joints_num=17)
        phi = jnp.asarray(rng.normal(size=(2, 5, 32)), dtype=jnp.float32)
        variables = reg.init(jax.random.key(0), phi)
        zeroed = jax.tree.map(jnp.zeros_like, variables)
        y = reg.apply(zeroed, phi)
        assert y.shape == (2, 5, 17, 3)
        np.testing.assert_array_equal(np.asarray(y), 0.0)

    def test_regressor_iterative_refinement(self, rng):
        """3 iterations of error feedback: output differs from a 1-iter run."""
        phi = jnp.asarray(rng.normal(size=(1, 3, 32)), dtype=jnp.float32)
        r3 = JointRegressor(latent_dim=32, iters=3)
        r1 = JointRegressor(latent_dim=32, iters=1)
        v = r3.init(jax.random.key(1), phi)
        y3 = r3.apply(v, phi)
        y1 = r1.apply(v, phi)
        assert not np.allclose(np.asarray(y3), np.asarray(y1))


class TestPHD:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = PHDFor3DJoints(latent_dim=128, feature_dim=256, number_blocks=2)
        feats = jnp.zeros((2, 8, 256))
        params = model.init(jax.random.key(0), feats)
        return model, params

    def test_forward_shapes(self, model_and_params, rng):
        model, params = model_and_params
        feats = jnp.asarray(rng.normal(size=(2, 8, 256)), dtype=jnp.float32)
        phi, phi_hat, joints_phi, joints_hat = model.apply(params, feats)
        assert phi.shape == (2, 8, 128)
        assert phi_hat.shape == (2, 8, 128)
        assert joints_phi.shape == (2, 8, 17, 3)
        assert joints_hat is None

    def test_predict_future(self, model_and_params, rng):
        model, params = model_and_params
        feats = jnp.asarray(rng.normal(size=(2, 8, 256)), dtype=jnp.float32)
        _, _, _, joints_hat = model.apply(params, feats, predict_future=True)
        assert joints_hat.shape == (2, 8, 17, 3)

    def test_phi_hat_shift(self, model_and_params, rng):
        """phi_hat[:, 0] is zero and phi_hat[:, 1:] equals f_AR(phi)[:, :-1]."""
        model, params = model_and_params
        feats = jnp.asarray(rng.normal(size=(1, 6, 256)), dtype=jnp.float32)
        phi, phi_hat, _, _ = model.apply(params, feats)
        np.testing.assert_array_equal(np.asarray(phi_hat[:, 0]), 0.0)

        ar = CausalTemporalNet(128, num_blocks=3)
        ar_out = ar.apply({"params": params["params"]["f_AR"]}, phi)
        np.testing.assert_allclose(
            np.asarray(phi_hat[:, 1:]), np.asarray(ar_out[:, :-1]), rtol=1e-5
        )

    def test_param_structure(self, model_and_params):
        _, params = model_and_params
        top = set(params["params"].keys())
        assert top == {"input_proj", "f_movie", "f_AR", "f_3D"}
        # f_movie has 2 blocks (training config), f_AR has 3 (paper default)
        assert set(params["params"]["f_movie"].keys()) == {"block0", "block1"}
        assert set(params["params"]["f_AR"].keys()) == {"block0", "block1", "block2"}

    def test_param_count_full_size(self):
        """Parameter count of the training configuration
        (latent 1024, feature 2048, 2+3 blocks, 17 joints)."""
        model = PHDFor3DJoints(latent_dim=1024, feature_dim=2048, number_blocks=2)
        params = model.init(jax.random.key(0), jnp.zeros((1, 4, 2048)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

        def block_params(d):  # 2 GN (2d each) + 2 convs (3*d*d + d)
            return 2 * (2 * d) + 2 * (3 * d * d + d)

        d = 1024
        expect = (
            (2048 * d + d)  # input_proj
            + 2 * block_params(d)  # f_movie
            + 3 * block_params(d)  # f_AR
            + ((d + 51) * 1024 + 1024)  # f_3D fc1
            + (1024 * 1024 + 1024)  # f_3D fc2
            + (1024 * 51 + 51)  # f_3D fc3
        )
        assert n == expect

    def test_dropout_train_vs_eval(self, model_and_params, rng):
        model, params = model_and_params
        feats = jnp.asarray(rng.normal(size=(1, 6, 256)), dtype=jnp.float32)
        y_eval1 = model.apply(params, feats)[2]
        y_eval2 = model.apply(params, feats)[2]
        np.testing.assert_array_equal(np.asarray(y_eval1), np.asarray(y_eval2))
        y_train = model.apply(
            params, feats, train=True, rngs={"dropout": jax.random.key(7)}
        )[2]
        assert not np.allclose(np.asarray(y_train), np.asarray(y_eval1))

    def test_jit_compiles(self, model_and_params, rng):
        model, params = model_and_params
        feats = jnp.asarray(rng.normal(size=(2, 8, 256)), dtype=jnp.float32)
        fwd = jax.jit(lambda p, f: model.apply(p, f)[2])
        y = fwd(params, feats)
        assert y.shape == (2, 8, 17, 3)
