"""PHD temporal pose model ("Predicting 3D Human Dynamics from Video",
Zhang et al.), adapted to 17-joint H36M regression.

Semantics match the reference (src/model.py:18-178); the design is
channels-last (B, T, D) end-to-end — no permutes, the feature axis stays on
the TPU lane dimension — and the causal convs lower to single MXU matmuls
(:func:`h36x.ops.causal_conv1d`).

Components:
  - :class:`CausalConv1d` — left-edge-padded temporal conv (src/model.py:18-33)
  - :class:`ResidualBlock` — GN/ReLU/conv x2 + skip (src/model.py:35-56)
  - :class:`CausalTemporalNet` — N residual blocks; used for both the
    movie-strip encoder f_movie and the autoregressive predictor f_AR
    (src/model.py:67-75, 142-143)
  - :class:`JointRegressor` — HMR-style iterative error feedback MLP
    (src/model.py:83-116)
  - :class:`PHDFor3DJoints` — input projection + f_movie + f_AR + f_3D with
    the one-step-right shift of the AR stream (src/model.py:127-178)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import uniform as _uniform_init

from h36x.ops.causal_conv import causal_conv1d


def _fan_in_uniform(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's Linear/Conv default scale,
    kept so training dynamics are comparable to the reference."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return _uniform_init(scale=2.0 * bound)(key, shape, dtype) - bound

    return init


class CausalConv1d(nn.Module):
    """Temporal conv whose output at t depends only on inputs <= t."""

    features: int
    kernel_size: int = 3
    dtype: Any = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        fan_in = d_in * self.kernel_size
        kernel = self.param(
            "kernel",
            _fan_in_uniform(fan_in),
            (self.kernel_size, d_in, self.features),
        )
        bias = self.param("bias", _fan_in_uniform(fan_in), (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return causal_conv1d(x, kernel, bias)


class ResidualBlock(nn.Module):
    """GN -> ReLU -> CausalConv -> Dropout -> GN -> ReLU -> CausalConv + skip.

    dtype sets the COMPUTE dtype (bf16 mixed-precision training keeps f32
    params and f32 GroupNorm statistics — GN reduces over T*D/G elements
    and its variance cancellation is the one numerically fragile spot)."""

    channels: int
    groups: int = 32
    dropout: float = 0.5
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        residual = x
        # GroupNorm over (time, channels-in-group) per sample — on (B, T, C)
        # this reduces the same element set as torch GN on (B, C, T).
        # Statistics at least f32 under low-precision compute (bf16/f16),
        # but NOT forced down to f32 when the inputs are wider (the f64
        # trajectory-parity oracle relies on full-width norms).
        gn_dtype = (jnp.float32 if self.dtype is not None
                    and jnp.dtype(self.dtype).itemsize < 4 else None)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="gn1",
                         dtype=gn_dtype)(x)
        x = nn.relu(x)
        x = CausalConv1d(self.channels, self.kernel_size, dtype=self.dtype,
                         name="conv1")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="gn2",
                         dtype=gn_dtype)(x)
        x = nn.relu(x)
        x = CausalConv1d(self.channels, self.kernel_size, dtype=self.dtype,
                         name="conv2")(x)
        return x + residual.astype(x.dtype)


class CausalTemporalNet(nn.Module):
    """Stack of residual blocks over (B, T, D); receptive field 1+4*num_blocks."""

    latent_dim: int = 2048
    num_blocks: int = 3
    dropout: float = 0.5
    groups: int = 32
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_blocks):
            x = ResidualBlock(
                self.latent_dim,
                groups=self.groups,
                dropout=self.dropout,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train=train)
        return x


def _dense(features: int, fan_in: int, name: str, dtype=None) -> nn.Dense:
    init = _fan_in_uniform(fan_in)
    return nn.Dense(features, kernel_init=init, bias_init=init, name=name,
                    dtype=dtype)


class JointRegressor(nn.Module):
    """Iterative-error-feedback 3D joint regressor (HMR-style).

    Starting from y = 0, each of `iters` rounds refines y by the MLP applied
    to concat(phi, y). Three static rounds unroll into the jit graph.
    """

    latent_dim: int = 2048
    joints_num: int = 17
    iters: int = 3
    hidden: int = 1024
    dropout: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, phi: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        b, t, _ = phi.shape
        out_dim = self.joints_num * 3

        fc1 = _dense(self.hidden, self.latent_dim + out_dim, "fc1", self.dtype)
        fc2 = _dense(self.hidden, self.hidden, "fc2", self.dtype)
        fc3 = _dense(out_dim, self.hidden, "fc3", self.dtype)
        drop = nn.Dropout(self.dropout, deterministic=not train)

        y = jnp.zeros((b, t, out_dim), dtype=phi.dtype)
        for _ in range(self.iters):
            h = jnp.concatenate([phi, y], axis=-1)
            h = nn.relu(fc1(h))
            h = drop(h)
            h = nn.relu(fc2(h))
            y = y + fc3(h)
        return y.reshape(b, t, self.joints_num, 3)


class PHDFor3DJoints(nn.Module):
    """Full PHD pose model over precomputed per-frame features.

    forward(feats (B,T,feature_dim)) ->
      phi        (B,T,latent)  movie strips from f_movie
      phi_hat    (B,T,latent)  f_AR output shifted right one step (zeros at t=0)
      joints_phi (B,T,J,3)     f_3D(phi)
      joints_hat (B,T,J,3)|None  f_3D(phi_hat) when predict_future
    """

    latent_dim: int = 1024
    feature_dim: int = 2048
    joints_num: int = 17
    number_blocks: int = 2
    ar_blocks: int = 3
    dropout: float = 0.5
    groups: int = 32
    kernel_size: int = 3
    regressor_iters: int = 3
    regressor_hidden: int = 1024
    dtype: Any = None  # compute dtype (bf16 mixed precision); params f32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        predict_future: bool = False,
        *,
        train: bool = False,
    ):
        x = _dense(self.latent_dim, self.feature_dim, "input_proj",
                   self.dtype)(feats)
        phi = CausalTemporalNet(
            self.latent_dim,
            num_blocks=self.number_blocks,
            dropout=self.dropout,
            groups=self.groups,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            name="f_movie",
        )(x, train=train)

        ar_out = CausalTemporalNet(
            self.latent_dim,
            num_blocks=self.ar_blocks,
            dropout=self.dropout,
            groups=self.groups,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            name="f_AR",
        )(phi, train=train)
        # Shift the AR stream one step into the future: phi_hat[t] predicts
        # phi[t] from history < t; t=0 has no history and stays zero.
        phi_hat = jnp.concatenate(
            [jnp.zeros_like(ar_out[:, :1, :]), ar_out[:, :-1, :]], axis=1
        )

        f_3d = JointRegressor(
            self.latent_dim,
            joints_num=self.joints_num,
            iters=self.regressor_iters,
            hidden=self.regressor_hidden,
            dropout=self.dropout,
            dtype=self.dtype,
            name="f_3D",
        )
        joints_phi = f_3d(phi, train=train)

        joints_hat: Optional[jnp.ndarray] = None
        if predict_future:
            joints_hat = f_3d(phi_hat, train=train)

        return phi, phi_hat, joints_phi, joints_hat
