"""Serving: streaming per-frame inference and autoregressive future rollout.

The PHD architecture is built to *predict* 3D dynamics: f_AR forecasts the
next movie strip, f_3D decodes strips to joints. The reference defines the
pieces (PRED_LEN/INPUT_LEN in config.py, predict_future in model.py:158-178)
but ships no rollout or streaming driver; this module provides both, on top
of the param-tree engines in :mod:`h36x.infer`:

- :func:`make_rollout_fn` — jit-compiled multi-step AR rollout: given a
  T-frame feature window, autoregressively extend the movie-strip sequence
  `steps` frames into the future and decode future joints. The rollout runs
  at a fixed shape (one compile for any step count): the causal convs never
  look right, and GroupNorm — the block's one non-causal op — uses
  statistics masked to the frames that exist, so each step is exactly the
  variable-length recomputation without recompiles.
- :class:`StreamingPredictor` — per-frame online inference over a sliding
  feature window (ring buffer warm-started by edge replication, matching
  the causal convs' left edge padding), with optional future rollout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from h36x.infer import _regressor, _temporal_net, _temporal_net_masked


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _rollout(params, feats, steps: int, joints_num: int, groups: int,
             use_pallas: bool):
    """(params, feats (B,T,D_feat)) -> (joints_ctx (B,T,J,3),
    joints_future (B,steps,J,3), phi_ext (B,T+steps,D))."""
    x = feats @ params["input_proj"]["kernel"] + params["input_proj"]["bias"]
    phi = _temporal_net(x, params["f_movie"], groups, use_pallas, False, 256)
    b, t, d = phi.shape

    buf = jnp.zeros((b, t + steps, d), dtype=phi.dtype)
    buf = jax.lax.dynamic_update_slice(buf, phi, (0, 0, 0))

    def body(s, buf):
        # f_AR over the fixed-shape buffer with GroupNorm statistics masked
        # to the t+s frames that exist; the causal convs then guarantee
        # position t+s-1 only sees the already-written prefix.
        ar = _temporal_net_masked(buf, params["f_AR"], groups, valid_len=t + s)
        next_phi = jax.lax.dynamic_slice(ar, (0, t + s - 1, 0), (b, 1, d))
        return jax.lax.dynamic_update_slice(buf, next_phi, (0, t + s, 0))

    buf = jax.lax.fori_loop(0, steps, body, buf)

    joints_ctx = _regressor(phi, params["f_3D"], joints_num, use_pallas, False)
    future_phi = jax.lax.dynamic_slice(buf, (0, t, 0), (b, steps, d))
    joints_future = _regressor(
        future_phi, params["f_3D"], joints_num, use_pallas, False
    )
    return joints_ctx, joints_future, buf


def make_rollout_fn(steps: int, joints_num: int = 17, groups: int = 32,
                    use_pallas: bool = False):
    """(params, feats (B,T,feature_dim)) ->
    (joints_ctx (B,T,J,3), joints_future (B,steps,J,3))."""

    def fn(params, feats):
        ctx, fut, _ = _rollout(params, feats, steps, joints_num, groups, use_pallas)
        return ctx, fut

    return fn


class StreamingPredictor:
    """Online per-frame 3D pose over a sliding feature window.

    push(feat) accepts one frame's backbone features (feature_dim,) and
    returns the newest frame's joints (J, 3). Until `window` frames have
    arrived the buffer is left-filled with the first frame (the same edge
    semantics the causal convs use for t<0). `forecast(steps)` rolls the AR
    predictor `steps` frames past the current window.
    """

    def __init__(self, params, window: int = 40, feature_dim: int = 2048,
                 joints_num: int = 17, groups: int = 32,
                 use_pallas: bool = False):
        self.params = params
        self.window = window
        self.joints_num = joints_num
        self.groups = groups
        self.use_pallas = use_pallas
        self._buf = np.zeros((1, window, feature_dim), dtype=np.float32)
        self._seen = 0

        from h36x.infer import phd_forward_fused

        @jax.jit
        def forward(params, feats):
            return phd_forward_fused(
                params, feats, joints_num=joints_num, groups=groups,
                use_pallas=use_pallas,
            )[2]

        self._forward = forward
        self._rollouts: dict = {}

    def push(self, feat: np.ndarray) -> np.ndarray:
        """Add one frame's features; returns that frame's joints (J, 3)."""
        feat = np.asarray(feat, dtype=np.float32).reshape(-1)
        if self._seen == 0:
            self._buf[0, :] = feat  # edge-replicate warm start
        else:
            self._buf[0, :-1] = self._buf[0, 1:]
            self._buf[0, -1] = feat
        self._seen += 1
        joints = self._forward(self.params, jnp.asarray(self._buf))
        return np.asarray(joints[0, -1])

    def forecast(self, steps: int) -> np.ndarray:
        """AR rollout `steps` frames past the current window -> (steps, J, 3)."""
        if self._seen == 0:
            raise RuntimeError("no frames pushed yet")
        if steps not in self._rollouts:
            self._rollouts[steps] = make_rollout_fn(
                steps, self.joints_num, self.groups, self.use_pallas
            )
        _, future = self._rollouts[steps](self.params, jnp.asarray(self._buf))
        return np.asarray(future[0])

    @property
    def warm(self) -> bool:
        return self._seen >= self.window
