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


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _rollout_from_x(params, x, steps: int, joints_num: int, groups: int,
                    use_pallas: bool, with_ctx: bool = True,
                    regressor_iters: int = 3):
    """Rollout over already-projected inputs x (B,T,latent) -> (joints_ctx,
    joints_future, phi_ext). The streaming predictor keeps its ring buffer
    in projected space, so it feeds this entry directly; with_ctx=False
    skips the context-window regressor pass for callers that only want the
    future frames (StreamingPredictor.forecast)."""
    phi = _temporal_net(x, params["f_movie"], groups, use_pallas, False, None)
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

    joints_ctx = (_regressor(phi, params["f_3D"], joints_num, use_pallas,
                             False, iters=regressor_iters)
                  if with_ctx else None)
    future_phi = jax.lax.dynamic_slice(buf, (0, t, 0), (b, steps, d))
    joints_future = _regressor(
        future_phi, params["f_3D"], joints_num, use_pallas, False,
        iters=regressor_iters,
    )
    return joints_ctx, joints_future, buf


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _rollout(params, feats, steps: int, joints_num: int, groups: int,
             use_pallas: bool, regressor_iters: int = 3):
    """(params, feats (B,T,D_feat)) -> (joints_ctx (B,T,J,3),
    joints_future (B,steps,J,3), phi_ext (B,T+steps,D)). Jitted so the
    input projection fuses into the same program as the rollout (one
    dispatch, which matters on high-latency dispatch paths)."""
    x = feats @ params["input_proj"]["kernel"] + params["input_proj"]["bias"]
    return _rollout_from_x(params, x, steps, joints_num, groups, use_pallas,
                           True, regressor_iters)


def make_rollout_fn(steps: int, joints_num: int = 17, groups: int = 32,
                    use_pallas: bool = False, regressor_iters: int = 3):
    """(params, feats (B,T,feature_dim)) ->
    (joints_ctx (B,T,J,3), joints_future (B,steps,J,3)).

    regressor_iters must match the checkpoint's training config."""

    def fn(params, feats):
        ctx, fut, _ = _rollout(params, feats, steps, joints_num, groups,
                               use_pallas, regressor_iters)
        return ctx, fut

    return fn


# ---------------------------------------------------------------------------
# Streaming: per-frame inference
# ---------------------------------------------------------------------------
#
# GroupNorm in the residual blocks normalizes over (time, group-channels), so
# the window STATISTICS change every time the window slides: an exactly-
# equivalent push must rerun the temporal net over the window — O(window)
# work is inherent to the model's semantics, not an implementation choice.
# Two levers remain, both used here:
#
#   exact path    — the ring buffer lives in projected (latent) space so
#                   input_proj runs once per frame, and the joint regressor
#                   decodes ONLY the newest frame. Bit-identical to a full
#                   forward; roughly halves per-push FLOPs at the training
#                   config.
#   frozen path   — freeze() captures each GroupNorm's window statistics and
#                   each causal conv's K-1 tap history; push then costs O(1)
#                   frames of compute regardless of window size. Outputs are
#                   exact w.r.t. the frozen-stats model (tested), and track
#                   the sliding-stats model as closely as the statistics are
#                   stationary — the right trade for long steady-state
#                   streams; call freeze() again (or unfreeze()) after a
#                   scene change.


def _gn_group_stats(x: jnp.ndarray, groups: int, eps: float):
    """x (1, T, D) -> per-group (mean (G,), rstd (G,)) over (T, D/G)."""
    _, t_len, d = x.shape
    xg = x.reshape(t_len, groups, d // groups)
    mean = xg.mean(axis=(0, 2))
    var = jnp.mean((xg - mean[None, :, None]) ** 2, axis=(0, 2))
    return mean, jax.lax.rsqrt(var + eps)


def _frozen_gn_relu(u, mean_g, rstd_g, scale, bias, groups: int):
    """Per-frame GN+ReLU with externally-fixed per-group statistics.
    u (N, D); mean_g/rstd_g (G,)."""
    d = u.shape[-1]
    rep = d // groups
    mean = jnp.repeat(mean_g, rep)
    rstd = jnp.repeat(rstd_g, rep)
    return jax.nn.relu((u - mean) * rstd * scale + bias)


def _sorted_blocks(net_params: dict):
    from h36x.infer import sorted_blocks

    return sorted_blocks(net_params)


def _capture_freeze(x, net_params, groups: int, eps: float):
    """Run the temporal net over the full window (1, T, D), returning
    (phi, per-block GN stats, per-block conv tap history). The tap history
    holds the last K-1 frames of each conv's input stream — exactly the
    state an O(1) streaming step needs."""
    from h36x.ops.causal_conv import causal_conv1d

    stats, state = {}, {}
    for name in _sorted_blocks(net_params):
        p = net_params[name]
        k_taps = p["conv1"]["kernel"].shape[0]
        mu1, rstd1 = _gn_group_stats(x, groups, eps)
        h = _frozen_gn_relu(x, mu1, rstd1, p["gn1"]["scale"], p["gn1"]["bias"],
                            groups)
        c1 = causal_conv1d(h, p["conv1"]["kernel"], p["conv1"]["bias"])
        mu2, rstd2 = _gn_group_stats(c1, groups, eps)
        g = _frozen_gn_relu(c1, mu2, rstd2, p["gn2"]["scale"],
                            p["gn2"]["bias"], groups)
        c2 = causal_conv1d(g, p["conv2"]["kernel"], p["conv2"]["bias"])
        stats[name] = {"mu1": mu1, "rstd1": rstd1, "mu2": mu2, "rstd2": rstd2}
        # history = last K-1 frames; spelled via a positive start index
        # because -(k_taps - 1) is -0 == "the whole window" when K == 1
        start = h.shape[1] - (k_taps - 1)
        state[name] = {"h": h[0, start:], "g": g[0, start:]}
        x = c2 + x
    return x, stats, state


def _stream_block(u, p, st, fs, groups: int):
    """One residual block on ONE new frame u (1, D) with frozen GN stats fs
    and conv tap history st; returns (out (1, D), new history)."""
    h = _frozen_gn_relu(u, fs["mu1"], fs["rstd1"], p["gn1"]["scale"],
                        p["gn1"]["bias"], groups)
    h_hist = jnp.concatenate([st["h"], h], axis=0)  # (K, D)
    c1 = jnp.einsum(
        "kd,kdo->o", h_hist, p["conv1"]["kernel"],
        preferred_element_type=jnp.float32,
    )[None, :] + p["conv1"]["bias"]
    g = _frozen_gn_relu(c1, fs["mu2"], fs["rstd2"], p["gn2"]["scale"],
                        p["gn2"]["bias"], groups)
    g_hist = jnp.concatenate([st["g"], g], axis=0)
    c2 = jnp.einsum(
        "kd,kdo->o", g_hist, p["conv2"]["kernel"],
        preferred_element_type=jnp.float32,
    )[None, :] + p["conv2"]["bias"]
    return c2 + u, {"h": h_hist[1:], "g": g_hist[1:]}


# Module-level jitted step programs shared by every StreamingPredictor
# instance: jit keys on (function, static args), so constructing a new
# predictor per clip (h36x/cli/predict.py) reuses the compiled executables
# instead of re-tracing per-instance closures.


def _project(params, feat):  # (feature_dim,) -> (latent,)
    return feat @ params["input_proj"]["kernel"] + params["input_proj"]["bias"]


@functools.partial(jax.jit, static_argnames=("window",))
def _warm_start(params, feat, *, window: int):
    return jnp.tile(_project(params, feat)[None, None, :], (1, window, 1))


@functools.partial(jax.jit,
                   static_argnames=("groups", "joints_num", "use_pallas",
                                    "regressor_iters"))
def _step_jit(params, xbuf, feat, *, groups, joints_num, use_pallas,
              regressor_iters=3):
    xnew = _project(params, feat)
    xbuf = jnp.concatenate([xbuf[:, 1:], xnew[None, None, :]], axis=1)
    phi = _temporal_net(xbuf, params["f_movie"], groups, use_pallas,
                        False, None)
    joints = _regressor(phi[:, -1:], params["f_3D"], joints_num,
                        use_pallas, False, iters=regressor_iters)
    return xbuf, joints[0, -1]


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def _capture_jit(params, xbuf, *, groups, eps):
    _, stats, state = _capture_freeze(xbuf, params["f_movie"], groups, eps)
    return stats, state


@functools.partial(jax.jit,
                   static_argnames=("groups", "joints_num", "use_pallas",
                                    "regressor_iters"))
def _frozen_step_jit(params, xbuf, stats, state, feat, *, groups,
                     joints_num, use_pallas, regressor_iters=3):
    xnew = _project(params, feat)
    xbuf = jnp.concatenate([xbuf[:, 1:], xnew[None, None, :]], axis=1)
    u = xnew[None, :]
    new_state = {}
    for name in _sorted_blocks(params["f_movie"]):
        u, new_state[name] = _stream_block(
            u, params["f_movie"][name], state[name], stats[name], groups
        )
    joints = _regressor(u[:, None, :], params["f_3D"], joints_num,
                        use_pallas, False, iters=regressor_iters)
    return xbuf, new_state, joints[0, 0]


class StreamingPredictor:
    """Online per-frame 3D pose over a sliding feature window.

    push(feat) accepts one frame's backbone features (feature_dim,) and
    returns the newest frame's joints (J, 3). Until `window` frames have
    arrived the buffer is left-filled with the first frame (the same edge
    semantics the causal convs use for t<0). `forecast(steps)` rolls the AR
    predictor `steps` frames past the current window.

    The ring buffer is kept in projected (latent) space and only the newest
    frame is decoded, so a push reruns just the temporal net over the window
    (required for exact sliding-GroupNorm semantics — see module comment).
    freeze() switches to O(1)-per-push incremental inference with the
    GroupNorm statistics pinned at the freeze-time window.
    """

    def __init__(self, params, window: int = 40, feature_dim: int = 2048,
                 joints_num: int = 17, groups: int = 32,
                 use_pallas: bool = False, eps: float = 1e-5,
                 regressor_iters: int = 3):
        self.params = params
        self.window = window
        self.feature_dim = int(params["input_proj"]["kernel"].shape[0])
        if feature_dim != self.feature_dim:
            raise ValueError(
                f"feature_dim={feature_dim} does not match the checkpoint's "
                f"input projection ({self.feature_dim})")
        self.joints_num = joints_num
        self.groups = groups
        self.use_pallas = use_pallas
        self.eps = eps
        self.regressor_iters = regressor_iters
        self._xbuf = None  # (1, window, latent) projected, device-resident
        self._seen = 0
        self._frozen = None  # (stats, state) pytrees when frozen

    def push(self, feat: np.ndarray) -> np.ndarray:
        """Add one frame's features; returns that frame's joints (J, 3).

        One jitted dispatch per push (the input projection is fused into
        the step program — two dispatches would double per-frame latency
        on high-latency dispatch paths); only the very first push pays an
        extra dispatch to build the edge-replicated warm-start buffer.
        """
        feat = np.asarray(feat, dtype=np.float32).reshape(-1)
        if feat.size != self.feature_dim:
            raise ValueError(
                f"feat has {feat.size} features, expected {self.feature_dim}")
        feat = jnp.asarray(feat)
        if self._seen == 0:
            # edge-replicate warm start (constant window, so the roll in the
            # step functions is a no-op on content)
            self._xbuf = _warm_start(self.params, feat, window=self.window)
        self._seen += 1
        if self._frozen is not None:
            stats, state = self._frozen
            self._xbuf, state, joints = _frozen_step_jit(
                self.params, self._xbuf, stats, state, feat,
                groups=self.groups, joints_num=self.joints_num,
                use_pallas=self.use_pallas,
                regressor_iters=self.regressor_iters,
            )
            self._frozen = (stats, state)
        else:
            self._xbuf, joints = _step_jit(
                self.params, self._xbuf, feat, groups=self.groups,
                joints_num=self.joints_num, use_pallas=self.use_pallas,
                regressor_iters=self.regressor_iters,
            )
        return np.asarray(joints)

    def freeze(self) -> None:
        """Pin GroupNorm statistics at the current window and switch push()
        to O(1) incremental compute. Requires at least one pushed frame;
        call again later to re-pin the statistics to a newer window."""
        if self._seen == 0:
            raise RuntimeError("no frames pushed yet")
        self._frozen = _capture_jit(self.params, self._xbuf,
                                    groups=self.groups, eps=self.eps)

    def unfreeze(self) -> None:
        """Return to exact sliding-statistics inference."""
        self._frozen = None

    @property
    def frozen(self) -> bool:
        return self._frozen is not None

    def forecast(self, steps: int) -> np.ndarray:
        """AR rollout `steps` frames past the current window -> (steps, J, 3)."""
        if self._seen == 0:
            raise RuntimeError("no frames pushed yet")
        # with_ctx=False skips the context-window regressor pass (we only
        # want the future frames); jit's static-arg cache keys on steps, so
        # no per-instance memo is needed
        _, future, _ = _rollout_from_x(
            self.params, self._xbuf, steps, self.joints_num, self.groups,
            self.use_pallas, False, self.regressor_iters,
        )
        return np.asarray(future[0])

    @property
    def warm(self) -> bool:
        return self._seen >= self.window
