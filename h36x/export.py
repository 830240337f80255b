"""AOT deployment artifacts for the PHD model via jax.export (StableHLO).

The reference's only deployment story is a pickled torch checkpoint loaded
back into the training codebase (src/results.py:175-187): serving requires
the full Python stack, the model source, and a matching torch version. h36x
adds a real one: serialize the jitted forward (and the autoregressive
rollout) together with the trained parameters into one self-contained
StableHLO artifact that any JAX runtime — same machine or a fleet of TPU
servers — can execute with `jax.export.deserialize(blob).call`, no h36x
package, no model code, no checkpoint plumbing.

Design choices:

- **Params are baked in** as StableHLO constants. The artifact is the whole
  deployable unit; there is no separate weights file to version-skew against.
- **The batch dimension is symbolic** by default (shape polymorphism), so
  one artifact serves any batch size without recompiles at export time.
  Time stays fixed: GroupNorm statistics and the rollout buffer are built
  for the training window (the model's own semantics — see h36x/serve.py).
- **Multi-platform lowering** (`platforms=("cpu", "tpu")` by default): the
  same file runs on a TPU server and on a CPU box for smoke tests. Lowering
  does not execute, so a TPU artifact can be produced on a CPU-only host.
- The compute path is the XLA formulation (`use_pallas=False`) — the
  production default (DESIGN.md "Pallas vs XLA on the PHD model") and the
  only one that lowers portably across platforms.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jex

from h36x.infer import phd_forward_fused
from h36x.serve import make_rollout_fn


def _feats_spec(batch, seq_len: int, feature_dim: int, dtype):
    if batch is None:
        (batch,) = jex.symbolic_shape("b")
    return jax.ShapeDtypeStruct((batch, seq_len, feature_dim), dtype)


def _cast_params(params, compute_dtype):
    """Cast float params to compute_dtype BEFORE tracing, so the artifact's
    baked-in constants shrink too (bf16 halves the file and the serve-time
    HBM weight traffic). Inputs stay f32 at the boundary; outputs are cast
    back to f32 inside the artifact."""
    if compute_dtype is None:
        return params
    return jax.tree.map(
        lambda x: x.astype(compute_dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        params,
    )


def export_forward(
    params,
    *,
    seq_len: int = 40,
    feature_dim: int = 2048,
    joints_num: int = 17,
    groups: int = 32,
    batch: int | None = None,
    dtype=jnp.float32,
    compute_dtype=None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    regressor_iters: int = 3,
) -> bytes:
    """Serialize `feats (B, seq_len, feature_dim) -> joints (B, T, J, 3)`
    with `params` baked in. batch=None exports a symbolic batch dimension.
    compute_dtype=jnp.bfloat16 bakes bf16 weights and runs the artifact's
    compute in bf16 (half the file, half the serve-time weight traffic,
    ~mm-level joint deviation); the interface stays f32 in, f32 out.
    regressor_iters must match the checkpoint's training config."""
    cparams = _cast_params(params, compute_dtype)

    def forward(feats):
        if compute_dtype is not None:
            feats = feats.astype(compute_dtype)
        joints = phd_forward_fused(
            cparams, feats, joints_num=joints_num, groups=groups,
            use_pallas=False, regressor_iters=regressor_iters,
        )[2]
        return joints.astype(jnp.float32)

    exp = jex.export(jax.jit(forward), platforms=tuple(platforms))(
        _feats_spec(batch, seq_len, feature_dim, dtype)
    )
    return bytes(exp.serialize())


def export_rollout(
    params,
    *,
    steps: int,
    seq_len: int = 40,
    feature_dim: int = 2048,
    joints_num: int = 17,
    groups: int = 32,
    batch: int | None = None,
    dtype=jnp.float32,
    compute_dtype=None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    regressor_iters: int = 3,
) -> bytes:
    """Serialize the AR rollout: `feats (B, seq_len, feature_dim) ->
    (joints_ctx (B, T, J, 3), joints_future (B, steps, J, 3))`.

    `steps` future frames are baked into the artifact (the rollout runs a
    fixed-shape masked-GroupNorm buffer — h36x/serve.py); export one
    artifact per forecast horizon you deploy. compute_dtype as in
    :func:`export_forward`; regressor_iters must match the checkpoint's
    training config."""
    cparams = _cast_params(params, compute_dtype)
    rollout_fn = make_rollout_fn(steps, joints_num, groups,
                                 use_pallas=False,
                                 regressor_iters=regressor_iters)

    def rollout(feats):
        if compute_dtype is not None:
            feats = feats.astype(compute_dtype)
        ctx, fut = rollout_fn(cparams, feats)
        return ctx.astype(jnp.float32), fut.astype(jnp.float32)

    exp = jex.export(jax.jit(rollout), platforms=tuple(platforms))(
        _feats_spec(batch, seq_len, feature_dim, dtype)
    )
    return bytes(exp.serialize())


def load_artifact(src) -> Callable:
    """Rehydrate an artifact (bytes or a path) into a jit-compiled callable.

    The returned function takes `feats` and returns whatever the artifact
    computes (joints, or (ctx, future) for rollouts). Works on any platform
    the artifact was lowered for; requires only jax, not h36x."""
    if isinstance(src, (str, Path)):
        src = Path(src).read_bytes()
    exp = jex.deserialize(bytearray(src))
    return jax.jit(exp.call)


def artifact_info(src) -> dict:
    """Introspect an artifact: platforms, input/output shapes/dtypes."""
    if isinstance(src, (str, Path)):
        src = Path(src).read_bytes()
    exp = jex.deserialize(bytearray(src))
    return {
        "platforms": list(exp.platforms),
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
        "nbytes": len(src),
    }


def artifact_input_shape(src) -> tuple:
    """(batch, seq_len, feature_dim) of the artifact's feature input.

    batch is None when the export used a symbolic batch dimension (the
    default). Lets h36x-serve derive the wire shapes from the artifact
    itself instead of trusting hand-typed --seq-len/--feature-dim flags.
    """
    if isinstance(src, (str, Path)):
        src = Path(src).read_bytes()
    exp = jex.deserialize(bytearray(src))
    b, t, d = exp.in_avals[0].shape
    return (int(b) if isinstance(b, int) else None, int(t), int(d))


def save_artifact(blob: bytes, path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # pid-suffixed so two exporters racing on the same path each publish a
    # complete blob (a shared ".tmp" lets A rename the file B is mid-write)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path
