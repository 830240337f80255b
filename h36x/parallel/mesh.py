"""Mesh construction and sharding rules.

Axes:
  data  — batch dimension (pure DP; gradient psum over ICI)
  model — tensor parallelism for the wide GEMMs (input_proj, conv taps,
          regressor MLP): kernels shard on their output column axis, the
          next layer's kernel shards on its input row axis, so XLA inserts
          the minimal all-gather/reduce-scatter pattern.

On a single host this builds over however many devices exist (1 real TPU
chip, or N virtual CPU devices under --xla_force_host_platform_device_count).
Multi-host extends transparently: jax.devices() is global under jax.distributed.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors shard their leading axis over the data-parallel axes.

    On the 2-axis (data, model) mesh that is `data`; on a multislice
    (slice, data, model) mesh rows shard over the combined (slice, data)
    super-axis — params stay replicated over `slice`, so the gradient
    psum's slice hop is the only DCN traffic.
    """
    if "slice" in mesh.axis_names:
        return NamedSharding(mesh, P(("slice", "data")))
    return NamedSharding(mesh, P("data"))


def data_axis_size(mesh: Mesh) -> int:
    """Number of ways the batch axis is split (slice*data on multislice)."""
    return mesh.shape.get("slice", 1) * mesh.shape.get("data", 1)


# Param-path -> PartitionSpec rules for tensor parallelism. Paths are
# '/'-joined flax param paths, e.g. 'f_movie/block0/conv1/kernel'.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # input projection (feature_dim x latent): split latent columns
    (r".*input_proj/kernel$", P(None, "model")),
    (r".*input_proj/bias$", P("model")),
    # causal conv kernels (K, D_in, D_out): split output channels
    (r".*conv\d/kernel$", P(None, None, "model")),
    (r".*conv\d/bias$", P("model")),
    # regressor MLP: fc1 splits hidden columns, fc2 contracts over those
    # sharded rows (XLA inserts the psum), fc3 stays replicated — its
    # input is the psum'd fc2 output and its own dims are tiny (J*3)
    (r".*f_3D/fc1/kernel$", P(None, "model")),
    (r".*f_3D/fc1/bias$", P("model")),
    (r".*f_3D/fc2/kernel$", P("model", None)),
)


_warned_indivisible: set = set()


def param_sharding_rules(path: str, leaf, mesh: Mesh) -> NamedSharding:
    """Sharding for one parameter; replicated unless a TP rule matches and
    the dimension divides the model-axis size."""
    model_size = mesh.shape["model"]
    if model_size > 1:
        for pattern, spec in _TP_RULES:
            if re.match(pattern, path):
                # only apply when every sharded dim divides the axis
                ok = True
                for dim, axis in zip(leaf.shape, spec):
                    if axis == "model" and dim % model_size != 0:
                        ok = False
                if ok:
                    return NamedSharding(mesh, spec)
                # an explicitly requested model axis that ends up fully
                # replicated is all-cost-no-benefit (every device redoes
                # the full GEMM) — say so instead of silently degrading
                key = (path, model_size)
                if key not in _warned_indivisible:
                    _warned_indivisible.add(key)
                    print(
                        f"WARNING: TP rule for {path} skipped — shape "
                        f"{tuple(leaf.shape)} not divisible by "
                        f"mesh.model={model_size}; this param stays "
                        "replicated (pick a model-axis size dividing the "
                        "layer widths)")
    return NamedSharding(mesh, P())


def _key_path_str(keypath) -> str:
    """jax key path -> the "layer/sub/kernel" string _TP_RULES match on.
    The single source of truth — shard_params and param_shardings MUST
    derive paths identically or the TP rules silently stop matching."""
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", ""))) for k in keypath
    )


def shard_params(params, mesh: Mesh):
    """Device_put every param with its rule-derived sharding (composed on
    param_shardings so the path->rule traversal exists exactly once)."""
    return jax.device_put(params, param_shardings(params, mesh))


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params` (for jit in_shardings)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for keypath, leaf in flat:
        shardings.append(
            param_sharding_rules(_key_path_str(keypath), leaf, mesh))
    return jax.tree_util.tree_unflatten(treedef, shardings)
