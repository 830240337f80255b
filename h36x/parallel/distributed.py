"""Multi-host (multi-process) SPMD helpers.

Single-host meshes need nothing from here. On a TPU pod slice, call
:func:`initialize` once per process before any jax call; `jax.devices()`
then spans the slice and the same `make_mesh`/`shard_params` code paths
produce a global mesh whose collectives ride ICI (DCN only between slices).

Data loading is host-local: each process materializes only its shard of the
global batch (:func:`local_batch_slice`) and `make_global_batch` assembles
the global-shape jax.Array from per-host shards without gathering.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper.

    num_processes=None (the documented TPU-pod call pattern) delegates to
    jax's own cluster auto-detection — a silent no-op here would leave
    jax.devices() host-local and every host training an INDEPENDENT model
    with nothing visibly wrong. num_processes<=1 is the explicit
    single-process no-op.
    """
    if num_processes is None:
        jax.distributed.initialize()  # raises if no cluster is detectable
        return
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def setup_from_config(dist) -> None:
    """Apply a :class:`h36x.config.DistConfig` before any backend init.

    Order matters on this runtime: platform forcing must precede device
    queries (the axon TPU plugin registers itself at interpreter start), so
    call this FIRST in a CLI main. No-op for the default single-process
    config."""
    if getattr(dist, "platform", ""):
        jax.config.update("jax_platforms", dist.platform)
    if getattr(dist, "local_devices", 0):
        jax.config.update("jax_num_cpu_devices", dist.local_devices)
    if getattr(dist, "collectives", ""):
        jax.config.update("jax_cpu_collectives_implementation",
                          dist.collectives)
    if dist.num_processes and dist.num_processes > 1:
        initialize(
            coordinator_address=dist.coordinator or None,
            num_processes=dist.num_processes,
            process_id=dist.process_id if dist.process_id >= 0 else None,
        )


def is_main_process() -> bool:
    """True on the process that owns logging/checkpoint writes (rank 0)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int, process_id: Optional[int] = None,
                      process_count: Optional[int] = None) -> slice:
    """Half-open row range of the global batch owned by this process."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    if global_batch % pcount != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{pcount} processes")
    per = global_batch // pcount
    return slice(pid * per, (pid + 1) * per)


def make_multislice_mesh(slices: int, data: int = -1, model: int = 1,
                         devices=None):
    """(slice, data, model) mesh for multi-slice pods.

    The leading `slice` axis is the DCN dimension (inter-slice links);
    `data` and `model` stay intra-slice so TP collectives and the first
    hop of the gradient reduction ride ICI, with only the final psum
    crossing DCN. Batch rows shard jointly over slice x data
    (:func:`multislice_batch_sharding`); params use the same TP rules as
    the 2-axis mesh (the `model` axis name is shared), replicated over
    `slice`.
    """
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (slices * model) != 0:
            raise ValueError(
                f"{n} devices not divisible by slices*model={slices * model}")
        data = n // (slices * model)
    if slices * data * model != n:
        raise ValueError(f"mesh {slices}x{data}x{model} != {n} devices")
    arr = np.array(devices).reshape(slices, data, model)
    return Mesh(arr, axis_names=("slice", "data", "model"))


def multislice_batch_sharding(mesh):
    """Batch rows shard over the combined (slice, data) super-axis.

    Same rule as h36x.parallel.mesh.batch_sharding (which detects the
    slice axis); kept as the explicitly-named multislice entry point."""
    from h36x.parallel.mesh import batch_sharding

    return batch_sharding(mesh)


def make_global_batch(local_arrays, mesh, global_batch: int,
                      stacked: bool = False):
    """Per-host numpy shards -> global jax.Arrays sharded over mesh 'data'.

    local_arrays: pytree of host arrays whose leading dim is the LOCAL batch
    (global_batch / process_count rows). Uses
    jax.make_array_from_process_local_data, which never gathers across hosts.
    On a multi-slice mesh rows shard over the (slice, data) super-axis.

    stacked=True: leaves carry a leading step axis (k, local_batch, ...)
    (the multi-step scan dispatch, h36x/train/step.py scan_steps); the step
    axis stays unsharded and rows shard on axis 1.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = ("slice", "data") if "slice" in mesh.axis_names else "data"
    spec = P(None, rows) if stacked else P(rows)
    sharding = NamedSharding(mesh, spec)

    def convert(x):
        x = np.asarray(x)
        if stacked:
            global_shape = (x.shape[0], global_batch) + x.shape[2:]
        else:
            global_shape = (global_batch,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(convert, local_arrays)
