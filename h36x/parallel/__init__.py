"""Device-mesh parallelism: mesh construction, sharding rules, host feed.

Replaces the reference's single-node nn.DataParallel (reference
src/train.py:381-384) with first-class SPMD over a `jax.sharding.Mesh`:
batches shard over the `data` axis, gradients reduce over ICI inside the jit
program, and an optional `model` axis tensor-parallelizes the wide dense
layers.
"""

from h36x.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    shard_params,
)
from h36x.parallel.feed import prefetch_to_device  # noqa: F401
