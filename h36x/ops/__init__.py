"""TPU compute ops: jnp reference implementations + Pallas kernels.

Every op has a pure-jnp implementation (works everywhere, including the CPU
test mesh) and, where measured profitable, a Pallas TPU kernel selected via
the `use_pallas` keyword on the serving entry points in
:mod:`h36x.infer` / :mod:`h36x.serve` (XLA is the measured production
default — DESIGN.md "Pallas vs XLA").
"""

from h36x.ops.causal_conv import causal_conv1d  # noqa: F401
from h36x.ops.resize import resize_bilinear  # noqa: F401
