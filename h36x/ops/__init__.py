"""TPU compute ops: jnp reference implementations + Pallas kernels.

Every op has a pure-jnp implementation (works everywhere, including the CPU
test mesh) and, where profitable, a Pallas TPU kernel selected via
:func:`h36x.ops.dispatch.use_pallas`.
"""

from h36x.ops.causal_conv import causal_conv1d  # noqa: F401
from h36x.ops.resize import resize_bilinear  # noqa: F401
