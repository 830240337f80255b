"""Pure-function camera / crop / skeleton geometry (jnp + numpy hosts).

Everything here is stateless and exactly unit-tested; this is the foundation
layer of the framework (reference parity targets are cited per function).
"""

from h36x.geometry.skeleton import (  # noqa: F401
    H36M_EDGES,
    H36M_FLIP_PAIRS,
    H36M_JOINT_NAMES,
    H36M_RAW_JOINT_IDS,
    NUM_JOINTS,
    edge_index_arrays,
)
from h36x.geometry.camera import (  # noqa: F401
    adjust_camera_after_crop_and_resize,
    intrinsics_matrix,
    project_point_radial,
    project_with_K,
    rotation_matrix_xyz,
)
from h36x.geometry.crop import (  # noqa: F401
    adjust_joints2d_after_crop_and_resize,
    compute_square_crop_from_2d,
)
