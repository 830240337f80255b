"""Human3.6M 17-joint skeleton constants.

Joint ordering follows the standard H36M 17-joint subset (reference
src/dataset.py:28-46, src/datasets/read_human_36m.py:46):

  0: Pelvis (root)
  1: R_Hip    2: R_Knee    3: R_Ankle
  4: L_Hip    5: L_Knee    6: L_Ankle
  7: Spine    8: Neck/Thorax
  9: Nose    10: Head
 11: L_Shoulder 12: L_Elbow 13: L_Wrist
 14: R_Shoulder 15: R_Elbow 16: R_Wrist
"""

from __future__ import annotations

import numpy as np

NUM_JOINTS = 17

H36M_JOINT_NAMES = (
    "pelvis",
    "r_hip", "r_knee", "r_ankle",
    "l_hip", "l_knee", "l_ankle",
    "spine", "thorax", "nose", "head",
    "l_shoulder", "l_elbow", "l_wrist",
    "r_shoulder", "r_elbow", "r_wrist",
)

# Indices into the raw 32-joint H36M pose arrays selecting the 17-joint subset
# (reference src/datasets/read_human_36m.py:46).
H36M_RAW_JOINT_IDS = (0, 1, 2, 3, 6, 7, 8, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27)

# Skeleton bone edges, 16 total (reference src/train.py:29-35, visualize.py:11-17).
H36M_EDGES = (
    (0, 1), (1, 2), (2, 3),
    (0, 4), (4, 5), (5, 6),
    (0, 7), (7, 8), (8, 9), (9, 10),
    (8, 11), (11, 12), (12, 13),
    (8, 14), (14, 15), (15, 16),
)

# Left/right mirrored joint pairs swapped during horizontal flips
# (reference src/dataset.py:39-46).
H36M_FLIP_PAIRS = (
    (1, 4),    # hips
    (2, 5),    # knees
    (3, 6),    # ankles
    (14, 11),  # shoulders
    (15, 12),  # elbows
    (16, 13),  # wrists
)


def edge_index_arrays() -> tuple[np.ndarray, np.ndarray]:
    """(src, dst) int32 arrays of the 16 skeleton edges for vectorized bone math."""
    src = np.array([e[0] for e in H36M_EDGES], dtype=np.int32)
    dst = np.array([e[1] for e in H36M_EDGES], dtype=np.int32)
    return src, dst


def flip_permutation(num_joints: int = NUM_JOINTS) -> np.ndarray:
    """Joint permutation realizing a left/right swap as a single gather.

    A gather with this permutation is TPU-friendlier than pairwise swaps: it
    compiles to one static `take` instead of a chain of dynamic updates.
    """
    perm = np.arange(num_joints, dtype=np.int32)
    for a, b in H36M_FLIP_PAIRS:
        perm[a], perm[b] = b, a
    return perm
