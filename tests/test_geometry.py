"""Exact-value unit tests for the geometry core (crop/camera/skeleton).

Oracles are independent numpy implementations of the documented reference
semantics (reference src/dataset.py:75-138, src/train.py:84-110,
src/datasets/read_human_36m.py:169-231).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from h36x.geometry import (
    H36M_EDGES,
    H36M_FLIP_PAIRS,
    H36M_RAW_JOINT_IDS,
    adjust_camera_after_crop_and_resize,
    adjust_joints2d_after_crop_and_resize,
    compute_square_crop_from_2d,
    intrinsics_matrix,
    project_point_radial,
    project_with_K,
    rotation_matrix_xyz,
)
from h36x.geometry.skeleton import flip_permutation


class TestSkeleton:
    def test_edge_count_and_range(self):
        assert len(H36M_EDGES) == 16
        for a, b in H36M_EDGES:
            assert 0 <= a < 17 and 0 <= b < 17

    def test_flip_pairs(self):
        assert len(H36M_FLIP_PAIRS) == 6
        perm = flip_permutation()
        # applying the permutation twice is the identity
        assert np.array_equal(perm[perm], np.arange(17))
        # pelvis/spine/thorax/nose/head are fixed points
        for j in (0, 7, 8, 9, 10):
            assert perm[j] == j

    def test_raw_joint_ids(self):
        assert len(H36M_RAW_JOINT_IDS) == 17
        assert len(set(H36M_RAW_JOINT_IDS)) == 17
        assert max(H36M_RAW_JOINT_IDS) < 32


class TestCrop:
    def test_square_crop_simple(self):
        # joints spanning x in [100, 200], y in [150, 250] in a 1000x1000 image
        joints = np.array([[100.0, 150.0], [200.0, 250.0]])
        box = compute_square_crop_from_2d(joints, img_h=1000, img_w=1000, scale=1.6)
        top, left, h, w = box
        assert h == w
        # side = 1.6 * max(100, 100) = 160, centered on (150, 200)
        assert h == 160
        assert left == 150 - 80
        assert top == 200 - 80

    def test_square_crop_clamps_to_image(self):
        joints = np.array([[2.0, 2.0], [50.0, 40.0]])
        box = compute_square_crop_from_2d(joints, img_h=100, img_w=100, scale=1.6)
        top, left, h, w = (int(v) for v in box)
        assert left >= 0 and top >= 0
        assert left + w <= 100 and top + h <= 100

    def test_square_crop_degenerate_point(self):
        # all joints at one point: extent clamps to >= 1 px
        joints = np.full((17, 2), 55.0)
        box = compute_square_crop_from_2d(joints, img_h=200, img_w=200)
        assert int(box[2]) >= 1

    def test_adjust_joints2d(self):
        joints = np.array([[[60.0, 80.0], [100.0, 120.0]]])  # (1,2,2)
        box = np.array([40, 20, 200, 200])  # top=40, left=20, 200x200 -> 224
        out = adjust_joints2d_after_crop_and_resize(joints, box, out_size=224)
        s = 224.0 / 200.0
        np.testing.assert_allclose(out[0, 0], [(60 - 20) * s, (80 - 40) * s], rtol=1e-6)
        np.testing.assert_allclose(out[0, 1], [(100 - 20) * s, (120 - 40) * s], rtol=1e-6)

    def test_adjust_joints2d_does_not_mutate_input(self):
        joints = np.ones((3, 2), dtype=np.float32)
        before = joints.copy()
        adjust_joints2d_after_crop_and_resize(joints, np.array([0, 0, 10, 10]))
        np.testing.assert_array_equal(joints, before)


class TestCamera:
    def test_intrinsics_matrix(self):
        K = intrinsics_matrix([1000.0, 1100.0], [320.0, 240.0])
        np.testing.assert_allclose(
            K, [[1000, 0, 320], [0, 1100, 240], [0, 0, 1]], rtol=1e-7
        )

    def test_adjust_camera(self):
        box = np.array([40, 20, 200, 200])
        K = adjust_camera_after_crop_and_resize([1000.0, 1100.0], [320.0, 240.0], box)
        s = 224.0 / 200.0
        assert K[0, 0] == pytest.approx(1000 * s)
        assert K[1, 1] == pytest.approx(1100 * s)
        assert K[0, 2] == pytest.approx((320 - 20) * s)
        assert K[1, 2] == pytest.approx((240 - 40) * s)
        assert K[2, 2] == 1.0

    def test_project_with_K_matches_manual(self, rng):
        P = rng.normal(size=(2, 5, 17, 3)).astype(np.float32)
        P[..., 2] = np.abs(P[..., 2]) + 1.0  # in front of the camera
        K = intrinsics_matrix([1145.0, 1144.0], [512.0, 515.0])
        uv = np.asarray(project_with_K(jnp.asarray(P), jnp.asarray(K)))
        # manual pinhole
        expect_u = (1145.0 * P[..., 0] + 512.0 * P[..., 2]) / P[..., 2]
        expect_v = (1144.0 * P[..., 1] + 515.0 * P[..., 2]) / P[..., 2]
        np.testing.assert_allclose(uv[..., 0], expect_u, rtol=1e-4)
        np.testing.assert_allclose(uv[..., 1], expect_v, rtol=1e-4)

    @pytest.mark.parametrize("kshape", ["single", "batch", "batch_time"])
    def test_project_with_K_broadcasting(self, rng, kshape):
        B, T, J = 3, 4, 17
        P = rng.normal(size=(B, T, J, 3)).astype(np.float32)
        P[..., 2] = np.abs(P[..., 2]) + 1.0
        K1 = intrinsics_matrix([1000.0, 1000.0], [500.0, 500.0])
        if kshape == "single":
            K = K1
            uv = np.asarray(project_with_K(jnp.asarray(P), jnp.asarray(K)))
            ref = np.asarray(project_with_K(jnp.asarray(P[0, 0]), jnp.asarray(K1)))
            np.testing.assert_allclose(uv[0, 0], ref, rtol=1e-5)
        elif kshape == "batch":
            K = np.stack([K1] * B)
            uv = np.asarray(project_with_K(jnp.asarray(P), jnp.asarray(K)))
        else:
            K = np.broadcast_to(K1, (B, T, 3, 3)).copy()
            uv = np.asarray(project_with_K(jnp.asarray(P), jnp.asarray(K)))
        assert uv.shape == (B, T, J, 2)

    def test_project_clamps_z(self):
        P = np.array([[1.0, 1.0, 0.0]], dtype=np.float32)  # z = 0
        K = intrinsics_matrix([1.0, 1.0], [0.0, 0.0])
        uv = np.asarray(project_with_K(jnp.asarray(P), jnp.asarray(K)))
        assert np.all(np.isfinite(uv))

    def test_rotation_matrix_orthonormal(self, rng):
        angles = rng.normal(size=3)
        R = rotation_matrix_xyz(angles)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) == pytest.approx(1.0)

    def test_rotation_matrix_zero_is_identity(self):
        np.testing.assert_allclose(rotation_matrix_xyz([0, 0, 0]), np.eye(3))

    def test_radial_projection_zero_distortion_matches_pinhole(self, rng):
        """With k = 0 the radial model must reduce to pinhole through K."""
        N = 11
        P_world = rng.normal(size=(N, 3)).astype(np.float64) * 100
        R = rotation_matrix_xyz(rng.normal(size=3) * 0.1)
        t = rng.normal(size=3) * 10
        f = np.array([1100.0, 1120.0])
        c = np.array([508.0, 512.0])
        k_all = np.zeros(5)
        # put points in front of the camera
        P_cam = (P_world - t) @ R.T
        P_cam[:, 2] = np.abs(P_cam[:, 2]) + 500.0
        P_world = P_cam @ np.linalg.inv(R).T + t

        proj = np.asarray(project_point_radial(P_world, R, t, f, c, k_all))
        K = intrinsics_matrix(f, c)
        expect = np.asarray(project_with_K(jnp.asarray(P_cam, dtype=jnp.float32), jnp.asarray(K)))
        np.testing.assert_allclose(proj, expect, rtol=1e-3)

    def test_radial_projection_distortion_direction(self):
        """Positive k1 (barrel) pushes off-axis points outward from center."""
        P_cam = np.array([[100.0, 0.0, 1000.0]])
        R = np.eye(3)
        t = np.zeros(3)
        f = np.array([1000.0, 1000.0])
        c = np.array([0.0, 0.0])
        no_dist = np.asarray(project_point_radial(P_cam, R, t, f, c, np.zeros(5)))
        with_dist = np.asarray(
            project_point_radial(P_cam, R, t, f, c, np.array([0.5, 0, 0, 0, 0]))
        )
        assert with_dist[0, 0] > no_dist[0, 0]
