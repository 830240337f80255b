"""Loss/metric tests vs hand-computed values (reference src/train.py:29-57)."""

import numpy as np
import jax.numpy as jnp

from h36x.train.losses import bone_length_loss, mpjpe, mse3d
from h36x.geometry.skeleton import H36M_EDGES


def test_mse3d_exact():
    pred = jnp.ones((1, 2, 17, 3)) * 2.0
    gt = jnp.zeros((1, 2, 17, 3))
    assert float(mse3d(pred, gt)) == 4.0


def test_mpjpe_exact():
    gt = jnp.zeros((1, 1, 17, 3))
    pred = jnp.zeros((1, 1, 17, 3)).at[..., 0].set(3.0).at[..., 1].set(4.0)
    # every joint displaced by a 3-4-5 triangle -> mpjpe = 5
    assert float(mpjpe(pred, gt)) == 5.0


def test_mpjpe_is_mean_over_joints(rng):
    pred = jnp.asarray(rng.normal(size=(2, 3, 17, 3)), dtype=jnp.float32)
    gt = jnp.asarray(rng.normal(size=(2, 3, 17, 3)), dtype=jnp.float32)
    want = np.linalg.norm(np.asarray(pred) - np.asarray(gt), axis=-1).mean()
    assert float(mpjpe(pred, gt)) == np.float32(want)


def test_bone_length_zero_for_identical():
    pose = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2, 17, 3)), jnp.float32)
    assert float(bone_length_loss(pose, pose)) == 0.0


def test_bone_length_translation_invariant(rng):
    pose = jnp.asarray(rng.normal(size=(1, 2, 17, 3)), dtype=jnp.float32)
    shifted = pose + jnp.asarray([10.0, -5.0, 3.0])
    assert float(bone_length_loss(shifted, pose)) < 1e-9


def test_bone_length_manual(rng):
    gt = np.asarray(rng.normal(size=(1, 1, 17, 3)), dtype=np.float32)
    pred = np.asarray(rng.normal(size=(1, 1, 17, 3)), dtype=np.float32)
    lens_p = np.array(
        [np.linalg.norm(pred[0, 0, b] - pred[0, 0, a]) for a, b in H36M_EDGES]
    )
    lens_g = np.array(
        [np.linalg.norm(gt[0, 0, b] - gt[0, 0, a]) for a, b in H36M_EDGES]
    )
    want = np.mean((lens_p - lens_g) ** 2)
    got = float(bone_length_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
