"""Training subsystem: losses/metrics, train state, jit steps, checkpoints, loop."""

from h36x.train.losses import bone_length_loss, mpjpe, mse3d  # noqa: F401
