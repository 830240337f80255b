"""Camera models: pinhole projection, radial+tangential projection, intrinsics.

jnp implementations so they jit/vmap/grad cleanly on TPU; all are pure.
Parity targets: reference src/train.py:84-110 (pinhole, broadcast K),
src/datasets/read_human_36m.py:169-191 & 220-231 (radial projection,
Euler rotation), src/dataset.py:118-138 (K adjustment after crop/resize).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotation_matrix_xyz(angles) -> np.ndarray:
    """Rotation matrix X(x) @ Y(y) @ Z(z) from Euler angles (radians).

    Matches the composition used for H36M camera extrinsics (reference
    src/datasets/read_human_36m.py:220-231).
    """
    x, y, z = (float(a) for a in np.asarray(angles, dtype=np.float64))
    cx, sx = np.cos(x), np.sin(x)
    cy, sy = np.cos(y), np.sin(y)
    cz, sz = np.cos(z), np.sin(z)
    X = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Z = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (X @ Y) @ Z


def intrinsics_matrix(f, c, dtype=np.float32) -> np.ndarray:
    """Build K = [[fx,0,cx],[0,fy,cy],[0,0,1]] from focal lengths and center."""
    f = np.asarray(f, dtype=dtype).reshape(2)
    c = np.asarray(c, dtype=dtype).reshape(2)
    return np.array(
        [[f[0], 0.0, c[0]], [0.0, f[1], c[1]], [0.0, 0.0, 1.0]], dtype=dtype
    )


def project_with_K(P_cam: jnp.ndarray, K: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Pinhole projection of camera-frame points through intrinsics K.

    P_cam: (..., 3); K: (3,3), (B,3,3), or (B,T,3,3) — broadcast against the
    leading dims of P_cam exactly as the reference does (src/train.py:84-110).
    Returns (..., 2) pixel coordinates.
    """
    P = jnp.asarray(P_cam)
    K = jnp.asarray(K)
    # documented layouts only, like the reference's ValueError guard
    # (src/train.py:84-110): an unexpected K would otherwise broadcast
    # plausibly-but-wrongly against P's leading dims with no error
    if K.ndim not in (2, 3, 4) or K.shape[-2:] != (3, 3):
        raise ValueError(
            f"unexpected K shape {K.shape}; expected (3,3), (B,3,3) or "
            "(B,T,3,3)")
    # Align K's batch dims with P's: K gains singleton dims until K.ndim-2 ==
    # P.ndim-1 would over-broadcast, so expand to match P's leading dims.
    while K.ndim < P.ndim + 1:
        # (…,3,3) -> add a broadcast dim just before the matrix dims
        K = K[..., None, :, :] if K.ndim > 2 else K[None, ...]
    P_h = jnp.einsum("...ij,...j->...i", K, P)
    z = jnp.clip(P_h[..., 2:3], min=eps)
    return P_h[..., 0:2] / z


def project_point_radial(P, R, t, f, c, k_all):
    """Full H36M projection with radial + tangential distortion.

    P: (N,3) world points; R: (3,3); t: (3,); f,c: (2,); k_all: (5,) packed as
    (k1, k2, p1, p2, k3) — the H36M metadata layout (reference
    src/datasets/read_human_36m.py:169-191). Returns (N,2) pixels.
    """
    P = jnp.asarray(P, dtype=jnp.float32)
    R = jnp.asarray(R, dtype=jnp.float32)
    t = jnp.asarray(t, dtype=jnp.float32).reshape(3)
    f = jnp.asarray(f, dtype=jnp.float32).reshape(2)
    c = jnp.asarray(c, dtype=jnp.float32).reshape(2)
    k_all = jnp.asarray(k_all, dtype=jnp.float32).reshape(5)

    radial_k = jnp.stack([k_all[0], k_all[1], k_all[4]])  # k1,k2,k3
    tangential_p = k_all[2:4]  # p1,p2

    X = (P - t) @ R.T  # camera frame, (N,3)
    XX = X[:, :2] / X[:, 2:3]  # normalized image plane, (N,2)

    r2 = jnp.sum(XX**2, axis=1)  # (N,)
    radial = 1.0 + radial_k[0] * r2 + radial_k[1] * r2**2 + radial_k[2] * r2**3
    tan = tangential_p[0] * XX[:, 1] + tangential_p[1] * XX[:, 0]

    XXX = XX * (radial + tan)[:, None] + jnp.outer(r2, tangential_p[::-1])
    return f[None, :] * XXX + c[None, :]


def adjust_camera_after_crop_and_resize(f, c, box, out_size: int = 224) -> np.ndarray:
    """Rebuild K after cropping to `box` and resizing to out_size×out_size.

    box = (top, left, h, w) in original pixels. Principal point shifts by the
    crop offset and everything scales by out/crop (reference
    src/dataset.py:118-138). Host-side numpy: runs in the data pipeline.
    """
    top, left, hh, ww = (float(v) for v in np.asarray(box).reshape(4))
    sx = out_size / ww
    sy = out_size / hh
    f = np.asarray(f, dtype=np.float32).reshape(2)
    c = np.asarray(c, dtype=np.float32).reshape(2)
    f_new = np.array([f[0] * sx, f[1] * sy], dtype=np.float32)
    c_new = np.array([(c[0] - left) * sx, (c[1] - top) * sy], dtype=np.float32)
    return intrinsics_matrix(f_new, c_new)
