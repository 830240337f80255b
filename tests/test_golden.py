"""Golden regression fixtures: deterministic outputs of the semantic core,
checked into tests/golden/. These freeze the numerics across refactors —
if a change breaks one of these, it changed model/geometry behavior, not
just implementation.

Regenerate (only when a semantic change is intended):
    python -m tests.test_golden regen
"""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _compute_all():
    from h36x.geometry.camera import project_point_radial, project_with_K
    from h36x.geometry.crop import compute_square_crop_from_2d
    from h36x.models.phd import PHDFor3DJoints
    from h36x.ops.causal_conv import causal_conv1d
    from h36x.ops.preprocess import crop_resize_matrices

    out = {}
    rng = np.random.default_rng(20260816)

    # PHD forward at reduced size, fixed init + input
    model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=2)
    feats = jnp.asarray(rng.normal(size=(2, 8, 32)), dtype=jnp.float32)
    params = model.init(jax.random.key(123), feats)["params"]
    phi, phi_hat, joints, _ = model.apply({"params": params}, feats)
    out["phd_phi"] = np.asarray(phi)
    out["phd_phi_hat"] = np.asarray(phi_hat)
    out["phd_joints"] = np.asarray(joints)

    # causal conv
    x = jnp.asarray(rng.normal(size=(1, 6, 8)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 8, 4)), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=(4,)), dtype=jnp.float32)
    out["cconv"] = np.asarray(causal_conv1d(x, w, b))

    # projections
    pts = rng.normal(size=(5, 17, 3)).astype(np.float32)
    pts[..., 2] = np.abs(pts[..., 2]) + 2.0
    K = np.array([[1145.0, 0, 508.0], [0, 1143.0, 512.0], [0, 0, 1]], np.float32)
    out["pinhole"] = np.asarray(project_with_K(jnp.asarray(pts), jnp.asarray(K)))
    out["radial"] = np.asarray(
        project_point_radial(
            pts.reshape(-1, 3) * 100, np.eye(3), np.zeros(3),
            np.array([1100.0, 1102.0]), np.array([500.0, 502.0]),
            np.array([-0.2, 0.24, 0.001, -0.0002, -0.002]),
        )
    )

    # AR rollout (masked-GN fixed-shape semantics, h36x/serve.py)
    from h36x.serve import make_rollout_fn

    ctx, fut = make_rollout_fn(steps=3, groups=32)(params, feats)
    out["rollout_ctx"] = np.asarray(ctx)
    out["rollout_future"] = np.asarray(fut)

    # crop geometry
    j2d = rng.random((8, 17, 2)).astype(np.float32) * np.array([900, 950]) + 30
    out["crop_box"] = compute_square_crop_from_2d(j2d, 1000, 1000).astype(np.int64)
    wy, wx = crop_resize_matrices(out["crop_box"], 1000, 1000, out_size=16)
    out["resize_wy"] = wy
    out["resize_wx"] = wx
    return out


def test_golden_outputs():
    path = GOLDEN / "core_v1.npz"
    assert path.exists(), "golden fixture missing; run `python -m tests.test_golden regen`"
    golden = np.load(path)
    got = _compute_all()
    assert set(golden.files) == set(got)
    for key in golden.files:
        np.testing.assert_allclose(
            got[key], golden[key], rtol=1e-4, atol=1e-5,
            err_msg=f"golden mismatch for {key!r} — semantic change?",
        )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        GOLDEN.mkdir(exist_ok=True)
        np.savez_compressed(GOLDEN / "core_v1.npz", **_compute_all())
        print(f"wrote {GOLDEN / 'core_v1.npz'}")
