"""AOT serving artifacts (jax.export / StableHLO): roundtrip parity with the
flax forward, symbolic-batch polymorphism, rollout artifacts, and the export
CLI. The reference has no deployment path to mirror (its serving is loading
last.pt back into the training code, src/results.py:175-187); the oracle here
is h36x's own model.apply."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import serialization

from h36x.export import (
    artifact_info,
    export_forward,
    export_rollout,
    load_artifact,
    save_artifact,
)
from h36x.models.phd import PHDFor3DJoints
from h36x.serve import make_rollout_fn

SEQ, FEAT = 10, 32


@pytest.fixture(scope="module")
def setup():
    model = PHDFor3DJoints(latent_dim=64, feature_dim=FEAT, number_blocks=1,
                           groups=8)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, SEQ, FEAT)).astype(np.float32)
    params = jax.device_get(
        model.init(jax.random.key(0), jnp.asarray(feats))["params"]
    )
    return model, params, feats


class TestForwardArtifact:
    def test_symbolic_batch_matches_model_apply(self, setup):
        model, params, feats = setup
        blob = export_forward(params, seq_len=SEQ, feature_dim=FEAT, groups=8)
        assert isinstance(blob, bytes)
        fn = load_artifact(blob)
        rng = np.random.default_rng(1)
        for b in (2, 5):  # one artifact, multiple batch sizes
            x = rng.normal(size=(b, SEQ, FEAT)).astype(np.float32)
            want = model.apply({"params": params}, jnp.asarray(x),
                               train=False)[2]
            np.testing.assert_allclose(
                np.asarray(fn(x)), np.asarray(want), rtol=1e-4, atol=1e-5
            )

    def test_fixed_batch_rejects_other_sizes(self, setup):
        _, params, feats = setup
        blob = export_forward(params, seq_len=SEQ, feature_dim=FEAT,
                              groups=8, batch=2)
        fn = load_artifact(blob)
        assert np.asarray(fn(feats)).shape == (2, SEQ, 17, 3)
        with pytest.raises(Exception):
            fn(np.zeros((3, SEQ, FEAT), np.float32))

    def test_bf16_compute_dtype_smaller_and_close(self, setup):
        """compute_dtype=bfloat16 must bake smaller constants (less than
        ~60% of the f32 artifact) while keeping f32 in/out and tracking the
        f32 forward to bf16-level tolerance."""
        model, params, feats = setup
        f32 = export_forward(params, seq_len=SEQ, feature_dim=FEAT, groups=8)
        bf16 = export_forward(params, seq_len=SEQ, feature_dim=FEAT,
                              groups=8, compute_dtype=jnp.bfloat16)
        assert len(bf16) < 0.6 * len(f32)

        out = load_artifact(bf16)(feats)
        assert np.asarray(out).dtype == np.float32
        want = model.apply({"params": params}, jnp.asarray(feats),
                           train=False)[2]
        assert float(jnp.max(jnp.abs(jnp.asarray(out) - want))) < 2e-2

    def test_file_roundtrip_and_info(self, setup, tmp_path):
        _, params, feats = setup
        blob = export_forward(params, seq_len=SEQ, feature_dim=FEAT, groups=8)
        path = save_artifact(blob, tmp_path / "phd.hlo")
        fn = load_artifact(path)
        out = np.asarray(fn(feats))
        assert out.shape == (2, SEQ, 17, 3) and np.isfinite(out).all()

        info = artifact_info(path)
        assert "cpu" in info["platforms"]
        assert info["nbytes"] == len(blob)
        assert len(info["in_avals"]) == 1

        # h36x-serve derives its wire shapes from this; batch is symbolic
        from h36x.export import artifact_input_shape

        assert artifact_input_shape(path) == (None, SEQ, FEAT)

    def test_input_shape_fixed_batch(self, setup):
        from h36x.export import artifact_input_shape

        _, params, _ = setup
        blob = export_forward(params, seq_len=SEQ, feature_dim=FEAT,
                              groups=8, batch=3)
        assert artifact_input_shape(blob) == (3, SEQ, FEAT)


class TestRolloutArtifact:
    def test_matches_rollout_fn(self, setup):
        _, params, feats = setup
        steps = 3
        blob = export_rollout(params, steps=steps, seq_len=SEQ,
                              feature_dim=FEAT, groups=8)
        fn = load_artifact(blob)
        ctx, fut = fn(feats)
        want_ctx, want_fut = make_rollout_fn(steps, groups=8)(
            params, jnp.asarray(feats)
        )
        np.testing.assert_allclose(np.asarray(ctx), np.asarray(want_ctx),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fut), np.asarray(want_fut),
                                   rtol=1e-4, atol=1e-5)


class TestExportCLI:
    def test_export_check_and_sidecar(self, setup, tmp_path):
        from h36x.cli.export import main as export_main

        model, params, _ = setup
        ckpt_path = tmp_path / "params.msgpack"
        ckpt_path.write_bytes(serialization.to_bytes(params))

        out = tmp_path / "art" / "phd.hlo"
        export_main([
            "--model-path", str(ckpt_path), "--out", str(out),
            "--seq-len", str(SEQ), "--feature-dim", str(FEAT),
            "--latent-dim", "64", "--num-blocks", "1", "--groups", "8",
            "--platforms", "cpu", "--check",
        ])
        assert out.exists()
        with open(str(out) + ".json") as f:
            sidecar = json.load(f)
        assert sidecar["kind"] == "forward"
        assert sidecar["platforms"] == ["cpu"]

        # doctor --artifact: sidecar hash verified, then corruption caught
        import hashlib

        from h36x.cli.doctor import main as doctor_main

        assert sidecar["sha256"] == hashlib.sha256(out.read_bytes()).hexdigest()
        doctor_main(["--artifact", str(out)])
        blob = bytearray(out.read_bytes())
        blob[len(blob) // 2] ^= 0x01
        out.write_bytes(blob)
        with pytest.raises(SystemExit, match="problems"):
            doctor_main(["--artifact", str(out)])

    def test_rollout_kind(self, setup, tmp_path):
        from h36x.cli.export import main as export_main

        _, params, feats = setup
        ckpt_path = tmp_path / "params.msgpack"
        ckpt_path.write_bytes(serialization.to_bytes(params))
        out = tmp_path / "roll.hlo"
        export_main([
            "--model-path", str(ckpt_path), "--out", str(out),
            "--kind", "rollout", "--forecast", "2",
            "--seq-len", str(SEQ), "--feature-dim", str(FEAT),
            "--latent-dim", "64", "--num-blocks", "1", "--groups", "8",
            "--platforms", "cpu",
        ])
        ctx, fut = load_artifact(out)(feats)
        assert np.asarray(fut).shape == (2, 2, 17, 3)
