"""Reference PHD checkpoint conversion: key mapping, structural match with
the flax model, and the causal-conv tap-order correspondence vs torch
(the replicate-pad parity trap flagged in SURVEY.md §7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h36x.models.phd import PHDFor3DJoints
from h36x.models.torch_import import convert_torch_phd
from h36x.ops.causal_conv import causal_conv1d


def _fake_phd_state_dict(rng, latent=64, feature=32, blocks=(2, 3), hidden=1024):
    """State dict with the reference PHD key layout and shapes."""
    sd = {}
    sd["input_proj.weight"] = rng.normal(size=(latent, feature)).astype(np.float32)
    sd["input_proj.bias"] = rng.normal(size=latent).astype(np.float32)
    for mod, n in zip(("f_movie", "f_AR"), blocks):
        for i in range(n):
            base = f"{mod}.blocks.{i}"
            for gn in ("gn1", "gn2"):
                sd[f"{base}.{gn}.weight"] = rng.normal(size=latent).astype(np.float32)
                sd[f"{base}.{gn}.bias"] = rng.normal(size=latent).astype(np.float32)
            for conv in ("conv1", "conv2"):
                sd[f"{base}.{conv}.conv.weight"] = (
                    rng.normal(size=(latent, latent, 3)).astype(np.float32) * 0.05
                )
                sd[f"{base}.{conv}.conv.bias"] = rng.normal(size=latent).astype(np.float32)
    # real reference layout: final Linear at Sequential index 5
    dims = [(latent + 51, hidden), (hidden, hidden), (hidden, 51)]
    for idx, (i_dim, o_dim) in zip(("0", "3", "5"), dims):
        sd[f"f_3D.mlp.{idx}.weight"] = (
            rng.normal(size=(o_dim, i_dim)).astype(np.float32) * 0.05
        )
        sd[f"f_3D.mlp.{idx}.bias"] = rng.normal(size=o_dim).astype(np.float32)
    sd["f_3D.y0"] = np.zeros(51, np.float32)
    return sd


class TestPHDConversion:
    def test_structure_matches_model_init(self, rng):
        sd = _fake_phd_state_dict(rng)
        converted = convert_torch_phd(sd)
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=2)
        init_params = jax.device_get(
            model.init(jax.random.key(0), jnp.zeros((1, 4, 32)))["params"]
        )
        flat_c = jax.tree_util.tree_flatten_with_path(converted)[0]
        flat_i = jax.tree_util.tree_flatten_with_path(init_params)[0]
        shapes_c = {tuple(map(str, kp)): v.shape for kp, v in flat_c}
        shapes_i = {tuple(map(str, kp)): v.shape for kp, v in flat_i}
        assert shapes_c == shapes_i

    def test_converted_model_runs(self, rng):
        sd = _fake_phd_state_dict(rng)
        params = jax.tree.map(jnp.asarray, convert_torch_phd(sd))
        model = PHDFor3DJoints(latent_dim=64, feature_dim=32, number_blocks=2)
        feats = jnp.asarray(rng.normal(size=(2, 6, 32)), dtype=jnp.float32)
        out = model.apply({"params": params}, feats)[2]
        assert out.shape == (2, 6, 17, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_linear_transpose(self, rng):
        sd = _fake_phd_state_dict(rng)
        converted = convert_torch_phd(sd)
        np.testing.assert_array_equal(
            converted["input_proj"]["kernel"], sd["input_proj.weight"].T
        )
        np.testing.assert_array_equal(
            converted["f_3D"]["fc2"]["kernel"], sd["f_3D.mlp.3.weight"].T
        )

    def test_y0_buffer_dropped(self, rng):
        converted = convert_torch_phd(_fake_phd_state_dict(rng))
        assert "y0" not in converted["f_3D"]

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            convert_torch_phd({"f_movie.blocks.0.bogus.weight": np.zeros(3)})


class TestExportRoundTrip:
    def test_convert_export_is_identity(self, rng):
        from h36x.models.torch_import import export_phd_to_torch

        sd = _fake_phd_state_dict(rng)
        back = export_phd_to_torch(convert_torch_phd(sd))
        assert set(back) == set(sd)
        for k in sd:
            if k == "f_3D.y0":
                np.testing.assert_array_equal(back[k], np.zeros(51, np.float32))
            else:
                np.testing.assert_array_equal(back[k], sd[k])


class TestCausalConvTapOrder:
    def test_matches_torch_replicate_pad_conv1d(self, rng):
        """Converted (O,I,K)->(K,I,O) weights through our causal_conv1d must
        equal torch's replicate-pad + Conv1d exactly (src/model.py:29-33)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        b, t, d_in, d_out, k = 2, 7, 6, 5, 3
        x = rng.normal(size=(b, t, d_in)).astype(np.float32)
        w_torch = rng.normal(size=(d_out, d_in, k)).astype(np.float32)
        bias = rng.normal(size=d_out).astype(np.float32)

        tx = torch.from_numpy(np.transpose(x, (0, 2, 1)))  # (B, C, T)
        tx = F.pad(tx, (k - 1, 0), mode="replicate")
        want = F.conv1d(tx, torch.from_numpy(w_torch), torch.from_numpy(bias))
        want = np.transpose(want.numpy(), (0, 2, 1))  # (B, T, O)

        kernel = np.transpose(w_torch, (2, 1, 0))  # the converter's layout
        got = np.asarray(
            causal_conv1d(jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias))
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
