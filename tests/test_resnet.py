"""ResNet-50 backbone: parameter count, conv/pool/BN semantics vs torch
functional oracles (torch CPU is available; torchvision is not), and the
torch state_dict converter (key mapping + structural match)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flax.linen as nn

from h36x.models.resnet import ResNet50, count_params, init_resnet_params
from h36x.models.torch_import import convert_torch_resnet50


@pytest.fixture(scope="module")
def small_input(rng=None):
    return np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)


class TestArchitecture:
    def test_param_count(self):
        """torchvision resnet50 has 25,557,032 params; headless (no fc
        2048*1000+1000) leaves 23,508,032."""
        model = ResNet50()
        variables = init_resnet_params(model, jax.random.key(0), input_hw=64)
        assert count_params(variables) == 23_508_032

    def test_output_shape_any_hw(self, small_input):
        model = ResNet50()
        variables = init_resnet_params(model, jax.random.key(0), input_hw=64)
        out = model.apply(variables, jnp.asarray(small_input))
        assert out.shape == (2, 2048)
        out224 = model.apply(
            variables, jnp.zeros((1, 224, 224, 3), jnp.float32)
        )
        assert out224.shape == (1, 2048)

    def test_batch_stats_structure(self):
        model = ResNet50()
        variables = init_resnet_params(model, jax.random.key(0), input_hw=64)
        assert "batch_stats" in variables
        # 53 BN layers in resnet50: 1 stem + 3*16 blocks + 4 downsample
        n_bn = len(jax.tree.leaves(variables["batch_stats"])) // 2
        assert n_bn == 53


class TestOpSemanticsVsTorch:
    """Validate conv/maxpool padding+stride semantics against torch.nn.functional."""

    def test_conv_7x7_stride2_pad3(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(1, 20, 20, 3)).astype(np.float32)
        w_oihw = rng.normal(size=(8, 3, 7, 7)).astype(np.float32)

        conv = nn.Conv(8, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)
        kernel = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))
        out = conv.apply({"params": {"kernel": kernel}}, jnp.asarray(x))

        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        tout = torch.nn.functional.conv2d(tx, torch.from_numpy(w_oihw), stride=2, padding=3)
        want = np.transpose(tout.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)

    def test_conv_3x3_stride2_pad1(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(1, 15, 15, 4)).astype(np.float32)
        w_oihw = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)
        conv = nn.Conv(6, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False)
        kernel = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))
        out = conv.apply({"params": {"kernel": kernel}}, jnp.asarray(x))
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        tout = torch.nn.functional.conv2d(tx, torch.from_numpy(w_oihw), stride=2, padding=1)
        want = np.transpose(tout.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)

    def test_maxpool_3x3_stride2_pad1(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(1, 17, 17, 4)).astype(np.float32)
        padded = jnp.pad(
            jnp.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
        )
        out = nn.max_pool(padded, (3, 3), strides=(2, 2))
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        tout = torch.nn.functional.max_pool2d(tx, 3, stride=2, padding=1)
        want = np.transpose(tout.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)

    def test_batchnorm_inference(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(2, 5, 5, 8)).astype(np.float32)
        gamma = rng.normal(size=8).astype(np.float32)
        beta = rng.normal(size=8).astype(np.float32)
        mean = rng.normal(size=8).astype(np.float32)
        var = np.abs(rng.normal(size=8)).astype(np.float32) + 0.5

        bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
        out = bn.apply(
            {
                "params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
                "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
            },
            jnp.asarray(x),
        )
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        tout = torch.nn.functional.batch_norm(
            tx, torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(gamma), torch.from_numpy(beta), training=False, eps=1e-5,
        )
        want = np.transpose(tout.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


class TestBottleneckComposition:
    """Whole Bottleneck block vs a torch-functional oracle — validates the
    v1.5 stride placement (on the 3x3), projection shortcut, and BN wiring
    as a composition, not just per-op."""

    def test_projection_block_stride2(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        cin, width = 16, 8
        x = rng.normal(size=(2, 9, 9, cin)).astype(np.float32)

        from h36x.models.resnet import Bottleneck

        block = Bottleneck(features=width, strides=2)
        variables = block.init(jax.random.key(0), jnp.asarray(x))

        # overwrite with random-but-known weights/stats
        def randomize(tree, path=""):
            return jax.tree.map(
                lambda p: jnp.asarray(
                    np.random.default_rng(abs(hash(path)) % 2**31 or 1)
                    .normal(size=p.shape)
                    .astype(np.float32)
                    * 0.2
                ),
                tree,
            )

        params = randomize(variables["params"])
        stats = jax.tree.map(
            lambda s: jnp.abs(jnp.asarray(
                np.random.default_rng(3).normal(size=s.shape).astype(np.float32)
            )) + 0.5,
            variables["batch_stats"],
        )
        got = np.asarray(
            block.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
        )

        def t(a):
            return torch.from_numpy(np.asarray(a))

        def conv(tx, kernel, stride):
            w = t(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))  # HWIO->OIHW
            pad = (kernel.shape[0] - 1) // 2
            return F.conv2d(tx, w, stride=stride, padding=pad)

        def bn(tx, p, s):
            return F.batch_norm(
                tx, t(s["mean"]), t(s["var"]), t(p["scale"]), t(p["bias"]),
                training=False, eps=1e-5,
            )

        tx = t(np.transpose(x, (0, 3, 1, 2)))
        y = F.relu(bn(conv(tx, params["conv1"]["kernel"], 1),
                      params["bn1"], stats["bn1"]))
        y = F.relu(bn(conv(y, params["conv2"]["kernel"], 2),
                      params["bn2"], stats["bn2"]))
        y = bn(conv(y, params["conv3"]["kernel"], 1), params["bn3"], stats["bn3"])
        res = bn(conv(tx, params["downsample_conv"]["kernel"], 2),
                 params["downsample_bn"], stats["downsample_bn"])
        want = np.transpose(F.relu(y + res).numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def _fake_torchvision_state_dict(rng):
    """Build a state_dict with torchvision resnet50's exact key structure."""
    sd = {}

    def conv(name, cout, cin, k):
        # small scale so 50 random layers don't overflow f32 in the run test
        sd[f"{name}.weight"] = (
            rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05
        )

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(rng.normal(size=c)).astype(np.float32) + 0.5
        sd[f"{name}.num_batches_tracked"] = np.array(0)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    sizes = [3, 4, 6, 3]
    cin = 64
    for stage, blocks in enumerate(sizes):
        width = 64 * 2**stage
        for b in range(blocks):
            base = f"layer{stage+1}.{b}"
            conv(f"{base}.conv1", width, cin, 1)
            bn(f"{base}.bn1", width)
            conv(f"{base}.conv2", width, width, 3)
            bn(f"{base}.bn2", width)
            conv(f"{base}.conv3", width * 4, width, 1)
            bn(f"{base}.bn3", width * 4)
            if b == 0:
                conv(f"{base}.downsample.0", width * 4, cin, 1)
                bn(f"{base}.downsample.1", width * 4)
            cin = width * 4
    sd["fc.weight"] = rng.normal(size=(1000, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=1000).astype(np.float32)
    return sd


class TestTorchImport:
    def test_converted_structure_matches_init(self, rng):
        sd = _fake_torchvision_state_dict(rng)
        converted = convert_torch_resnet50(sd)

        model = ResNet50()
        variables = init_resnet_params(model, jax.random.key(0), input_hw=64)

        flat_c = jax.tree_util.tree_flatten_with_path(converted["params"])[0]
        flat_i = jax.tree_util.tree_flatten_with_path(
            jax.device_get(variables["params"])
        )[0]
        paths_c = {tuple(str(k) for k in kp): v.shape for kp, v in flat_c}
        paths_i = {tuple(str(k) for k in kp): v.shape for kp, v in flat_i}
        assert paths_c == paths_i

        flat_cs = jax.tree_util.tree_flatten_with_path(converted["batch_stats"])[0]
        flat_is = jax.tree_util.tree_flatten_with_path(
            jax.device_get(variables["batch_stats"])
        )[0]
        assert {tuple(str(k) for k in kp): v.shape for kp, v in flat_cs} == {
            tuple(str(k) for k in kp): v.shape for kp, v in flat_is
        }

    def test_converted_weights_run(self, rng):
        sd = _fake_torchvision_state_dict(rng)
        converted = jax.tree.map(jnp.asarray, convert_torch_resnet50(sd))
        model = ResNet50()
        out = model.apply(converted, jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 2048)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_conv_transpose_is_oihw_to_hwio(self, rng):
        sd = {"conv1.weight": rng.normal(size=(64, 3, 7, 7)).astype(np.float32)}
        out = convert_torch_resnet50(sd)
        k = out["params"]["conv1"]["kernel"]
        assert k.shape == (7, 7, 3, 64)
        np.testing.assert_array_equal(k[1, 2, 0, 5], sd["conv1.weight"][5, 0, 1, 2])


def _build_torch_resnet50():
    """torchvision's resnet50 graph in plain torch (torchvision itself is not
    installed here). Key layout, init and forward match
    torchvision.models.resnet.ResNet(Bottleneck, [3, 4, 6, 3]) so the
    resulting state_dict is a faithful stand-in for the real
    IMAGENET1K_V2 file (reference src/preprocess_resnet_features.py:207-209).
    """
    import torch
    from torch import nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, cin, width, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride=stride,
                                    padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(width * 4)
            self.relu = tnn.ReLU(inplace=True)
            if stride != 1 or cin != width * 4:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                    tnn.BatchNorm2d(width * 4),
                )
            else:
                self.downsample = None

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idt)

    class ResNet50Torch(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            cin = 64
            for stage, blocks in enumerate((3, 4, 6, 3)):
                width = 64 * 2**stage
                layer = []
                for b in range(blocks):
                    stride = 2 if (stage > 0 and b == 0) else 1
                    layer.append(Bottleneck(cin, width, stride))
                    cin = width * 4
                setattr(self, f"layer{stage + 1}", tnn.Sequential(*layer))
            self.fc = tnn.Linear(2048, 1000)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in (1, 2, 3, 4):
                x = getattr(self, f"layer{i}")(x)
            return x.mean(dim=(2, 3))  # headless: pooled 2048-D features

    return ResNet50Torch()


class TestFullNetworkOracle:
    """End-to-end: full 50-layer torch network -> state_dict -> converter ->
    flax ResNet50 agree on pooled features (VERDICT round-1 missing item #2)."""

    def test_full_resnet50_feature_agreement(self, rng):
        import torch

        torch.manual_seed(0)
        ref = _build_torch_resnet50().eval()
        # Randomize BN running stats so running-average semantics are
        # actually exercised (fresh init is mean=0/var=1, which would let a
        # stats-mapping bug pass unnoticed).
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0.0, 0.05)
                    m.running_var.uniform_(0.8, 1.3)

        x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

        converted = jax.tree.map(
            jnp.asarray, convert_torch_resnet50(ref.state_dict())
        )
        got = np.asarray(ResNet50().apply(converted, jnp.asarray(x)))

        assert got.shape == want.shape == (2, 2048)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4 * scale)
