"""Convert a torchvision ResNet-50 state_dict into h36x flax variables.

The reference extracts features with torchvision's IMAGENET1K_V2 weights
(reference src/preprocess_resnet_features.py:207-209). This environment has
no torchvision / no network egress, so pretrained weights cannot be fetched
here; when a state_dict file is available (torch.save'd dict of tensors),
this converter maps it weight-for-weight onto :class:`h36x.models.resnet.ResNet50`:

    OIHW conv weights -> HWIO kernels,
    bn.{weight,bias} -> params/{scale,bias},
    bn.running_{mean,var} -> batch_stats/{mean,var},
    layer{L}.{B}.downsample.{0,1} -> layer{L}_{B}/downsample_{conv,bn},
    fc.* dropped (the backbone is headless).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _put(tree: dict, path, value) -> None:
    """Insert value at a nested path, creating intermediate dicts."""
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_torch_resnet50(state_dict: dict) -> dict:
    """state_dict (torch tensors or numpy) -> {'params', 'batch_stats'}."""
    params: dict = {}
    stats: dict = {}
    put = _put

    for key, value in state_dict.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        v = _to_numpy(value)

        m = re.match(r"^(conv1|bn1)\.(.+)$", key)
        if m:
            module = [m.group(1)]
            field = m.group(2)
        else:
            m = re.match(r"^layer(\d)\.(\d+)\.(.+)$", key)
            if not m:
                raise KeyError(f"unrecognized torch key {key!r}")
            block = f"layer{m.group(1)}_{m.group(2)}"
            rest = m.group(3)
            dm = re.match(r"^downsample\.(\d)\.(.+)$", rest)
            if dm:
                sub = "downsample_conv" if dm.group(1) == "0" else "downsample_bn"
                module = [block, sub]
                field = dm.group(2)
            else:
                sub, field = rest.split(".", 1)
                module = [block, sub]

        if field == "weight" and v.ndim == 4:  # conv OIHW -> HWIO
            put(params, module + ["kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif field == "weight":  # bn gamma
            put(params, module + ["scale"], v)
        elif field == "bias":
            put(params, module + ["bias"], v)
        elif field == "running_mean":
            put(stats, module + ["mean"], v)
        elif field == "running_var":
            put(stats, module + ["var"], v)
        else:
            raise KeyError(f"unrecognized field {field!r} in {key!r}")

    return {"params": params, "batch_stats": stats}


def load_torch_resnet50(path) -> dict:
    """Load a torch.save'd ResNet-50 state_dict file and convert it."""
    import torch

    raw = torch.load(Path(path), map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return convert_torch_resnet50(raw)


# ---------------------------------------------------------------------------
# PHD pose-model checkpoints (the reference's last.pt / best.pt)
# ---------------------------------------------------------------------------


def convert_torch_phd(state_dict: dict) -> dict:
    """Reference PHD state_dict -> h36x flax param tree.

    Key layout of the reference model (src/model.py:127-146 + train.py
    checkpoints, which store the bare module state_dict under 'model'):

        input_proj.{weight,bias}
        f_movie.blocks.{i}.{gn1,gn2}.{weight,bias}
        f_movie.blocks.{i}.{conv1,conv2}.conv.{weight,bias}
        f_AR.blocks.{i}...
        f_3D.mlp.{0,3,5}.{weight,bias}   (Linear indices in the Sequential;
                                          the 2nd Dropout is commented out in
                                          the reference, src/model.py:97)
        f_3D.y0                          (zero buffer; dropped)

    torch Linear weights are (out, in) -> transposed kernels; torch Conv1d
    weights are (out, in, k) -> our causal-conv kernels (k, in, out) with
    tap order preserved (both index taps oldest-first over the same
    left-padded window).
    """
    params: dict = {}

    def put(path, value):
        _put(params, path, value)

    # Sequential(Linear, ReLU, Dropout, Linear, ReLU, Linear): the second
    # Dropout is commented out in the reference (src/model.py:97), so the
    # final Linear sits at index 5. Index 6 is also accepted (the layout if
    # that Dropout were re-enabled).
    mlp_names = {"0": "fc1", "3": "fc2", "5": "fc3", "6": "fc3"}

    for key, value in state_dict.items():
        if key == "f_3D.y0":
            continue
        v = _to_numpy(value)
        parts = key.split(".")
        if parts[0] == "input_proj":
            if parts[1] == "weight":
                put(["input_proj", "kernel"], v.T)
            else:
                put(["input_proj", "bias"], v)
        elif parts[0] in ("f_movie", "f_AR"):
            # f_movie.blocks.{i}.<layer>...
            block = f"block{parts[2]}"
            layer = parts[3]
            if layer in ("gn1", "gn2"):
                field = "scale" if parts[4] == "weight" else "bias"
                put([parts[0], block, layer, field], v)
            elif layer in ("conv1", "conv2"):
                # conv1.conv.weight (O, I, K) -> kernel (K, I, O)
                if parts[-1] == "weight":
                    put([parts[0], block, layer, "kernel"], np.transpose(v, (2, 1, 0)))
                else:
                    put([parts[0], block, layer, "bias"], v)
            else:
                raise KeyError(f"unrecognized PHD key {key!r}")
        elif parts[0] == "f_3D" and parts[1] == "mlp":
            name = mlp_names.get(parts[2])
            if name is None:
                raise KeyError(f"unrecognized regressor layer in {key!r}")
            if parts[3] == "weight":
                put(["f_3D", name, "kernel"], v.T)
            else:
                put(["f_3D", name, "bias"], v)
        else:
            raise KeyError(f"unrecognized PHD key {key!r}")

    return params


def export_phd_to_torch(params: dict) -> dict:
    """h36x flax PHD params -> reference-layout torch state_dict (numpy
    values; wrap with torch.from_numpy to load into the reference model).

    Inverse of :func:`convert_torch_phd`, so h36x-trained checkpoints flow
    back to users of the reference unchanged (y0 is emitted as zeros)."""
    out: dict = {}
    out["input_proj.weight"] = np.asarray(params["input_proj"]["kernel"]).T
    out["input_proj.bias"] = np.asarray(params["input_proj"]["bias"])
    for mod in ("f_movie", "f_AR"):
        for block_name, block in params[mod].items():
            i = block_name.removeprefix("block")
            base = f"{mod}.blocks.{i}"
            for gn in ("gn1", "gn2"):
                out[f"{base}.{gn}.weight"] = np.asarray(block[gn]["scale"])
                out[f"{base}.{gn}.bias"] = np.asarray(block[gn]["bias"])
            for conv in ("conv1", "conv2"):
                out[f"{base}.{conv}.conv.weight"] = np.transpose(
                    np.asarray(block[conv]["kernel"]), (2, 1, 0)
                )
                out[f"{base}.{conv}.conv.bias"] = np.asarray(block[conv]["bias"])
    for name, idx in (("fc1", "0"), ("fc2", "3"), ("fc3", "5")):
        out[f"f_3D.mlp.{idx}.weight"] = np.asarray(params["f_3D"][name]["kernel"]).T
        out[f"f_3D.mlp.{idx}.bias"] = np.asarray(params["f_3D"][name]["bias"])
    out["f_3D.y0"] = np.zeros(
        params["f_3D"]["fc3"]["kernel"].shape[1], dtype=np.float32
    )
    return out


def load_torch_phd(path) -> dict:
    """Load a reference training checkpoint (last.pt/best.pt or a bare
    state_dict) and convert the model weights."""
    import torch

    raw = torch.load(Path(path), map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "model" in raw:
        raw = raw["model"]
    return convert_torch_phd(raw)


def infer_model_config(params: dict) -> dict:
    """Reconstruct the shape-VISIBLE architecture fields from a converted
    PHD param tree (ModelConfig field names, ready for a checkpoint
    manifest's config.model section).

    Torch checkpoints carry no config, but most of the architecture is in
    the shapes: input_proj (feature_dim, latent_dim), the f_movie/f_AR
    block counts, the conv tap count, and the regressor MLP widths
    (fc1 in = latent + 3*J, fc3 out = 3*J). `groups` and `regressor_iters`
    are genuinely shape-invisible (loop/group counts) and are NOT returned
    — callers must supply them (the reference hard-codes 32/3,
    /root/reference/src/model.py:127-146).
    """
    feature_dim, latent_dim = (int(s) for s in
                               np.shape(params["input_proj"]["kernel"]))
    joints3 = int(np.shape(params["f_3D"]["fc3"]["kernel"])[1])
    if joints3 % 3:
        raise ValueError(f"f_3D.fc3 output {joints3} is not 3*J")
    block0 = params["f_movie"]["block0"]["conv1"]["kernel"]
    return {
        "latent_dim": latent_dim,
        "feature_dim": feature_dim,
        "joints_num": joints3 // 3,
        "num_blocks": sum(k.startswith("block") for k in params["f_movie"]),
        "ar_num_blocks": sum(k.startswith("block") for k in params["f_AR"]),
        "kernel_size": int(np.shape(block0)[0]),
        "regressor_hidden": int(np.shape(params["f_3D"]["fc1"]["kernel"])[1]),
    }
