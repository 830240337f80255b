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


def convert_torch_resnet50(state_dict: dict) -> dict:
    """state_dict (torch tensors or numpy) -> {'params', 'batch_stats'}."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

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
