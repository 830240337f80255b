"""CLI: convert reference (torch) artifacts into h36x-native formats.

Two migrations for users switching from the reference pipeline:

  --torch-shards SRC --out DST : rewrite a torch shard store
    (shard_XXXXX.pt + index.pt, reference preprocess_resnet_features.py
    output) into the h36x raw/mmap shard format + index.json. After this,
    training reads shards with zero deserialization (the compat reader can
    consume .pt stores directly, but pays torch.load per shard).

  --torch-ckpt best.pt --out dir/ [--name best] : convert a reference
    training checkpoint into an h36x params-only .msgpack + manifest,
    loadable via --init-from or h36x-results --model-path.
"""

import argparse
import json
import os
from pathlib import Path

import numpy as np


def convert_shard_store(src: str, dst: str) -> int:
    from h36x.data.shards import (
        ARRAY_KEYS,
        load_torch_index,
        load_torch_shard,
        write_index,
        write_shard,
        shard_path,
    )

    src_p, dst_p = Path(src), Path(dst)
    dst_p.mkdir(parents=True, exist_ok=True)
    index = load_torch_index(src_p / "index.pt")
    n_shards = index["n_shards"]
    if n_shards is None:
        n_shards = 1 + max(c["shard_id"] for c in index["clips"])
    for sid in range(n_shards):
        shard = load_torch_shard(src_p, sid)
        # the format's single source of truth — a key added to ARRAY_KEYS
        # must not silently go missing from converted stores
        arrays = {k: np.asarray(shard[k]) for k in ARRAY_KEYS}
        write_shard(shard_path(dst_p, sid), arrays, shard["meta"], shard["n_vars"])
        print(f"shard {sid + 1}/{n_shards} converted", flush=True)
    write_index(
        dst_p,
        index["clips"],
        n_shards=n_shards,
        n_clips=index.get("n_clips") or len(index["clips"]),
        n_variants=index["n_variants"],
        aug_names=index.get("aug_names", ["orig"]),
        seq_len=index.get("seq_len"),
        frame_skip=index.get("frame_skip"),
        feat_dtype=index.get("feat_dtype", "float32"),
    )
    return n_shards


def convert_checkpoint(torch_ckpt: str, out_dir: str, name: str = "best",
                       groups: int = 32, regressor_iters: int = 3) -> Path:
    from flax import serialization

    from h36x.models.torch_import import infer_model_config, load_torch_phd

    params = load_torch_phd(torch_ckpt)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    data_path = out / f"{name}.msgpack"
    with open(data_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    # record the architecture so the consumer CLIs (results/predict/export/
    # serve) resolve it from the manifest like they do for h36x-train
    # checkpoints. Shape-visible fields come from the param tree; groups/
    # regressor_iters are shape-invisible and come from the flags (defaults
    # = the reference's hard-coded values, src/model.py:127-146).
    model_cfg = infer_model_config(params)
    model_cfg["groups"] = groups
    model_cfg["regressor_iters"] = regressor_iters
    with open(out / f"{name}.json", "w") as f:
        json.dump({"converted_from": os.path.abspath(torch_ckpt),
                   "format": "params-only",
                   "model_config_inferred_from_shapes": True,
                   "config": {"model": model_cfg}}, f, indent=2)
    return data_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch-shards", default="", help="reference shard dir (index.pt)")
    p.add_argument("--torch-ckpt", default="", help="reference last.pt/best.pt")
    p.add_argument("--out", required=True)
    p.add_argument("--name", default="best")
    p.add_argument("--groups", type=int, default=32,
                   help="GroupNorm groups the torch checkpoint was trained "
                        "with (shape-invisible; recorded in the manifest)")
    p.add_argument("--regressor-iters", type=int, default=3,
                   help="refinement rounds the torch checkpoint was trained "
                        "with (shape-invisible; recorded in the manifest)")
    args = p.parse_args(argv)

    if args.torch_shards:
        n = convert_shard_store(args.torch_shards, args.out)
        print(f"converted {n} shards -> {args.out}")
    if args.torch_ckpt:
        path = convert_checkpoint(args.torch_ckpt, args.out, args.name,
                                  groups=args.groups,
                                  regressor_iters=args.regressor_iters)
        print(f"converted checkpoint -> {path}")
    if not args.torch_shards and not args.torch_ckpt:
        raise SystemExit("provide --torch-shards and/or --torch-ckpt")


if __name__ == "__main__":
    main()
