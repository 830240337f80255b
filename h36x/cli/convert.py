"""CLI: convert artifacts between the reference (torch) and h36x formats.

Two migrations for users switching FROM the reference pipeline:

  --torch-shards SRC --out DST : rewrite a torch shard store
    (shard_XXXXX.pt + index.pt, reference preprocess_resnet_features.py
    output) into the h36x raw/mmap shard format + index.json. After this,
    training reads shards with zero deserialization (the compat reader can
    consume .pt stores directly, but pays torch.load per shard).

  --torch-ckpt best.pt --out dir/ [--name best] : convert a reference
    training checkpoint into an h36x params-only .msgpack + manifest,
    loadable via --init-from or h36x-results --model-path.

And two exports BACK to the reference formats, so h36x artifacts can be
validated inside the reference codebase (two-way A/B for the parity day):

  --to-torch-shards SRC --out DST : h36x feature store -> reference torch
    store (shard_XXXXX.pt + index.pt, the exact layout
    /root/reference/src/dataset_features.py:16-27 documents and loads with
    weights_only=True). Array bytes pass through unchanged (stores keep the
    reference's mm units; datasets convert on read in both codebases).

  --to-torch-ckpt CKPT --out best.pt : h36x checkpoint (TrainState or
    params-only msgpack, or an orbax directory/slot reference) -> a
    reference-layout torch state_dict that
    /root/reference/src/results.py:184-186 loads with
    model.load_state_dict(state, strict=True).
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


def export_shard_store(src: str, dst: str) -> int:
    """h36x store -> reference torch store. Inverse of convert_shard_store;
    array bytes and meta/index records pass through unchanged."""
    import torch

    from h36x.data.shards import ARRAY_KEYS, load_index, read_shard, shard_path

    src_p, dst_p = Path(src), Path(dst)
    dst_p.mkdir(parents=True, exist_ok=True)
    index = load_index(src_p)
    n_shards = index["n_shards"]
    for sid in range(n_shards):
        shard = read_shard(shard_path(src_p, sid), mmap=False)
        out = {}
        for k in ARRAY_KEYS:
            arr = np.ascontiguousarray(shard[k])
            if arr.dtype not in (np.float32, np.float16):
                raise SystemExit(
                    f"shard {sid}: array '{k}' has dtype {arr.dtype}; the "
                    "reference loader only reads float32/float16 stores")
            out[k] = torch.from_numpy(arr)
        out["meta"] = shard["meta"]
        out["n_vars"] = int(shard["n_vars"])
        # legacy (non-zipfile) serialization like the reference writer
        # (preprocess_resnet_features.py:45); loads under weights_only=True
        torch.save(out, dst_p / f"shard_{sid:05d}.pt",
                   _use_new_zipfile_serialization=False)
        print(f"shard {sid + 1}/{n_shards} exported", flush=True)
    torch.save({
        "clips": index["clips"],
        "n_shards": n_shards,
        "n_clips": index.get("n_clips") or len(index["clips"]),
        "n_variants": index["n_variants"],
        "aug_names": index.get("aug_names", ["orig"]),
        "seq_len": index.get("seq_len"),
        "frame_skip": index.get("frame_skip"),
        "feat_dtype": index.get("feat_dtype", "float32"),
        "variants_grouped": True,
        "shuffle_seed": index.get("shuffle_seed"),
        "shuffle_pool": index.get("shuffle_pool"),
    }, dst_p / "index.pt")
    return n_shards


def export_checkpoint(h36x_ckpt: str, out_pt: str) -> Path:
    """h36x checkpoint -> reference-loadable torch state_dict (best.pt)."""
    import torch

    from h36x.models.torch_import import export_phd_to_torch
    from h36x.train.checkpoint import load_params_raw

    params = load_params_raw(h36x_ckpt)
    if not isinstance(params, dict) or "input_proj" not in params:
        raise SystemExit(
            f"{h36x_ckpt} does not hold PHD model params (top-level keys: "
            f"{sorted(params) if isinstance(params, dict) else type(params)})")
    sd = export_phd_to_torch(params)
    out = Path(out_pt)
    out.parent.mkdir(parents=True, exist_ok=True)
    # np.array copy: exported leaves can be non-writable views (flax state);
    # torch.from_numpy warns on those
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, out)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch-shards", default="", help="reference shard dir (index.pt)")
    p.add_argument("--torch-ckpt", default="", help="reference last.pt/best.pt")
    p.add_argument("--to-torch-shards", default="",
                   help="h36x feature store to export as a reference torch "
                        "store (--out = destination dir)")
    p.add_argument("--to-torch-ckpt", default="",
                   help="h36x checkpoint (msgpack/orbax/slot ref) to export "
                        "as a reference state_dict (--out = best.pt path)")
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
    if args.to_torch_shards:
        n = export_shard_store(args.to_torch_shards, args.out)
        print(f"exported {n} shards -> {args.out} (reference torch format)")
    if args.to_torch_ckpt:
        path = export_checkpoint(args.to_torch_ckpt, args.out)
        print(f"exported checkpoint -> {path} (reference state_dict)")
    if not (args.torch_shards or args.torch_ckpt
            or args.to_torch_shards or args.to_torch_ckpt):
        raise SystemExit("provide --torch-shards, --torch-ckpt, "
                         "--to-torch-shards, and/or --to-torch-ckpt")


if __name__ == "__main__":
    main()
