"""--save-fp16 store probe: disk bytes and host-side read/assembly cost.

The store dtype trades read-time precision (f16 rounding, ~1e-3 relative on
unit-scale features) for half the dominant disk payload and half the bytes
the host pulls per batch. This measures both halves of that trade on a
realistic store shape (feature_dim 2048, seq_len 40 — the config of record):

  1. disk: total shard bytes for the SAME feature content at f32 vs f16;
  2. host IO: `FeatureClipDataset.get_batch` wall time at both dtypes,
     lru_cold (fresh reader: empty LRU, mmap first-touch — but the store
     was written moments earlier, so every page is OS-cache-HOT; this
     measures assembly + upcast cost, NOT disk reads, and best-of-reps
     makes it hotter still) and warm (LRU-cached shard). True cold-disk
     behavior needs a dropped page cache (privileged) or a store larger
     than RAM — out of scope here; treat disk_ratio as the honest proxy
     for the disk half of the trade.

Pure host work — runs on any platform; no TPU needed. The device-transfer
half of the story is measured by benchmarks/feed_probe.py (`--feed-dtype`):
an fp16 store + f16/bf16 feed composes both savings.

Usage: python -m benchmarks.fp16_store_probe [--clips 64] [--batch 32] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time
from pathlib import Path


def probe(clips: int, batch: int, reps: int, seq_len: int = 40,
          feat_dim: int = 2048) -> dict:
    import numpy as np

    from h36x.data.features import FeatureClipDataset
    from tests.helpers import make_synthetic_store

    out = {}
    tmp = Path(tempfile.mkdtemp(prefix="fp16probe_"))
    try:
        per_shard = 8
        n_shards = max(1, clips // per_shard)
        stores = {}
        for dtype in ("float32", "float16"):
            root = tmp / dtype
            root.mkdir()
            make_synthetic_store(root, n_shards=n_shards,
                                 clips_per_shard=per_shard, n_vars=4,
                                 seq_len=seq_len, feat_dim=feat_dim,
                                 feat_dtype=dtype)
            stores[dtype] = root
            out[f"disk_bytes_{dtype}"] = sum(
                p.stat().st_size for p in root.glob("shard_*.h36x"))

        idx = np.random.default_rng(0).permutation(
            n_shards * per_shard * 4)[:batch].tolist()
        # (store dtype, feed dtype): f16 store read at the default f32 feed
        # pays an upcast; read at an f16 feed it is a straight half-size copy
        combos = [("float32", "float32"), ("float16", "float32"),
                  ("float16", "float16")]
        for dtype, feed in combos:
            lru_cold, warm = [], []
            for _ in range(reps):
                ds = FeatureClipDataset(stores[dtype], augment=True,
                                        feed_dtype=feed)  # fresh LRU
                t0 = time.perf_counter()
                ds.get_batch(idx)
                lru_cold.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                ds.get_batch(idx)
                warm.append(time.perf_counter() - t0)
            tag = dtype if feed == "float32" else f"{dtype}_feed16"
            out[f"get_batch_lru_cold_ms_{tag}"] = round(min(lru_cold) * 1e3, 2)
            out[f"get_batch_warm_ms_{tag}"] = round(min(warm) * 1e3, 2)

        out["disk_ratio"] = round(
            out["disk_bytes_float32"] / out["disk_bytes_float16"], 3)
        out["warm_speedup"] = round(
            out["get_batch_warm_ms_float32"]
            / max(out["get_batch_warm_ms_float16"], 1e-9), 2)
        out["lru_cold_speedup"] = round(
            out["get_batch_lru_cold_ms_float32"]
            / max(out["get_batch_lru_cold_ms_float16"], 1e-9), 2)
        out["config"] = {"clips": clips, "batch": batch, "reps": reps,
                         "seq_len": seq_len, "feat_dim": feat_dim,
                         "n_vars": 4}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clips", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)
    print(json.dumps(probe(args.clips, args.batch, args.reps)))


if __name__ == "__main__":
    main()
