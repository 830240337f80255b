"""Training-loop throughput benchmark: full epochs over a synthetic shard
store (host gather + prefetch + sharded jit steps + metric drain), wall clock.

Emits ONE JSON line (the training counterpart of bench.py's extraction
headline): steady-state clips/s, clip-frames/s and epochs/hour from
fit()'s own metrics.jsonl epoch records — epoch 1 carries the jit compile
and is excluded — plus the feed-vs-step decomposition per epoch (the
per-phase timers fit records) naming the measured bottleneck. Reference
hot loop being measured: /root/reference/src/train.py:126-213.

Usage: python -m benchmarks.train_bench [--clips 512] [--epochs 4]
       [--batch-size 32] [--latent 1024] [--feed-dtype bfloat16]
       [--out results.json]
"""

import argparse
import json
import tempfile
import time
from pathlib import Path

from h36x.config import TrainConfig
from h36x.data.features import FeatureClipDataset
from h36x.data.sampler import MixedShardBatchSampler, SequentialBatchSampler
from h36x.train.loop import fit


def main(argv=None):
    from h36x.utils.runtime import setup_jax_cache

    setup_jax_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", type=int, default=512)
    p.add_argument("--seq-len", type=int, default=40)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--out", default="",
                   help="also write the JSON line to this path")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--latent", type=int, default=1024)
    p.add_argument("--steps-per-dispatch", type=int, default=1)
    p.add_argument("--feed-dtype", default="float32",
                   help="dtype the feature arrays cross the host->device "
                        "link in (float32|bfloat16|float16); features are "
                        "~96%% of batch bytes, so bf16 halves the transfer "
                        "on feed-bound links")
    args = p.parse_args(argv)

    from tests.helpers import make_synthetic_store

    with tempfile.TemporaryDirectory() as store, tempfile.TemporaryDirectory() as runs:
        shard_clips = 64
        make_synthetic_store(
            store,
            n_shards=max(1, args.clips // shard_clips),
            clips_per_shard=shard_clips,
            n_vars=4,
            seq_len=args.seq_len,
            feat_dim=2048,
            subjects=(1, 5),
        )
        cfg = TrainConfig()
        cfg.outdir = runs
        cfg.data.seq_len = args.seq_len
        cfg.model.latent_dim = args.latent
        cfg.optim.epochs = args.epochs
        cfg.optim.batch_size = args.batch_size
        cfg.optim.log_every = 0
        cfg.optim.early_stop_patience = 0
        cfg.optim.steps_per_dispatch = args.steps_per_dispatch

        cfg.data.feed_dtype = args.feed_dtype
        train_set = FeatureClipDataset(store, subjects=[1], augment=True,
                                       shard_cache_size=16,
                                       feed_dtype=args.feed_dtype)
        val_set = FeatureClipDataset(store, subjects=[5],
                                     feed_dtype=args.feed_dtype)
        train_sampler = MixedShardBatchSampler(
            train_set, batch_size=args.batch_size,
            shards_per_batch=min(4, max(1, args.clips // shard_clips)),
            drop_last=True, seed=0,
        )
        val_sampler = SequentialBatchSampler(val_set, batch_size=args.batch_size)

        t0 = time.perf_counter()
        fit(cfg, train_set, val_set, train_sampler, val_sampler)
        dt = time.perf_counter() - t0
        steps_per_epoch = len(train_set) // args.batch_size
        clips_per_epoch = steps_per_epoch * args.batch_size

        rows = [json.loads(l) for l in
                (Path(runs) / "metrics.jsonl").read_text().splitlines()]
        # steady state: epoch 1 pays the jit compile (30-300 s on the
        # tunnel); everything after is the number that matters for an
        # hours-long job
        steady = rows[1:] if len(rows) > 1 else rows
        epoch_s = [r["epoch_seconds"] for r in steady]
        data_s = [r.get("train_data_s") or 0.0 for r in steady]
        step_s = [r.get("train_step_s") or 0.0 for r in steady]
        drain_s = [r.get("train_drain_s") or 0.0 for r in steady]
        val_s = [(r.get("val_data_s") or 0.0) + (r.get("val_step_s") or 0.0)
                 + (r.get("val_drain_s") or 0.0) for r in steady]
        mean = lambda xs: sum(xs) / max(len(xs), 1)  # noqa: E731
        ep = mean(epoch_s)
        feed, step = mean(data_s), mean(step_s)
        result = {
            "metric": "train_e2e_clip_frames_per_s",
            "value": round(clips_per_epoch * args.seq_len / ep, 1),
            "unit": "clip-frames/s",
            "clips_per_s": round(clips_per_epoch / ep, 2),
            "epochs_per_hour": round(3600.0 / ep, 2),
            "steady_epoch_s": round(ep, 3),
            "epochs_measured": len(steady),
            "compile_epoch_s": round(rows[0]["epoch_seconds"], 3),
            "feed_s_per_epoch": round(feed, 3),
            "step_s_per_epoch": round(step, 3),
            "drain_s_per_epoch": round(mean(drain_s), 3),
            "val_s_per_epoch": round(mean(val_s), 3),
            # checkpointing + logging + sampler/host batch assembly are
            # the remainder; on a contended host this bucket absorbs the
            # interference, so a dominant 'other' means re-run quiet
            "other_s_per_epoch": round(
                max(ep - feed - step - mean(drain_s) - mean(val_s), 0.0),
                3),
            # dispatch is async: queued device work that outruns the host
            # lands in the end-of-epoch drain, so device wait = step+drain
            "bottleneck": max(
                (("feed", feed), ("step", step + mean(drain_s)),
                 ("eval", mean(val_s)),
                 ("host-other",
                  max(ep - feed - step - mean(drain_s) - mean(val_s), 0.0))),
                key=lambda kv: kv[1])[0],
            "config": {
                "clips": args.clips, "seq_len": args.seq_len,
                "batch_size": args.batch_size, "latent": args.latent,
                "steps_per_dispatch": args.steps_per_dispatch,
                "feed_dtype": args.feed_dtype, "epochs": args.epochs,
            },
            "wall_s_total": round(dt, 1),
        }
        line = json.dumps(result)
        print("\n" + line)
        if args.out:
            Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
