"""Training-loop throughput benchmark: full epochs over a synthetic shard
store (host gather + prefetch + sharded jit steps + metric drain), wall clock.

Usage: python -m benchmarks.train_bench [--clips 512] [--epochs 2]
       [--batch-size 32] [--latent 1024]
"""

import argparse
import tempfile
import time

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
    p.add_argument("--epochs", type=int, default=2)
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
        n_steps = args.epochs * (len(train_set) // args.batch_size)
        frames = n_steps * args.batch_size * args.seq_len
        print(
            f"\nE2E training: {dt:.1f}s for {args.epochs} epochs "
            f"({n_steps} steps) -> {frames/dt:.0f} clip-frames/s incl. eval"
        )


if __name__ == "__main__":
    main()
