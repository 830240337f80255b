"""CLI: phase-1 training (freeze f_AR, train f_movie + f_3D)
(reference train.sh -> train.py main)."""

from h36x.config import TrainConfig, parse_into
from h36x.data.features import FeatureClipDataset
from h36x.data.sampler import MixedShardBatchSampler, SequentialBatchSampler
from h36x.train.loop import fit


def main(argv=None):
    from h36x.utils.runtime import setup_jax_cache

    cfg = parse_into(TrainConfig(), argv, description=__doc__)

    # Multi-process init must precede every other jax call (it pins the
    # platform and registers this process with the coordinator). Single
    # process: no-op. See DistConfig in h36x/config.py.
    from h36x.parallel.distributed import is_main_process, setup_from_config

    setup_from_config(cfg.dist)
    setup_jax_cache()

    if not cfg.train_root:
        raise SystemExit("--train-root is required")
    val_root = cfg.val_root or cfg.train_root

    train_set = FeatureClipDataset(
        cfg.train_root,
        subjects=cfg.train_subjects,
        augment=cfg.data.augment,
        max_clips=cfg.data.max_clips,
        # -1 is the auto sentinel; 0 is a VALID value (ShardReader's
        # no-caching mode) and must not be coerced to the default
        shard_cache_size=(64 if cfg.data.shard_cache_size < 0
                          else cfg.data.shard_cache_size),
        log_loads_every=cfg.data.log_shard_loads,
        feed_dtype=cfg.data.feed_dtype,
    )
    val_set = FeatureClipDataset(val_root, subjects=cfg.val_subjects,
                                 feed_dtype=cfg.data.feed_dtype)
    train_sampler = MixedShardBatchSampler(
        train_set, batch_size=cfg.optim.batch_size, shuffle=True, drop_last=True,
        seed=cfg.optim.seed,
    )
    val_sampler = SequentialBatchSampler(val_set, batch_size=cfg.optim.batch_size)

    if is_main_process():
        phase = getattr(cfg.optim, "phase", 1)
        print(f"===== Phase-{phase} training =====")
        print(f"Train clips: {len(train_set)} | Val clips: {len(val_set)}")
        print(f"Batch size: {cfg.optim.batch_size} | LR: {cfg.optim.lr} | "
              f"Epochs: {cfg.optim.epochs}")
        if cfg.dist.num_processes > 1:
            import jax
            print(f"Processes: {jax.process_count()} | global devices: "
                  f"{jax.device_count()}")
        print("============================")
    fit(cfg, train_set, val_set, train_sampler, val_sampler)


if __name__ == "__main__":
    main()
