"""CLI: phase-1 training (freeze f_AR, train f_movie + f_3D)
(reference train.sh -> train.py main)."""

from h36x.config import TrainConfig, parse_into
from h36x.data.features import FeatureClipDataset
from h36x.data.sampler import MixedShardBatchSampler, SequentialBatchSampler
from h36x.train.loop import fit


def main(argv=None):
    from h36x.utils.runtime import setup_jax_cache

    setup_jax_cache()

    cfg = parse_into(TrainConfig(), argv, description=__doc__)
    if not cfg.train_root:
        raise SystemExit("--train-root is required")
    val_root = cfg.val_root or cfg.train_root

    train_set = FeatureClipDataset(
        cfg.train_root,
        subjects=cfg.train_subjects,
        augment=True,
        shard_cache_size=max(cfg.data.shard_cache_size, 64),
    )
    val_set = FeatureClipDataset(val_root, subjects=cfg.val_subjects)
    train_sampler = MixedShardBatchSampler(
        train_set, batch_size=cfg.optim.batch_size, shuffle=True, drop_last=True,
        seed=cfg.optim.seed,
    )
    val_sampler = SequentialBatchSampler(val_set, batch_size=cfg.optim.batch_size)

    print("===== Phase-1 training =====")
    print(f"Train clips: {len(train_set)} | Val clips: {len(val_set)}")
    print(f"Batch size: {cfg.optim.batch_size} | LR: {cfg.optim.lr} | "
          f"Epochs: {cfg.optim.epochs}")
    print("============================")
    fit(cfg, train_set, val_set, train_sampler, val_sampler)


if __name__ == "__main__":
    main()
