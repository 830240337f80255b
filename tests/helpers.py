"""Shared test fixtures: synthetic shard stores."""

import numpy as np

from h36x.data import shards as shard_store


def make_synthetic_store(
    root,
    n_shards: int = 3,
    clips_per_shard: int = 8,
    n_vars: int = 4,
    seq_len: int = 8,
    feat_dim: int = 64,
    subjects=(1, 5),
    seed: int = 0,
    feat_dtype: str = "float32",
):
    """Write a tiny valid shard store; returns the index clip list.

    feat_dtype='float16' mirrors --save-fp16 stores: the SAME drawn features
    (the rng stream is dtype-independent) rounded to f16 at write time, so a
    store pair differing only in feat_dtype is a controlled precision
    experiment.
    """
    rng = np.random.default_rng(seed)
    clip_index = []
    aug_names = ["orig", "cjitter", "hflip", "trev"][:n_vars]
    for sid in range(n_shards):
        rows = clips_per_shard * n_vars
        arrays = {
            "feats": rng.normal(size=(rows, seq_len, feat_dim))
            .astype(np.float32).astype(np.dtype(feat_dtype)),
            "joints3d": rng.normal(size=(rows, seq_len, 17, 3)).astype(np.float32) * 1000,
            "joints2d": rng.normal(size=(rows, seq_len, 17, 2)).astype(np.float32) * 100,
            "K": np.tile(np.eye(3, dtype=np.float32) * 1000, (rows, 1, 1)),
        }
        meta = []
        for c in range(clips_per_shard):
            subject = subjects[(sid * clips_per_shard + c) % len(subjects)]
            for v in range(n_vars):
                meta.append(
                    {
                        "subject": subject,
                        "action": f"Act{c}",
                        "cam": "cam_0",
                        "start": c * 10,
                        "end": c * 10 + seq_len,
                        "aug": aug_names[v],
                        "frame_skip": 2,
                    }
                )
            clip_index.append(
                {
                    "shard_id": sid,
                    "row": c * n_vars,
                    "subject": subject,
                    "action": f"Act{c}",
                    "cam": "cam_0",
                    "start": c * 10,
                    "end": c * 10 + seq_len,
                }
            )
        shard_store.write_shard(
            shard_store.shard_path(root, sid), arrays, meta, n_vars
        )
    shard_store.write_index(
        root,
        clip_index,
        n_shards=n_shards,
        n_clips=n_shards * clips_per_shard,
        n_variants=n_vars,
        aug_names=aug_names,
        seq_len=seq_len,
        frame_skip=2,
        feat_dtype=feat_dtype,
        shuffle_seed=123,
        shuffle_pool=8192,
    )
    return clip_index
