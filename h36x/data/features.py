"""Feature-clip dataset over the shard store.

Parity target: reference src/dataset_features.py:28-126 — subject filtering,
clip x variant item expansion when augmenting, LRU shard caching, mm->m joint
conversion, optional per-row meta for the test set.

TPU-first addition: :meth:`get_batch` gathers a whole batch of rows into
stacked contiguous numpy arrays in one pass (grouped by shard), which is what
the device feed consumes — there is no per-item collate step on the hot path.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from h36x.data import shards as shard_store


class FeatureClipDataset:
    def __init__(
        self,
        root,
        subjects: Optional[List[int]] = None,
        max_clips: Optional[int] = None,
        test_set: bool = False,
        augment: bool = False,
        shard_cache_size: int = 2,
        log_loads_every: int = 0,
        feed_dtype: str = "float32",
    ):
        self.root = Path(root)
        self.test_set = test_set
        self.augment = augment
        # dtype of the FEATURE arrays this dataset hands to the device feed
        # (`--data.feed-dtype`). Features are ~96% of a batch's bytes, so
        # bfloat16 halves host->device transfer on feed-bound links (the
        # model promotes/casts on device; joints/K stay f32 — they are tiny
        # and the losses need their precision).
        if feed_dtype not in ("float32", "bfloat16", "float16"):
            raise ValueError(
                f"feed_dtype must be float32|bfloat16|float16, got {feed_dtype!r}"
            )
        self.feed_dtype = shard_store._np_dtype(feed_dtype)

        index = shard_store.load_index(self.root)
        self._torch_format = bool(index.get("torch_format"))
        # Row addressing below is row = clip["row"] + variant — the grouped
        # layout the reference defines (src/dataset_features.py:116) and the
        # only one h36x writes. An index declaring any other layout must be
        # refused, not silently misread row-by-row.
        if not index.get("variants_grouped", True):
            raise RuntimeError(
                f"{self.root}: index declares variants_grouped=false — this "
                "reader only supports the grouped row layout "
                "(row = clip row + variant offset)"
            )
        self.n_vars = int(index["n_variants"])
        self.aug_names = index.get("aug_names", ["orig"])
        self.seq_len = index.get("seq_len")
        self.frame_skip = index.get("frame_skip")

        clips = index["clips"]
        if subjects is not None:
            subj = set(int(s) for s in subjects)
            clips = [c for c in clips if int(c["subject"]) in subj]
        if max_clips is not None:
            clips = clips[:max_clips]
        if not clips:
            raise RuntimeError(f"no clips under {root} for subjects={subjects}")
        self.clips = clips

        if augment:
            self._items = [(c, v) for c in clips for v in range(self.n_vars)]
        else:
            self._items = [(c, 0) for c in clips]

        self._reader = shard_store.ShardReader(
            self.root, cache_size=shard_cache_size,
            log_loads_every=log_loads_every,
            loader=shard_store.load_torch_shard if self._torch_format else None,
        )

    # -- container protocol ------------------------------------------------

    def __len__(self) -> int:
        return len(self._items)

    @property
    def items(self):
        return self._items

    def shard_id_of(self, idx: int) -> int:
        return int(self._items[idx][0]["shard_id"])

    def cache_stats(self) -> dict:
        """Shard-cache load/hit counters (reference dataset_features.py:101-105)."""
        return self._reader.stats()

    def _shard(self, shard_id: int) -> dict:
        # one LRU for both formats: the reader's loader was chosen at init
        return self._reader.get(shard_id)

    def __getitem__(self, idx: int):
        clip, var = self._items[idx]
        shard = self._shard(int(clip["shard_id"]))
        row = int(clip["row"]) + var
        feats = np.asarray(shard["feats"][row], dtype=self.feed_dtype)
        joints3d = np.asarray(shard["joints3d"][row], dtype=np.float32) / 1000.0
        joints2d = np.asarray(shard["joints2d"][row], dtype=np.float32)
        K = np.asarray(shard["K"][row], dtype=np.float32)
        if self.test_set:
            return feats, joints3d, joints2d, K, shard["meta"][row]
        return feats, joints3d, joints2d, K

    # -- batched access (device-feed hot path) ------------------------------

    def get_batch(self, indices: Sequence[int]):
        """Gather rows into stacked arrays: (feats, joints3d, joints2d, K[, meta]).

        Rows are fetched shard-by-shard so each cached shard is touched once.
        joints3d are converted mm -> m here, matching __getitem__.
        """
        n = len(indices)
        if n == 0:
            # next(iter({})) below would raise a bare StopIteration, which
            # PEP 479 turns into an opaque RuntimeError inside generator feeds
            raise ValueError("get_batch() called with no indices")
        by_shard: dict = {}
        for pos, idx in enumerate(indices):
            clip, var = self._items[idx]
            by_shard.setdefault(int(clip["shard_id"]), []).append(
                (pos, int(clip["row"]) + var)
            )

        # Row shapes come from the first shard we gather from anyway — no
        # separate priming fetch. Keep the loaded shard and reuse it in the
        # loop: with shard caching off (shard_cache_size=0, a valid mode)
        # a second self._shard(first_sid) would re-read the file per batch.
        first_sid = next(iter(by_shard))
        first_shard = self._shard(first_sid)
        feats = np.empty((n,) + first_shard["feats"].shape[1:],
                         dtype=self.feed_dtype)
        joints3d = np.empty((n,) + first_shard["joints3d"].shape[1:], dtype=np.float32)
        joints2d = np.empty((n,) + first_shard["joints2d"].shape[1:], dtype=np.float32)
        K = np.empty((n, 3, 3), dtype=np.float32)
        meta: list = [None] * n
        for sid, rows in by_shard.items():
            shard = first_shard if sid == first_sid else self._shard(sid)
            pos_arr = np.array([p for p, _ in rows])
            row_arr = np.array([r for _, r in rows])
            feats[pos_arr] = np.asarray(shard["feats"][row_arr],
                                        dtype=self.feed_dtype)
            joints3d[pos_arr] = (
                np.asarray(shard["joints3d"][row_arr], dtype=np.float32) / 1000.0
            )
            joints2d[pos_arr] = np.asarray(shard["joints2d"][row_arr], dtype=np.float32)
            K[pos_arr] = np.asarray(shard["K"][row_arr], dtype=np.float32)
            if self.test_set:
                for p, r in rows:
                    meta[p] = shard["meta"][r]

        if self.test_set:
            return feats, joints3d, joints2d, K, meta
        return feats, joints3d, joints2d, K
