"""Shard-aware batch sampling.

MixedShardBatchSampler trades shuffle quality against shard-cache locality:
it buckets items by shard, then draws each batch round-robin from K randomly
chosen active shards (parity with reference src/samplers.py:5-66, including
seeded epoch reshuffling via set_epoch and the drop_last contract).
"""

from __future__ import annotations

import random
from typing import Iterator, List


class MixedShardBatchSampler:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shards_per_batch: int = 4,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
    ):
        if batch_size % shards_per_batch != 0:
            raise ValueError("batch_size must be divisible by shards_per_batch")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed

        buckets: dict = {}
        for idx in range(len(dataset)):
            buckets.setdefault(dataset.shard_id_of(idx), []).append(idx)
        self.buckets = buckets

        # The round-robin draw needs K distinct active shards; a store with
        # fewer shards than requested would silently yield ZERO batches
        # (latent in the reference, samplers.py:48). Clamp K to the largest
        # divisor of batch_size that the store can actually sustain.
        k = min(shards_per_batch, max(1, len(buckets)))
        while batch_size % k != 0:
            k -= 1
        if k != shards_per_batch:
            print(
                f"MixedShardBatchSampler: only {len(buckets)} shard(s); "
                f"using shards_per_batch={k} (requested {shards_per_batch})"
            )
        self.k = k
        self.per_shard = batch_size // k

    def set_epoch(self, epoch: int) -> None:
        self.seed = epoch

    def __iter__(self) -> Iterator[List[int]]:
        rng = random.Random(self.seed)
        shard_ids = list(self.buckets.keys())
        if self.shuffle:
            rng.shuffle(shard_ids)

        streams = {}
        for sid in shard_ids:
            inds = self.buckets[sid].copy()
            if self.shuffle:
                rng.shuffle(inds)
            streams[sid] = inds

        active = [sid for sid in shard_ids if streams[sid]]
        while len(active) >= self.k:
            chosen = rng.sample(active, self.k) if self.shuffle else active[: self.k]
            batch: List[int] = []
            for sid in chosen:
                take = min(self.per_shard, len(streams[sid]))
                batch.extend(streams[sid][:take])
                del streams[sid][:take]
                if not streams[sid]:
                    active.remove(sid)
            if len(batch) < self.batch_size and self.drop_last:
                continue
            yield batch

    def __len__(self) -> int:
        total = len(self.dataset)
        if self.drop_last:
            return total // self.batch_size
        return (total + self.batch_size - 1) // self.batch_size


class SequentialBatchSampler:
    """Plain fixed-order batching for eval/test loops."""

    def __init__(self, dataset, batch_size: int, drop_last: bool = False):
        self.n = len(dataset)
        self.batch_size = batch_size
        self.drop_last = drop_last

    def set_epoch(self, epoch: int) -> None:  # interface parity
        del epoch

    def __iter__(self):
        for start in range(0, self.n, self.batch_size):
            batch = list(range(start, min(start + self.batch_size, self.n)))
            if len(batch) < self.batch_size and self.drop_last:
                return
            yield batch

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size
