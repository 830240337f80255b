"""MixedShardBatchSampler behavior (reference src/samplers.py:5-66)."""

import pytest

from h36x.data.features import FeatureClipDataset
from h36x.data.sampler import MixedShardBatchSampler, SequentialBatchSampler
from tests.helpers import make_synthetic_store


@pytest.fixture
def dataset(tmp_path):
    make_synthetic_store(tmp_path, n_shards=4, clips_per_shard=8, n_vars=4)
    return FeatureClipDataset(tmp_path, augment=True)  # 4*8*4 = 128 items


class TestMixedShardBatchSampler:
    def test_batches_cover_k_shards(self, dataset):
        s = MixedShardBatchSampler(dataset, batch_size=8, shards_per_batch=4, seed=0)
        for batch in s:
            shards = {dataset.shard_id_of(i) for i in batch}
            assert len(shards) <= 4
            assert len(batch) == 8

    def test_full_epoch_coverage_without_drop(self, dataset):
        s = MixedShardBatchSampler(
            dataset, batch_size=8, shards_per_batch=4, drop_last=False, seed=1
        )
        seen = [i for b in s for i in b]
        # every item appears exactly once
        assert sorted(seen) == list(range(len(dataset)))

    def test_epoch_reseed_changes_order(self, dataset):
        s = MixedShardBatchSampler(dataset, batch_size=8, seed=0)
        s.set_epoch(0)
        order0 = [tuple(b) for b in s]
        s.set_epoch(1)
        order1 = [tuple(b) for b in s]
        s.set_epoch(0)
        order0_again = [tuple(b) for b in s]
        assert order0 == order0_again  # deterministic per epoch
        assert order0 != order1

    def test_no_shuffle_deterministic(self, dataset):
        s = MixedShardBatchSampler(dataset, batch_size=8, shuffle=False)
        a = [tuple(b) for b in s]
        b = [tuple(b) for b in s]
        assert a == b

    def test_batch_size_divisibility(self, dataset):
        with pytest.raises(ValueError):
            MixedShardBatchSampler(dataset, batch_size=10, shards_per_batch=4)

    def test_drop_last_false_drains_unbalanced_shards(self):
        """Once fewer than k shards stay live, drop_last=False keeps
        drawing from the remainder instead of silently dropping items."""

        class Unbalanced:
            sizes = {0: 40, 1: 4}

            def __len__(self):
                return sum(self.sizes.values())

            def shard_id_of(self, idx):
                return 0 if idx < self.sizes[0] else 1

        ds = Unbalanced()
        s = MixedShardBatchSampler(ds, batch_size=8, shards_per_batch=2,
                                   drop_last=False, seed=0)
        batches = list(s)
        seen = [i for b in batches for i in b]
        assert sorted(seen) == list(range(len(ds)))  # nothing dropped
        # partial batches only as the single final tail: an unbalanced pick
        # (small shard nearly empty) is topped up from other live shards,
        # so __len__ == ceil(n/B) is exact and consumers pairing the
        # sampler with len() (tqdm, fixed-step schedules) see every batch
        assert [len(b) for b in batches[:-1]] == [8] * (len(batches) - 1)
        assert len(batches[-1]) == len(ds) % 8 or len(batches[-1]) == 8
        assert len(batches) == len(s) == (len(ds) + 7) // 8

        s_drop = MixedShardBatchSampler(ds, batch_size=8, shards_per_batch=2,
                                        drop_last=True, seed=0)
        seen_drop = []
        n_batches = 0
        for b in s_drop:
            assert len(b) == 8  # drop_last contract unchanged
            seen_drop.extend(b)
            n_batches += 1
        # drop_last drops ONLY the final sub-batch_size remainder — not
        # everything left in the surviving shards once the small shard
        # empties (the reference's early stop, samplers.py:48, would yield
        # a single batch here and drop 36 of 44 items)
        assert n_batches == len(s_drop) == len(ds) // 8
        assert len(seen_drop) == len(set(seen_drop)) == n_batches * 8

    def test_drop_last_only_full_batches(self, dataset):
        s = MixedShardBatchSampler(dataset, batch_size=8, drop_last=True, seed=3)
        for batch in s:
            assert len(batch) == 8


class TestSequentialBatchSampler:
    def test_order_and_tail(self, dataset):
        s = SequentialBatchSampler(dataset, batch_size=50)
        batches = list(s)
        assert [len(b) for b in batches] == [50, 50, 28]
        assert batches[0][0] == 0
        assert batches[-1][-1] == len(dataset) - 1
        assert len(s) == 3

    def test_drop_last(self, dataset):
        s = SequentialBatchSampler(dataset, batch_size=50, drop_last=True)
        assert [len(b) for b in s] == [50, 50]
