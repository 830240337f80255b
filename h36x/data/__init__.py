"""Data subsystem: ingestion, clip windowing, shard store, samplers, feeding."""

from h36x.data.shards import ShardReader, ShardWriter, load_index, write_index  # noqa: F401
from h36x.data.features import FeatureClipDataset  # noqa: F401
from h36x.data.sampler import MixedShardBatchSampler  # noqa: F401
