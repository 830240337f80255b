"""h36x quickstart: the whole API on synthetic data, end to end.

Run:  python examples/quickstart.py
(CPU-friendly sizes; on a TPU host the same code uses the chip.)
"""

import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from h36x.config import ExtractConfig, TrainConfig
from h36x.data.clips import ClipIndex
from h36x.data.features import FeatureClipDataset
from h36x.data.sampler import MixedShardBatchSampler, SequentialBatchSampler
from h36x.extract.pipeline import run_extract
from h36x.serve import StreamingPredictor
from h36x.train.loop import build_model, fit


class SyntheticClips:
    """Stands in for an ingested H36M tree (see h36x.cli.ingest)."""

    def __init__(self, n=12, t=8, hw=64):
        self.n, self.t, self.hw = n, t, hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        frames = rng.integers(0, 256, size=(self.t, self.hw, self.hw, 3)).astype(np.uint8)
        j3d = rng.normal(size=(self.t, 17, 3)).astype(np.float32) * 100
        j2d = (rng.random((self.t, 17, 2)) * 40 + 12).astype(np.float32)
        cam = {"f": np.array([90.0, 90.0]), "c": np.array([32.0, 32.0]),
               "k": np.zeros(5), "rt": np.eye(3), "t": np.zeros(3)}
        ci = ClipIndex("synthetic.mp4", "synthetic.pkl", 1 + i % 2, "Demo_0",
                       "cam_0", cam, i * 4, i * 4 + self.t)
        return frames, j3d, j2d, cam, ci


def main():
    with tempfile.TemporaryDirectory() as store, tempfile.TemporaryDirectory() as runs:
        # 1) feature extraction: crops + augmentation on host, backbone on device
        run_extract(
            ExtractConfig(out=store, seq_len=8, resize=32, batch_size=4,
                          num_workers=2, augment=True, shard_size=4,
                          shuffle_pool=64),
            dataset=SyntheticClips(),
        )

        # 2) phase-1 training over the shard store
        cfg = TrainConfig()
        cfg.outdir = runs
        cfg.data.seq_len = 8
        cfg.model.latent_dim = 64
        cfg.model.num_blocks = 1
        cfg.optim.epochs = 2
        cfg.optim.batch_size = 4
        cfg.optim.log_every = 0
        train_set = FeatureClipDataset(store, subjects=[1], augment=True)
        val_set = FeatureClipDataset(store, subjects=[2])
        state, best = fit(
            cfg, train_set, val_set,
            MixedShardBatchSampler(train_set, 4, shards_per_batch=2, seed=0),
            SequentialBatchSampler(val_set, 4),
        )
        print(f"\nbest val MPJPE: {best:.3f} m")

        # 3) inference: batch forward, streaming, and AR future rollout
        params = jax.device_get(state.params)
        feats, j3d, _, _ = val_set.get_batch([0])

        model = build_model(cfg)
        pred = model.apply({"params": params}, jnp.asarray(feats))[2]
        print("batch joints:", np.asarray(pred).shape)

        sp = StreamingPredictor(params, window=8, feature_dim=2048,
                                groups=cfg.model.groups)
        for t in range(8):
            joints_t = sp.push(feats[0, t])
        print("streaming last-frame joints:", joints_t.shape)
        future = sp.forecast(5)
        print("AR 5-step forecast:", future.shape)


if __name__ == "__main__":
    main()
