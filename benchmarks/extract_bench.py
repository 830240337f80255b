"""End-to-end extraction throughput benchmark (host + device, wall clock).

Unlike bench.py (pure device-step speed), this measures run_extract on a
synthetic in-memory clip source: decode is simulated (frames are generated),
so the number isolates the pipeline — host crop/resize/jitter workers,
batching, device feature passes, shuffle pool, async shard writes.

NOTE: on the tunneled dev runtime this number is dominated by per-dispatch
round trips and host->device transfer over the network relay; it reflects a
real TPU host only when run on one (see CLAUDE.md / DESIGN.md).

Usage: python -m benchmarks.extract_bench [--clips 64] [--seq-len 40]
       [--hw 1000] [--resize 224] [--augment true]
"""

import argparse
import tempfile

import numpy as np

from h36x.config import ExtractConfig
from h36x.data.clips import ClipIndex
from h36x.extract.pipeline import run_extract


class SyntheticClips:
    """In-memory stand-in for ClipDataset: random frames + in-frame joints."""

    def __init__(self, n_clips: int, seq_len: int, hw: int):
        self.n, self.t, self.hw = n_clips, seq_len, hw
        self.seq_len = seq_len
        self.frame_skip = 2
        # one shared base clip; per-clip frames derive from it with a cheap
        # roll (generating 120 MB of fresh numpy randomness per clip costs
        # ~10 s and would make the benchmark measure the RNG, not the
        # pipeline — real decode produces frames far faster)
        self._base = np.random.default_rng(0).integers(
            0, 256, size=(seq_len, hw, hw, 3)
        ).astype(np.uint8)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        frames = np.roll(self._base, shift=i * 7, axis=1)
        j3d = rng.normal(size=(self.t, 17, 3)).astype(np.float32) * 100
        j2d = (
            rng.random((self.t, 17, 2)) * (self.hw * 0.4) + self.hw * 0.3
        ).astype(np.float32)
        cam = {
            "f": np.array([1100.0, 1100.0]),
            "c": np.array([self.hw / 2, self.hw / 2]),
            "k": np.zeros(5), "rt": np.eye(3), "t": np.zeros(3),
        }
        ci = ClipIndex(
            video_path="synthetic.mp4", gt_path="synthetic.pkl",
            subject=1, action="Bench_0", cam="cam_0", cam_params=cam,
            start=i * 5, end=i * 5 + self.t,
        )
        return frames, j3d, j2d, cam, ci


def main(argv=None):
    from h36x.utils.runtime import setup_jax_cache

    setup_jax_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", type=int, default=64)
    p.add_argument("--seq-len", type=int, default=40)
    p.add_argument("--hw", type=int, default=1000)
    p.add_argument("--resize", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--augment", default="true")
    args = p.parse_args(argv)
    augment = str(args.augment).lower() in ("1", "true", "yes")

    with tempfile.TemporaryDirectory() as out:
        cfg = ExtractConfig(
            out=out, seq_len=args.seq_len, resize=args.resize,
            batch_size=args.batch_size, num_workers=args.num_workers,
            augment=augment, shard_size=64, shuffle_pool=4096,
        )
        ds = SyntheticClips(args.clips, args.seq_len, args.hw)
        summary = run_extract(cfg, dataset=ds)
    print(
        f"\nE2E extraction: {summary['clips_per_sec']:.2f} clips/s "
        f"({summary['frames_per_sec']:.0f} clip-frames/s) "
        f"over {args.clips} clips @ {args.hw}px, augment={augment}"
    )


if __name__ == "__main__":
    main()
