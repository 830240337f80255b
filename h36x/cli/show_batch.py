"""CLI: load a saved debug/results NPZ and run the animation viewers
(reference testing_dataloader.py)."""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("npz", help="debug_batch.npz / batch_result npz")
    p.add_argument("--sample", type=int, default=0)
    p.add_argument("--mode", choices=["video3d", "reproject", "features"],
                   default="reproject")
    args = p.parse_args(argv)

    from h36x.viz import (
        plot_batch_sample,
        plot_batch_sample_2d_2dproj_3d,
        plot_batch_sample_2d_2dproj_3d_no_video,
    )

    data = np.load(args.npz, allow_pickle=True)
    j3d = data["joints3d"]
    j2d = data["joints2d"]
    K = data["cam_K"] if "cam_K" in data else data["K"]

    if args.mode == "features" or "video" not in data or data["video"].ndim < 5:
        plot_batch_sample_2d_2dproj_3d_no_video(j3d, j2d, K, args.sample)
    elif args.mode == "video3d":
        plot_batch_sample(data["video"], j3d, args.sample)
    else:
        plot_batch_sample_2d_2dproj_3d(data["video"], j3d, j2d, K, args.sample)


if __name__ == "__main__":
    main()
