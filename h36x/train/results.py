"""Test-set inference + artifact dump.

Stage parity: reference src/results.py — evaluate the trained model on the
test subject, print loss/MPJPE in m and mm, then dump ONE batch to a
compressed NPZ containing the raw video clips (reloaded from the ingested
mp4s via each row's meta), GT/predicted 3D joints, 2D joints, K, meta, and
the test metrics (results.py:227-236 field set, with the same names).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from h36x.data.features import FeatureClipDataset
from h36x.data.sampler import SequentialBatchSampler
from h36x.train.step import make_forward


def find_video_path(preprocessed_root: str, meta: dict) -> str:
    """Locate the ingested mp4 for a feature row's meta (results.py:30-41)."""
    subject = int(meta["subject"])
    action = str(meta["action"])
    cam = str(meta["cam"])
    if not cam.startswith("cam_"):
        cam = f"cam_{cam}"
    cam_dir = os.path.join(preprocessed_root, f"S{subject}", action, cam)
    mp4s = sorted(glob.glob(os.path.join(cam_dir, "*.mp4")))
    if not mp4s:
        raise FileNotFoundError(f"no mp4 under {cam_dir}")
    return mp4s[0]


def pad_or_trim_video(video: np.ndarray, target_t: int) -> np.ndarray:
    """(T,H,W,3) -> exactly target_t frames, padding with the last frame."""
    t = video.shape[0]
    if t == target_t:
        return video
    if t > target_t:
        return video[:target_t]
    pad = np.repeat(video[-1:], target_t - t, axis=0)
    return np.concatenate([video, pad], axis=0)


def resize_video_hw(video: np.ndarray, out_hw: Optional[int]) -> np.ndarray:
    """(T,H,W,3) u8 -> (T,out,out,3) u8 bilinear (host, cv2)."""
    if out_hw is None:
        return video
    import cv2

    out = np.empty((video.shape[0], out_hw, out_hw, 3), np.uint8)
    for t in range(video.shape[0]):
        out[t] = cv2.resize(video[t], (out_hw, out_hw), interpolation=cv2.INTER_LINEAR)
    return out


def load_video_clip_from_meta(
    preprocessed_root: str, meta: dict, seq_len: int, out_hw: Optional[int] = None
) -> np.ndarray:
    """Re-decode the raw clip a feature row came from (results.py:96-115)."""
    from h36x.data.clips import decode_clip

    path = find_video_path(preprocessed_root, meta)
    start, end = int(meta["start"]), int(meta["end"])
    frame_skip = int(meta.get("frame_skip", 1))
    video = decode_clip(path, start, end, frame_skip)
    video = pad_or_trim_video(video, seq_len)
    return resize_video_hw(video, out_hw)


def evaluate_test(model, params, dataset: FeatureClipDataset,
                  batch_size: int = 16, mesh=None):
    """Full-test-set metrics: (loss, mpjpe_m, l3d, l2d=0) like train.evaluate.

    Runs the same weighted eval step as training validation
    (:func:`h36x.train.step.make_weighted_eval_step`): per-batch metric
    SUMS over real rows accumulate on device and drain once, so the
    dataset mean is exact even when the tail batch is short (padded rows
    carry weight 0) and there is no per-batch host sync. With a mesh,
    batches shard over the `data` axis and params replicate — the results
    stage scales over chips like extraction and training do (the
    reference's results.py is single-GPU)."""
    # One eval implementation for the whole framework: this delegates to
    # h36x.train.loop.evaluate (weighted sums, exact tail means, prefetch
    # overlap, multi-process local rows) instead of keeping a second copy
    # of the padding/masking/drain machinery in sync by hand.
    from h36x.train.loop import evaluate
    from h36x.train.step import make_weighted_eval_step

    step = make_weighted_eval_step(model)
    sharding = None
    if mesh is not None:
        from h36x.parallel.mesh import batch_sharding, shard_params

        sharding = batch_sharding(mesh)
        params = shard_params(jax.device_get(params), mesh)
    sampler = SequentialBatchSampler(dataset, batch_size)
    metrics = evaluate(step, params, dataset, sampler, sharding)
    return metrics["loss"], metrics["mpjpe"], metrics["l3d"], 0.0


def dump_result_batch(
    model,
    params,
    dataset: FeatureClipDataset,
    preprocessed_root: str,
    out_path: str,
    seq_len: int,
    batch_size: int = 16,
    save_n: int = 16,
    video_size: Optional[int] = 224,
    test_metrics=(0.0, 0.0, 0.0, 0.0),
    forward_fn=None,
) -> dict:
    """Predict one batch and write the results NPZ; returns the payload.

    forward_fn optionally overrides the jitted (params, feats) -> joints
    forward (e.g. h36x.infer.make_fused_forward for the Pallas path)."""
    forward = forward_fn if forward_fn is not None else make_forward(model)
    if not dataset.test_set:
        raise ValueError(
            "dump_result_batch needs clip meta (video lookup) — construct "
            "the FeatureClipDataset with test_set=True")
    idx = list(range(min(batch_size, len(dataset))))
    feats, j3d, j2d, K, meta = dataset.get_batch(idx)
    pred = np.asarray(forward(params, jnp.asarray(feats)))

    if seq_len != feats.shape[1]:
        # videos must be cut to the STORE's T, or frame t in the NPZ stops
        # corresponding to joints[t]/pred[t] (and the viewers walk off the
        # end) whenever the --seq-len flag disagrees with the store
        print(f"WARNING: requested seq_len {seq_len} != store rows' T "
              f"{feats.shape[1]}; using the store's")
        seq_len = int(feats.shape[1])

    b = min(len(idx), save_n)
    videos = []
    metas = []
    for i in range(b):
        if not isinstance(meta[i], dict):
            raise RuntimeError(f"meta[{i}] is {type(meta[i])}, expected dict")
        videos.append(
            load_video_clip_from_meta(preprocessed_root, meta[i], seq_len, video_size)
        )
        metas.append(meta[i])
    videos_np = np.stack(videos)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    payload = {
        "video": videos_np,
        "joints3d": j3d[:b],
        "predicted3djoints": pred[:b],
        "joints2d": j2d[:b],
        "K": K[:b],
        "meta": np.array(metas, dtype=object),
        "test_metrics": np.array(test_metrics, dtype=np.float32),
    }
    np.savez_compressed(out_path, **payload)
    return payload


def dump_debug_batch(
    dataset: FeatureClipDataset, out_path: str, batch_size: int = 8
) -> dict:
    """teste.py equivalent: one feature batch -> debug NPZ (teste.py:82-89).

    Saved under the reference's field names (video slot holds the features —
    the feature dataset has no pixels, exactly like the reference's dump).
    """
    if not dataset.test_set:
        raise ValueError(
            "dump_debug_batch saves clip meta — construct the "
            "FeatureClipDataset with test_set=True")
    idx = list(range(min(batch_size, len(dataset))))
    feats, j3d, j2d, K, meta = dataset.get_batch(idx)
    payload = {
        "video": feats,
        "joints3d": j3d,
        "joints2d": j2d,
        "cam_K": K,
        "meta": np.array(meta, dtype=object),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez_compressed(out_path, **payload)
    return payload
