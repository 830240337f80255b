"""Scale soak drill for the extraction stage (VERDICT r4 #2).

Every committed throughput number so far is a short burst on a tiny tree;
the reference job is ~200k clips over hours
(/root/reference/src/preprocess_resnet_features.py:25). This drill runs the
REAL extraction stage (production `run_extract` over a real ingested tree of
mp4s: decode, crop, jitter, shuffle pool, async shard writer, progress
files, resume) at tens-of-thousands-of-clips scale and measures what bursts
cannot:

  - sustained clip-frames/s over wall time (first-half vs second-half rate:
    a leak or O(n^2) index path shows up as decay);
  - host RSS ceiling vs the documented pool formula (DESIGN.md "Shuffle
    pool host RAM") — the default --shuffle-pool-gb bound must hold it;
  - progress.json / index growth at realistic index sizes;
  - a true-SIGKILL mid-run + `--resume` completion at scale, verified by a
    full CRC read-back (verify_store) and an exact clip-coverage check.

The backbone is a deterministic fake (per-frame hash projection to 2048-d,
same shape/bytes as ResNet-50 features) and the device is forced CPU: the
chip-side rate is bench.py's domain (measured at 96% of its HBM roofline);
the soak isolates everything AROUND the chip — the host pipeline that has
to survive the hours-long job. Feature bytes, pool RAM, store size, and
index sizes are exactly the production fp32 augmented shapes.

Usage (the run of record; ~30-60 min on one core, ~20 GB under --workdir):
  python -m benchmarks.soak_extract --videos 96 --frames 2200 \
      --out benchmarks/results_soak_r5.json --workdir /tmp/soak

Small smoke (also what tests/test_soak_smoke.py runs):
  python -m benchmarks.soak_extract --videos 4 --frames 120 --size 64 \
      --resize 32 --kill-at-frac 0.5 --out /tmp/soak.json
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

SEQ_LEN = 40
STRIDE = 5
FRAME_SKIP = 2
SUBJECTS = (1, 5, 6, 7, 8, 9, 11)


# --- synthetic ingested tree -------------------------------------------------

def synth_tree(root: Path, n_videos: int, n_frames: int, size: int,
               seed: int = 0) -> int:
    """Write an ingested-layout tree (S*/action/cam_0/{mp4,pkls}) of
    `n_videos` videos x `n_frames` raw frames at size x size.

    Frames are cheap structured content (gradient background + joint dots
    drifting with a smooth 3D walk) so mp4v encodes fast and small while
    the decode path stays real. Returns the expected clip count."""
    import pickle

    import cv2

    root.mkdir(parents=True, exist_ok=True)
    marker = root / ".soak_tree.json"
    want = {"n_videos": n_videos, "n_frames": n_frames, "size": size,
            "seed": seed}
    if marker.exists() and json.loads(marker.read_text()) == want:
        return _expected_clips(n_videos, n_frames)

    fx = fy = 1.4 * size
    cx = cy = size / 2
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    bg = np.stack([40 + 30 * xx / size, 40 + 30 * yy / size,
                   60 + 0 * xx], axis=-1)
    for v in range(n_videos):
        subject = SUBJECTS[v % len(SUBJECTS)]
        action = f"Soak_{v}"
        cam_dir = root / f"S{subject}" / action / "cam_0"
        cam_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(seed * 100_003 + v)
        base = np.concatenate(
            [rng.uniform(-500, 500, size=(1, 17, 2)),
             rng.uniform(3000, 4500, size=(1, 17, 1))], axis=-1)
        steps = rng.normal(0, 14.0, size=(n_frames, 17, 3))
        for t in range(1, n_frames):
            steps[t] = 0.8 * steps[t - 1] + 0.2 * steps[t]
        j3d = (base + np.cumsum(steps, axis=0)).astype(np.float32)
        j3d[..., 2] = np.clip(j3d[..., 2], 2500, 5200)
        z = np.maximum(j3d[..., 2], 1e-3)
        j2d = np.stack([fx * j3d[..., 0] / z + cx,
                        fy * j3d[..., 1] / z + cy], axis=-1)
        j2d = np.clip(j2d, 4, size - 5).astype(np.float32)

        vw = cv2.VideoWriter(
            str(cam_dir / f"S{subject}_{action}_cam_0.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 25, (size, size))
        for f in range(n_frames):
            frame = bg.copy()
            ui = np.clip(j2d[f, :, 0].astype(np.int32), 2, size - 3)
            vi = np.clip(j2d[f, :, 1].astype(np.int32), 2, size - 3)
            for j in range(17):
                frame[vi[j] - 2:vi[j] + 3, ui[j] - 2:ui[j] + 3] = (
                    40 + 12 * j, 255 - 12 * j, 128)
            vw.write(np.clip(frame, 0, 255).astype(np.uint8))
        vw.release()
        with open(cam_dir / "gt_poses.pkl", "wb") as f:
            pickle.dump({"2d": j2d, "3d": j3d}, f)
        with open(cam_dir / "camera_wext.pkl", "wb") as f:
            pickle.dump({"f": np.array([fx, fy]), "c": np.array([cx, cy]),
                         "k": np.zeros(5), "rt": np.eye(3),
                         "t": np.zeros(3)}, f)
        if (v + 1) % 16 == 0:
            print(f"[synth] {v + 1}/{n_videos} videos", flush=True)
    marker.write_text(json.dumps(want))
    return _expected_clips(n_videos, n_frames)


def _expected_clips(n_videos: int, n_frames: int) -> int:
    usable = (n_frames + FRAME_SKIP - 1) // FRAME_SKIP  # ceil: frames 0,2,4..
    per_video = max(0, (usable - SEQ_LEN) // STRIDE + 1)
    return n_videos * per_video


# --- worker (runs run_extract in its own process, killable) ------------------

def worker_main(cfg_json: str) -> None:
    """Child-process entry: force CPU in-process (plain env vars do not
    override the axon TPU plugin), install the fake backbone, run the
    production extraction."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)

    from h36x.config import ExtractConfig
    import h36x.extract.pipeline as pl

    def _load(cfg):
        return None, None

    def _make(model, mesh=None, engine="flax"):
        def fn(variables, frames):
            # deterministic per-frame content sample -> 2048-d f32 (same
            # bytes-per-row as ResNet-50 features, fully content-dependent,
            # ~zero FLOPs) so the PIPELINE is what gets soaked, not numpy
            flat = np.asarray(frames).reshape(frames.shape[0], -1)
            idx = np.linspace(0, flat.shape[1] - 1, 2048).astype(np.int64)
            return flat[:, idx].astype(np.float32)

        return fn

    pl._load_backbone = _load
    pl.make_feature_fn = _make

    cfg = ExtractConfig(**json.loads(Path(cfg_json).read_text()))
    pl.run_extract(cfg)


# --- monitor ------------------------------------------------------------------

def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _progress_stats(out_dir: Path) -> tuple:
    p = out_dir / "progress.json"
    try:
        size = p.stat().st_size
        n = len(json.loads(p.read_text()).get("clips", []))
        return n, size
    except (OSError, json.JSONDecodeError):
        # finalize_store commits index.json then unlinks progress.json —
        # a missing progress file on a finished store means ALL clips are
        # committed, not zero (reading 0 here poisoned the rate curve
        # with a negative second-half slope in the first soak run)
        try:
            idx = json.loads((out_dir / "index.json").read_text())
            return len(idx.get("clips", [])), 0
        except (OSError, json.JSONDecodeError):
            return 0, 0


def run_leg(cfg_dict: dict, expected_clips: int, kill_at_frac: float,
            sample_s: float, label: str) -> dict:
    """Launch a worker subprocess; sample RSS/progress; optionally SIGKILL
    at `kill_at_frac` of the expected committed clips. Returns the leg's
    samples + outcome."""
    out_dir = Path(cfg_dict["out"])
    cfg_path = out_dir.parent / f"soak_cfg_{label}.json"
    out_dir.parent.mkdir(parents=True, exist_ok=True)
    cfg_path.write_text(json.dumps(cfg_dict))
    proc = subprocess.Popen(
        [sys.executable, "-m", "benchmarks.soak_extract",
         "--worker-cfg", str(cfg_path)],
        cwd=str(Path(__file__).resolve().parent.parent))
    t0 = time.monotonic()
    samples = []
    killed = False
    while True:
        ret = proc.poll()
        now = time.monotonic() - t0
        clips_done, prog_bytes = _progress_stats(out_dir)
        store_bytes = sum(
            f.stat().st_size for f in out_dir.glob("shard_*.h36x"))
        samples.append({
            "t_s": round(now, 2), "clips_committed": clips_done,
            "rss_mb": round(_rss_mb(proc.pid), 1),
            "progress_bytes": prog_bytes, "store_bytes": store_bytes,
        })
        if ret is not None:
            break
        if (not killed and kill_at_frac > 0
                and clips_done >= kill_at_frac * expected_clips):
            print(f"[soak] SIGKILL worker at {clips_done}/{expected_clips} "
                  f"committed clips (t={now:.0f}s)", flush=True)
            proc.send_signal(signal.SIGKILL)
            killed = True
        time.sleep(sample_s)
    return {
        "label": label,
        "returncode": proc.returncode,
        "killed": killed,
        "wall_s": round(time.monotonic() - t0, 2),
        "samples": samples,
    }


# --- verification + stats ------------------------------------------------------

def verify_final(out_dir: Path, expected_clips: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from h36x.data.shards import load_index, verify_store

    rep = verify_store(out_dir)
    idx = load_index(out_dir)
    keys = [(c["subject"], c["action"], c["cam"], c["start"])
            for c in idx["clips"]]
    return {
        "verify_errors": rep["errors"],
        "arrays_checked": rep["arrays_checked"],
        "n_shards": rep["n_shards"],
        "index_clips": len(idx["clips"]),
        "expected_clips": expected_clips,
        "unique_clips": len(set(keys)),
        "coverage_ok": (len(idx["clips"]) == expected_clips
                        and len(set(keys)) == expected_clips
                        and not rep["errors"]),
    }


def throughput_stats(legs: list, seq_len: int) -> dict:
    """Sustained rate from the committed-clip curve across all legs (resume
    leg's clock continues after the kill gap is removed)."""
    # stitch: (cumulative wall within active legs, clips_committed),
    # under a running-max envelope — committed clips never decrease, so
    # any dip in the raw samples is a measurement artifact (a progress
    # flush racing the reader, or the pre-fix completed-store zero)
    pts = []
    base_t = 0.0
    hi = 0
    for leg in legs:
        for s in leg["samples"]:
            hi = max(hi, s["clips_committed"])
            pts.append((base_t + s["t_s"], hi))
        base_t += leg["wall_s"]
    if len(pts) < 4:
        return {}
    t_end, clips_end = pts[-1]
    # first-half vs second-half committed rate (decay detector)
    mid_t = t_end / 2
    first = [(t, c) for t, c in pts if t <= mid_t]
    second = [(t, c) for t, c in pts if t > mid_t]
    def rate(seg):
        if len(seg) < 2 or seg[-1][0] == seg[0][0]:
            return 0.0
        return (seg[-1][1] - seg[0][1]) / (seg[-1][0] - seg[0][0])
    r1, r2 = rate(first), rate(second)
    return {
        "clip_frames_per_s_overall": round(clips_end * seq_len / t_end, 1),
        "clips_per_s_overall": round(clips_end / t_end, 2),
        "clips_per_s_first_half": round(r1, 2),
        "clips_per_s_second_half": round(r2, 2),
        "second_to_first_rate_ratio": round(r2 / r1, 3) if r1 > 0 else None,
    }


def recompute(results_path: str) -> dict:
    """Recompute throughput_stats from a results JSON's stored samples
    (in place) — the stats fix for runs recorded before the completed-
    store zero-read was corrected; the raw samples were always good."""
    path = Path(results_path)
    result = json.loads(path.read_text())
    legs = [dict(leg, samples=result["samples"][leg["label"]])
            for leg in result["legs"]]
    # the envelope cannot recover the final index commit from pre-fix
    # samples (they read 0 after completion); the verified index count is
    # the ground truth for the last point
    if result.get("final", {}).get("coverage_ok"):
        legs[-1]["samples"][-1]["clips_committed"] = max(
            legs[-1]["samples"][-1]["clips_committed"],
            result["final"]["index_clips"])
    result["throughput"] = throughput_stats(legs, result["config"]["seq_len"])
    path.write_text(json.dumps(result) + "\n")
    return result


def main(argv=None):
    global SEQ_LEN, STRIDE

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--worker-cfg", default="", help=argparse.SUPPRESS)
    ap.add_argument("--recompute", default="", metavar="RESULTS_JSON",
                    help="recompute throughput stats from a recorded "
                         "results JSON's samples and rewrite it")
    ap.add_argument("--videos", type=int, default=96)
    ap.add_argument("--frames", type=int, default=2200)
    ap.add_argument("--size", type=int, default=128,
                    help="raw video HxW (decode cost knob)")
    ap.add_argument("--resize", type=int, default=224)
    ap.add_argument("--workdir", default="/tmp/h36x_soak")
    ap.add_argument("--out", default="benchmarks/results_soak.json")
    ap.add_argument("--kill-at-frac", type=float, default=0.5)
    ap.add_argument("--sample-s", type=float, default=3.0)
    ap.add_argument("--shuffle-pool-gb", type=float, default=8.0)
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--seq-len", type=int, default=SEQ_LEN)
    ap.add_argument("--stride", type=int, default=STRIDE)
    ap.add_argument("--shard-size", type=int, default=512)
    ap.add_argument("--shuffle-pool", type=int, default=8192)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args(argv)

    if args.recompute:
        result = recompute(args.recompute)
        print(json.dumps(result["throughput"]))
        return

    if args.worker_cfg:
        worker_main(args.worker_cfg)
        return

    SEQ_LEN, STRIDE = args.seq_len, args.stride

    work = Path(args.workdir)
    tree = work / "ingested"
    store = work / "features"
    print(f"[soak] synthesizing tree: {args.videos} videos x {args.frames} "
          f"frames @ {args.size}px", flush=True)
    t_synth = time.monotonic()
    expected = synth_tree(tree, args.videos, args.frames, args.size)
    t_synth = time.monotonic() - t_synth
    print(f"[soak] tree ready: {expected} expected clips "
          f"({t_synth:.0f}s)", flush=True)

    cfg = dict(
        root=str(tree), out=str(store), seq_len=args.seq_len,
        frame_skip=FRAME_SKIP, stride=args.stride, resize=args.resize,
        batch_size=args.batch_size, num_workers=args.num_workers,
        augment=True, shard_size=args.shard_size,
        shuffle_pool=args.shuffle_pool,
        shuffle_pool_gb=args.shuffle_pool_gb, shuffle_seed=123,
        subjects=list(SUBJECTS),
    )
    if store.exists():
        import shutil

        shutil.rmtree(store)

    legs = [run_leg(cfg, expected, args.kill_at_frac, args.sample_s,
                    "initial")]
    if legs[0]["killed"]:
        assert legs[0]["returncode"] != 0
        resume_cfg = dict(cfg, resume=True)
        legs.append(run_leg(resume_cfg, expected, 0.0, args.sample_s,
                            "resume"))

    final = verify_final(store, expected)
    rss_peak = max((s["rss_mb"] for leg in legs for s in leg["samples"]),
                   default=0.0)
    prog_peak = max((s["progress_bytes"] for leg in legs
                     for s in leg["samples"]), default=0)
    store_bytes = sum(f.stat().st_size for f in store.glob("shard_*.h36x"))
    result = {
        "config": {k: cfg[k] for k in
                   ("seq_len", "stride", "resize", "shard_size",
                    "shuffle_pool", "shuffle_pool_gb", "num_workers")},
        "videos": args.videos, "frames_per_video": args.frames,
        "raw_size_px": args.size,
        "expected_clips": expected,
        "synth_s": round(t_synth, 1),
        "legs": [{k: leg[k] for k in
                  ("label", "returncode", "killed", "wall_s")}
                 for leg in legs],
        "samples": {leg["label"]: leg["samples"] for leg in legs},
        "throughput": throughput_stats(legs, args.seq_len),
        "rss_peak_mb": rss_peak,
        "progress_json_peak_bytes": prog_peak,
        "store_bytes": store_bytes,
        "resume_exercised": bool(legs[0]["killed"]),
        "final": final,
        "ok": bool(final["coverage_ok"]
                   and (not legs[0]["killed"] or len(legs) == 2)
                   and (legs[-1]["returncode"] == 0)),
    }
    line = json.dumps(result)
    Path(args.out).write_text(line + "\n")
    # keep the huge sample arrays out of stdout
    brief = {k: v for k, v in result.items() if k != "samples"}
    print(json.dumps(brief))


if __name__ == "__main__":
    main()
