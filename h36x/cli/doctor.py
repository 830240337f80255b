"""CLI: environment + artifact diagnostics (`h36x-doctor`).

One command that answers "why doesn't my setup work": JAX backend and
device inventory, native library build status, optional host dependencies
(cv2 / spacepy / torch / orbax), and — when pointed at artifacts — shard
store and checkpoint sanity. The reference has no equivalent; its failure
mode is a stack trace nine layers into a SLURM job.

Exit code is non-zero if any REQUIRED check fails (store/checkpoint checks
are required once their flag is given; optional deps only warn).
"""

import argparse
import importlib


def _check(name, fn, problems, required=True):
    try:
        detail = fn()
        print(f"  [ok] {name}: {detail}")
    except Exception as e:  # noqa: BLE001 - diagnostics must not crash
        tag = "FAIL" if required else "warn"
        print(f"  [{tag}] {name}: {type(e).__name__}: {e}")
        if required:
            problems.append(name)


def _jax_info():
    import jax

    devs = jax.devices()
    kinds = {d.platform for d in devs}
    return (f"jax {jax.__version__}, {len(devs)} device(s) "
            f"[{', '.join(sorted(kinds))}], "
            f"process {jax.process_index()}/{jax.process_count()}")


def _native_info():
    from h36x import native

    lib = native.load()
    if lib is None:
        raise RuntimeError("libh36xio.so not built and build failed "
                           "(falling back to cv2 host ops)")
    return f"libh36xio loaded ({lib._name})"


def _optional(mod):
    def probe():
        m = importlib.import_module(mod)
        return getattr(m, "__version__", "present")

    return probe


def _store_info(root):
    def probe():
        from pathlib import Path

        from h36x.data.shards import load_index, read_shard, shard_path

        idx = load_index(root)
        n = idx["n_shards"]
        if n is None:  # reference index.pt may omit it; recompute from clips
            n = 1 + max(c["shard_id"] for c in idx["clips"])
        torch_fmt = bool(idx.get("torch_format"))
        # torch stores ship shard_XXXXX.pt — check THOSE, not the .h36x
        # names (gating the checks off entirely would print [ok] for a
        # reference store with absent/corrupt shards, exactly the failure
        # the doctor exists to preempt)
        def _spath(s):
            return (Path(root) / f"shard_{s:05d}.pt") if torch_fmt \
                else shard_path(root, s)

        missing = [s for s in range(n) if not _spath(s).exists()]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)}/{n} shard files missing (first: "
                f"{_spath(missing[0]).name})")
        detail = (f"{idx['n_clips']} clips x {idx['n_variants']} variants, "
                  f"{n} shards, seq_len={idx['seq_len']}, "
                  f"dtype={idx['feat_dtype']}")
        if torch_fmt:
            from h36x.data.shards import load_torch_shard

            shard = load_torch_shard(root, 0)
        else:
            shard = read_shard(shard_path(root, 0))
        rows = shard["feats"].shape[0]
        detail += f"; shard 0 reads ok ({rows} rows)"
        return detail

    return probe


def _verify_store(root):
    """Deep integrity scan (vs `--root`'s shallow existence/read check):
    recompute every shard's recorded per-array CRC32s and cross-check the
    index's clip->shard mapping against on-disk row counts."""

    def probe():
        from h36x.data.shards import verify_store

        rep = verify_store(root)
        if rep["errors"]:
            for e in rep["errors"][:10]:
                print(f"       - {e}")
            if len(rep["errors"]) > 10:
                print(f"       - ... {len(rep['errors']) - 10} more")
            raise RuntimeError(f"{len(rep['errors'])} integrity error(s)")
        note = ("" if not rep["arrays_unchecked"] else
                f"; {rep['arrays_unchecked']} array(s) predate checksums "
                "(readable but unverifiable)")
        return (f"{rep['n_shards']} shards, {rep['rows']} rows, "
                f"{rep['arrays_checked']} arrays CRC-verified{note}")

    return probe


def _artifact_info(path):
    """AOT serving artifact check: re-hash the blob against the export
    sidecar's sha256/nbytes, then deserialize it (structural validation)
    and report kind/platforms/shapes."""

    def probe():
        import hashlib
        import json
        from pathlib import Path

        p = Path(path)
        blob = p.read_bytes()
        side = Path(str(p) + ".json")
        verified = ""
        if side.exists():
            rec = json.loads(side.read_text())
            want_n = rec.get("nbytes")
            if want_n is not None and want_n != len(blob):
                raise RuntimeError(
                    f"size mismatch: sidecar records {want_n} bytes, file "
                    f"is {len(blob)} — truncated or mispaired")
            want = rec.get("sha256")
            if want is not None:
                got = hashlib.sha256(blob).hexdigest()
                if got != want:
                    raise RuntimeError(
                        f"sha256 mismatch: sidecar records {want[:12]}..., "
                        f"file hashes {got[:12]}... — blob corrupted")
                verified = ", sha256 verified"
        from h36x.export import artifact_info

        info = artifact_info(blob)  # deserialize = structural validation
        return (f"{info['nbytes'] / 1e6:.1f} MB, platforms "
                f"{info['platforms']}, in {info['in_avals']}{verified}")

    return probe


def _ckpt_info(path):
    def probe():
        import json
        from pathlib import Path

        def describe(man: dict) -> str:
            # training manifests carry epoch/step/best_val; h36x-convert
            # writes {converted_from, format} only — report what exists
            # instead of KeyError-failing a perfectly loadable artifact
            if "epoch" in man:
                return (f"epoch {man['epoch']}, step {man.get('step', '?')}, "
                        f"best_val {man.get('best_val', float('nan')):.4f}")
            if "converted_from" in man:
                return (f"converted from {man['converted_from']} "
                        f"({man.get('format', 'unknown format')})")
            return f"manifest keys: {sorted(man)}"

        def arch(man: dict) -> str:
            mc = (man.get("config") or {}).get("model") or {}
            if not mc:
                return ""
            keys = ("latent_dim", "num_blocks", "groups", "regressor_iters")
            shown = {k: mc[k] for k in keys if k in mc}
            return ("; arch " + " ".join(f"{k}={v}" for k, v in shown.items())
                    if shown else "")

        p = Path(path)
        if p.is_dir():  # orbax directory or a run dir
            for name in ("last", "best"):
                if (p / f"{name}.json").exists():
                    man = json.loads((p / f"{name}.json").read_text())
                    return f"{name}: {describe(man)}{arch(man)}"
            raise FileNotFoundError("no last.json/best.json manifest found")
        man_path = p.with_suffix(".json")
        if not p.exists():
            raise FileNotFoundError(str(p))
        size_mb = p.stat().st_size / 1e6
        detail = f"{size_mb:.1f} MB"
        if man_path.exists():
            man = json.loads(man_path.read_text())
            detail += f", {describe(man)}{arch(man)}"
            want = man.get("sha256")
            if want is not None:  # recorded by save_checkpoint (msgpack)
                import hashlib

                blob = p.read_bytes()
                if man.get("nbytes") not in (None, len(blob)):
                    raise RuntimeError(
                        f"size mismatch: manifest records "
                        f"{man['nbytes']} bytes, file is {len(blob)} — "
                        "truncated or mispaired with this manifest")
                got = hashlib.sha256(blob).hexdigest()
                if got != want:
                    raise RuntimeError(
                        f"sha256 mismatch: manifest records {want[:12]}..., "
                        f"file hashes {got[:12]}... — blob corrupted or "
                        "mispaired with this manifest")
                detail += ", sha256 verified"
        return detail

    return probe


def dedup_stats(root, seq_len, stride, frame_skip):
    """Unique-frame-scheduler dedup counts from pose pickles alone (no
    video decode): the crop box of every window is a pure function of its
    2D-joint slice plus the frame dims (h36x/extract/dedup.py keys the
    feature cache on (frame, box)). Dims come from the video header when
    the mp4 is present (one container open per video, no frame decode —
    the real H36M cameras are 1000x1002 while 2c would give ~1025x1031,
    which clamps edge boxes differently than the real scheduler); with no
    video the principal-point estimate dims = 2c is the fallback.

    Returns the counts; the derived ratios equal run_extract_dedup's
    reported `dedup_ratio` exactly when the whole tree is extracted with
    --augment (asserted by tests/test_dedup.py)."""
    import numpy as np

    from h36x.data.clips import scan_clips
    from h36x.geometry.crop import compute_square_crop_from_2d

    clips, gt_cache, _ = scan_clips(
        root, subjects=_all_subjects(root), seq_len=seq_len,
        stride=stride, frame_skip=frame_skip,
    )
    by_video: dict = {}
    for ci in clips:
        by_video.setdefault(ci.video_idx, []).append(ci)
    unique = 0
    total = 0
    stable = 0
    windows = 0
    uniq_frames = 0  # distinct subsampled frames covered (video scope)
    for cis in by_video.values():
        j2d_all = gt_cache[cis[0].gt_path][1]
        img_w = img_h = 0
        try:  # header-only open; the scheduler clamps on the DECODED dims
            import cv2

            cap = cv2.VideoCapture(cis[0].video_path)
            if cap.isOpened():
                img_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                img_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            cap.release()
        except ImportError:
            pass
        if img_w <= 0 or img_h <= 0:
            c = np.asarray(cis[0].cam_params.get("c", ()),
                           np.float64).reshape(-1)
            if c.size == 2 and np.all(c > 0):
                img_w, img_h = int(round(2 * c[0])), int(round(2 * c[1]))
            else:  # no principal point: generous bound, clamp only at edges
                img_h = img_w = int(np.ceil(j2d_all.max() * 1.6)) + 8
        seen = set()
        frames = set()
        prev = None
        for ci in cis:
            j2d = j2d_all[np.arange(ci.start, ci.end) * frame_skip]
            box = compute_square_crop_from_2d(j2d, img_h, img_w)
            bkey = tuple(int(v) for v in box[:3])
            windows += 1
            if prev is not None and bkey == prev:
                stable += 1
            prev = bkey
            for t in range(ci.start, ci.end):
                total += 1
                frames.add(t)
                if (t, bkey) not in seen:
                    seen.add((t, bkey))
                    unique += 1
        uniq_frames += len(frames)
    return {
        "n_clips": len(clips), "n_videos": len(by_video), "total": total,
        "unique": unique, "uniq_frames": uniq_frames, "stable": stable,
        "windows": windows,
    }


def dedup_ratios(s: dict) -> dict:
    """Device dedup vs the per-clip pipeline's 3 passes/clip-frame, per
    mode. cjitter costs seq_len per clip at --jitter-key clip but is
    cached like orig/hflip when re-keyed; --crop-scope video gives every
    frame ONE box, so unique (frame, box) pairs == distinct frames."""
    t, u, uf = s["total"], s["unique"], s["uniq_frames"]
    return {
        "clip": 3 * t / (t + 2 * u),
        "crop_video": 3 * t / (t + 2 * uf),
        "jitter_rekey": t / u,
        "full": t / uf,
    }


def _dedup_estimate(root, seq_len, stride, frame_skip):
    """The number that decides whether --crop-scope video or --jitter-key
    video|frame is worth turning on for a given dataset (see dedup_stats)."""

    def probe():
        s = dedup_stats(root, seq_len, stride, frame_skip)
        r = dedup_ratios(s)
        passes = (s["total"] + 2 * s["unique"]) / s["total"]
        pairs = max(s["windows"] - s["n_videos"], 1)
        return (f"{s['n_clips']} clips / {s['n_videos']} videos: "
                f"{100 * s['stable'] / pairs:.0f}% of consecutive windows "
                f"share a box; unique (frame, box) = "
                f"{s['unique']}/{s['total']} -> ~{r['clip']:.2f}x device "
                f"dedup at reference semantics ({passes:.2f} "
                f"passes/clip-frame); --crop-scope video guarantees "
                f"{r['crop_video']:.2f}x; --jitter-key video|frame -> "
                f"{r['jitter_rekey']:.2f}x ({r['full']:.2f}x with "
                f"--crop-scope video)")

    return probe


def _all_subjects(root):
    import os
    import re

    subs = []
    for d in os.listdir(root):
        m = re.fullmatch(r"S(\d+)", d)
        if m:
            subs.append(int(m.group(1)))
    return sorted(subs)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="", help="feature-shard store to check")
    p.add_argument("--ckpt", default="",
                   help="checkpoint file or run directory to check")
    p.add_argument("--artifact", default="",
                   help="h36x-export artifact: re-hash against its .json "
                        "sidecar and deserialize (structural validation)")
    p.add_argument("--verify-store", default="",
                   help="feature-shard store: full integrity scan — "
                        "recompute per-array CRC32s, check truncation and "
                        "index/shard row agreement (reads every byte; "
                        "--root alone only checks existence + shard 0)")
    p.add_argument("--dedup-estimate", default="",
                   help="ingested clip tree: predict the unique-frame "
                        "scheduler's dedup ratio from pose data (no decode)")
    p.add_argument("--seq-len", type=int, default=40)
    p.add_argument("--stride", type=int, default=5)
    p.add_argument("--frame-skip", type=int, default=2)
    args = p.parse_args(argv)

    problems: list = []
    print("h36x doctor")
    _check("jax backend", _jax_info, problems)
    _check("native library", _native_info, problems, required=False)
    for mod, why in (("cv2", "video decode"), ("spacepy", "raw CDF ingest"),
                     ("torch", "test oracles / weight import"),
                     ("orbax.checkpoint", "orbax ckpt backend")):
        _check(f"{mod} ({why})", _optional(mod), problems, required=False)
    if args.root:
        _check(f"store {args.root}", _store_info(args.root), problems)
    if args.verify_store:
        _check(f"store integrity {args.verify_store}",
               _verify_store(args.verify_store), problems)
    if args.ckpt:
        _check(f"checkpoint {args.ckpt}", _ckpt_info(args.ckpt), problems)
    if args.artifact:
        _check(f"artifact {args.artifact}", _artifact_info(args.artifact),
               problems)
    if args.dedup_estimate:
        _check(
            f"dedup estimate {args.dedup_estimate}",
            _dedup_estimate(args.dedup_estimate, args.seq_len, args.stride,
                            args.frame_skip),
            problems,
        )

    if problems:
        raise SystemExit(f"doctor found problems: {', '.join(problems)}")
    print("all required checks passed")


if __name__ == "__main__":
    main()
