"""Unique-frame extraction scheduling (h36x/extract/dedup.py): byte-exact
parity with the per-clip scheduler, actual dedup on overlapping windows,
the deviation modes (crop_scope='video', jitter_key='video'/'frame'),
sequential video decode, resume and partitioning.

Byte-exact parity is asserted with a DETERMINISTIC stand-in backbone (a
fixed f64 projection of the pixels): it isolates the scheduler's actual
contract — which pixels reach the backbone and where each row lands —
from XLA:CPU's threaded convolutions, whose bf16 reductions are NOT
reliably batch-position-deterministic under concurrent host load (the
per-clip pipeline's own store showed run-to-run 2e-2 feature jitter at
shared frames). One integration test runs the real backbone at a matching
tolerance. On TPU the backbone's fixed MXU tiling is position-invariant,
so the store contract is bitwise there."""

import numpy as np
import pytest

from h36x.config import ExtractConfig
from h36x.data.clips import ClipIndex
from h36x.data.features import FeatureClipDataset
from h36x.extract.pipeline import run_extract

H, W = 40, 48

_PROJ = np.random.default_rng(99).normal(size=(16 * 16 * 3, 64))


@pytest.fixture
def fake_backbone(monkeypatch):
    """Deterministic per-frame 'backbone': position/batch-shape invariant by
    construction (per-row f64 contraction), so any store mismatch is a
    scheduler bug, not numeric noise."""
    import h36x.extract.pipeline as pl

    def load(cfg):
        return None, None

    def make(model, mesh=None, engine="flax"):
        def fn(variables, frames):
            flat = np.asarray(frames).reshape(frames.shape[0], -1)
            f = flat.astype(np.float64) @ _PROJ
            return np.tile(np.asarray(f, np.float32), (1, 2048 // 64))

        return fn

    monkeypatch.setattr(pl, "_load_backbone", load)
    monkeypatch.setattr(pl, "make_feature_fn", make)


class FakeOverlapDataset:
    """Video-structured clip source with OVERLAPPING windows.

    Frames are deterministic per (video, frame) — the invariant real video
    gives the dedup scheduler — so the per-clip path (which regenerates a
    frame for every window containing it) and the dedup path (which reads
    it once) see identical pixels. `smooth=True` keeps each video's 2D
    joints constant so every window computes the same crop box (full
    dedup); `smooth=False` drifts them so boxes change between windows
    (content-addressed cache must keep exact parity at partial hit rates).
    """

    def __init__(self, n_videos=2, n_sub=14, seq_len=8, stride=2,
                 smooth=True):
        self.seq_len = seq_len
        self.frame_skip = 2
        self.n_sub = n_sub
        self.smooth = smooth
        self.clips = []
        self._j2d = {}
        self._j3d = {}
        for v in range(n_videos):
            rng = np.random.default_rng(100 + v)
            base = rng.random((1, 17, 2)) * [W - 16, H - 16] + 8
            if smooth:
                j2d = np.repeat(base, n_sub, axis=0)
            else:
                drift = np.cumsum(rng.normal(0, 1.5, size=(n_sub, 1, 2)),
                                  axis=0)
                j2d = np.clip(base + drift, 4, [W - 4, H - 4])
            self._j2d[v] = j2d.astype(np.float32)
            self._j3d[v] = (rng.normal(size=(n_sub, 17, 3)) * 100).astype(
                np.float32)
            for start in range(0, n_sub - seq_len + 1, stride):
                self.clips.append(ClipIndex(
                    video_path=f"fake_{v}.mp4", gt_path=f"fake_{v}.pkl",
                    subject=1 + v, action="Act", cam="cam_0",
                    cam_params={"f": np.array([500.0, 500.0]),
                                "c": np.array([W / 2, H / 2]),
                                "k": np.zeros(5), "rt": np.eye(3),
                                "t": np.zeros(3)},
                    start=start, end=start + seq_len, video_idx=v,
                ))

    def __len__(self):
        return len(self.clips)

    def _frame(self, v, f):
        rng = np.random.default_rng(v * 10_000 + f)
        return rng.integers(0, 256, size=(H, W, 3)).astype(np.uint8)

    def clip_annotations(self, i):
        ci = self.clips[i]
        v = ci.video_idx
        return (self._j3d[v][ci.start:ci.end].copy(),
                self._j2d[v][ci.start:ci.end].copy(), ci.cam_params, ci)

    def video_groups(self):
        groups = {}
        for i, ci in enumerate(self.clips):
            groups.setdefault(ci.video_idx, []).append(i)
        return [groups[v] for v in sorted(groups)]

    def video_joints2d(self, video_idx):
        return self._j2d[video_idx]

    def __getitem__(self, i):
        j3d, j2d, cam, ci = self.clip_annotations(i)
        frames = np.stack([self._frame(ci.video_idx, f)
                           for f in range(ci.start, ci.end)])
        return frames, j3d, j2d, cam, ci


def _cfg(out, **kw):
    # mode flags pinned to strict reference semantics: most tests here
    # verify dedup-vs-legacy BYTE parity, which is defined at clip/clip
    # (the round-5 'auto' default resolves to the video/video production
    # profile on the dedup scheduler); mode tests override explicitly
    base = dict(out=str(out), seq_len=8, resize=16, batch_size=2,
                num_workers=2, augment=True, shard_size=3, shuffle_pool=100,
                shuffle_seed=1, crop_scope="clip", jitter_key="clip")
    base.update(kw)
    return ExtractConfig(**base)


def _rows(root, augment=True):
    ds = FeatureClipDataset(root, augment=augment, test_set=True)
    out = {}
    for i in range(len(ds)):
        feats, j3d, j2d, K, meta = ds[i]
        key = (meta["subject"], meta["start"], meta["aug"])
        assert key not in out
        out[key] = (feats, j3d, j2d, K, meta["box"])
    return out


@pytest.mark.parametrize("smooth", [True, False])
@pytest.mark.parametrize("augment", [True, False])
def test_dedup_store_matches_per_clip_exactly(tmp_path, smooth, augment,
                                              fake_backbone):
    """The headline invariant: the dedup scheduler's store is byte-identical
    to the per-clip scheduler's — same clips, same shard rows, same feature
    BYTES (orig/cjitter/hflip/trev), same joints/K/meta — whether crop
    boxes are stable across windows (smooth) or drift (content-addressed
    cache partial hits)."""
    ds = FakeOverlapDataset(smooth=smooth)
    s_legacy = run_extract(_cfg(tmp_path / "legacy", dedup=False,
                                augment=augment), dataset=ds)
    s_dedup = run_extract(_cfg(tmp_path / "dedup", dedup=True,
                               augment=augment), dataset=ds)
    assert s_legacy["n_clips"] == s_dedup["n_clips"] == len(ds)

    want = _rows(tmp_path / "legacy", augment)
    got = _rows(tmp_path / "dedup", augment)
    assert want.keys() == got.keys()
    for key in want:
        for a, b in zip(want[key], got[key]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(key))

    if smooth:
        # overlapping windows share frames: stride=2, seq_len=8 -> interior
        # clips add only 2 new frames per deterministic variant
        legacy_rows = len(ds) * 8 * (3 if augment else 1)
        assert s_dedup["backbone_frames"] < legacy_rows
        assert s_dedup["dedup_ratio"] > 1.5


def test_dedup_shuffle_pool_order_matches(tmp_path, fake_backbone):
    """Shard assignment (seeded shuffle over arrival order) must be
    identical between the two schedulers — clips enter the pool in global
    clip-index order in both."""
    ds = FakeOverlapDataset()
    run_extract(_cfg(tmp_path / "a", dedup=False), dataset=ds)
    run_extract(_cfg(tmp_path / "b", dedup=True), dataset=ds)
    import json

    idx_a = json.loads((tmp_path / "a" / "index.json").read_text())
    idx_b = json.loads((tmp_path / "b" / "index.json").read_text())
    assert idx_a["clips"] == idx_b["clips"]


def test_crop_scope_video_full_dedup(tmp_path, fake_backbone):
    """crop_scope='video' pins one box per video, so even with drifting
    joints every overlapping frame dedups; the store stays self-consistent
    (per-clip j2d/K adjusted with the same video box)."""
    ds = FakeOverlapDataset(smooth=False)
    s = run_extract(_cfg(tmp_path / "out", crop_scope="video"), dataset=ds)
    # unique frames per video: n_sub per variant; cjitter stays per-clip
    n_clips, T, n_sub, n_videos = len(ds), 8, 14, 2
    expected = n_clips * T + 2 * n_sub * n_videos  # cj per clip + (o,h) unique
    assert s["backbone_frames"] == expected

    rows = _rows(tmp_path / "out")
    # all clips of one video share the box
    boxes = {(k[0], tuple(v[4])) for k, v in rows.items()}
    assert len(boxes) == n_videos
    # geometric self-consistency: hflip j2d is the mirrored orig j2d with
    # left/right joint identities swapped (same rule as the default path)
    from h36x.geometry.skeleton import flip_permutation

    perm = flip_permutation()
    for (subj, start, aug), (f, j3, j2, K, box) in rows.items():
        if aug != "orig":
            continue
        fh, j3h, j2h, Kh, _ = rows[(subj, start, "hflip")]
        np.testing.assert_allclose(j2h[..., perm, 0], 16 - j2[..., 0],
                                   rtol=0, atol=1e-4)


@pytest.mark.parametrize("jitter_key", ["video", "frame"])
def test_jitter_key_modes_dedup_cjitter(tmp_path, jitter_key, fake_backbone):
    """jitter_key='video'/'frame' makes the jittered variant deterministic
    per frame: overlapping clips share cjitter rows at shared frames, and
    the deterministic variants (orig/hflip/trev) still match the default
    store exactly."""
    ds = FakeOverlapDataset(smooth=True)
    s_ref = run_extract(_cfg(tmp_path / "ref"), dataset=ds)
    s = run_extract(_cfg(tmp_path / "out", jitter_key=jitter_key),
                    dataset=ds)
    assert s["backbone_frames"] < s_ref["backbone_frames"]

    ref = _rows(tmp_path / "ref")
    got = _rows(tmp_path / "out")
    assert ref.keys() == got.keys()
    for (subj, start, aug), (f, j3, j2, K, box) in got.items():
        if aug in ("orig", "hflip", "trev"):
            np.testing.assert_array_equal(f, ref[(subj, start, aug)][0])
        np.testing.assert_array_equal(j3, ref[(subj, start, aug)][1])

    # shared frames: consecutive clips overlap by 6 frames; their cjitter
    # rows must agree on the overlap (same frame, same box, same factors)
    for (subj, start, aug), (f, *_rest) in got.items():
        if aug != "cjitter":
            continue
        nxt = got.get((subj, start + 2, "cjitter"))
        if nxt is not None:
            np.testing.assert_array_equal(f[2:], nxt[0][:-2])


def test_dedup_resume_after_crash(tmp_path, fake_backbone):
    """Dedup extraction resumes from progress.json without duplicating or
    dropping clips."""
    import time as _time

    class Flaky(FakeOverlapDataset):
        def __init__(self, fail_at, **kw):
            super().__init__(**kw)
            self.fail_at = fail_at

        def clip_annotations(self, i):
            if self.fail_at is not None and i == self.fail_at:
                raise RuntimeError("simulated annotation crash")
            return super().clip_annotations(i)

    # small dispatches so some clips finalize (and progress flushes) before
    # the crash lands
    cfg = _cfg(tmp_path / "out", shard_size=2, shuffle_pool=2,
               frames_per_dispatch=12)
    with pytest.raises(RuntimeError, match="simulated annotation crash"):
        run_extract(cfg, dataset=Flaky(fail_at=5))

    progress = tmp_path / "out" / "progress.json"
    for _ in range(50):
        if progress.exists():
            break
        _time.sleep(0.1)
    assert progress.exists()

    cfg.resume = True
    ok = Flaky(fail_at=None)
    summary = run_extract(cfg, dataset=ok)
    assert not progress.exists()
    rows = _rows(tmp_path / "out")
    starts = {(s, st) for (s, st, aug) in rows}
    assert len(starts) == len(ok)  # every clip exactly once

    # resumed rows still byte-match a clean single run
    run_extract(_cfg(tmp_path / "clean", shard_size=2, shuffle_pool=2),
                dataset=FakeOverlapDataset())
    clean = _rows(tmp_path / "clean")
    assert rows.keys() == clean.keys()
    for key in rows:
        np.testing.assert_array_equal(rows[key][0], clean[key][0],
                                      err_msg=str(key))


@pytest.mark.parametrize("partition_by", ["clip", "video"])
def test_dedup_partitioned_merge_matches_full(tmp_path, partition_by,
                                             fake_backbone):
    """Partitioned dedup jobs + merge == one full job, for both partition
    semantics (clip round-robin keeps legacy behavior; video round-robin
    decodes each video exactly once across jobs)."""
    from h36x.data.shards import merge_stores

    ds = FakeOverlapDataset()
    run_extract(_cfg(tmp_path / "full"), dataset=ds)
    for i in range(2):
        run_extract(_cfg(tmp_path / f"p{i}", partition=f"{i}/2",
                         partition_by=partition_by), dataset=ds)
    merge_stores([tmp_path / "p0", tmp_path / "p1"], tmp_path / "merged")

    want = _rows(tmp_path / "full")
    got = _rows(tmp_path / "merged")
    assert want.keys() == got.keys()
    for key in want:
        np.testing.assert_array_equal(want[key][0], got[key][0],
                                      err_msg=str(key))


def test_sequential_cursor_matches_per_clip_decode(tmp_path):
    """SequentialVideoCursor must deliver the same subsampled frames as the
    per-clip scan decode, across overlapping monotonic windows."""
    cv2 = pytest.importorskip("cv2")
    from h36x.data.clips import SequentialVideoCursor, _decode_scan

    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (32, 24))
    rng = np.random.default_rng(0)
    for _ in range(40):
        vw.write(rng.integers(0, 255, size=(24, 32, 3)).astype(np.uint8))
    vw.release()

    with SequentialVideoCursor(path, frame_skip=2) as cur:
        for start, end in ((0, 8), (2, 10), (6, 14), (12, 20)):
            got = cur.get(start, end)
            want = _decode_scan(path, start, end, 2)
            np.testing.assert_array_equal(got, want)
        with pytest.raises(ValueError, match="non-monotonic"):
            cur.get(4, 12)

    with SequentialVideoCursor(path, frame_skip=2) as cur:
        with pytest.raises(RuntimeError, match="frame count mismatch"):
            cur.get(0, 99)

    with pytest.raises(FileNotFoundError):
        SequentialVideoCursor(str(tmp_path / "missing.mp4"))


def test_dedup_real_backbone_integration(tmp_path):
    """End-to-end with the real ResNet-50: the dedup store matches the
    per-clip store with byte-equal joints/K/meta and features equal within
    XLA:CPU's threaded-conv reduction jitter (see module docstring; the
    deterministic-backbone tests above pin the scheduler byte-exactly)."""
    ds = FakeOverlapDataset(n_videos=1, n_sub=12)
    run_extract(_cfg(tmp_path / "legacy", dedup=False), dataset=ds)
    run_extract(_cfg(tmp_path / "dedup", dedup=True), dataset=ds)
    want = _rows(tmp_path / "legacy")
    got = _rows(tmp_path / "dedup")
    assert want.keys() == got.keys()
    for key in want:
        np.testing.assert_allclose(want[key][0], got[key][0], rtol=0.1,
                                   atol=0.1, err_msg=str(key))
        for a, b in zip(want[key][1:], got[key][1:]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(key))


def test_dedup_store_trains(tmp_path):
    """Dedup extraction output feeds the feature dataset / training path."""
    ds = FakeOverlapDataset()
    run_extract(_cfg(tmp_path / "out", augment=False), dataset=ds)
    out = FeatureClipDataset(tmp_path / "out")
    feats, j3d, j2d, K = out[0]
    assert feats.shape == (8, 2048)
    assert np.all(np.isfinite(feats))


def test_doctor_estimate_matches_measured_ratio(tmp_path, fake_backbone):
    """The pose-only prediction (h36x-doctor --dedup-estimate) equals
    run_extract_dedup's measured dedup_ratio in every mode — the 'matches
    exactly' guarantee PARITY.md documents. The tree's cameras put the
    principal point at the exact frame center so the doctor's 2c dims
    reproduce the scheduler's edge clamping."""
    cv2 = pytest.importorskip("cv2")
    import pickle

    from h36x.cli.doctor import dedup_ratios, dedup_stats
    from h36x.data.clips import ClipDataset
    from h36x.extract.dedup import run_extract_dedup

    root = tmp_path / "ingested"
    h = w = 64
    n_frames = 28  # 14 subsampled frames at skip 2
    rng = np.random.default_rng(11)
    for subject, action in ((1, "Walking_0"), (5, "Eating_0")):
        cam_dir = root / f"S{subject}" / action / "cam_0"
        cam_dir.mkdir(parents=True)
        vw = cv2.VideoWriter(str(cam_dir / "v.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h))
        for _ in range(n_frames):
            vw.write(rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8))
        vw.release()
        base = rng.random((1, 17, 2)) * 30 + 14
        drift = np.cumsum(rng.normal(0, 0.6, size=(n_frames, 1, 2)), axis=0)
        j2d = np.clip(base + drift, 4, w - 4).astype(np.float32)
        j3d = (rng.normal(size=(n_frames, 17, 3)) * 100).astype(np.float32)
        with open(cam_dir / "gt_poses.pkl", "wb") as f:
            pickle.dump({"2d": j2d, "3d": j3d}, f)
        with open(cam_dir / "camera_wext.pkl", "wb") as f:
            pickle.dump({"f": np.array([90.0, 90.0]),
                         "c": np.array([w / 2, h / 2]),
                         "k": np.zeros(5), "rt": np.eye(3),
                         "t": np.zeros(3)}, f)

    stats = dedup_stats(str(root), seq_len=8, stride=2, frame_skip=2)
    pred = dedup_ratios(stats)
    # drift makes the case non-degenerate: some windows share boxes, some
    # don't, so all three mode predictions are distinct numbers
    assert stats["uniq_frames"] < stats["unique"] < stats["total"]

    for kw, key in (({}, "clip"),
                    ({"crop_scope": "video"}, "crop_video"),
                    ({"jitter_key": "frame"}, "jitter_rekey")):
        ds = ClipDataset(str(root), subjects=[1, 5], seq_len=8, stride=2)
        summary = run_extract_dedup(_cfg(tmp_path / f"store_{key}", **kw), ds)
        assert summary["dedup_ratio"] == pytest.approx(pred[key], abs=1e-9), key


_KILL_EXTRACT_CHILD = '''
"""Fault-injection child: run a dedup extraction and SIGKILL ourselves in
the middle of the Nth shard write, leaving a torn .tmp behind
(tests/test_dedup.py::test_sigkill_mid_extraction_resumes_byte_identical)."""
import os
import signal
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # env vars do not beat the plugin

import numpy as np

repo = sys.argv[3]
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

import h36x.data.shards as shards
import h36x.extract.pipeline as pl
from test_dedup import FakeOverlapDataset, _PROJ, _cfg

pl._load_backbone = lambda cfg: (None, None)


def _make(model, mesh=None, engine="flax"):
    def fn(variables, frames):
        flat = np.asarray(frames).reshape(frames.shape[0], -1)
        f = flat.astype(np.float64) @ _PROJ
        return np.tile(np.asarray(f, np.float32), (1, 2048 // 64))

    return fn


pl.make_feature_fn = _make

kill_at = int(sys.argv[2])
orig_write = shards.write_shard
count = [0]


def write_then_die(path, arrays, meta, n_vars):
    count[0] += 1
    if count[0] == kill_at:
        # die MID-write: leave a torn tmp (write_shard is tmp+rename,
        # so this is exactly the state a real kill produces), then vanish
        with open(str(path) + ".tmp", "wb") as f:
            f.write(b"torn" * 8)
        os.kill(os.getpid(), signal.SIGKILL)
    return orig_write(path, arrays, meta, n_vars)


shards.write_shard = write_then_die

cfg = _cfg(sys.argv[1], shard_size=2, shuffle_pool=2, frames_per_dispatch=12)
pl.run_extract(cfg, dataset=FakeOverlapDataset())
print("COMPLETED WITHOUT KILL", flush=True)
'''


def test_sigkill_mid_extraction_resumes_byte_identical(tmp_path,
                                                       fake_backbone):
    """True fault injection for extraction resume: a subprocess is
    SIGKILLed inside the async writer's 3rd shard write (torn shard.tmp on
    disk, progress.json one flush behind). In-process exception tests can't
    produce this state — their error path still drains the writer cleanly.
    Resuming with the same flags must finish the store, and every clip's
    rows must byte-match an uninterrupted run."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = tmp_path / "extract_kill_child.py"
    child.write_text(_KILL_EXTRACT_CHILD)
    out = tmp_path / "out"
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)

    proc = subprocess.run(
        [sys.executable, str(child), str(out), "3", repo],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == -9, (
        f"child did not die by SIGKILL (rc={proc.returncode}):\n"
        f"{(proc.stdout + proc.stderr)[-2000:]}")
    assert "COMPLETED WITHOUT KILL" not in proc.stdout
    assert not (out / "index.json").exists()
    assert (out / "progress.json").exists()
    torn = [p for p in out.glob("*.tmp")]
    assert torn, "the kill should have left a torn shard tmp file"

    cfg = _cfg(out, shard_size=2, shuffle_pool=2, frames_per_dispatch=12,
               resume=True)
    ds = FakeOverlapDataset()
    summary = run_extract(cfg, dataset=ds)
    assert summary["n_clips"] == len(ds)
    assert not (out / "progress.json").exists()

    run_extract(_cfg(tmp_path / "clean", shard_size=2, shuffle_pool=2,
                     frames_per_dispatch=12), dataset=FakeOverlapDataset())
    rows = _rows(out)
    clean = _rows(tmp_path / "clean")
    assert rows.keys() == clean.keys()
    for key in rows:
        for a, b in zip(rows[key], clean[key]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(key))


def test_store_invariant_to_dispatch_and_workers(tmp_path, fake_backbone):
    """Operational knobs must never reach the bytes: the same tree
    extracted with different device-batch sizes and worker counts (and the
    shard files they ride in) must be byte-identical row for row — a
    padding/assembly bug that leaks batch position into a feature row
    would show up here first."""
    base = dict(shard_size=2, shuffle_pool=4)
    ref = None
    for tag, kw in (
        ("a", dict(frames_per_dispatch=12, num_workers=1)),
        ("b", dict(frames_per_dispatch=24, num_workers=4)),
        ("c", dict(frames_per_dispatch=7, num_workers=2)),  # ragged chunks
        # pool size moves rows BETWEEN shards but must not touch the bytes
        ("d", dict(frames_per_dispatch=12, num_workers=2, shuffle_pool=50)),
        # byte-budget early flushes are an operational knob too (~1 KiB
        # budget forces flushing at every shard boundary)
        ("e", dict(frames_per_dispatch=12, num_workers=2,
                   shuffle_pool_gb=1e-6)),
    ):
        run_extract(_cfg(tmp_path / tag, **{**base, **kw}),
                    dataset=FakeOverlapDataset())
        rows = _rows(tmp_path / tag)
        if ref is None:
            ref = rows
            continue
        assert rows.keys() == ref.keys()
        for key in ref:
            for a, b in zip(ref[key], rows[key]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                              err_msg=f"{tag} {key}")


def test_auto_mode_sentinel_resolution(tmp_path, fake_backbone):
    """The round-5 'auto' defaults resolve per scheduler: the PRODUCTION
    profile (crop_scope='video', jitter_key='video' — full dedup) on the
    unique-frame scheduler, strict reference semantics ('clip'/'clip') on
    the per-clip scheduler. Explicit values pass through untouched, and an
    explicit dedup-only mode still hard-errors on the per-clip path.
    Deviation being defaulted: preprocess_resnet_features.py:287-297 /
    dataset.py:395-400 (DESIGN.md 'Jitter re-keying')."""
    from h36x.extract.pipeline import resolve_extract_modes

    # unit: sentinel resolution (explicit values never touched)
    cfg = ExtractConfig(out="x")
    assert (cfg.crop_scope, cfg.jitter_key) == ("auto", "auto")
    prod = resolve_extract_modes(cfg, production=True)
    assert (prod.crop_scope, prod.jitter_key) == ("video", "video")
    ref = resolve_extract_modes(cfg, production=False)
    assert (ref.crop_scope, ref.jitter_key) == ("clip", "clip")
    expl = resolve_extract_modes(
        ExtractConfig(out="x", crop_scope="clip", jitter_key="frame"),
        production=True)
    assert (expl.crop_scope, expl.jitter_key) == ("clip", "frame")

    # e2e, dedup scheduler: ExtractConfig defaults = the production
    # profile. With drifting boxes (smooth=False) per-clip crops would NOT
    # fully dedup, so full dedup here proves crop_scope resolved to
    # 'video'; the backbone-frame count proves jitter re-keying too:
    # 3 computed variants x n_sub unique frames x n_videos.
    ds = FakeOverlapDataset(smooth=False)
    cfg_auto = _cfg(tmp_path / "auto")
    cfg_auto = ExtractConfig(**{**cfg_auto.__dict__,
                                "crop_scope": "auto", "jitter_key": "auto"})
    s = run_extract(cfg_auto, dataset=ds)
    n_videos, n_sub = 2, 14
    assert s["backbone_frames"] == 3 * n_sub * n_videos

    # the summary reports the RESOLVED modes (never the sentinel) — the
    # same resolved values flow into the resume-safety run_config
    assert s["crop_scope"] == "video"
    assert s["jitter_key"] == "video"

    # byte parity with the explicitly-requested production profile
    run_extract(_cfg(tmp_path / "explicit", crop_scope="video",
                     jitter_key="video"), dataset=ds)
    got, want = _rows(tmp_path / "auto"), _rows(tmp_path / "explicit")
    assert got.keys() == want.keys()
    for key in want:
        for a, b in zip(want[key], got[key]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(key))

    # e2e, per-clip scheduler: 'auto' resolves to reference semantics and
    # matches an explicit clip/clip store byte-for-byte
    s_legacy = run_extract(
        ExtractConfig(**{**_cfg(tmp_path / "legacy_auto", dedup=False).__dict__,
                         "crop_scope": "auto", "jitter_key": "auto"}),
        dataset=ds)
    assert s_legacy["n_clips"] == len(ds)
    run_extract(_cfg(tmp_path / "legacy_expl", dedup=False), dataset=ds)
    got = _rows(tmp_path / "legacy_auto")
    want = _rows(tmp_path / "legacy_expl")
    assert got.keys() == want.keys()
    for key in want:
        for a, b in zip(want[key], got[key]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(key))

    # explicit dedup-only modes still refuse the per-clip scheduler
    with pytest.raises(ValueError, match="unique-frame scheduler"):
        run_extract(_cfg(tmp_path / "bad", dedup=False, jitter_key="frame"),
                    dataset=ds)


def test_auto_default_refuses_resuming_reference_keyed_store(tmp_path,
                                                             fake_backbone):
    """A pre-round-5 store (strict clip/clip keying, recorded WITHOUT mode
    keys) interrupted mid-run must not resume under the new 'auto' default
    — that would mix video-keyed rows into a clip-keyed store. The guard
    is the existing run_config mismatch rule; this pins that the default
    flip actually trips it, and that re-running with the original explicit
    flags still resumes cleanly."""
    import dataclasses
    import time as _time

    class Flaky(FakeOverlapDataset):
        def __init__(self, fail_at, **kw):
            super().__init__(**kw)
            self.fail_at = fail_at

        def clip_annotations(self, i):
            if self.fail_at is not None and i == self.fail_at:
                raise RuntimeError("simulated annotation crash")
            return super().clip_annotations(i)

    cfg = _cfg(tmp_path / "out", shard_size=2, shuffle_pool=2,
               frames_per_dispatch=12)  # clip/clip (pinned by _cfg)
    with pytest.raises(RuntimeError, match="simulated annotation crash"):
        run_extract(cfg, dataset=Flaky(fail_at=5))
    progress = tmp_path / "out" / "progress.json"
    for _ in range(50):
        if progress.exists():
            break
        _time.sleep(0.1)
    assert progress.exists()

    auto_resume = dataclasses.replace(cfg, resume=True,
                                      crop_scope="auto", jitter_key="auto")
    with pytest.raises(ValueError, match="resume config mismatch"):
        run_extract(auto_resume, dataset=Flaky(fail_at=None))

    cfg.resume = True
    summary = run_extract(cfg, dataset=Flaky(fail_at=None))
    assert summary["n_clips"] == len(Flaky(fail_at=None))
    assert (summary["crop_scope"], summary["jitter_key"]) == ("clip", "clip")
