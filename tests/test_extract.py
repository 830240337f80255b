"""Extraction-stage tests: AsyncWriter, ShufflePool contract, and the full
run_extract pipeline on a synthetic clip source -> shard store -> dataset
round trip (reference stage: src/preprocess_resnet_features.py)."""

import time

import numpy as np
import pytest

from h36x.config import ExtractConfig
from h36x.data.clips import ClipIndex
from h36x.data.features import FeatureClipDataset
from h36x.data.shards import ShardWriter, read_shard, shard_path
from h36x.extract.pipeline import ShufflePool, run_extract
from h36x.extract.writer import AsyncWriter


class TestAsyncWriter:
    def test_executes_in_order(self, tmp_path):
        w = AsyncWriter()
        results = []
        for i in range(10):
            w.submit(results.append, i)
        w.stop()
        assert results == list(range(10))

    def test_error_propagates(self):
        w = AsyncWriter()

        def boom():
            raise ValueError("disk full")

        w.submit(boom)
        with pytest.raises(RuntimeError):
            w.wait()

    def test_stop_after_error_joins_thread(self):
        """stop() must enqueue the shutdown sentinel and join even when a
        prior task failed — otherwise the worker thread leaks blocked on
        q.get() and error-path cleanup can never shut the writer down."""
        w = AsyncWriter()

        def boom():
            raise ValueError("disk full")

        w.submit(boom)
        with pytest.raises(RuntimeError):
            w.stop()
        w._thread.join(timeout=5)
        assert not w._thread.is_alive()

    def test_wait_blocks_until_done(self):
        w = AsyncWriter()
        done = []

        def slow():
            time.sleep(0.2)
            done.append(1)

        w.submit(slow)
        w.wait()
        assert done == [1]
        w.stop()


def _group(clip_i, n_vars, t=4, f=8):
    rng = np.random.default_rng(clip_i)
    return [
        {
            "feat": rng.normal(size=(t, f)).astype(np.float32),
            "joints3d": rng.normal(size=(t, 17, 3)).astype(np.float32),
            "joints2d": rng.normal(size=(t, 17, 2)).astype(np.float32),
            "K": np.eye(3, dtype=np.float32),
            "meta": {"subject": 1, "action": "A", "cam": "cam_0",
                     "start": clip_i, "end": clip_i + t, "aug": f"v{v}"},
        }
        for v in range(n_vars)
    ]


class TestShufflePool:
    def test_variants_contiguous_and_index_consistent(self, tmp_path):
        n_vars, shard_size = 2, 3
        writer = ShardWriter(tmp_path, n_vars)
        pool = ShufflePool(writer, n_vars, shard_size, pool_size=4, seed=0)
        for i in range(10):
            pool.add(_group(i, n_vars))
        pool.finish()

        # 10 clips, shards of 3 -> 4 shards (last partial with 1 clip)
        assert writer.shard_id == 4
        assert len(pool.clip_index) == 10

        for entry in pool.clip_index:
            shard = read_shard(shard_path(tmp_path, entry["shard_id"]))
            row = entry["row"]
            # variant rows are contiguous: same start, v0 then v1
            assert shard["meta"][row]["aug"] == "v0"
            assert shard["meta"][row + 1]["aug"] == "v1"
            assert shard["meta"][row]["start"] == entry["start"]
            assert shard["meta"][row + 1]["start"] == entry["start"]

    def test_shuffle_is_seeded(self, tmp_path):
        orders = []
        for run in range(2):
            writer = ShardWriter(tmp_path / f"r{run}", 1)
            pool = ShufflePool(writer, 1, 4, pool_size=100, seed=7)
            for i in range(8):
                pool.add(_group(i, 1))
            pool.finish()
            orders.append([e["start"] for e in pool.clip_index])
        assert orders[0] == orders[1]

    def test_wrong_group_size_raises(self, tmp_path):
        pool = ShufflePool(ShardWriter(tmp_path, 2), 2, 4, 8, 0)
        with pytest.raises(ValueError):
            pool.add(_group(0, 1))

    def test_byte_budget_flushes_early(self, tmp_path):
        """max_bytes caps host RAM: the pool flushes once the buffered
        arrays exceed the budget even though the clip count is far below
        pool_size, and the buffered-bytes counter tracks carry exactly."""
        g_bytes = ShufflePool.group_nbytes(_group(0, 1))
        writer = ShardWriter(tmp_path, 1)
        # budget = 3 groups; shard_size=2 so each early flush writes one
        # shard and carries <=1 group
        pool = ShufflePool(writer, 1, shard_size=2, pool_size=100, seed=0,
                           max_bytes=3 * g_bytes)
        for i in range(10):
            pool.add(_group(i, 1))
            # never holds more than budget + one group
            assert pool._buf_bytes <= 4 * g_bytes
            assert pool._buf_bytes == g_bytes * (len(pool.pool) + len(pool.carry))
        assert writer.shard_id >= 3  # flushed well before pool_size=100
        pool.finish()
        assert len(pool.clip_index) == 10
        # all rows present exactly once
        starts = sorted(e["start"] for e in pool.clip_index)
        assert starts == list(range(10))

    def test_byte_budget_never_starves_a_shard(self, tmp_path):
        """A budget smaller than one shard's worth of groups must not spin
        flushes that write nothing: the pool waits until shard_size groups
        exist, then streams shard by shard."""
        g_bytes = ShufflePool.group_nbytes(_group(0, 1))
        writer = ShardWriter(tmp_path, 1)
        pool = ShufflePool(writer, 1, shard_size=4, pool_size=100, seed=0,
                           max_bytes=g_bytes)  # < one shard
        for i in range(9):
            pool.add(_group(i, 1))
        assert writer.shard_id == 2  # 8 rows streamed, 1 carried
        pool.finish()
        assert len(pool.clip_index) == 9

    def test_zero_budget_is_unbounded(self, tmp_path):
        writer = ShardWriter(tmp_path, 1)
        pool = ShufflePool(writer, 1, shard_size=2, pool_size=100, seed=0,
                           max_bytes=0)
        for i in range(20):
            pool.add(_group(i, 1))
        assert writer.shard_id == 0  # nothing flushed below pool_size
        pool.finish()
        assert len(pool.clip_index) == 20


class FakeClipDataset:
    """ClipDataset stand-in: synthetic frames/poses, no video files."""

    def __init__(self, n_clips=6, t=4, h=32, w=36):
        self.n, self.t, self.h, self.w = n_clips, t, h, w
        self.seq_len = t
        self.frame_skip = 2

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        frames = rng.integers(0, 256, size=(self.t, self.h, self.w, 3)).astype(np.uint8)
        j3d = rng.normal(size=(self.t, 17, 3)).astype(np.float32) * 100
        # keep joints inside the image so the crop is valid
        j2d = (rng.random((self.t, 17, 2)) * [self.w - 8, self.h - 8] + 4).astype(
            np.float32
        )
        cam = {"f": np.array([500.0, 500.0]), "c": np.array([self.w / 2, self.h / 2]),
               "k": np.zeros(5), "rt": np.eye(3), "t": np.zeros(3)}
        ci = ClipIndex(
            video_path="fake.mp4", gt_path="fake.pkl", subject=1 + i % 2,
            action="Act", cam="cam_0", cam_params=cam, start=i * 5, end=i * 5 + self.t,
        )
        return frames, j3d, j2d, cam, ci


@pytest.mark.parametrize("augment", [False, True])
def test_run_extract_end_to_end(tmp_path, augment):
    cfg = ExtractConfig(
        root="", out=str(tmp_path / "out"), seq_len=4, resize=16,
        batch_size=3, num_workers=2, augment=augment, shard_size=2,
        shuffle_pool=100, shuffle_seed=1, save_fp16=False,
    )
    ds = FakeClipDataset(n_clips=6)
    summary = run_extract(cfg, dataset=ds)
    assert summary["n_clips"] == 6
    n_vars = 4 if augment else 1
    assert summary["n_vars"] == n_vars

    out = FeatureClipDataset(tmp_path / "out", augment=augment)
    assert len(out) == 6 * n_vars
    feats, j3d, j2d, K = out[0]
    assert feats.shape == (4, 2048)
    assert np.all(np.isfinite(feats))

    # meta carries the provenance fields
    ds_meta = FeatureClipDataset(tmp_path / "out", test_set=True)
    *_, meta = ds_meta[0]
    for key in ("subject", "action", "cam", "start", "end", "aug", "frame_skip", "box"):
        assert key in meta


def test_trev_features_are_reversed_orig(tmp_path):
    """The temporal-reverse variant's features must equal the orig features
    reversed in time (per-frame backbone identity)."""
    cfg = ExtractConfig(
        out=str(tmp_path / "out"), seq_len=4, resize=16, batch_size=2,
        num_workers=1, augment=True, shard_size=4, shuffle_pool=100,
    )
    run_extract(cfg, dataset=FakeClipDataset(n_clips=2))
    ds = FeatureClipDataset(tmp_path / "out", test_set=True, augment=True)
    by_aug = {}
    for i in range(len(ds)):
        feats, j3, j2, K, meta = ds[i]
        by_aug.setdefault(meta["start"], {})[meta["aug"]] = (feats, j3)
    for start, variants in by_aug.items():
        f_orig, j_orig = variants["orig"]
        f_trev, j_trev = variants["trev"]
        np.testing.assert_allclose(f_trev, f_orig[::-1], rtol=1e-5)
        np.testing.assert_allclose(j_trev, j_orig[::-1], rtol=1e-5)


class FlakyClipDataset(FakeClipDataset):
    """Raises on a chosen clip index to simulate a mid-run crash."""

    def __init__(self, fail_at, **kw):
        super().__init__(**kw)
        self.fail_at = fail_at

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError("simulated decode crash")
        return super().__getitem__(i)

    @property
    def clips(self):
        """Clip metadata matching FakeClipDataset.__getitem__'s ClipIndex."""
        from h36x.data.clips import ClipIndex

        return [
            ClipIndex("fake.mp4", "fake.pkl", 1 + i % 2, "Act", "cam_0",
                      {}, i * 5, i * 5 + self.t)
            for i in range(self.n)
        ]


def test_resume_after_crash(tmp_path):
    """Extraction interrupted mid-run resumes without duplicating clips."""
    import time as _time

    cfg = ExtractConfig(
        out=str(tmp_path / "out"), seq_len=4, resize=16, batch_size=2,
        num_workers=1, augment=False, shard_size=2, shuffle_pool=2,
        resume=False,
    )
    flaky = FlakyClipDataset(fail_at=4, n_clips=6)
    with pytest.raises(RuntimeError, match="simulated decode crash"):
        run_extract(cfg, dataset=flaky)

    progress = tmp_path / "out" / "progress.json"
    for _ in range(50):  # async writer may still be draining
        if progress.exists():
            break
        _time.sleep(0.1)
    assert progress.exists()
    assert not (tmp_path / "out" / "index.json").exists()

    cfg.resume = True
    ok = FlakyClipDataset(fail_at=None, n_clips=6)
    summary = run_extract(cfg, dataset=ok)
    assert summary["n_shards"] >= 3
    assert not progress.exists()  # superseded by index.json

    ds = FeatureClipDataset(tmp_path / "out")
    assert len(ds) == 6
    keys = set()
    ds_meta = FeatureClipDataset(tmp_path / "out", test_set=True)
    for i in range(len(ds_meta)):
        *_, meta = ds_meta[i]
        keys.add((meta["subject"], meta["start"]))
    assert len(keys) == 6  # every clip exactly once, none duplicated


def test_partitioned_extract_merge_matches_full(tmp_path):
    """N coordination-free partition jobs + merge == one full job: same
    clips, same per-clip features/joints (partitioning preserves the global
    clip index, so per-clip rngs and backbone outputs are identical)."""
    from h36x.data.shards import merge_stores

    def cfg_for(out, partition=""):
        return ExtractConfig(
            out=str(out), seq_len=4, resize=16, batch_size=3, num_workers=2,
            augment=True, shard_size=2, shuffle_pool=100, shuffle_seed=1,
            partition=partition,
        )

    run_extract(cfg_for(tmp_path / "full"), dataset=FakeClipDataset(n_clips=7))
    summaries = [
        run_extract(cfg_for(tmp_path / f"part_{i}", partition=f"{i}/2"),
                    dataset=FakeClipDataset(n_clips=7))
        for i in range(2)
    ]
    assert summaries[0]["n_processed"] == 4  # clips 0,2,4,6
    assert summaries[1]["n_processed"] == 3  # clips 1,3,5

    idx = merge_stores([tmp_path / "part_0", tmp_path / "part_1"],
                       tmp_path / "merged")
    assert idx["n_clips"] == 7
    assert not shard_path(tmp_path / "part_0", 0).exists()  # moved

    def rows_by_key(root):
        ds = FeatureClipDataset(root, augment=True, test_set=True)
        out = {}
        for i in range(len(ds)):
            feats, j3d, j2d, K, meta = ds[i]
            key = (meta["subject"], meta["action"], meta["start"], meta["aug"])
            assert key not in out
            out[key] = (feats, j3d, j2d, K)
        return out

    want, got = rows_by_key(tmp_path / "full"), rows_by_key(tmp_path / "merged")
    assert want.keys() == got.keys()
    for key in want:
        for a, b in zip(want[key], got[key]):
            np.testing.assert_array_equal(a, b, err_msg=str(key))


def test_merge_stores_rejects_duplicates_and_keeps_parts(tmp_path):
    from h36x.data.shards import merge_stores

    cfg = ExtractConfig(out=str(tmp_path / "p0"), seq_len=4, resize=16,
                        batch_size=2, num_workers=1, augment=False,
                        shard_size=2, shuffle_pool=100, partition="0/2")
    run_extract(cfg, dataset=FakeClipDataset(n_clips=6))

    # duplicate part -> error, and (validate-first) nothing moved
    with pytest.raises(ValueError, match="more than one part"):
        merge_stores([tmp_path / "p0", tmp_path / "p0"], tmp_path / "m")
    assert shard_path(tmp_path / "p0", 0).exists()

    # keep-parts mode links instead of moving
    merge_stores([tmp_path / "p0"], tmp_path / "m2", move=False)
    assert shard_path(tmp_path / "p0", 0).exists()
    assert shard_path(tmp_path / "m2", 0).exists()

    # a non-empty output store is refused (would overwrite/strand shards)
    with pytest.raises(ValueError, match="not empty"):
        merge_stores([tmp_path / "p0"], tmp_path / "m2", move=False)


def test_merge_crash_mid_populate_leaves_parts_intact(tmp_path, monkeypatch):
    """An unpredictable I/O failure mid-merge (ENOSPC, SIGKILL...) must not
    break EITHER side: sources are consumed only after the merged index is
    committed, so a crash leaves intact parts + an index-less (non-store)
    out_root (review finding, round 4 — the old per-shard shutil.move
    stripped parts as it went)."""
    import os as _os

    from h36x.data.shards import load_index, merge_stores, shard_path
    from tests.helpers import make_synthetic_store

    # one shard per part: make_synthetic_store reuses clip keys across its
    # shards, and merge correctly refuses duplicate clips
    for part, subj in (("p0", 1), ("p1", 2)):
        (tmp_path / part).mkdir()
        make_synthetic_store(tmp_path / part, n_shards=1, clips_per_shard=4,
                             seq_len=4, feat_dim=16, subjects=(subj,))

    real_link = _os.link
    calls = {"n": 0}

    def dying_link(src, dst, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # fail mid-populate, after some files landed
            raise RuntimeError("simulated I/O failure")
        return real_link(src, dst, **kw)

    monkeypatch.setattr(_os, "link", dying_link)
    with pytest.raises(RuntimeError, match="simulated I/O failure"):
        merge_stores([tmp_path / "p0", tmp_path / "p1"], tmp_path / "m",
                     move=True)
    monkeypatch.undo()

    # every part is COMPLETE and re-mergeable; out_root is not a store
    for part in ("p0", "p1"):
        assert load_index(tmp_path / part)["n_shards"] == 1
        assert shard_path(tmp_path / part, 0).exists()
    assert not (tmp_path / "m" / "index.json").exists()

    # wipe the stranded target and retry: the same merge succeeds, and only
    # then (index committed) are the sources consumed
    import shutil

    shutil.rmtree(tmp_path / "m")
    idx = merge_stores([tmp_path / "p0", tmp_path / "p1"], tmp_path / "m",
                       move=True)
    assert idx["n_shards"] == 2
    from h36x.data.shards import verify_store

    rep = verify_store(tmp_path / "m")
    assert not rep["errors"]
    assert not shard_path(tmp_path / "p0", 0).exists()  # consumed after


def test_resume_config_mismatch_raises(tmp_path, monkeypatch):
    """Resuming with different store-shaping flags (e.g. --augment toggled)
    must refuse instead of mixing incompatible rows into one store."""
    import time as _time

    cfg = ExtractConfig(
        out=str(tmp_path / "out"), seq_len=4, resize=16, batch_size=2,
        num_workers=1, augment=True, shard_size=2, shuffle_pool=2,
    )
    with pytest.raises(RuntimeError, match="simulated decode crash"):
        run_extract(cfg, dataset=FlakyClipDataset(fail_at=4, n_clips=6))
    progress = tmp_path / "out" / "progress.json"
    for _ in range(50):
        if progress.exists():
            break
        _time.sleep(0.1)

    cfg.resume = True
    cfg.augment = False  # the mismatch
    with pytest.raises(ValueError, match="resume config mismatch"):
        run_extract(cfg, dataset=FlakyClipDataset(fail_at=None, n_clips=6))

    # a jitter-backend flip (native lib availability changed between crash
    # and resume) is a byte-provenance mismatch too: the two backends differ
    # by +-1 u8 on rint-boundary pixels and must not share a store
    cfg.augment = True
    from h36x import native as _native

    _real_avail = _native.jitter_available
    monkeypatch.setattr(
        _native, "jitter_available", lambda: not _real_avail()
    )
    with pytest.raises(ValueError, match="resume config mismatch"):
        run_extract(cfg, dataset=FlakyClipDataset(fail_at=None, n_clips=6))
    monkeypatch.setattr(_native, "jitter_available", _real_avail)

    # matching config resumes fine
    summary = run_extract(cfg, dataset=FlakyClipDataset(fail_at=None, n_clips=6))
    assert summary["n_clips"] == 6


def test_extracted_store_trains(tmp_path):
    """Extraction output feeds the training loop end to end."""
    import jax
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.state import create_train_state, make_optimizer
    from h36x.train.step import make_train_step

    cfg = ExtractConfig(
        out=str(tmp_path / "out"), seq_len=4, resize=16, batch_size=3,
        num_workers=1, augment=False, shard_size=3, shuffle_pool=100,
    )
    run_extract(cfg, dataset=FakeClipDataset(n_clips=6))

    ds = FeatureClipDataset(tmp_path / "out")
    with pytest.raises(ValueError, match="no indices"):
        ds.get_batch([])  # was a bare StopIteration (opaque inside feeds)
    feats, j3d, j2d, K = ds.get_batch(list(range(4)))

    model = PHDFor3DJoints(latent_dim=64, feature_dim=2048, number_blocks=1)
    optimizer, _ = make_optimizer(lr=1e-3)
    state = create_train_state(model, optimizer, jax.random.key(0), jnp.asarray(feats))
    step = make_train_step(model, optimizer, donate=False)
    state, metrics = step(
        state, tuple(jnp.asarray(x) for x in (feats, j3d, j2d, K)), jax.random.key(1)
    )
    assert np.isfinite(float(metrics["loss"]))


def test_feature_fn_opt_engine_matches_flax(rng):
    """engine='opt' (folded BN/normalize + s2d stem) must agree with the
    flax feature fn at the numerics of the compute dtype."""
    import jax
    import jax.numpy as jnp

    from h36x.extract.pipeline import make_feature_fn
    from h36x.models.resnet import ResNet50, init_resnet_params

    model = ResNet50(dtype=jnp.float32)
    variables = init_resnet_params(model, jax.random.key(0), input_hw=32)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(3, 32, 32, 3)), dtype=jnp.uint8
    )
    flax_fn = make_feature_fn(model)
    opt_fn = make_feature_fn(model, engine="opt")
    a = np.asarray(flax_fn(variables, frames))
    b = np.asarray(opt_fn(variables, frames))
    assert a.shape == b.shape == (3, 2048)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_feature_fn_mesh_dp_matches_single_device(rng):
    """Multi-chip DP extraction (make_feature_fn(mesh=...)) must produce the
    single-device features exactly, including the padded-tail path when the
    row count does not divide the data axis (reference replaced:
    preprocess_resnet_features.py:214-217 nn.DataParallel backbone)."""
    import jax
    import jax.numpy as jnp

    from h36x.extract.pipeline import make_feature_fn
    from h36x.models.resnet import ResNet50, init_resnet_params
    from h36x.parallel.mesh import make_mesh

    model = ResNet50(dtype=jnp.float32)
    variables = init_resnet_params(model, jax.random.key(0), input_hw=32)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])

    single_fn = make_feature_fn(model)
    dp_fn = make_feature_fn(model, mesh=mesh)
    for n in (8, 5):  # divisible and padded-tail row counts
        frames = np.asarray(
            rng.integers(0, 256, size=(n, 32, 32, 3)), dtype=np.uint8
        )
        a = np.asarray(single_fn(variables, jnp.asarray(frames)))
        b = np.asarray(dp_fn(variables, frames))
        assert b.shape == (n, 2048)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestConfigValidation:
    """validate_extract_config fails on flag typos in milliseconds, BEFORE
    the multi-minute pose-pickle tree scan (it is cfg-only)."""

    def test_bad_values_rejected(self):
        from h36x.config import ExtractConfig
        from h36x.extract.pipeline import validate_extract_config

        validate_extract_config(ExtractConfig())  # defaults pass
        for flag, bad in (("jitter_key", "vido"), ("crop_scope", "cilp"),
                          ("partition_by", "vid")):
            cfg = ExtractConfig(**{flag: bad})
            with pytest.raises(ValueError, match=flag.replace("_", "-")):
                validate_extract_config(cfg)
        with pytest.raises(ValueError, match="partition"):
            validate_extract_config(ExtractConfig(partition="3"))

    def test_no_dedup_rejects_deviation_modes(self):
        from h36x.config import ExtractConfig
        from h36x.extract.pipeline import validate_extract_config

        with pytest.raises(ValueError, match="unique-frame"):
            validate_extract_config(
                ExtractConfig(dedup=False, jitter_key="video"))
        # with dedup the same flag is legal at the cfg level
        validate_extract_config(ExtractConfig(dedup=True, jitter_key="video"))
