"""Shard store round-trip, alignment, LRU cache, and dataset semantics
(reference contract: src/dataset_features.py:16-27, 89-126)."""

import json

import numpy as np
import pytest

from h36x.data import shards as shard_store
from h36x.data.features import FeatureClipDataset
from tests.helpers import make_synthetic_store


class TestShardFile:
    def test_roundtrip(self, tmp_path, rng):
        arrays = {
            "feats": rng.normal(size=(8, 5, 32)).astype(np.float32),
            "joints3d": rng.normal(size=(8, 5, 17, 3)).astype(np.float32),
            "joints2d": rng.normal(size=(8, 5, 17, 2)).astype(np.float32),
            "K": rng.normal(size=(8, 3, 3)).astype(np.float32),
        }
        meta = [{"subject": 1, "row": i} for i in range(8)]
        path = tmp_path / "shard_00000.h36x"
        shard_store.write_shard(path, arrays, meta, n_vars=4)

        for mmap in (True, False):
            out = shard_store.read_shard(path, mmap=mmap)
            assert out["n_vars"] == 4
            assert out["meta"] == meta
            for k, v in arrays.items():
                np.testing.assert_array_equal(np.asarray(out[k]), v)

    def test_offsets_aligned(self, tmp_path, rng):
        arrays = {
            "feats": rng.normal(size=(3, 2, 7)).astype(np.float32),
            "joints3d": rng.normal(size=(3, 2, 17, 3)).astype(np.float32),
            "joints2d": rng.normal(size=(3, 2, 17, 2)).astype(np.float32),
            "K": rng.normal(size=(3, 3, 3)).astype(np.float32),
        }
        path = tmp_path / "s.h36x"
        shard_store.write_shard(path, arrays, [{}] * 3, n_vars=1)
        with open(path, "rb") as f:
            assert f.read(8) == shard_store.MAGIC
            hlen = int(np.frombuffer(f.read(4), np.uint32)[0])
            header = json.loads(f.read(hlen))
        for spec in header["arrays"].values():
            assert spec["offset"] % 64 == 0

    def test_bfloat16_roundtrip(self, tmp_path, rng):
        import ml_dtypes

        feats = rng.normal(size=(2, 3, 8)).astype(ml_dtypes.bfloat16)
        arrays = {"feats": feats, "joints3d": np.zeros((2, 1, 17, 3), np.float32),
                  "joints2d": np.zeros((2, 1, 17, 2), np.float32),
                  "K": np.zeros((2, 3, 3), np.float32)}
        path = tmp_path / "s.h36x"
        shard_store.write_shard(path, arrays, [{}] * 2, n_vars=1)
        out = shard_store.read_shard(path)
        assert out["feats"].dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(np.asarray(out["feats"]), feats)

    def test_row_count_mismatch_raises(self, tmp_path):
        arrays = {"feats": np.zeros((2, 1, 1), np.float32), "K": np.zeros((3, 3, 3), np.float32)}
        with pytest.raises(ValueError):
            shard_store.write_shard(tmp_path / "x.h36x", arrays, [{}] * 2, 1)

    def test_bad_magic_raises(self, tmp_path):
        p = tmp_path / "bad.h36x"
        p.write_bytes(b"NOTASHARD???")
        with pytest.raises(ValueError):
            shard_store.read_shard(p)


class TestShardReaderLRU:
    def test_eviction(self, tmp_path):
        make_synthetic_store(tmp_path, n_shards=4, clips_per_shard=2, n_vars=1)
        reader = shard_store.ShardReader(tmp_path, cache_size=2)
        reader.get(0)
        reader.get(1)
        reader.get(2)  # evicts 0
        assert set(reader._cache) == {1, 2}
        reader.get(1)  # 1 becomes MRU
        reader.get(3)  # evicts 2
        assert set(reader._cache) == {1, 3}
        assert reader.load_calls == 4

    def test_cache_hit_no_reload(self, tmp_path):
        make_synthetic_store(tmp_path, n_shards=1, clips_per_shard=2, n_vars=1)
        reader = shard_store.ShardReader(tmp_path, cache_size=2)
        reader.get(0)
        reader.get(0)
        assert reader.load_calls == 1

    def test_stats_and_thrash_log(self, tmp_path, capsys):
        """Cache-thrash observability (reference dataset_features.py:101-105)."""
        make_synthetic_store(tmp_path, n_shards=3, clips_per_shard=2, n_vars=1)
        reader = shard_store.ShardReader(tmp_path, cache_size=1,
                                         log_loads_every=2)
        for sid in (0, 0, 1, 2, 1):  # 4 loads, 1 hit
            reader.get(sid)
        assert reader.stats() == {"loads": 4, "hits": 1, "cache_size": 1}
        out = capsys.readouterr().out
        assert out.count("[shards]") == 2  # every 2nd load

        ds = FeatureClipDataset(tmp_path)
        ds[0]
        assert ds.cache_stats()["loads"] == 1


class TestFeatureClipDataset:
    def test_subject_filter_and_len(self, tmp_path):
        make_synthetic_store(tmp_path, n_shards=2, clips_per_shard=6, n_vars=4,
                             subjects=(1, 5))
        ds_all = FeatureClipDataset(tmp_path)
        assert len(ds_all) == 12  # augment=False -> one item per clip
        ds1 = FeatureClipDataset(tmp_path, subjects=[1])
        assert len(ds1) == 6
        ds_aug = FeatureClipDataset(tmp_path, subjects=[1], augment=True)
        assert len(ds_aug) == 24

    def test_mm_to_m_conversion(self, tmp_path):
        make_synthetic_store(tmp_path, n_shards=1, clips_per_shard=2, n_vars=1)
        shard = shard_store.read_shard(shard_store.shard_path(tmp_path, 0))
        ds = FeatureClipDataset(tmp_path)
        _, j3d, _, _ = ds[0]
        np.testing.assert_allclose(
            j3d, np.asarray(shard["joints3d"][0]) / 1000.0, rtol=1e-6
        )

    def test_variant_row_addressing(self, tmp_path):
        make_synthetic_store(tmp_path, n_shards=1, clips_per_shard=3, n_vars=4)
        shard = shard_store.read_shard(shard_store.shard_path(tmp_path, 0))
        ds = FeatureClipDataset(tmp_path, augment=True)
        # items iterate clip-major, variant-minor
        for clip_i in range(3):
            for v in range(4):
                feats, *_ = ds[clip_i * 4 + v]
                np.testing.assert_array_equal(
                    feats, np.asarray(shard["feats"][clip_i * 4 + v])
                )

    def test_test_set_returns_meta(self, tmp_path):
        make_synthetic_store(tmp_path, n_shards=1, clips_per_shard=2, n_vars=1)
        ds = FeatureClipDataset(tmp_path, test_set=True)
        out = ds[0]
        assert len(out) == 5
        assert isinstance(out[4], dict)
        assert out[4]["aug"] == "orig"

    def test_get_batch_matches_getitem(self, tmp_path):
        make_synthetic_store(tmp_path, n_shards=2, clips_per_shard=4, n_vars=4)
        ds = FeatureClipDataset(tmp_path, augment=True, shard_cache_size=2)
        idx = [0, 5, 17, 30, 2]
        feats, j3d, j2d, K = ds.get_batch(idx)
        assert feats.shape[0] == 5
        for pos, i in enumerate(idx):
            f, j3, j2, k = ds[i]
            np.testing.assert_array_equal(feats[pos], f)
            np.testing.assert_allclose(j3d[pos], j3, rtol=1e-6)
            np.testing.assert_array_equal(j2d[pos], j2)
            np.testing.assert_array_equal(K[pos], k)

    def test_missing_index_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            FeatureClipDataset(tmp_path / "nope")

    def test_empty_subject_filter_raises(self, tmp_path):
        make_synthetic_store(tmp_path, n_shards=1, clips_per_shard=2, n_vars=1)
        with pytest.raises(RuntimeError):
            FeatureClipDataset(tmp_path, subjects=[99])


class TestTorchCompat:
    def test_reads_reference_format(self, tmp_path, rng):
        """The dataset must consume shards written in the reference's torch
        layout (shard_XXXXX.pt + index.pt) unchanged."""
        torch = pytest.importorskip("torch")
        rows, T = 4, 5
        shard = {
            "feats": torch.randn(rows, T, 16),
            "joints3d": torch.randn(rows, T, 17, 3),
            "joints2d": torch.randn(rows, T, 17, 2),
            "K": torch.randn(rows, 3, 3),
            "meta": [{"subject": 1, "aug": "orig"}] * rows,
            "n_vars": 1,
        }
        torch.save(shard, tmp_path / "shard_00000.pt")
        index = {
            "clips": [
                {"shard_id": 0, "row": r, "subject": 1, "action": "A", "cam": "cam_0",
                 "start": 0, "end": T}
                for r in range(rows)
            ],
            "n_shards": 1,
            "n_clips": rows,
            "n_variants": 1,
            "aug_names": ["orig"],
            "seq_len": T,
            "frame_skip": 2,
            "feat_dtype": "float32",
            "variants_grouped": True,
        }
        torch.save(index, tmp_path / "index.pt")

        ds = FeatureClipDataset(tmp_path, subjects=[1])
        assert len(ds) == rows
        feats, j3d, j2d, K = ds[1]
        np.testing.assert_allclose(feats, shard["feats"][1].numpy(), rtol=1e-6)
        np.testing.assert_allclose(j3d, shard["joints3d"][1].numpy() / 1000.0, rtol=1e-6)

        # an index declaring any OTHER row layout must be refused loudly:
        # reading it with grouped addressing (row + var) would silently pair
        # wrong feature rows with joints/meta (review finding, round 4)
        index["variants_grouped"] = False
        torch.save(index, tmp_path / "index.pt")
        with pytest.raises(RuntimeError, match="variants_grouped"):
            FeatureClipDataset(tmp_path, subjects=[1])


class TestVerifyStore:
    """Integrity scan (shards.verify_store / h36x-doctor --verify-store):
    per-array CRC32s recorded at write time must catch bit flips,
    truncation, and index/shard row drift; legacy shards without checksums
    verify as present-but-unverifiable."""

    def _store(self, root):
        make_synthetic_store(root, n_shards=3, clips_per_shard=4,
                             seq_len=4, feat_dim=16)
        return root

    def test_clean_store_verifies(self, tmp_path):
        root = self._store(tmp_path)
        rep = shard_store.verify_store(root)
        assert rep["errors"] == []
        assert rep["n_shards"] == 3
        assert rep["rows"] == 3 * 4 * 4
        assert rep["arrays_checked"] == 3 * 4  # 4 arrays per shard
        assert rep["arrays_unchecked"] == 0

    def test_bit_flip_detected(self, tmp_path):
        root = self._store(tmp_path)
        path = shard_store.shard_path(root, 1)
        blob = bytearray(path.read_bytes())
        blob[-100] ^= 0x40  # flip one payload bit near the end (K array)
        path.write_bytes(blob)
        rep = shard_store.verify_store(root)
        assert len(rep["errors"]) == 1
        assert "CRC32 mismatch" in rep["errors"][0]
        assert "shard_00001" in rep["errors"][0]

    def test_truncation_detected(self, tmp_path):
        root = self._store(tmp_path)
        path = shard_store.shard_path(root, 2)
        blob = path.read_bytes()
        path.write_bytes(blob[: len(blob) - 64])
        rep = shard_store.verify_store(root)
        assert any("truncated" in e and "shard_00002" in e
                   for e in rep["errors"])

    def test_missing_shard_detected(self, tmp_path):
        root = self._store(tmp_path)
        shard_store.shard_path(root, 0).unlink()
        rep = shard_store.verify_store(root)
        assert any("unreadable" in e and "shard_00000" in e
                   for e in rep["errors"])

    def test_index_row_drift_detected(self, tmp_path):
        root = self._store(tmp_path)
        idx = json.loads((root / "index.json").read_text())
        dropped = [c for c in idx["clips"] if c["shard_id"] != 1 or
                   c["row"] != 0]
        idx["clips"] = dropped  # index lost a clip the shard still holds
        (root / "index.json").write_text(json.dumps(idx))
        rep = shard_store.verify_store(root)
        assert any("index" in e and "shard_00001" in e
                   for e in rep["errors"])

    def test_legacy_shard_without_checksums_is_unverifiable_not_error(
            self, tmp_path):
        root = self._store(tmp_path)
        path = shard_store.shard_path(root, 0)
        blob = bytearray(path.read_bytes())
        # blank the crc fields in-place (same-length space padding keeps
        # the JSON valid and every offset unchanged) — the exact bytes a
        # pre-checksum writer produced, minus the keys
        import re

        hlen = int(np.frombuffer(blob[8:12], "<u4")[0])
        header = blob[12:12 + hlen].decode()
        legacy = re.sub(r', "crc32": \d+',
                        lambda m: " " * len(m.group(0)), header)
        assert len(legacy) == len(header) and '"crc32"' not in legacy
        blob[12:12 + hlen] = legacy.encode()
        path.write_bytes(blob)
        # the store still reads fine
        shard_store.read_shard(path)
        rep = shard_store.verify_store(root)
        assert rep["errors"] == []
        assert rep["arrays_unchecked"] == 4
        assert rep["arrays_checked"] == 2 * 4

    def test_doctor_cli_verify_store(self, tmp_path, capsys):
        from h36x.cli.doctor import main as doctor_main

        root = self._store(tmp_path)
        doctor_main(["--verify-store", str(root)])
        out = capsys.readouterr().out
        assert "CRC-verified" in out

        path = shard_store.shard_path(root, 1)
        blob = bytearray(path.read_bytes())
        blob[-100] ^= 0x40
        path.write_bytes(blob)
        with pytest.raises(SystemExit, match="problems"):
            doctor_main(["--verify-store", str(root)])
        out = capsys.readouterr().out
        assert "CRC32 mismatch" in out


def test_merge_cli_verify_gate(tmp_path):
    """h36x-merge-shards --verify refuses to merge a corrupted part (a bad
    network copy must not silently poison the unified store)."""
    from h36x.cli.merge_shards import main as merge_main

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir()
    b.mkdir()
    # one shard per part: the synthetic helper reuses (action, start)
    # across shard ids, which the merge's duplicate check would reject
    make_synthetic_store(a, n_shards=1, clips_per_shard=3, seq_len=4,
                         feat_dim=16, subjects=(1,))
    make_synthetic_store(b, n_shards=1, clips_per_shard=3, seq_len=4,
                         feat_dim=16, subjects=(5,))
    path = shard_store.shard_path(b, 0)
    blob = bytearray(path.read_bytes())
    blob[-20] ^= 0x02
    path.write_bytes(blob)
    with pytest.raises(SystemExit, match="integrity"):
        merge_main(["--parts", str(a), str(b), "--out", str(tmp_path / "m"),
                    "--verify", "--keep-parts"])

    blob[-20] ^= 0x02  # undo the corruption; the merge must now pass
    path.write_bytes(blob)
    merge_main(["--parts", str(a), str(b), "--out", str(tmp_path / "m2"),
                "--verify", "--keep-parts"])
    assert (tmp_path / "m2" / "index.json").exists()
    assert shard_store.verify_store(tmp_path / "m2")["errors"] == []
