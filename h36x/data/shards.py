"""h36x feature-shard store.

A TPU-first re-design of the reference's torch.save shard format (reference
src/preprocess_resnet_features.py:80-91, 403-417; contract documented at
src/dataset_features.py:16-27). Differences by design:

- raw little-endian arrays behind a JSON header instead of pickled tensors:
  a shard loads with one sequential read (or np.memmap) and no framework
  deserialization on the hot path;
- 64-byte-aligned array offsets so memory-mapped reads stay page/vector
  aligned;
- `index.json` instead of a pickled index: human-inspectable, versionable.

On-disk shard layout (shard_XXXXX.h36x):

    bytes 0..8    magic b"H36XSHRD"
    bytes 8..12   uint32 LE header length H
    bytes 12..12+H  JSON header {
        "version": 1,
        "n_vars": int,
        "arrays": {name: {"dtype", "shape", "offset", "nbytes", "crc32"}},
        "meta": [per-row dicts],
    }
    payload       raw array bytes at the stated offsets

"crc32" is the zlib CRC32 of the array's payload bytes (additive field:
readers ignore it, shards written before it existed verify as "present but
unverifiable"). :func:`verify_store` / `h36x-doctor --verify-store`
recompute it to detect bit rot, torn copies and index drift.

Row layout matches the reference contract: a shard holds N_clips x n_vars
rows with a clip's variants contiguous, so a clip addresses its variant rows
as row + var_offset.

A compatibility reader for the reference's torch `.pt` shards/index lives in
:func:`load_torch_index` / :func:`load_torch_shard` (gated on torch).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

import sys

MAGIC = b"H36XSHRD"
_ALIGN = 64
_HOST_LE = sys.byteorder == "little"

ARRAY_KEYS = ("feats", "joints3d", "joints2d", "K")

_DTYPE_NAMES = {"float32", "float16", "bfloat16", "float64", "int32", "int64", "uint8"}


def _np_dtype(name: str):
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    if name not in _DTYPE_NAMES:
        raise ValueError(f"unsupported shard dtype {name!r}")
    # explicit little-endian: shard payloads are LE on disk by contract
    # (a no-op on LE hosts, where '<f4' == the native dtype)
    return np.dtype(name).newbyteorder("<")


def _dtype_name(dt: np.dtype) -> str:
    name = dt.name
    if name not in _DTYPE_NAMES:
        raise ValueError(f"unsupported shard dtype {dt!r}")
    return name


def shard_path(root, shard_id: int) -> Path:
    return Path(root) / f"shard_{shard_id:05d}.h36x"


def _array_buffer(arr: np.ndarray):
    """The contiguous bytes of `arr` without copying. Custom dtypes
    (ml_dtypes bfloat16) refuse the buffer protocol — reinterpret as u8."""
    try:
        return arr.data
    except (ValueError, BufferError):
        return arr.view(np.uint8).data


def _crc32(arr: np.ndarray) -> int:
    import zlib

    return zlib.crc32(_array_buffer(arr)) & 0xFFFFFFFF


def write_shard(path, arrays: Dict[str, np.ndarray], meta: List[dict], n_vars: int) -> None:
    """Serialize one shard. `arrays` values must share the leading row count."""
    rows = {k: int(v.shape[0]) for k, v in arrays.items()}
    if len(set(rows.values())) != 1:
        raise ValueError(f"inconsistent row counts: {rows}")
    n_rows = next(iter(rows.values()))
    if len(meta) != n_rows:
        raise ValueError(f"meta has {len(meta)} entries for {n_rows} rows")

    header: dict = {"version": 1, "n_vars": int(n_vars), "arrays": {}, "meta": meta}
    # Two passes: sizing the header changes offsets, so reserve with a first
    # pass then recompute once the header length is fixed.
    entries = {}
    for name, arr in arrays.items():
        # force little-endian on disk so the documented format contract is
        # real (no-op copy-wise on LE hosts, where '<' == native)
        arr = np.ascontiguousarray(arr)
        if arr.dtype.byteorder not in ("<", "|") and (
            arr.dtype.byteorder == ">" or not _HOST_LE
        ):
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        entries[name] = arr
        header["arrays"][name] = {
            "dtype": _dtype_name(arr.dtype),
            "shape": list(arr.shape),
            "offset": 0,
            "nbytes": int(arr.nbytes),
            # one extra sequential pass at write time (async-writer thread)
            # buys verifiable integrity for the store's whole lifetime
            "crc32": _crc32(arr),
        }

    def _layout(header_len: int) -> int:
        off = len(MAGIC) + 4 + header_len
        for name in entries:
            off = (off + _ALIGN - 1) // _ALIGN * _ALIGN
            header["arrays"][name]["offset"] = off
            off += header["arrays"][name]["nbytes"]
        return off

    blob = json.dumps(header).encode()
    _layout(len(blob))
    blob2 = json.dumps(header).encode()
    # offsets may grow the header (more digits); settle with one more pass
    while len(blob2) != len(blob):
        blob = blob2
        _layout(len(blob))
        blob2 = json.dumps(header).encode()

    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(np.array(len(blob2), dtype="<u4").tobytes())
        f.write(blob2)
        for name, arr in entries.items():
            f.seek(header["arrays"][name]["offset"])
            # buffer-protocol write: arr.tobytes() would transiently copy
            # the whole (often ~100 MB) array inside the writer thread
            f.write(_array_buffer(arr))
    os.replace(tmp, path)


def read_shard(path, mmap: bool = True) -> dict:
    """Load a shard into {'feats': ..., 'joints3d': ..., ..., 'meta': [...]}.

    With mmap=True arrays are memory-mapped (zero-copy until touched).
    """
    path = str(path)
    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise ValueError(f"{path}: not an h36x shard")
        (hlen,) = np.frombuffer(f.read(4), dtype="<u4")
        header = json.loads(f.read(int(hlen)).decode())

    out: dict = {"meta": header["meta"], "n_vars": header["n_vars"]}
    for name, spec in header["arrays"].items():
        dt = _np_dtype(spec["dtype"])
        shape = tuple(spec["shape"])
        if mmap:
            arr = np.memmap(path, dtype=dt, mode="r", offset=spec["offset"], shape=shape)
        else:
            arr = np.fromfile(path, dtype=dt, count=int(np.prod(shape)), offset=spec["offset"]).reshape(shape)
        out[name] = arr
    return out


def verify_store(root) -> dict:
    """Integrity-check a feature store (`h36x-doctor --verify-store`).

    Full sequential read of every shard (no mmap): recompute each array's
    recorded CRC32, check payload sizes, per-shard row-count consistency,
    meta length, and that the index's clip->shard mapping agrees with what
    is on disk — the bit-rot / torn-copy / index-drift detector for stores
    that live on real storage for months.

    Returns {"n_shards", "rows", "arrays_checked", "arrays_unchecked",
    "errors": [str]}. `arrays_unchecked` counts arrays written before
    checksums existed (legacy shards): present and readable, but
    unverifiable. Raises for torch-format stores (the reference's .pt
    shards carry no checksums to verify).
    """
    import zlib

    root = Path(root)
    idx = load_index(root)
    if idx.get("torch_format"):
        raise ValueError(
            "checksum verification covers native .h36x stores; reference "
            ".pt stores carry no integrity records")
    n_shards = int(idx["n_shards"])
    n_vars = int(idx["n_variants"])
    per_shard: Dict[int, int] = {}
    for c in idx["clips"]:
        sid = int(c["shard_id"])
        per_shard[sid] = per_shard.get(sid, 0) + 1
    errors: List[str] = []
    for sid in per_shard:
        if sid < 0 or sid >= n_shards:
            errors.append(
                f"index maps {per_shard[sid]} clip(s) to nonexistent "
                f"shard {sid} (store has {n_shards})")
    rows = 0
    checked = unchecked = 0
    for sid in range(n_shards):
        path = shard_path(root, sid)
        shard_rows = None
        try:
            with open(path, "rb") as f:
                if f.read(len(MAGIC)) != MAGIC:
                    raise ValueError("bad magic")
                (hlen,) = np.frombuffer(f.read(4), dtype="<u4")
                header = json.loads(f.read(int(hlen)).decode())
                for name, spec in header["arrays"].items():
                    f.seek(int(spec["offset"]))
                    buf = f.read(int(spec["nbytes"]))
                    if len(buf) != int(spec["nbytes"]):
                        errors.append(
                            f"{path.name}:{name}: truncated "
                            f"({len(buf)}/{spec['nbytes']} payload bytes)")
                        continue
                    want = spec.get("crc32")
                    if want is None:
                        unchecked += 1
                    else:
                        got = zlib.crc32(buf) & 0xFFFFFFFF
                        if got != int(want):
                            errors.append(
                                f"{path.name}:{name}: CRC32 mismatch "
                                f"(recorded {int(want):#010x}, recomputed "
                                f"{got:#010x}) — payload corrupted")
                        else:
                            checked += 1
                    if spec["shape"]:
                        if shard_rows is None:
                            shard_rows = int(spec["shape"][0])
                        elif int(spec["shape"][0]) != shard_rows:
                            errors.append(
                                f"{path.name}: arrays disagree on row "
                                f"count ({spec['shape'][0]} vs {shard_rows})")
                if shard_rows is not None and len(header["meta"]) != shard_rows:
                    errors.append(
                        f"{path.name}: {len(header['meta'])} meta entries "
                        f"for {shard_rows} rows")
        except Exception as e:  # noqa: BLE001 — report, keep scanning
            errors.append(f"{path.name}: unreadable "
                          f"({type(e).__name__}: {e})")
            continue
        expect = per_shard.get(sid, 0) * n_vars
        if shard_rows is not None and shard_rows != expect:
            errors.append(
                f"{path.name}: {shard_rows} rows on disk but the index "
                f"maps {per_shard.get(sid, 0)} clip(s) x {n_vars} "
                f"variants = {expect}")
        rows += shard_rows or 0
    return {"n_shards": n_shards, "rows": rows, "arrays_checked": checked,
            "arrays_unchecked": unchecked, "errors": errors}


class ShardWriter:
    """Stateful helper accumulating rows and flushing numbered shard files."""

    def __init__(self, out_root, n_vars: int, async_writer=None):
        self.out_root = Path(out_root)
        self.out_root.mkdir(parents=True, exist_ok=True)
        self.n_vars = n_vars
        self.shard_id = 0
        self._async = async_writer

    def write(self, arrays: Dict[str, np.ndarray], meta: List[dict]) -> int:
        sid = self.shard_id
        path = shard_path(self.out_root, sid)
        if self._async is not None:
            self._async.submit(write_shard, path, arrays, meta, self.n_vars)
        else:
            write_shard(path, arrays, meta, self.n_vars)
        self.shard_id += 1
        return sid


class ShardReader:
    """LRU cache of open shards (reference src/dataset_features.py:89-110).

    log_loads_every > 0 reproduces the reference's cache-thrash
    observability (src/dataset_features.py:101-105): every Nth disk load
    prints the running load/hit counts so an undersized cache is visible
    in the training log instead of only in the data-phase timer.
    """

    def __init__(self, root, cache_size: int = 2, mmap: bool = True,
                 log_loads_every: int = 0, loader=None):
        self.root = Path(root)
        self.cache_size = cache_size
        self.mmap = mmap
        self.log_loads_every = log_loads_every
        # loader(root, shard_id) -> dict; default reads native .h36x files.
        # The torch-compat dataset passes load_torch_shard so one LRU /
        # stats implementation covers both formats.
        self._loader = loader or (
            lambda root, sid: read_shard(shard_path(root, sid), mmap=self.mmap)
        )
        self._cache: dict = {}
        self._order: list = []
        self.load_calls = 0
        self.hits = 0

    def get(self, shard_id: int) -> dict:
        if shard_id in self._cache:
            self.hits += 1
            self._order.remove(shard_id)
            self._order.append(shard_id)
            return self._cache[shard_id]
        while self._order and len(self._order) >= self.cache_size:
            # `while`+non-empty guard: cache_size=0 ("no caching") must not
            # pop from an empty list, and the freshly loaded shard below is
            # still returned (and immediately evicted on the next get)
            oldest = self._order.pop(0)
            del self._cache[oldest]
        self.load_calls += 1
        shard = self._loader(self.root, shard_id)
        if self.cache_size > 0:
            self._cache[shard_id] = shard
            self._order.append(shard_id)
        if self.log_loads_every and self.load_calls % self.log_loads_every == 0:
            print(f"[shards] {self.load_calls} loads / {self.hits} hits "
                  f"(cache {self.cache_size}, shard {shard_id})", flush=True)
        return shard

    def stats(self) -> dict:
        return {"loads": self.load_calls, "hits": self.hits,
                "cache_size": self.cache_size}


# ---------------------------------------------------------------------------
# Index
# ---------------------------------------------------------------------------


def write_index(
    root,
    clips: List[dict],
    *,
    n_shards: int,
    n_clips: int,
    n_variants: int,
    aug_names: List[str],
    seq_len: int,
    frame_skip: int,
    feat_dtype: str,
    shuffle_seed: Optional[int] = None,
    shuffle_pool: Optional[int] = None,
) -> None:
    """Write index.json describing the shard set (the L3->L4 contract)."""
    payload = {
        "version": 1,
        "clips": clips,
        "n_shards": n_shards,
        "n_clips": n_clips,
        "n_variants": n_variants,
        "aug_names": aug_names,
        "seq_len": seq_len,
        "frame_skip": frame_skip,
        "feat_dtype": feat_dtype,
        "variants_grouped": True,
        "shuffle_seed": shuffle_seed,
        "shuffle_pool": shuffle_pool,
    }
    tmp = Path(root) / "index.json.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, Path(root) / "index.json")


def load_index(root) -> dict:
    """Load index.json; falls back to a reference-format index.pt if present."""
    root = Path(root)
    jpath = root / "index.json"
    if jpath.exists():
        with open(jpath) as f:
            return json.load(f)
    tpath = root / "index.pt"
    if tpath.exists():
        return load_torch_index(tpath)
    raise FileNotFoundError(
        f"no index.json (or compat index.pt) under {root}; run the h36x "
        "extract stage first."
    )


def merge_stores(parts, out_root, move: bool = True) -> dict:
    """Unify partitioned extraction stores into one shard store.

    Multi-host extraction runs N coordination-free jobs
    (``h36x-extract --partition i/N``), each writing a complete store for
    its clip subset. This renumbers every part's shard files into one
    namespace under `out_root` and concatenates the clip indexes —
    O(#shards) hard links (falling back to copy across filesystems) plus
    one JSON write; no tensor data is read or rewritten. With move=False
    the parts stay intact; with move=True the source shard files are
    unlinked only AFTER the merged index is written, so a crash at any
    point leaves either intact parts + an index-less (non-store) out_root,
    or a complete merged store + some stray source links — never a broken
    store on either side.

    Disk note: on a filesystem WITHOUT hard-link support (some NFS/FUSE/
    exFAT mounts) phase 1 falls back to copying, so move=True transiently
    needs parts + a full merged copy (~2x the store) before phase 3 frees
    the sources — the price of never leaving a broken store on either
    side (the pre-round-4 per-shard rename needed zero extra bytes but a
    crash mid-merge stranded half-moved shards with no index). On any
    link-capable filesystem (the normal case) links are free and peak
    usage is unchanged.

    Part metadata (n_variants, aug_names, seq_len, frame_skip, feat_dtype)
    must agree; clips must not repeat across parts. Returns the merged
    index payload.
    """
    import shutil

    parts = [Path(p) for p in parts]
    if not parts:
        raise ValueError("no part stores given")
    out_root = Path(out_root)
    out_root.mkdir(parents=True, exist_ok=True)
    # refuse a non-empty target: overwriting an existing store (or a
    # previous merge with MORE shards) would destroy/strand shard files
    leftovers = ([p.name for p in out_root.glob("shard_*.h36x")]
                 + [p.name for p in (out_root / "index.json",) if p.exists()])
    if leftovers:
        raise ValueError(
            f"output store {out_root} is not empty ({leftovers[:3]}...); "
            "merge into a fresh directory")

    indexes = [load_index(p) for p in parts]
    first = indexes[0]
    for p, idx in zip(parts[1:], indexes[1:]):
        for key in ("n_variants", "aug_names", "seq_len", "frame_skip",
                    "feat_dtype"):
            if idx[key] != first[key]:
                raise ValueError(
                    f"part {p} disagrees on {key}: "
                    f"{idx[key]!r} != {first[key]!r}")

    # Validate everything (duplicates, overlaps, missing shards) BEFORE
    # touching the filesystem; the populate/finalize/unlink ordering below
    # then covers the unpredictable failures (ENOSPC, I/O error, SIGKILL)
    # validation cannot.
    merged_clips: List[dict] = []
    renames = []
    seen = set()
    offset = 0
    for part, idx in zip(parts, indexes):
        if idx.get("torch_format") or idx.get("n_shards") is None:
            # key on the format flag, not just a missing count: a torch
            # index WITH n_shards would otherwise die later on a misleading
            # "missing shard_00000.h36x" for a store that only has .pt files
            raise ValueError(
                f"part {part} has a torch-format (or countless) index — "
                "convert it first (h36x-convert --torch-shards) or merge "
                "only native h36x part stores")
        for sid in range(idx["n_shards"]):
            src, dst = shard_path(part, sid), shard_path(out_root, offset + sid)
            if not src.exists():
                raise FileNotFoundError(f"part {part} is missing {src.name}")
            if src.resolve() == dst.resolve():
                raise ValueError(f"part {part} overlaps the output store")
            renames.append((src, dst))
        for entry in idx["clips"]:
            key = (entry["subject"], entry["action"], entry["cam"],
                   entry["start"])
            if key in seen:
                raise ValueError(f"clip {key} appears in more than one part")
            seen.add(key)
            merged_clips.append(dict(entry, shard_id=entry["shard_id"] + offset))
        offset += idx["n_shards"]

    # Phase 1 — populate out_root WITHOUT mutating the parts: hard-link
    # (same-FS: free) or copy (cross-FS). Until index.json exists,
    # out_root is not a store, so a crash here strands only nameless
    # files; every part is still complete and re-mergeable.
    for src, dst in renames:
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)

    # Phase 2 — finalize: write_index is atomic (tmp + os.replace).
    write_index(
        out_root,
        merged_clips,
        n_shards=offset,
        n_clips=len(merged_clips),
        n_variants=first["n_variants"],
        aug_names=first["aug_names"],
        seq_len=first["seq_len"],
        frame_skip=first["frame_skip"],
        feat_dtype=first["feat_dtype"],
        shuffle_seed=first.get("shuffle_seed"),
        shuffle_pool=first.get("shuffle_pool"),
    )

    # Phase 3 — only now is consuming the parts safe. A crash mid-unlink
    # leaves a COMPLETE merged store plus some still-linked sources
    # (same inode under hard links): wasted names, not corruption.
    if move:
        for src, _ in renames:
            os.unlink(src)
    return load_index(out_root)


# ---------------------------------------------------------------------------
# Compatibility readers for the reference's torch shard format
# ---------------------------------------------------------------------------


def load_torch_index(path) -> dict:
    import torch

    idx = torch.load(path, map_location="cpu", weights_only=True)
    return {
        "version": 0,
        "clips": idx["clips"],
        "n_shards": idx.get("n_shards"),
        "n_clips": idx.get("n_clips"),
        "n_variants": idx["n_variants"],
        "aug_names": idx.get("aug_names", ["orig"]),
        "seq_len": idx.get("seq_len"),
        "frame_skip": idx.get("frame_skip"),
        "feat_dtype": idx.get("feat_dtype", "float32"),
        "variants_grouped": idx.get("variants_grouped", True),
        "torch_format": True,
    }


def load_torch_shard(root, shard_id: int) -> dict:
    import torch

    data = torch.load(
        Path(root) / f"shard_{shard_id:05d}.pt", map_location="cpu", weights_only=True
    )
    out = {"meta": data.get("meta", []), "n_vars": data.get("n_vars", 1)}
    for k in ARRAY_KEYS:
        out[k] = data[k].numpy()
    return out
