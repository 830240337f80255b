"""Checkpointing: last/best policy with resume.

Parity with the reference policy (src/train.py:61-76, 437-451): `last` saved
every epoch, `best` saved on val-MPJPE improvement; a checkpoint carries
{epoch, best_val, params, opt_state, config}. Two storage backends share the
policy:

- **msgpack** (default): flax msgpack blob + JSON manifest — single-host,
  framework-independent files (no pickled code objects).
- **orbax**: an Orbax OCDBT checkpoint directory per name. The TPU-native
  choice at scale: atomic directory commit, per-array chunked storage, and
  sharding-aware multi-host save/restore (each host writes/reads only its
  shards) — the path to use for multi-slice jobs
  (h36x/parallel/distributed.py).

`load_checkpoint` / `fit(resume=...)` autodetect the backend from what is on
disk, so a run can switch backends between restarts.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from h36x.train.state import TrainState

MANIFEST = "manifest.json"


def save_checkpoint(
    directory,
    name: str,
    state: TrainState,
    epoch: int,
    best_val: float,
    config: Optional[dict] = None,
    extra: Optional[dict] = None,
) -> Path:
    """Write <directory>/<name>.msgpack + .json. Atomic via rename.
    `extra` entries are merged into the manifest (e.g. the early-stop
    patience counter, so a resumed run stops when an uninterrupted one
    would)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)

    # Pull everything to host before serializing (params may be sharded).
    host_state = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), state)
    blob = serialization.to_bytes(host_state)

    data_path = directory / f"{name}.msgpack"
    tmp = str(data_path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, data_path)

    import hashlib

    manifest = {
        "epoch": int(epoch),
        "best_val": float(best_val),
        "step": int(np.asarray(jax.device_get(state.step))),
        "config": config or {},
        # integrity record for `h36x-doctor --ckpt` (checkpoints sit on
        # disk for months; a silently corrupted blob should be one doctor
        # command away from a diagnosis, not a deserialization stack trace
        # at resume time). The manifest commits after the blob, so the
        # hash always describes the blob it sits next to.
        "sha256": hashlib.sha256(blob).hexdigest(),
        "nbytes": len(blob),
        **(extra or {}),
    }
    mpath = directory / f"{name}.json"
    tmp = str(mpath) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, mpath)
    return data_path


def save_checkpoint_orbax(
    directory,
    name: str,
    state: TrainState,
    epoch: int,
    best_val: float,
    config: Optional[dict] = None,
    extra: Optional[dict] = None,
) -> Path:
    """Orbax backend: write <directory>/<name>.{epoch%2}/ (OCDBT) + <name>.json.

    Orbax commits the directory atomically and, under a multi-host runtime,
    each process writes only its own shards — no host-0 gather of the full
    state, unlike the msgpack path.

    Crash-atomicity: `ckptr.save(..., force=True)` rmtree()s an existing
    target before writing, so saving straight to <name>/ would leave a
    window every epoch where NO resume checkpoint exists. Instead saves
    alternate between two slot directories <name>.0 / <name>.1, and the
    manifest's "dir" field is swapped only after the collective save
    commits. A crash mid-save loses only the in-progress slot; the
    manifest still points at the previous save's intact slot.

    Slot choice must (a) never target the live slot and (b) agree across
    hosts without a mid-run manifest read (ranks can race rank-0's
    manifest write). A per-(directory, name) in-process counter does both:
    every rank executes the same save sequence, so the counters agree; the
    FIRST save of a process seeds the counter from the on-disk manifest
    (written by a long-quiesced previous process — no race), targeting the
    slot opposite the live one. Epoch parity would NOT work for `best`,
    whose improvement epochs can repeat parity (0, 2 -> both slot 0 would
    rmtree the live best)."""
    import orbax.checkpoint as ocp

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    counter_key = (str(directory.absolute()), name)
    if counter_key not in _slot_counters:
        start = 0
        live = _orbax_dir(directory, name)
        if live is not None and live.name.rsplit(".", 1)[-1] in ("0", "1"):
            start = 1 - int(live.name.rsplit(".", 1)[-1])
        _slot_counters[counter_key] = start
    slot = _slot_counters[counter_key] % 2
    _slot_counters[counter_key] += 1
    slot_name = f"{name}.{slot}"
    path = (directory / slot_name).absolute()

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)

    # The directory save above is COLLECTIVE (every process writes its own
    # shards), but the manifest is one shared file on the common outdir —
    # rank-0 only, or concurrent O_TRUNC writers could corrupt it.
    if jax.process_index() == 0:
        manifest = {
            "epoch": int(epoch),
            "best_val": float(best_val),
            "step": int(np.asarray(jax.device_get(state.step))),
            "config": config or {},
            "backend": "orbax",
            "dir": slot_name,
            **(extra or {}),
        }
        mpath = directory / f"{name}.json"
        tmp = str(mpath) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, mpath)
    return path


_slot_counters: dict = {}  # (directory, name) -> saves issued this process


def _orbax_dir(directory: Path, name: str) -> Optional[Path]:
    """Resolve the live orbax directory for checkpoint `name`.

    Follows the manifest's "dir" slot pointer (written by
    save_checkpoint_orbax). A manifest WITH a "dir" field whose directory
    is gone is a dangling pointer (crashed save / partial sync) — return
    None rather than falling back to a stale legacy <name>/ dir, which
    would pair old params with the newer manifest. The legacy un-slotted
    layout is honored only when the manifest predates slots (no "dir"
    field) or there is no manifest at all.
    """
    manifest_path = directory / f"{name}.json"
    if manifest_path.exists():
        with open(manifest_path) as f:
            slot = json.load(f).get("dir")
        if slot is not None:
            return directory / slot if (directory / slot).is_dir() else None
    if (directory / name).is_dir():
        return directory / name
    return None


def _read_manifest(directory: Path, name: str) -> dict:
    """Manifest for `name`, degrading gracefully when it is absent.

    A checkpoint blob without <name>.json happens legitimately: legacy
    un-slotted orbax dirs predate manifests, and a crash between the
    msgpack write and the manifest write leaves exactly this state. The
    params are intact either way, so restore them with neutral counters
    (epoch 0, best_val inf — the schedule restarts) instead of crashing
    after the expensive restore; "manifest_missing" flags the degradation.
    """
    manifest_path = directory / f"{name}.json"
    if manifest_path.exists():
        with open(manifest_path) as f:
            return json.load(f)
    print(f"WARNING: checkpoint '{name}' has no manifest under {directory} "
          "(legacy layout or a save crashed before committing it); "
          "restarting the schedule at epoch 0")
    # epoch is "last epoch COMPLETED" (fit resumes at epoch+1), so the
    # neutral restart value is -1: epoch 0's sampler plan and full-LR
    # cosine step must run, not be skipped.
    return {"epoch": -1, "step": 0, "best_val": float("inf"),
            "manifest_missing": True}


def load_recorded_config(model_path) -> dict:
    """Full TrainConfig dict recorded in the manifest next to `model_path`.

    Every h36x-train save embeds the config in `<name>.json`
    (save_checkpoint / save_checkpoint_orbax `config=` field). Returns {}
    when no manifest or no recorded config exists (bare msgpacks, legacy
    layouts): callers fall back to their defaults exactly as before.

    Accepts every path shape load_params_only does: `outdir/best.msgpack`
    (manifest `outdir/best.json`), an orbax reference `outdir/last`
    (manifest `outdir/last.json`), or a direct slot dir `outdir/last.0`
    (manifest `outdir/last.json` after stripping the slot suffix).
    """
    if not str(model_path):
        # empty path (e.g. parity's torch-only mode, serve's artifact mode)
        # must not glob a stray "./.json"
        return {}
    p = Path(model_path)
    candidates = [p.with_suffix(".json") if p.suffix == ".msgpack"
                  else p.parent / f"{p.name}.json"]
    stem, dot, slot = p.name.rpartition(".")
    if dot and slot.isdigit():  # orbax slot dir last.0 / last.1
        candidates.append(p.parent / f"{stem}.json")
    for mpath in candidates:
        if mpath.exists():
            try:
                with open(mpath) as f:
                    manifest = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            cfg = manifest.get("config", {})
            if isinstance(cfg, dict):
                return dict(cfg)
    return {}


def load_recorded_model_config(model_path) -> dict:
    """The `model` section of the recorded TrainConfig (see
    load_recorded_config) — the architecture the checkpoint was trained
    with. Downstream CLIs (results/predict/export/serve/parity) use it so
    shape-invisible fields (`groups`, `regressor_iters`) never depend on
    hand-typed flags, which evaluate silently wrong on a mismatch."""
    model_cfg = load_recorded_config(model_path).get("model", {})
    return dict(model_cfg) if isinstance(model_cfg, dict) else {}


def _load_checkpoint_orbax(directory, name: str, template: TrainState):
    import orbax.checkpoint as ocp

    directory = Path(directory)
    ckpt_dir = _orbax_dir(directory, name)
    if ckpt_dir is None:
        raise FileNotFoundError(f"no orbax checkpoint '{name}' under {directory}")

    # Abstract restore template from metadata only — device_get(template)
    # would (a) fetch the whole state to host just to read shapes and (b)
    # raise outright when an array spans non-addressable devices (multi-host
    # model sharding, exactly the case orbax is mandated for). Propagating
    # each leaf's sharding lets orbax restore shard-aware: every host reads
    # only its own shards.
    def _abstract(x):
        dtype = getattr(x, "dtype", None)
        if dtype is None:
            dtype = np.asarray(x).dtype
        return jax.ShapeDtypeStruct(
            np.shape(x), dtype, sharding=getattr(x, "sharding", None)
        )

    abstract = jax.tree.map(_abstract, template)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(ckpt_dir.absolute(), abstract)
    return state, _read_manifest(directory, name)


def load_checkpoint(directory, name: str, template: TrainState):
    """Restore (state, manifest). `template` supplies the pytree structure
    (build it with create_train_state on the same model/optimizer).

    Backend autodetection trusts the shared <name>.json manifest first:
    both backends write it, so after a backend switch mid-run a stale file
    from the OTHER backend may still sit next to the current one — picking
    by file existence alone could pair old params with the new manifest.
    """
    directory = Path(directory)
    manifest_path = directory / f"{name}.json"
    if manifest_path.exists():
        with open(manifest_path) as f:
            backend = json.load(f).get("backend", "msgpack")
        if backend == "orbax":
            # NO msgpack fallthrough here: the manifest was written by an
            # orbax save, so a sibling <name>.msgpack is from an OLDER run —
            # pairing it with this newer manifest would resume old params at
            # a new epoch/best_val (exactly the mispairing the manifest
            # check exists to prevent). Missing dir -> raise.
            if _orbax_dir(directory, name) is None:
                raise FileNotFoundError(
                    f"manifest {manifest_path} records backend=orbax but no "
                    f"orbax checkpoint directory for '{name}' exists under "
                    f"{directory} (crashed save or partial sync?); refusing "
                    "to fall back to a stale msgpack file"
                )
            return _load_checkpoint_orbax(directory, name, template)
        # Symmetric refusal: the manifest records a msgpack save, so a
        # sibling legacy orbax <name>/ dir is from an OLDER run — falling
        # through to it would pair old params with this newer manifest.
        if not (directory / f"{name}.msgpack").exists():
            raise FileNotFoundError(
                f"manifest {manifest_path} records backend=msgpack but "
                f"{name}.msgpack is missing under {directory} (deleted or "
                "partial sync?); refusing to fall back to a stale orbax "
                "directory"
            )
    if (directory / f"{name}.msgpack").exists():
        with open(directory / f"{name}.msgpack", "rb") as f:
            blob = f.read()
        state = serialization.from_bytes(template, blob)
        return state, _read_manifest(directory, name)
    if (directory / name).is_dir():
        return _load_checkpoint_orbax(directory, name, template)
    raise FileNotFoundError(
        f"no checkpoint '{name}' under {directory} "
        f"(neither {name}.msgpack nor an orbax {name}/ directory)"
    )


def checkpoint_ref_exists(path) -> bool:
    """True when `path` names something load_params_only can open: a real
    file/dir, or an `outdir/last`-style reference to a slotted orbax save
    (resolved via the manifest next to it). CLIs use this to fail fast on
    typos WITHOUT rejecting orbax references whose literal path never
    exists on disk."""
    path = Path(path)
    return path.exists() or _orbax_dir(path.parent, path.name) is not None


def load_params_raw(path) -> dict:
    """Restore the model params as a plain nested dict of host numpy arrays
    WITHOUT a template — the shapes carry themselves.

    Accepts everything :func:`load_params_only` does (full TrainState
    msgpack, bare params msgpack, orbax directory, or an `outdir/last`
    slotted reference). Used by the reverse exporter (h36x-convert
    --to-torch-ckpt), where a structural template would demand resolving the
    architecture first just to throw it away."""
    path = Path(path)
    if not path.exists():
        resolved = _orbax_dir(path.parent, path.name)
        if resolved is not None:
            path = resolved
    if path.is_dir():  # orbax OCDBT directory
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            raw = ckptr.restore(path.absolute())
        if isinstance(raw, dict) and "params" in raw:
            raw = raw["params"]
        return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), raw)
    with open(path, "rb") as f:
        blob = f.read()
    raw = serialization.msgpack_restore(blob)
    if isinstance(raw, dict) and "params" in raw and "opt_state" in raw:
        raw = raw["params"]
    return raw


def load_params_only(path, params_template) -> Any:
    """Restore just the model params from a full-state checkpoint.

    Accepts a full TrainState msgpack (takes its 'params' entry), a bare
    params msgpack, or an Orbax checkpoint DIRECTORY (the `--ckpt-backend
    orbax` output) — every params-only consumer (predict/export/results/
    serve/init_from) goes through here, so both backends must load.
    """
    path = Path(path)
    if not path.exists():
        # `outdir/last` style reference to a slotted orbax save: resolve the
        # live slot via the manifest written next to it.
        resolved = _orbax_dir(path.parent, path.name)
        if resolved is not None:
            path = resolved
    if path.is_dir():  # orbax OCDBT directory
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            raw = ckptr.restore(path.absolute())  # saved structure as-is
        if isinstance(raw, dict) and "params" in raw:
            raw = raw["params"]
        return serialization.from_state_dict(
            params_template, jax.device_get(raw))
    with open(path, "rb") as f:
        blob = f.read()
    raw = serialization.msgpack_restore(blob)
    if isinstance(raw, dict) and "params" in raw and "opt_state" in raw:
        raw = raw["params"]
    return serialization.from_state_dict(params_template, raw)
