"""Epoch-level training driver.

Orchestrates: sharded batches over the mesh, per-epoch cosine LR, train +
eval passes with phase timers, last/best checkpoints, early stopping, resume.
Reference behavior being reproduced: src/train.py:114-279 (train/evaluate)
and src/train.py:418-459 (epoch loop / checkpoint / early-stop policy).
Epoch metrics additionally append to <outdir>/metrics.jsonl (the reference
only prints; SLURM stdout was its log store).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from h36x.config import TrainConfig
from h36x.models.phd import PHDFor3DJoints
from h36x.parallel.distributed import (
    is_main_process,
    local_batch_slice,
    make_global_batch,
)
from h36x.parallel.feed import prefetch_to_device
from h36x.parallel.mesh import (batch_sharding, data_axis_size, make_mesh,
                               shard_params)
from h36x.train import checkpoint as ckpt
from h36x.train.state import (
    TrainState,
    cosine_lr,
    create_train_state,
    make_optimizer,
    set_learning_rate,
)
from h36x.train.step import (
    curriculum_horizon,
    make_future_train_step,
    make_train_step,
    make_weighted_eval_step,
    make_weighted_future_eval_step,
)
from h36x.utils.profiling import maybe_trace
from h36x.utils.timers import PhaseTimers


def build_model(cfg: TrainConfig) -> PHDFor3DJoints:
    m = cfg.model
    dtype = None
    if getattr(m, "dtype", "float32") in ("bfloat16", "bf16"):
        dtype = jnp.bfloat16
    return PHDFor3DJoints(
        latent_dim=m.latent_dim,
        feature_dim=m.feature_dim,
        joints_num=m.joints_num,
        number_blocks=m.num_blocks,
        ar_blocks=m.ar_num_blocks,
        dropout=m.dropout,
        groups=m.groups,
        kernel_size=m.kernel_size,
        regressor_iters=m.regressor_iters,
        regressor_hidden=m.regressor_hidden,
        dtype=dtype,
    )


def _batches(
    dataset,
    sampler,
    sharding,
    drop_meta: bool = True,
    pad_to: int = 1,
    with_weights: bool = False,
    stack: int = 1,
):
    """Host batches -> sharded device batches. Tail batches whose row count
    does not divide the data axis are padded by repeating the last row.
    With with_weights=True every batch gains a trailing float32 (B,) weight
    vector that is 0 on those padded rows, so weighted eval steps can form
    exact dataset means (training keeps the cheap per-batch-mean contract:
    the reference averages per-batch means too, so the deviation there is
    bounded by one tail batch per epoch).

    Multi-process: every process iterates the identical (seeded) sampler
    order but gathers ONLY its local_batch_slice rows from the store, and
    the transfer assembles the global jax.Array from the per-process shards
    without any cross-host gather (h36x/parallel/distributed.py).

    stack > 1 groups that many consecutive batches into one pytree with a
    leading step axis (k, B, ...) for the multi-step scan dispatch
    (h36x/train/step.py scan_steps); the step axis is unsharded, rows
    shard as usual. The final group of an epoch may be shorter."""
    pcount = jax.process_count()

    def gen():
        for idx_batch in sampler:
            idx_batch = list(idx_batch)
            real = len(idx_batch)
            if pad_to > 1 and real % pad_to != 0:
                short = pad_to - real % pad_to
                idx_batch = idx_batch + [idx_batch[-1]] * short
            n_global = len(idx_batch)
            w = None
            if with_weights:
                w = np.zeros(n_global, dtype=np.float32)
                w[:real] = 1.0
            if pcount > 1:
                rows = local_batch_slice(n_global)
                idx_batch = idx_batch[rows]
                if w is not None:
                    w = w[rows]
            batch = dataset.get_batch(idx_batch)
            batch = batch[:4] if drop_meta else batch
            if w is not None:
                batch = (*batch, w)
            yield batch

    def gen_stacked():
        group = []
        for batch in gen():
            # a batch with a different row count (short tail with
            # drop_last=False) cannot np.stack with the group — flush and
            # let it ride its own (shorter-scan) group, preserving exact
            # per-batch semantics instead of padding it further
            if group and batch[0].shape[0] != group[0][0].shape[0]:
                yield tuple(np.stack(xs) for xs in zip(*group))
                group = []
            group.append(batch)
            if len(group) == stack:
                yield tuple(np.stack(xs) for xs in zip(*group))
                group = []
        if group:
            yield tuple(np.stack(xs) for xs in zip(*group))

    source = gen_stacked() if stack > 1 else gen()
    if pcount > 1:
        def transfer(batch):
            # local rows -> global-shape array; every process holds
            # n_local rows, so the global row count is n_local * pcount
            n_global = batch[0].shape[1 if stack > 1 else 0] * pcount
            return make_global_batch(batch, sharding.mesh, n_global,
                                     stacked=stack > 1)

        return prefetch_to_device(source, transfer=transfer)
    if stack > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(sharding.mesh, P(None, *sharding.spec))
    return prefetch_to_device(source, sharding=sharding)


def _data_axis(sharding) -> int:
    """Rows a batch must be divisible by under this sharding (data-axis
    size; slice*data on a multislice mesh)."""
    try:
        return data_axis_size(sharding.mesh)
    except AttributeError:
        return 1


def train_epoch(train_step, state, dataset, sampler, sharding, rng, log_every=500,
                scan_steps=1):
    """One epoch. Metric tensors stay on device until a log point or epoch
    end, so step dispatches pipeline instead of synchronizing per batch
    (device_get every iteration would serialize host<->device).

    scan_steps > 1: `train_step` is a grouped program
    (h36x/train/step.py scan_steps or accum_steps — same
    (state, batches, rng) -> (state, metrics, rng) signature): one
    dispatch consumes a stacked group of that many batches and carries
    the dropout rng on device. Multi-step scan applies one optimizer
    update per batch (trajectory identical to ungrouped); grad
    accumulation applies ONE update over the group's mean gradient.
    `n` counts batches either way, so logged metrics stay per-batch
    means."""
    timers = PhaseTimers()
    pending = []  # device-resident per-step metric dicts
    totals = {"loss": 0.0, "l3d": 0.0, "mpjpe": 0.0}
    opt_keys = ("l2d", "l_ar")  # tracked when the step reports them
    n = 0
    last_log = 0
    epoch_start = time.perf_counter()

    def drain():
        nonlocal pending
        for m in jax.device_get(pending):
            for k in opt_keys:
                if k in m:
                    totals.setdefault(k, 0.0)
            for k in totals:
                totals[k] += float(np.sum(m.get(k, 0.0)))
        pending = []

    timers.start("data")
    for batch in _batches(dataset, sampler, sharding, pad_to=_data_axis(sharding),
                          stack=scan_steps):
        timers.stop("data")
        timers.start("step")
        if scan_steps > 1:
            state, metrics, rng = train_step(state, batch, rng)
            n += int(batch[0].shape[0])
        else:
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, batch, sub)
            n += 1
        pending.append(metrics)
        timers.stop("step")
        if log_every > 0 and n - last_log >= log_every:
            last_log = n
            drain()  # synchronizes: every queued step must finish
            if is_main_process():
                print(
                    f"[3D]  iter {n:05d} | loss {totals['loss']/n:.6f} "
                    f"(3d {totals['l3d']/n:.6f}) | mpjpe {totals['mpjpe']/n:.3f} | "
                    f"epoch {time.perf_counter()-epoch_start:.1f}s",
                    flush=True,
                )
        timers.start("data")
    timers.stop("data")
    timers.start("drain")
    drain()
    timers.stop("drain")
    if n == 0:
        print(
            "WARNING: the train sampler yielded ZERO batches this epoch — "
            "check batch_size / shards_per_batch against the store's shard "
            "count and split sizes.",
            flush=True,
        )
    if is_main_process():
        print("[Train timing]\n" + timers.summary(n), flush=True)
    means = {k: v / max(n, 1) for k, v in totals.items()}
    # phase totals ride along for metrics.jsonl (feed-vs-step decomposition
    # per epoch; benchmarks/train_bench.py names the bottleneck from these)
    means["_timing"] = {k: round(v, 4) for k, v in timers.totals.items()}
    return state, means, rng


def evaluate(eval_step, params, dataset, sampler, sharding):
    """Validation pass. eval_step must be a weighted step
    (:func:`h36x.train.step.make_weighted_eval_step`): it returns per-batch
    SUMS over real (non-padded) rows plus the row count. Metric tensors stay
    on device until the final drain, so dispatches pipeline exactly like
    train_epoch instead of synchronizing host<->device every batch."""
    timers = PhaseTimers()
    pending = []  # device-resident per-batch sum dicts
    n = 0
    timers.start("data")
    for batch in _batches(
        dataset, sampler, sharding, pad_to=_data_axis(sharding), with_weights=True
    ):
        timers.stop("data")
        timers.start("step")
        pending.append(eval_step(params, batch))
        timers.stop("step")
        n += 1
        timers.start("data")
    timers.stop("data")
    timers.start("drain")
    totals = {"loss": 0.0, "l3d": 0.0, "mpjpe": 0.0, "bone": 0.0}
    rows = 0.0
    for m in jax.device_get(pending):
        for k in totals:
            totals[k] += float(m[k])
        rows += float(m["n"])
    timers.stop("drain")
    if is_main_process():
        print("[Val timing]\n" + timers.summary(n), flush=True)
    if rows == 0.0:
        # zero-row averages would read as val MPJPE 0.000 — a fake new
        # best that freezes `best` at the first epoch's params forever
        print(
            "WARNING: the val sampler yielded ZERO rows — check val "
            "subjects / batch size against the store; val metrics are inf "
            "this epoch and no 'best' checkpoint will be saved.",
            flush=True,
        )
        out = {k: float("inf") for k in totals}
    else:
        out = {k: v / rows for k, v in totals.items()}
    out["_timing"] = {k: round(v, 4) for k, v in timers.totals.items()}
    return out


def _append_metrics(outdir, record: dict) -> None:
    # json.dumps(inf/nan) emits non-RFC 'Infinity'/'NaN' tokens that break
    # strict consumers (jq, pandas) — the zero-row val epoch writes inf
    record = {
        k: (None if isinstance(v, float) and not math.isfinite(v) else v)
        for k, v in record.items()
    }
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


def fit(
    cfg: TrainConfig,
    train_set,
    val_set,
    train_sampler,
    val_sampler,
    mesh=None,
    state: Optional[TrainState] = None,
):
    """Full training run; returns (final_state, best_val).

    Multi-process (cfg.dist / jax.process_count() > 1): every process runs
    this same function over the same (shared-storage) store with identical
    seeds; batches are assembled from per-process local rows (_batches),
    gradient reduction rides the mesh collectives, and only rank 0 writes
    msgpack checkpoints / metrics.jsonl (orbax saves are collective — each
    process writes its own shards)."""
    main = is_main_process()
    log = print if main else (lambda *a, **k: None)  # rank-0 logging
    pcount = jax.process_count()
    if mesh is None:
        n_dev = len(jax.devices())
        model_ax = max(1, cfg.mesh.model)
        slices = max(1, getattr(cfg.mesh, "slices", 1))
        if model_ax > n_dev or n_dev % model_ax != 0:
            # without this, data_ax floors to 0 (or devices silently drop)
            # and the failure surfaces as an obscure sharding error later
            raise ValueError(
                f"--mesh.model {model_ax} must divide the device count "
                f"({n_dev})")
        if slices > 1:
            # Multislice pod: (slice, data, model) — the slice axis is the
            # DCN dimension; batch rows shard over slice x data and params
            # replicate over slice, so only the final gradient psum hop
            # crosses DCN (h36x/parallel/distributed.py:make_multislice_mesh).
            from h36x.parallel.distributed import make_multislice_mesh

            if n_dev % (slices * model_ax) != 0:
                raise ValueError(
                    f"{n_dev} devices not divisible by slices*model="
                    f"{slices * model_ax}")
            data_ax = (cfg.mesh.data if cfg.mesh.data > 0
                       else n_dev // (slices * model_ax))
            if cfg.optim.batch_size % (slices * data_ax) != 0:
                raise ValueError(
                    f"the combined slice*data axis ({slices * data_ax}) must "
                    f"divide the batch size ({cfg.optim.batch_size}) — pick "
                    "a batch that is a multiple of slices*data")
            mesh = make_multislice_mesh(slices, data_ax, model_ax)
            log(f"mesh: multislice (slice={slices}, data={data_ax}, "
                f"model={model_ax})")
        else:
            explicit = cfg.mesh.data > 0
            data_ax = cfg.mesh.data if explicit else n_dev // model_ax
            if explicit and cfg.optim.batch_size % data_ax != 0:
                # the user ASKED for this axis; shrinking it silently would
                # idle devices with only a log line — make them choose
                raise ValueError(
                    f"--mesh.data {data_ax} does not divide the batch size "
                    f"({cfg.optim.batch_size}); adjust one of them (or drop "
                    "--mesh.data to auto-fit)")
            # auto data axis: shrink to the largest batch divisor
            while data_ax > 1 and cfg.optim.batch_size % data_ax != 0:
                data_ax -= 1
            n_used = data_ax * model_ax
            if n_used != n_dev:
                if pcount > 1:
                    raise ValueError(
                        f"multi-process runs must use every device: batch "
                        f"{cfg.optim.batch_size} / mesh {cfg.mesh} leaves "
                        f"{n_dev - n_used}/{n_dev} devices idle")
                log(f"mesh: using {n_used}/{n_dev} devices "
                      f"(data={data_ax}, model={model_ax}; batch "
                      f"{cfg.optim.batch_size} must divide the data axis)")
            mesh = make_mesh(data_ax, model_ax, devices=jax.devices()[:n_used])
    rows_split = data_axis_size(mesh)
    if pcount > 1 and rows_split % pcount != 0:
        raise ValueError(
            f"batch-sharding axis {rows_split} not divisible by "
            f"{pcount} processes — local_batch_slice needs equal row counts")
    if (pcount > 1 and getattr(cfg, "ckpt_backend", "msgpack") == "msgpack"
            and mesh.shape.get("model", 1) > jax.local_device_count()):
        # model-axis shards would span processes: rank 0 cannot device_get
        # non-addressable remote shards into one msgpack file
        raise ValueError(
            f"model axis {mesh.shape.get('model', 1)} spans processes "
            f"(local devices: {jax.local_device_count()}); use "
            "--ckpt-backend orbax, whose saves are collective")
    model = build_model(cfg)
    phase = getattr(cfg.optim, "phase", 1)
    optimizer, _frozen = make_optimizer(
        cfg.optim.lr, cfg.optim.weight_decay, freeze_ar=cfg.optim.freeze_ar,
        phase=phase if phase != 1 else None,
    )

    rng = jax.random.key(cfg.optim.seed)
    rng, init_rng = jax.random.split(rng)
    if state is None:
        example = jnp.zeros((2, cfg.data.seq_len, cfg.model.feature_dim))
        state = create_train_state(model, optimizer, init_rng, example)
    if cfg.init_from:
        # Warm-start model weights from another run's checkpoint (e.g. a
        # phase-1 run feeding phase-2: the param tree is phase-independent,
        # only the optimizer state layout differs).
        params = ckpt.load_params_only(cfg.init_from, jax.device_get(state.params))
        state = TrainState(params, optimizer.init(params), state.step)
        log(f"Initialized model weights from {cfg.init_from}")
    state = TrainState(shard_params(state.params, mesh), state.opt_state, state.step)

    scan_steps = max(1, getattr(cfg.optim, "steps_per_dispatch", 1))
    accum_steps = max(1, getattr(cfg.optim, "grad_accum", 1))
    # batches per stacked dispatch group (scan and accum share the feed)
    group = scan_steps if scan_steps > 1 else accum_steps
    if phase == 2:
        if getattr(cfg.optim, "fused", False):
            # no fused phase-2 step exists; silently training the XLA path
            # while the user believes they chose the Pallas step would
            # invalidate any timing/numerics comparison they are running
            raise ValueError(
                "--optim.fused only implements the phase-1 step; "
                "phase 2 (f_AR curriculum) trains on the XLA path — "
                "drop the flag")
        future_step = make_future_train_step(
            model, optimizer, input_len=cfg.optim.input_len,
            pred_len=cfg.optim.pred_len, lambda_joints=cfg.optim.lambda_future,
            scan_steps=scan_steps, accum_steps=accum_steps,
        )
        train_step = None  # bound per-epoch with the curriculum horizon
    else:
        if (getattr(cfg.optim, "fused", False)
                and mesh.shape.get("model", 1) > 1):
            # the fused Pallas kernels consume raw param arrays with no
            # tensor-parallel sharding rules; letting the SPMD partitioner
            # hit them fails deep in Mosaic instead of here
            raise ValueError(
                "--optim.fused does not support --mesh.model > 1; use the "
                "default XLA step for tensor parallelism")
        train_step = make_train_step(
            model, optimizer, fused=getattr(cfg.optim, "fused", False),
            lambda_2d=getattr(cfg.optim, "lambda_2d", 0.0),
            scan_steps=scan_steps, accum_steps=accum_steps,
        )
    if phase == 2:
        # score the AR path: the plain eval metric only exercises modules
        # phase 2 freezes, so it would be constant and early-stop blindly
        eval_step = make_weighted_future_eval_step(
            model, input_len=cfg.optim.input_len, pred_len=cfg.optim.pred_len,
            lambda_joints=cfg.optim.lambda_future,
        )
    else:
        eval_step = make_weighted_eval_step(model)
    data_sharding = batch_sharding(mesh)

    backend = getattr(cfg, "ckpt_backend", "msgpack")
    if backend not in ("msgpack", "orbax"):
        raise ValueError(f"unknown ckpt_backend {backend!r}")
    save_ckpt = (ckpt.save_checkpoint_orbax if backend == "orbax"
                 else ckpt.save_checkpoint)
    # msgpack gathers + writes one file: rank 0 only. Orbax saves are
    # collective (every process persists its own shards).
    write_ckpt = (backend == "orbax") or main

    start_epoch = 0
    best_val = float("inf")
    no_improve = 0

    if cfg.resume:
        state, manifest = ckpt.load_checkpoint(cfg.resume, "last", state)
        # Restored leaves are host numpy (msgpack) or COMMITTED device
        # arrays (orbax restores each leaf with the template's sharding;
        # opt_state/step were single-device there). A committed
        # single-device leaf cannot enter the same jit as mesh-sharded
        # params — re-place params on the mesh and hand opt_state/step
        # back as host arrays so the step jit places them exactly like a
        # fresh init's (uncommitted) leaves.
        state = TrainState(
            shard_params(jax.device_get(state.params), mesh),
            jax.device_get(state.opt_state),
            jax.device_get(state.step),
        )
        start_epoch = manifest["epoch"] + 1
        best_val = manifest["best_val"]
        # restore the early-stop patience too: without it a resumed run
        # would tolerate up to `patience` MORE non-improving epochs than an
        # uninterrupted one
        no_improve = int(manifest.get("no_improve", 0))
        log(f"Resumed from {cfg.resume} (epoch={start_epoch}, "
            f"best={best_val:.4f}, no_improve={no_improve})")

    cfg_json = dataclasses.asdict(cfg)

    for epoch in range(start_epoch, cfg.optim.epochs):
        train_sampler.set_epoch(epoch)
        lr = cosine_lr(epoch, cfg.optim.lr, cfg.optim.epochs)
        set_learning_rate(state.opt_state, lr, freeze_ar=cfg.optim.freeze_ar)
        if phase == 2:
            horizon = curriculum_horizon(
                epoch, cfg.optim.pred_len, cfg.optim.curriculum_steps
            )
            step_fn = lambda s, b, r, _h=jnp.int32(horizon): future_step(s, b, r, _h)  # noqa: E731
            log(f"\nEpoch {epoch+1}/{cfg.optim.epochs} (lr {lr:.2e}, "
                  f"AR horizon {horizon})", flush=True)
        else:
            step_fn = train_step
            log(f"\nEpoch {epoch+1}/{cfg.optim.epochs} (lr {lr:.2e})", flush=True)
        t0 = time.perf_counter()

        with maybe_trace(cfg.profile_dir if epoch == start_epoch else None):
            # per-epoch key derived from the base seed, NOT a stream carried
            # across epochs: a resume at epoch e then gets exactly the
            # dropout keys the uninterrupted run would have used (the
            # carried stream restarts from the seed on resume and diverges)
            state, tr, _ = train_epoch(
                step_fn, state, train_set, train_sampler, data_sharding,
                jax.random.fold_in(rng, epoch),
                log_every=cfg.optim.log_every, scan_steps=group,
            )
        va = evaluate(eval_step, state.params, val_set, val_sampler, data_sharding)

        log(
            f"Train: loss={tr['loss']:.6f}"
            + (f" (2d {tr['l2d']:.6f})" if tr.get("l2d") else "")
            + (f" (ar {tr['l_ar']:.6f})" if tr.get("l_ar") else "")
            + f" | mpjpe={tr['mpjpe']:.3f}\n"
            f"Val:   loss={va['loss']:.6f} (3d {va['l3d']:.6f}) | mpjpe={va['mpjpe']:.3f}\n"
            f"Epoch time: {time.perf_counter()-t0:.2f}s",
            flush=True,
        )

        # Decide improvement BEFORE saving `last`, so the manifest records
        # the post-epoch best_val. The reference writes last.pt with the
        # PRE-update value (src/train.py:437-445), which lets a resume
        # restore a stale best_val and then overwrite `best` with a model
        # worse than the true best — fixed here, same policy otherwise.
        improved = (best_val - va["mpjpe"]) > cfg.optim.early_stop_min_delta
        if improved:
            best_val = va["mpjpe"]
            no_improve = 0
            # `best` commits BEFORE `last`: if the process dies between the
            # two saves, a resume sees the old last-manifest (old best_val)
            # and simply re-improves onto the already-good best; the other
            # order would pair the new best_val with stale best params.
            if write_ckpt:
                save_ckpt(cfg.outdir, "best", state, epoch, best_val, cfg_json)
        else:
            no_improve += 1
        if write_ckpt:
            save_ckpt(cfg.outdir, "last", state, epoch, best_val, cfg_json,
                      extra={"no_improve": no_improve})
        if main:
            _append_metrics(
                cfg.outdir,
                {
                    "epoch": epoch,
                    "lr": lr,
                    "train_loss": tr["loss"],
                    "train_mpjpe": tr["mpjpe"],
                    "val_loss": va["loss"],
                    "val_mpjpe": va["mpjpe"],
                    "val_bone": va.get("bone"),
                    "epoch_seconds": time.perf_counter() - t0,
                    "train_data_s": tr.get("_timing", {}).get("data"),
                    "train_step_s": tr.get("_timing", {}).get("step"),
                    "train_drain_s": tr.get("_timing", {}).get("drain"),
                    "val_data_s": va.get("_timing", {}).get("data"),
                    "val_step_s": va.get("_timing", {}).get("step"),
                    "val_drain_s": va.get("_timing", {}).get("drain"),
                },
            )

        if improved:
            log(f"New best val MPJPE: {best_val:.3f} (saved best)")
        else:
            log(
                f"No improvement for {no_improve}/{cfg.optim.early_stop_patience} "
                f"epochs (best {best_val:.3f}, current {va['mpjpe']:.3f})"
            )
        if cfg.optim.early_stop_patience > 0 and no_improve >= cfg.optim.early_stop_patience:
            log(f"Early stopping at epoch {epoch+1}. Best val MPJPE: {best_val:.3f}")
            break
        stop_after = getattr(cfg.optim, "stop_after_epochs", 0)
        if stop_after > 0 and (epoch - start_epoch + 1) >= stop_after:
            log(f"Stopping after {stop_after} epoch(s) this run "
                f"(--optim.stop-after-epochs; schedule targets "
                f"{cfg.optim.epochs} — resume with --resume to continue "
                "the exact trajectory)")
            break

    log(f"\nDone. Best val MPJPE: {best_val:.3f}")
    return state, best_val
