"""Unified configuration for every pipeline stage.

The reference spreads configuration over three mechanisms — module constants
(reference src/config.py:4-21), per-stage argparse (src/train.py:283-299,
src/preprocess_resnet_features.py:136-155) and absl flags
(src/datasets/read_human_36m.py:36-43). Here a single dataclass hierarchy owns
the defaults and every CLI builds on :func:`parse_into` for overrides.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import typing
from dataclasses import dataclass, field
from typing import List, Optional, Sequence


# ---------------------------------------------------------------------------
# Data / clip geometry defaults (reference src/config.py:8-15)
# ---------------------------------------------------------------------------

FRAME_SKIP = 2  # temporal subsampling applied when decoding video
SEQ_LEN = 40  # frames per clip (after subsampling)
INPUT_LEN = 15  # warm-up frames for future prediction
PRED_LEN = 25  # autoregressive prediction horizon
JOINTS_NUM = 17  # H36M 17-joint skeleton
FEATURE_DIM = 2048  # ResNet-50 pooled feature width

# Training defaults (reference src/config.py:18-21, src/train.py:283-299)
LATENT_DIM = 1024  # model latent ("movie strip") width used by train.py:370
BATCH_SIZE = 32
LR = 1e-4
EPOCHS = 50
CURRICULUM_STEPS = 25

TRAIN_SUBJECTS = (1, 6, 7, 8)
VAL_SUBJECTS = (5,)
TEST_SUBJECTS = (9,)
ALL_SUBJECTS = (1, 5, 6, 7, 8, 9, 11)


@dataclass
class DataConfig:
    """Feature-store read configuration for training.

    Only knobs the training stack actually consumes live here (extraction
    windowing — stride/resize/crop — belongs to ExtractConfig): dead
    fields would parse as CLI flags and then be silently ignored.
    """

    seq_len: int = SEQ_LEN
    shard_cache_size: int = -1  # -1: auto (64 for the training set; other
    #   consumers use FeatureClipDataset's own default of 2)
    # >0: print shard-cache load/hit counts every N disk loads (the
    # reference's cache-thrash observability, dataset_features.py:101-105)
    log_shard_loads: int = 0
    max_clips: Optional[int] = None  # truncate the train set (smoke runs)
    # train on all stored variants (the reference's behavior); false reads
    # only the 'orig' rows
    augment: bool = True
    # dtype the FEATURE arrays cross the host->device link in (float32 |
    # bfloat16 | float16). Features are ~96% of a batch's bytes; bfloat16
    # halves the transfer on feed-bound links at ~3 decimal digits of
    # feature precision (the model computes in its own dtype either way;
    # joints/K always travel f32). Applies to train AND val sets.
    feed_dtype: str = "float32"


@dataclass
class ModelConfig:
    """PHD model hyper-parameters (reference src/model.py:127-146, train.py:370)."""

    latent_dim: int = LATENT_DIM
    feature_dim: int = FEATURE_DIM
    joints_num: int = JOINTS_NUM
    num_blocks: int = 2  # f_movie depth used in training (train.py:370)
    ar_num_blocks: int = 3  # f_AR depth (model.py:143 default)
    regressor_iters: int = 3
    regressor_hidden: int = 1024
    dropout: float = 0.5
    groups: int = 32
    kernel_size: int = 3
    # compute dtype: 'float32' or 'bfloat16' (mixed precision: bf16 matmuls
    # and activations, f32 params/optimizer/GroupNorm statistics)
    dtype: str = "float32"


@dataclass
class OptimConfig:
    lr: float = LR
    weight_decay: float = 1e-2
    epochs: int = EPOCHS
    batch_size: int = BATCH_SIZE
    freeze_ar: bool = True  # phase-1: f_AR frozen (reference train.py:373-376)
    phase: int = 1  # 1: train f_movie+f_3D; 2: train f_AR (curriculum); 0: all
    input_len: int = INPUT_LEN
    pred_len: int = PRED_LEN
    curriculum_steps: int = CURRICULUM_STEPS
    lambda_future: float = 1.0
    early_stop_patience: int = 10
    early_stop_min_delta: float = 0.0
    # run at most this many epochs THIS invocation, then exit cleanly with
    # `last` saved — the LR/curriculum schedule still targets `epochs`, so
    # a later --resume continues the exact uninterrupted trajectory
    # (bounded compute windows: spot/preemptible instances, smoke drills).
    # 0 = no bound.
    stop_after_epochs: int = 0
    # 2D reprojection loss weight. The reference CLI defines --lambda-2d
    # (train.py:291, default 1e-6) but never adds the term to the loss
    # (:161-164); h36x wires it for real. 0.0 == reference behavior.
    lambda_2d: float = 0.0
    seed: int = 0
    log_every: int = 500
    # Train the phase-1 step through the fused Pallas residual blocks
    # (precise 3-pass MXU matmuls, Pallas forward AND backward kernels).
    fused: bool = False
    # >1: lax.scan that many optimizer updates into ONE dispatch (stacked
    # batch group, dropout rng carried on device). Identical parameter
    # trajectory to 1; amortizes the per-dispatch host overhead, which is
    # comparable to the step itself for a model this size. Phase 1 only.
    steps_per_dispatch: int = 1
    # >1: gradient accumulation — one optimizer update over the mean grad
    # of that many microbatches (effective batch = grad_accum * batch_size
    # at microbatch memory). Exclusive with steps_per_dispatch; phase 1.
    grad_accum: int = 1


@dataclass
class MeshConfig:
    """Device mesh layout. data = batch sharding, model = tensor parallel,
    slices > 1 adds a leading DCN axis for multislice pods (batch shards
    over slice x data; params replicate over slice)."""

    data: int = -1  # -1: use all devices on the data axis
    model: int = 1
    slices: int = 1


@dataclass
class DistConfig:
    """Multi-process (multi-host) launch. The reference is single-node only
    (SURVEY §2: no torch.distributed anywhere); h36x runs one Python process
    per host with jax.distributed + collectives over ICI/DCN.

    Leave num_processes=1 for single-host. On a pod, every host runs the
    same CLI with its own process_id; the feature store must be on shared
    storage and each process materializes only its local_batch_slice rows.
    platform/local_devices/collectives exist for CPU bring-up and CI
    (e.g. platform=cpu local_devices=2 collectives=gloo exercises the real
    cross-process path without TPUs)."""

    coordinator: str = ""  # host:port of process 0
    num_processes: int = 1
    process_id: int = -1  # -1: resolve from the cluster env (SLURM/TPU)
    platform: str = ""  # force a jax platform before init (e.g. 'cpu')
    local_devices: int = 0  # >0: jax_num_cpu_devices per process (cpu only)
    collectives: str = ""  # cpu collectives impl ('gloo' | 'mpi')


@dataclass
class TrainConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    dist: DistConfig = field(default_factory=DistConfig)
    train_root: str = ""
    val_root: str = ""
    outdir: str = "./runs/phase1"
    resume: str = ""
    init_from: str = ""  # warm-start weights from a checkpoint .msgpack
    train_subjects: List[int] = field(default_factory=lambda: list(TRAIN_SUBJECTS))
    val_subjects: List[int] = field(default_factory=lambda: list(VAL_SUBJECTS))
    profile_dir: str = ""  # jax profiler traces for epoch 1 when set
    # Checkpoint storage: "msgpack" (flax blob + JSON, single-host) or
    # "orbax" (OCDBT directory; sharding-aware multi-host save/restore).
    # Resume autodetects from disk, so this only selects the save format.
    ckpt_backend: str = "msgpack"


@dataclass
class ExtractConfig:
    """Feature-extraction stage (reference src/preprocess_resnet_features.py:136-155)."""

    root: str = ""
    out: str = ""
    seq_len: int = SEQ_LEN
    frame_skip: int = FRAME_SKIP
    stride: int = 5
    resize: int = 224
    batch_size: int = 32
    num_workers: int = 8
    subjects: List[int] = field(default_factory=lambda: list(ALL_SUBJECTS))
    save_fp16: bool = False
    augment: bool = False
    shard_size: int = 512  # clips per shard file
    shuffle_pool: int = 8192  # clips buffered before a shuffled flush
    shuffle_pool_gb: float = 8.0  # host-RAM budget for that buffer: flush
    #   early once the buffered arrays reach this many GiB (the clip count
    #   alone is a silent ~10.7 GB OOM at the augmented defaults — DESIGN.md
    #   "Shuffle pool host RAM"). Moves rows between shards, never changes
    #   row bytes. 0 = unbounded (legacy clip-count-only behavior)
    shuffle_seed: int = 123
    weights: str = ""  # optional path to a converted ResNet-50 checkpoint
    resume: bool = False  # continue an interrupted extraction (progress.json)
    # read the finished store back and recompute every shard's CRC32s
    # (shards.verify_store): catches a lying disk/page cache immediately
    # after the write instead of at training time
    verify_after: bool = False
    engine: str = "flax"  # 'flax' (bit-stable parity path) or 'opt'
    #   (folded BN/normalize + s2d stem, ~2% faster, ~3e-3 numeric shuffle)
    partition: str = ""  # "i/N": extract only clips i::N of the index —
    #   N independent single-host jobs over shared storage, each writing its
    #   own part store; h36x-merge-shards unifies them (multi-host scale-out
    #   without any cross-host coordination)
    partition_by: str = "clip"  # 'clip' (round-robin clips, preserves the
    #   legacy semantics) or 'video' (round-robin whole videos — each video
    #   is decoded by exactly one job, the right choice with --dedup)
    dedup: bool = True  # unique-frame scheduling (h36x/extract/dedup.py):
    #   sequential per-video decode + content-addressed (frame, crop-box)
    #   feature cache; byte-identical store, ~2.4x less device work at the
    #   reference stride/seq_len when crop boxes are stable across windows
    crop_scope: str = "auto"  # 'auto' (round 5) = 'video' on the
    #   unique-frame scheduler (PRODUCTION profile: one box per video,
    #   looser crop, guarantees full dedup) and 'clip' on the per-clip
    #   scheduler. 'clip' = strict reference parity (box from the clip's
    #   40-frame joint window, src/dataset.py:395-400). The video/video
    #   production profile is measured training-quality-neutral at a
    #   pre-registered 10% non-inferiority margin
    #   (benchmarks/jitter_key_experiment.py, DESIGN.md "Jitter
    #   re-keying"); pass --crop-scope clip --jitter-key clip for
    #   byte-level reference store semantics
    jitter_key: str = "auto"  # color-jitter rng keying: 'auto' (round 5)
    #   = 'video' on the unique-frame scheduler (PRODUCTION: jittered
    #   variant deterministic per frame -> dedupable, 8x total at stride
    #   5; 'frame' equivalent throughput) and 'clip' on the per-clip
    #   scheduler. 'clip' = reference parity (one factor set per clip —
    #   jitter pass not dedupable). Same evidence trail as crop_scope
    frames_per_dispatch: int = 0  # device batch rows for the dedup path;
    #   0 = auto (batch_size * seq_len * pixel-variants, one compiled shape)


@dataclass
class IngestConfig:
    """Raw-H36M ingestion (reference src/datasets/read_human_36m.py:36-43)."""

    source_dir: str = ""
    out_dir: str = ""
    subjects: List[int] = field(default_factory=lambda: list(ALL_SUBJECTS))


# ---------------------------------------------------------------------------
# CLI plumbing: every dataclass field becomes a --dotted.path flag.
# ---------------------------------------------------------------------------


def _add_fields(parser: argparse.ArgumentParser, cfg, prefix: str = "") -> None:
    for f in dataclasses.fields(cfg):
        name = f"{prefix}{f.name}"
        value = getattr(cfg, f.name)
        if dataclasses.is_dataclass(value):
            _add_fields(parser, value, prefix=f"{name}.")
            continue
        flag = "--" + name.replace("_", "-")
        if isinstance(value, bool):
            parser.add_argument(flag, type=_parse_bool, default=None)
        elif isinstance(value, list):
            # element type from the List[...] annotation, not a blanket
            # int (under `from __future__ import annotations` f.type is a
            # string, so resolve the real hint once per dataclass type)
            hints = typing.get_type_hints(type(cfg))
            args = typing.get_args(hints.get(f.name, None))
            elem = args[0] if args and args[0] in (int, float, str) else int
            parser.add_argument(flag, type=elem, nargs="*", default=None)
        elif value is None:
            parser.add_argument(flag, type=int, default=None)
        else:
            parser.add_argument(flag, type=type(value), default=None)


def _parse_bool(s: str) -> bool:
    if s.lower() in ("1", "true", "yes", "on"):
        return True
    if s.lower() in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"not a boolean: {s!r}")


def _apply(cfg, dotted: str, value) -> None:
    head, _, rest = dotted.partition(".")
    if rest:
        _apply(getattr(cfg, head), rest, value)
    else:
        setattr(cfg, head, value)


def parse_into(cfg, argv: Optional[Sequence[str]] = None, description: str = ""):
    """Parse CLI arguments into (a copy of) the given config dataclass."""
    parser = argparse.ArgumentParser(description=description)
    _add_fields(parser, cfg)
    ns = parser.parse_args(argv)
    out = dataclasses.replace(cfg)

    # dataclasses.replace is shallow; detach nested dataclasses AND list
    # fields so in-place edits on the returned config never leak back into
    # the template (or into sibling parse_into results).
    def _detach(dc):
        for f in dataclasses.fields(dc):
            v = getattr(dc, f.name)
            if dataclasses.is_dataclass(v):
                setattr(dc, f.name, dataclasses.replace(v))
                _detach(getattr(dc, f.name))
            elif isinstance(v, list):
                setattr(dc, f.name, list(v))

    _detach(out)
    for key, value in vars(ns).items():
        if value is None:
            continue
        _apply(out, key.replace("-", "_"), value)
    return out


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)
