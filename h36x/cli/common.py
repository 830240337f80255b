"""Shared CLI plumbing: checkpoint-recorded model-config resolution.

The reference re-types model hyper-parameters on every entry point
(/root/reference/src/results.py:175-187 builds the model from hard-coded
constants that must match train.py's); h36x instead records the full
training config in the checkpoint manifest and resolves it back here, so
`h36x-results --model-path runs/best.msgpack` reconstructs the trained
architecture with zero flags. Shape-visible mismatches (latent_dim,
num_blocks) fail loudly at param restore; the dangerous ones this guards
are shape-INVISIBLE: `groups` and `regressor_iters` change the math but
not the param tree, so a mismatch evaluates silently wrong.
"""

from __future__ import annotations

import dataclasses

from h36x.config import ModelConfig

# ModelConfig fields that define the architecture a checkpoint was trained
# with. dropout/dtype are deliberately excluded: they are train-time compute
# choices, not parameters of the saved function (eval never applies dropout,
# and serving may legitimately pick a different compute dtype).
ARCH_FIELDS = (
    "latent_dim", "feature_dim", "joints_num", "num_blocks",
    "ar_num_blocks", "groups", "kernel_size", "regressor_iters",
    "regressor_hidden",
)


def resolve_model_config(model_path, cli_values: dict,
                         ignore_recorded: bool = False,
                         quiet: bool = False) -> dict:
    """Merge model hyper-parameters: defaults <- recorded <- explicit flags.

    `cli_values` maps ARCH_FIELDS names to the argparse values, where None
    means "flag not given". Precedence per field:

    - flag given and it CONTRADICTS the manifest-recorded value -> raises
      SystemExit naming both values (pass --ignore-model-config /
      ignore_recorded=True to serve a deliberately different architecture);
    - flag given (no recorded value, or they agree) -> the flag;
    - no flag, recorded value exists -> the recorded value;
    - neither -> the ModelConfig dataclass default.

    Returns a full dict over ARCH_FIELDS. Checkpoints without a manifest
    (bare msgpacks, torch conversions) resolve exactly as before this
    existed: flags, then defaults.
    """
    from h36x.train.checkpoint import load_recorded_model_config

    defaults = dataclasses.asdict(ModelConfig())
    recorded = {} if ignore_recorded else load_recorded_model_config(model_path)

    resolved = {}
    conflicts = []
    from_manifest = []
    for field in ARCH_FIELDS:
        flag = cli_values.get(field)
        rec = recorded.get(field)
        if flag is not None and rec is not None and flag != rec:
            conflicts.append(f"{field}: flag {flag!r} vs recorded {rec!r}")
        if flag is not None:
            resolved[field] = flag
        elif rec is not None:
            resolved[field] = rec
            if rec != defaults[field]:
                from_manifest.append(f"{field}={rec}")
        else:
            resolved[field] = defaults[field]
    if conflicts:
        raise SystemExit(
            "model flags contradict the architecture recorded in the "
            f"checkpoint manifest next to {model_path}:\n  "
            + "\n  ".join(conflicts)
            + "\n(drop the flags to use the recorded config, or pass "
            "--ignore-model-config to override it deliberately)")
    if from_manifest and not quiet:
        print("Model config from checkpoint manifest: "
              + " ".join(from_manifest))
    return resolved


def build_model_from_arch(mc: dict, feature_dim=None):
    """Construct PHDFor3DJoints from a resolved ARCH_FIELDS dict.

    ONE constructor call for every consumer CLI (results/predict/export/
    parity): hand-copied subsets drifted twice into shape-invisible bugs
    (parity dropping groups/regressor_iters, results' fused path dropping
    joints_num — review findings, round 4). `feature_dim` overrides the
    resolved value where the data is authoritative (parity's NPZ batch).
    """
    from h36x.models.phd import PHDFor3DJoints

    return PHDFor3DJoints(
        latent_dim=mc["latent_dim"],
        feature_dim=(feature_dim if feature_dim is not None
                     else mc["feature_dim"]),
        joints_num=mc["joints_num"],
        number_blocks=mc["num_blocks"],
        ar_blocks=mc["ar_num_blocks"],
        groups=mc["groups"],
        kernel_size=mc["kernel_size"],
        regressor_iters=mc["regressor_iters"],
        regressor_hidden=mc["regressor_hidden"],
    )


def add_model_config_flags(parser, fields=("latent_dim", "num_blocks",
                                           "groups", "regressor_iters")):
    """Register the standard model-shape flags with a None sentinel default
    (so resolve_model_config can tell "not given" from "typed the default"),
    plus --ignore-model-config."""
    helps = {
        "latent_dim": "f_movie latent width",
        "num_blocks": "f_movie residual depth",
        "groups": "GroupNorm groups (shape-invisible: a mismatch with the "
                  "training config evaluates silently wrong)",
        "regressor_iters": "joint-regressor refinement rounds "
                           "(shape-invisible too)",
    }
    for field in fields:
        parser.add_argument(f"--{field.replace('_', '-')}", type=int,
                            default=None,
                            help=f"{helps.get(field, field)}; default: the "
                                 "value recorded in the checkpoint manifest "
                                 "(falls back to the training default)")
    parser.add_argument("--ignore-model-config", action="store_true",
                        help="ignore the architecture recorded in the "
                             "checkpoint manifest and use flags/defaults")
