"""Train state and optimizer construction.

Optimizer parity with the reference (src/train.py:386-393): AdamW
(weight_decay 1e-2) over trainable params only, cosine-annealed learning rate
stepped once per epoch with T_max = epochs, and the phase-1 freeze of every
f_AR parameter (src/train.py:373-376).

On TPU the whole step runs in bf16-friendly f32 master params — there is no
GradScaler equivalent needed (the reference's fp16 scaler at train.py:392 is
a CUDA artifact).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32, number of optimizer steps taken


def cosine_lr(epoch: int, base_lr: float, total_epochs: int, min_lr: float = 0.0) -> float:
    """Per-epoch cosine annealing: lr(e) = min + (base-min)(1+cos(pi e/T))/2."""
    t = min(epoch, total_epochs)
    return min_lr + (base_lr - min_lr) * 0.5 * (1.0 + math.cos(math.pi * t / total_epochs))


def _freeze_labels(params, frozen_prefixes):
    """Label tree: 'frozen' under any of frozen_prefixes (top-level module
    names), 'trainable' elsewhere."""

    def label_subtree(tree, label):
        return jax.tree.map(lambda _: label, tree)

    if not frozen_prefixes:
        return label_subtree(params, "trainable")
    frozen = set(frozen_prefixes)
    missing = frozen - set(params.keys())
    if missing:
        # an unmatched prefix (module renamed, or a typo in PHASE_FROZEN)
        # would silently train the supposedly frozen weights — a quiet
        # parity break with the reference's requires_grad=False freeze
        raise ValueError(
            f"frozen module(s) {sorted(missing)} not found in params "
            f"(top-level modules: {sorted(params.keys())})"
        )
    out = {}
    for key, sub in params.items():
        out[key] = label_subtree(sub, "frozen" if key in frozen else "trainable")
    return out


# Training phases (reference phase-1: src/train.py:373-376; phase-2 is the
# PHD paper's AR-predictor stage the reference stubbed via
# CURRICULUM_STEPS/PRED_LEN in config.py:8-21).
PHASE_FROZEN = {
    1: ("f_AR",),
    2: ("f_movie", "f_3D", "input_proj"),
    0: (),  # train everything
}


def make_optimizer(
    lr: float,
    weight_decay: float = 1e-2,
    freeze_ar: bool = True,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    phase: Optional[int] = None,
):
    """AdamW with an injectable learning rate and per-phase module freezing.

    The learning rate lives in the optimizer state (optax.inject_hyperparams)
    so the epoch loop can set the cosine-annealed value without recompiling
    the jitted step. `phase` overrides `freeze_ar` when given.
    """
    trainable = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
    )
    if phase is None:
        frozen = ("f_AR",) if freeze_ar else ()
    else:
        frozen = PHASE_FROZEN[phase]
    if not frozen:
        return trainable, ()  # same type either way; () means nothing frozen

    def label_fn(params):
        return _freeze_labels(params, frozen)

    tx = optax.multi_transform(
        {"trainable": trainable, "frozen": optax.set_to_zero()}, label_fn
    )
    return tx, frozen


def set_learning_rate(opt_state, lr: float, freeze_ar: bool = True):
    """Update the injected learning rate inside the optimizer state.

    Handles both the plain-AdamW and the multi_transform (frozen modules)
    state layouts; `freeze_ar` is accepted for API compatibility but the
    layout is detected from the state itself.
    """
    del freeze_ar
    if hasattr(opt_state, "inner_states"):
        inner = opt_state.inner_states["trainable"].inner_state
        inner.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    else:
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def create_train_state(model, optimizer, rng, example_feats) -> TrainState:
    variables = model.init(rng, example_feats)
    params = variables["params"]
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
