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


def _freeze_labels(params, frozen_prefix: Optional[str]):
    """Label tree: 'frozen' under frozen_prefix (a top-level module name),
    'trainable' elsewhere."""

    def label_subtree(tree, label):
        return jax.tree.map(lambda _: label, tree)

    if frozen_prefix is None:
        return label_subtree(params, "trainable")
    out = {}
    for key, sub in params.items():
        out[key] = label_subtree(sub, "frozen" if key == frozen_prefix else "trainable")
    return out


def make_optimizer(
    lr: float,
    weight_decay: float = 1e-2,
    freeze_ar: bool = True,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """AdamW with an injectable learning rate and optional f_AR freeze.

    The learning rate lives in the optimizer state (optax.inject_hyperparams)
    so the epoch loop can set the cosine-annealed value without recompiling
    the jitted step.
    """
    trainable = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
    )
    if not freeze_ar:
        return trainable, None

    def label_fn(params):
        return _freeze_labels(params, "f_AR")

    tx = optax.multi_transform(
        {"trainable": trainable, "frozen": optax.set_to_zero()}, label_fn
    )
    return tx, "f_AR"


def set_learning_rate(opt_state, lr: float, freeze_ar: bool = True):
    """Update the injected learning rate inside the optimizer state."""
    if freeze_ar:
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
