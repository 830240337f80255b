"""Probe: host-dispatch amortization of the multi-step scan train step.

The PHD update is a few ms of device work (DESIGN.md: 4.6 ms at B=64,T=40),
so per-dispatch host overhead is a real tax on training throughput — ~24 ms
on this tunneled dev runtime, ~0.1-1 ms on a production host. scan_steps=k
(h36x/train/step.py) folds k full optimizer updates into one dispatch via
lax.scan, paying that overhead once per k steps with an identical parameter
trajectory.

This probe isolates exactly that: batches are device-resident (no transfer),
and each timed burst ends in a device_get of a small param slice that
depends on every step (the only trustworthy sync on this tunnel —
block_until_ready does not reliably block here). Timed per optimizer STEP,
best of N bursts.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from h36x.utils.runtime import setup_jax_cache

setup_jax_cache()


def build(batch: int, k: int):
    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.state import create_train_state, make_optimizer
    from h36x.train.step import make_train_step

    model = PHDFor3DJoints(latent_dim=1024, feature_dim=2048, joints_num=17,
                           number_blocks=2, dropout=0.5)
    optimizer, _ = make_optimizer(lr=1e-4, freeze_ar=True)
    state = create_train_state(model, optimizer, jax.random.key(0),
                               jnp.zeros((2, 40, 2048)))
    step = make_train_step(model, optimizer, donate=False, scan_steps=k)

    rng = np.random.default_rng(0)
    one = (
        jnp.asarray(rng.normal(size=(batch, 40, 2048)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(batch, 40, 17, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(batch, 40, 17, 2)).astype(np.float32)),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))),
    )
    if k > 1:
        one = tuple(jnp.broadcast_to(x[None], (k,) + x.shape) for x in one)
    return state, step, one


def bench(batch: int, k: int, n_steps: int, bursts: int) -> float:
    """Seconds per optimizer step at scan_steps=k over a host dispatch loop."""
    state, step, batch_t = build(batch, k)
    key = jax.random.key(1)
    n_disp = max(1, n_steps // k)

    def burst(state, key):
        for _ in range(n_disp):
            if k > 1:
                state, _, key = step(state, batch_t, key)
            else:
                key, sub = jax.random.split(key)
                state, _ = step(state, batch_t, sub)
        # sync through a value that depends on every dispatched step
        _ = jax.device_get(state.params["input_proj"]["bias"][:1])
        return state

    state = burst(state, key)  # compile + warm
    best = float("inf")
    for _ in range(bursts):
        t0 = time.perf_counter()
        state = burst(state, key)
        best = min(best, (time.perf_counter() - t0) / (n_disp * k))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=32, help="updates per burst")
    ap.add_argument("--bursts", type=int, default=4)
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 4, 8, 16])
    args = ap.parse_args(argv)

    base = None
    for k in args.ks:
        sec = bench(args.batch, k, args.steps, args.bursts)
        base = base or sec
        print(f"scan_steps={k:3d}: {sec*1e3:7.2f} ms/step  "
              f"({base/sec:4.2f}x vs k={args.ks[0]})", flush=True)


if __name__ == "__main__":
    main()
