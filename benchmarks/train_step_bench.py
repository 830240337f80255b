"""On-chip train-step benchmark: XLA step vs --fused (Pallas fwd+bwd blocks).

Tunnel rules (memory/h36x-env-quirks): the loop runs in-jit via lax.fori_loop
with a data dependence through the carried TrainState and a tiny scalar
readout; wall-clock is best-of-N bursts because pool throughput varies.

Usage: python benchmarks/train_step_bench.py [--batch 64] [--steps 20]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from h36x.utils.runtime import setup_jax_cache

setup_jax_cache()


def build(batch: int, fused: bool, dropout: float):
    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.state import create_train_state, make_optimizer
    from h36x.train.step import make_train_step

    model = PHDFor3DJoints(latent_dim=1024, feature_dim=2048, joints_num=17,
                           number_blocks=2, dropout=dropout)
    optimizer, _ = make_optimizer(lr=1e-4, freeze_ar=True)
    state = create_train_state(model, optimizer, jax.random.key(0),
                               jnp.zeros((2, 40, 2048)))
    step = make_train_step(model, optimizer, donate=False, fused=fused)

    rng = np.random.default_rng(0)
    batch_t = (
        jnp.asarray(rng.normal(size=(batch, 40, 2048)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(batch, 40, 17, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(batch, 40, 17, 2)).astype(np.float32)),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))),
    )
    key = jax.random.key(1)

    def run(state, n_steps):
        def body(i, st):
            st2, _ = step(st, batch_t, jax.random.fold_in(key, i))
            return st2
        st = jax.lax.fori_loop(0, n_steps, body, state)
        return st.params["input_proj"]["bias"][:1]

    return state, jax.jit(run, static_argnums=1)


def bench(batch: int, steps: int, fused: bool, bursts: int = 4,
          dropout: float = 0.5) -> float:
    state, run = build(batch, fused, dropout)
    _ = jax.device_get(run(state, 1))  # compile
    best = float("inf")
    for _ in range(bursts):
        t0 = time.perf_counter()
        _ = jax.device_get(run(state, steps))
        dt = time.perf_counter() - t0
        best = min(best, dt / steps)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--bursts", type=int, default=4)
    ap.add_argument("--dropout", type=float, default=0.5)
    args = ap.parse_args(argv)

    xla = bench(args.batch, args.steps, fused=False, bursts=args.bursts,
                dropout=args.dropout)
    fus = bench(args.batch, args.steps, fused=True, bursts=args.bursts,
                dropout=args.dropout)
    rows = args.batch * 40
    print(f"batch={args.batch} T=40 latent=1024 blocks=2 dropout={args.dropout}")
    print(f"XLA   step: {xla*1e3:8.2f} ms  ({rows/xla:,.0f} frames/s)")
    print(f"fused step: {fus*1e3:8.2f} ms  ({rows/fus:,.0f} frames/s)")
    print(f"speedup: {xla/fus:.3f}x")


if __name__ == "__main__":
    main()
