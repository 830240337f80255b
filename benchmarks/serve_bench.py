"""On-chip serving benchmark: window forward, AR rollout, streaming pushes.

Measures the three serving modes of h36x/serve.py at the production model
config (latent 1024, 2 blocks, 2048-d features, 40-frame window):

  forward   batch window inference (joints for every frame of the window)
  rollout   autoregressive future prediction (window + `--forecast` steps)
  stream    per-frame push, exact sliding-GN path vs frozen O(1) path

Tunnel rules (memory/h36x-env-quirks): every loop runs in-jit via
lax.fori_loop with a data dependence through the carry and a tiny scalar
readout; wall-clock is best-of-N bursts because pool throughput varies.

Usage: python benchmarks/serve_bench.py [--batch 64] [--forecast 25]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from h36x.utils.runtime import setup_jax_cache

setup_jax_cache()

WINDOW, FEAT, LATENT, BLOCKS, J = 40, 2048, 1024, 2, 17


def _params():
    from h36x.models.phd import PHDFor3DJoints

    model = PHDFor3DJoints(latent_dim=LATENT, feature_dim=FEAT, joints_num=J,
                           number_blocks=BLOCKS)
    return jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, WINDOW, FEAT)))["params"]
    )


def _time_best(run, iters: int, bursts: int) -> float:
    _ = jax.device_get(run(1))  # compile
    best = float("inf")
    for _ in range(bursts):
        t0 = time.perf_counter()
        _ = jax.device_get(run(iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_forward(params, batch: int, iters: int, bursts: int) -> float:
    """ms per batched window forward (joints for all WINDOW frames)."""
    from h36x.infer import phd_forward_fused

    feats = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, WINDOW, FEAT)),
        jnp.float32,
    )

    @jax.jit
    def run(n):
        def body(i, f):
            joints = phd_forward_fused(params, f, use_pallas=False)[2]
            # data dependence: next input nudged by this output's mean
            return f + 1e-12 * jnp.mean(joints)
        return jax.lax.fori_loop(0, n, body, feats)[0, 0, 0]

    return _time_best(run, iters, bursts)


def bench_rollout(params, batch: int, steps: int, iters: int,
                  bursts: int) -> float:
    """ms per AR rollout extending the window by `steps` future frames."""
    from h36x.serve import _rollout

    feats = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, WINDOW, FEAT)),
        jnp.float32,
    )

    @jax.jit
    def run(n):
        def body(i, f):
            _, fut, _ = _rollout(params, f, steps, J, 32, False)
            return f + 1e-12 * jnp.mean(fut)
        return jax.lax.fori_loop(0, n, body, feats)[0, 0, 0]

    return _time_best(run, iters, bursts)


def bench_stream(params, frozen: bool, iters: int, bursts: int) -> float:
    """ms per streamed frame (device step only; decode/transfer excluded).

    exact path: temporal net reruns over the window each push (sliding
    GroupNorm statistics — the model's own semantics); frozen path: O(1)
    incremental step with pinned statistics."""
    from h36x.serve import StreamingPredictor

    sp = StreamingPredictor(params, window=WINDOW, feature_dim=FEAT,
                            joints_num=J)
    sp.push(np.zeros(FEAT, np.float32))  # init ring buffer
    xbuf = sp._xbuf

    if frozen:
        stats, state = sp._capture(params, xbuf)

        @jax.jit
        def run(n):
            def body(i, carry):
                xbuf, st = carry
                xnew = xbuf[0, -1] * 0.999 + 1e-4  # depends on prior push
                xbuf, st, joints = sp._frozen_step(params, xbuf, stats, st,
                                                   xnew)
                return xbuf + 1e-12 * jnp.mean(joints), st
            out, _ = jax.lax.fori_loop(0, n, body, (xbuf, state))
            return out[0, 0, 0]

    else:

        @jax.jit
        def run(n):
            def body(i, xbuf):
                xnew = xbuf[0, -1] * 0.999 + 1e-4
                xbuf, joints = sp._step(params, xbuf, xnew)
                return xbuf + 1e-12 * jnp.mean(joints)
            return jax.lax.fori_loop(0, n, body, xbuf)[0, 0, 0]

    return _time_best(run, iters, bursts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--forecast", type=int, default=25)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bursts", type=int, default=4)
    args = ap.parse_args(argv)

    params = _params()
    print(f"model: latent={LATENT} blocks={BLOCKS} window={WINDOW} "
          f"feature_dim={FEAT}")

    for b in (1, args.batch):
        fw = bench_forward(params, b, args.iters, args.bursts)
        print(f"forward  B={b:3d}: {fw*1e3:8.2f} ms/window "
              f"({b * WINDOW / fw:,.0f} frames/s)")
    for b in (1, args.batch):
        ro = bench_rollout(params, b, args.forecast, args.iters, args.bursts)
        print(f"rollout  B={b:3d} +{args.forecast}: {ro*1e3:8.2f} ms "
              f"({b / ro:,.1f} rollouts/s)")
    ex = bench_stream(params, frozen=False, iters=args.iters,
                      bursts=args.bursts)
    fz = bench_stream(params, frozen=True, iters=args.iters,
                      bursts=args.bursts)
    print(f"stream exact : {ex*1e3:8.3f} ms/push ({1/ex:,.0f} fps)")
    print(f"stream frozen: {fz*1e3:8.3f} ms/push ({1/fz:,.0f} fps, "
          f"{ex/fz:.2f}x vs exact)")


if __name__ == "__main__":
    main()
