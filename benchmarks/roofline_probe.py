"""Burst decomposition + train-step roofline (VERDICT r3 items #2/#4).

Stage A — where the headline's last 9% lives. bench.py times bursts of
`iters` backbone steps: one tunnel dispatch (~24 ms here) + iters in-jit
steps. Timing bursts of several lengths and fitting t(n) = fixed + n*step
separates the chip's per-step time from the fixed dispatch/readout cost the
burst length amortizes. Also times the backbone on PRE-normalized bf16
input to check whether the u8->f32->normalize->bf16 chain costs a separate
HBM pass (if XLA fuses it into conv1's input, the delta is ~0).

Stage B — train-step roofline at the config of record (B=32, T=40,
latent 1024, blocks 2, dropout on): XLA cost analysis (FLOPs, bytes) of the
EXACT jitted step + measured per-step time from in-jit bursts (readout
depends on params — the DCE trap, memory/h36x-env-quirks.md), for phase 1
and phase 2. Achieved TF/s and GB/s against the v5e's ~197 TF bf16 /
~819 GB/s say which wall the step sits under; the same fit as stage A says
what fraction of a dispatched step is tunnel overhead.

Usage: python -m benchmarks.roofline_probe [--stage a|b|all] [--batch 960]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

from h36x.utils.runtime import setup_jax_cache

setup_jax_cache()


def _fit_fixed_plus_linear(ns, ts):
    """Least-squares t = fixed + n*step; returns (fixed, step)."""
    A = np.stack([np.ones_like(ns, dtype=np.float64),
                  np.asarray(ns, np.float64)], axis=1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(ts, np.float64), rcond=None)
    return float(coef[0]), float(coef[1])


def stage_a(batch=960, out_hw=224, reps=4):
    import jax
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints  # noqa: F401 (import parity)
    from h36x.models.resnet import ResNet50, init_resnet_params
    from h36x.ops.preprocess import imagenet_normalize

    model = ResNet50(dtype=jnp.bfloat16)
    variables = init_resnet_params(model, jax.random.key(0))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(batch, out_hw, out_hw, 3)), dtype=jnp.uint8)

    @partial(jax.jit, static_argnums=2)
    def loop(variables, frames, n):
        def body(i, carry):
            fr, acc = carry
            video = imagenet_normalize(fr.astype(jnp.float32) * (1.0 / 255.0))
            feats = model.apply(variables, video.astype(jnp.bfloat16))
            s = feats.mean()
            fr = fr + (s * 0).astype(jnp.uint8) + (i % 2).astype(jnp.uint8)
            return fr, acc + s
        return jax.lax.fori_loop(0, n, body, (frames, jnp.zeros((), jnp.float32)))[1]

    # pre-normalized bf16 input: same conv pipeline, no u8->f32 chain
    pre = imagenet_normalize(
        np.asarray(frames, np.float32) * (1.0 / 255.0)).astype(jnp.bfloat16)

    @partial(jax.jit, static_argnums=2)
    def loop_pre(variables, x, n):
        def body(i, carry):
            xx, acc = carry
            feats = model.apply(variables, xx)
            s = feats.mean().astype(jnp.float32)
            # float mul-by-zero is not folded (NaN semantics), so this alone
            # carries the data dependence that defeats loop hoisting
            xx = xx + (s * 0).astype(jnp.bfloat16)
            return xx, acc + s
        return jax.lax.fori_loop(0, n, body, (x, jnp.zeros((), jnp.float32)))[1]

    out = {"batch": batch}
    ns = [1, 2, 5, 10, 20]
    for name, fn, arg in (("u8", loop, frames), ("prenorm_bf16", loop_pre, pre)):
        for n in ns:
            float(fn(variables, arg, n))  # warm each executable
        best = {}
        for n in ns:
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(fn(variables, arg, n))
                ts.append(time.perf_counter() - t0)
            best[n] = min(ts)
        fixed, step = _fit_fixed_plus_linear(ns, [best[n] for n in ns])
        out[name] = {
            "best_s_by_iters": {str(n): round(best[n], 4) for n in ns},
            "fixed_overhead_ms": round(fixed * 1e3, 2),
            "per_step_ms": round(step * 1e3, 3),
            "pure_frames_per_sec": round(batch / step, 1),
            "frames_per_sec_at_iters5": round(batch * 5 / best[5], 1),
            "frames_per_sec_at_iters20": round(batch * 20 / best[20], 1),
        }
    a, b = out["u8"]["per_step_ms"], out["prenorm_bf16"]["per_step_ms"]
    out["normalize_chain_ms_per_step"] = round(a - b, 3)
    return out


def _roofline_step(step_builder, state, args, readout, iters=(5, 20, 80),
                   reps=5):
    """Time a train step via in-jit bursts and return the linear fit."""
    import jax

    @partial(jax.jit, static_argnums=2)
    def loop(state, rng, n):
        def body(i, carry):
            st, r = carry
            r, sub = jax.random.split(r)
            st, _ = step_builder(st, args, sub)
            return st, r
        st, _ = jax.lax.fori_loop(0, n, body, (state, rng))
        return readout(st)

    for n in iters:
        float(loop(state, jax.random.key(1), n))
    best = {}
    for n in iters:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(state, jax.random.key(1), n))
            ts.append(time.perf_counter() - t0)
        best[n] = min(ts)
    fixed, step_s = _fit_fixed_plus_linear(list(iters),
                                           [best[n] for n in iters])
    return best, fixed, step_s


def stage_b(batch=32, t_len=40):
    import jax
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.state import create_train_state, make_optimizer
    from h36x.train.step import make_future_train_step, make_train_step

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(batch, t_len, 2048)).astype(np.float32))
    j3d = jnp.asarray(
        rng.normal(size=(batch, t_len, 17, 3)).astype(np.float32) * 0.1)
    j2d = jnp.asarray(rng.normal(size=(batch, t_len, 17, 2)).astype(np.float32))
    K = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1)))
    batch_t = (feats, j3d, j2d, K)

    out = {"batch": batch, "t_len": t_len}
    model = PHDFor3DJoints(latent_dim=1024, feature_dim=2048, joints_num=17,
                           number_blocks=2, dropout=0.25)

    for phase in (1, 2):
        optimizer, _ = make_optimizer(lr=1e-4, phase=phase)
        state = create_train_state(model, optimizer, jax.random.key(0),
                                   jnp.zeros((2, t_len, 2048)))
        if phase == 1:
            step = make_train_step(model, optimizer, donate=False)
            call = lambda st, b, r: step(st, b, r)  # noqa: E731
            lowered = jax.jit(
                lambda st, b, r: step(st, b, r)).lower(state, batch_t,
                                                       jax.random.key(1))
        else:
            fstep = make_future_train_step(model, optimizer, input_len=15,
                                           pred_len=25, donate=False)
            h = jnp.int32(25)
            call = lambda st, b, r: fstep(st, b, r, h)  # noqa: E731
            lowered = jax.jit(
                lambda st, b, r: fstep(st, b, r, h)).lower(state, batch_t,
                                                           jax.random.key(1))
        cost = lowered.compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))

        # readout must depend on a param THE PHASE ACTUALLY TRAINS or XLA
        # dead-codes the whole grad computation (the DCE trap): phase 2
        # freezes input_proj/f_movie/f_3D (state.PHASE_FROZEN), so reading
        # input_proj there lets the compiler delete every step in the burst
        # (observed: negative fitted per-step time).
        if phase == 1:
            readout = lambda st: st.params["input_proj"]["kernel"][0, 0]  # noqa: E731
        else:
            readout = lambda st: jax.tree_util.tree_leaves(  # noqa: E731
                st.params["f_AR"])[0].reshape(-1)[0]
        best, fixed, step_s = _roofline_step(call, state, batch_t, readout)
        out[f"phase{phase}"] = {
            "flops_per_step": flops,
            "bytes_per_step": bytes_acc,
            "arithmetic_intensity": round(flops / max(bytes_acc, 1.0), 2),
            "best_s_by_iters": {str(k): round(v, 4) for k, v in best.items()},
            "fixed_overhead_ms": round(fixed * 1e3, 2),
            "per_step_ms": round(step_s * 1e3, 3),
            "achieved_tflops": round(flops / step_s / 1e12, 2),
            "achieved_gbps": round(bytes_acc / step_s / 1e9, 1),
            "frames_per_sec": round(batch * t_len / step_s, 1),
        }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", default="all", choices=["a", "b", "all"])
    ap.add_argument("--batch", type=int, default=960)
    args = ap.parse_args(argv)
    out = {}
    if args.stage in ("a", "all"):
        out["stage_a"] = stage_a(batch=args.batch)
        print(json.dumps({"stage_a": out["stage_a"]}), flush=True)
    if args.stage in ("b", "all"):
        out["stage_b"] = stage_b()
        print(json.dumps({"stage_b": out["stage_b"]}), flush=True)


if __name__ == "__main__":
    main()
