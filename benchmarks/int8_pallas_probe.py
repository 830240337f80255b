"""Probe: does a Pallas/Mosaic-emitted int8 dot engage the MXU's 2x path?

Round-2 established that XLA:TPU lowers int8 GEMMs to the same-speed MXU
schedule as bf16 (benchmarks/int8_probe.py: 164 TOPS == 164 TFLOPS — the
advertised 394 TOPS int8 path never engages). This probe asks the
follow-up the round-2 verdict flagged: when PALLAS emits the
int8 x int8 -> int32 `dot` directly, does Mosaic pick the 2x path?

Three measurements on the same tiled-matmul kernel skeleton:
  - pallas bf16 x bf16 -> f32   (the Mosaic bf16 baseline)
  - pallas int8 x int8 -> int32 (the question)
  - XLA bf16 jnp.dot            (the XLA baseline for kernel overhead)

A second experiment targets the BANDWIDTH side (the backbone is HBM-bound
at ~86% of roofline): an int8-input GEMM that dequantizes per-K-tile in
VMEM — reads HALF the bytes of the bf16 GEMM from HBM. If Mosaic reaches
the same TOPS on int8 inputs, an int8-activation 1x1-conv path (2/3 of
ResNet bottleneck FLOPs are 1x1 convs = plain GEMMs) halves activation
traffic end to end.

Timing per memory/h36x-env-quirks.md: in-jit fori_loop with a data
dependence through the carry, scalar readout, best-of-N bursts.
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from h36x.utils.runtime import setup_jax_cache

setup_jax_cache()


def _matmul_kernel(x_ref, y_ref, o_ref, acc_ref, *, k_steps, out_dtype):
    """Tiled matmul: grid (M/bm, N/bn, K/bk); K innermost, f32/i32 acc."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], y_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype,
    )

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def make_pallas_matmul(m, k, n, in_dtype, acc_dtype, out_dtype,
                       bm=512, bk=512, bn=512):
    k_steps = k // bk
    kernel = partial(_matmul_kernel, k_steps=k_steps, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )


def _time_best(run, iters, bursts=6):
    _ = jax.device_get(run(iters))
    best = float("inf")
    for _ in range(bursts):
        t0 = time.perf_counter()
        _ = jax.device_get(run(iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench(mode: str, m=4096, k=4096, n=4096, iters=24, bm=512, bk=512, bn=512):
    rng = np.random.default_rng(0)
    if mode.startswith("int8"):
        x = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)
        y = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
        mm = make_pallas_matmul(m, k, n, jnp.int8, jnp.int32, jnp.int32,
                                bm=bm, bk=bk, bn=bn)
    elif mode == "pallas_bf16":
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        y = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
        mm = make_pallas_matmul(m, k, n, jnp.bfloat16, jnp.float32,
                                jnp.bfloat16, bm=bm, bk=bk, bn=bn)
    elif mode == "xla_bf16":
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        y = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

        def mm(a, b):
            return jnp.dot(a, b)
    else:
        raise ValueError(mode)

    @partial(jax.jit, static_argnums=0)
    def loop(niter, x, y):
        def body(i, carry):
            xx, acc = carry
            out = mm(xx, y)
            s = out[0, 0].astype(jnp.float32)
            # fold a zero derived from the output back into x: data dep
            if xx.dtype == jnp.int8:
                xx = (xx + (s * 0).astype(jnp.int8) + (i % 2).astype(jnp.int8))
            else:
                xx = xx + (s * 0).astype(xx.dtype) + (i % 2).astype(xx.dtype)
            return xx, acc + s

        return jax.lax.fori_loop(0, niter, body, (x, jnp.zeros((), jnp.float32)))[1]

    dt = _time_best(lambda ni: loop(ni, x, y), iters)
    tops = 2 * m * k * n / dt / 1e12
    return dt, tops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=4096)
    p.add_argument("--iters", type=int, default=24)
    p.add_argument("--block", type=int, nargs=3, default=[512, 512, 512])
    args = p.parse_args()
    s = args.size
    for mode in ("xla_bf16", "pallas_bf16", "int8"):
        try:
            dt, tops = bench(mode, s, s, s, args.iters, *args.block)
            unit = "TOPS" if mode == "int8" else "TFLOPS"
            print(f"{mode:12s}: {dt*1e3:7.3f} ms  {tops:7.1f} {unit}",
                  flush=True)
        except Exception as e:
            print(f"{mode:12s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
