"""Probe: is int8 matmul MXU-accelerated through XLA on this chip?

The v5e MXU advertises 2x int8 throughput over bf16 (394 vs 197 TOPS) and
the extraction backbone is HBM-bound (DESIGN.md "backbone ceiling"), so an
int8 data path could in principle double both the compute and the memory
roofline. Round-2 measured XLA int8 *conv* at 1.01x bf16; this probe
isolates the question to a plain GEMM so the verdict is about the XLA:TPU
int8 lowering itself, not conv layout details.

Timing per memory/h36x-env-quirks.md: in-jit fori_loop, data dependence
through the carry, scalar readout, best-of-N bursts.
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from h36x.utils.runtime import setup_jax_cache

setup_jax_cache()


def _time_best(run, iters: int, bursts: int) -> float:
    _ = jax.device_get(run(iters))  # warm the SAME executable (static niter)
    best = float("inf")
    for _ in range(bursts):
        t0 = time.perf_counter()
        _ = jax.device_get(run(iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_gemm(m: int, k: int, n: int, dtype: str, iters: int,
               bursts: int) -> float:
    """Seconds per (m,k)@(k,n) GEMM in the given input dtype."""
    rng = np.random.default_rng(0)
    if dtype == "int8":
        a = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        acc = jnp.int32
    else:
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
        acc = jnp.float32

    @partial(jax.jit, static_argnums=0)
    def run(niter, a, b):
        def body(i, carry):
            a, s = carry
            out = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
            )
            # Fold a data-dependent scalar back into `a` so the dot can't be
            # hoisted out of the loop. x*0 (and rem(x,1)) are foldable for
            # integers, which would break the dependence asymmetrically vs
            # bf16 — rem by a non-trivial modulus is not simplifiable.
            mod = jnp.asarray(127 if out.dtype == jnp.int32 else 1.0,
                              out.dtype)
            bump = jax.lax.rem(out[0, 0], mod).astype(a.dtype)
            return a + bump, s + out[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, niter, body, (a, jnp.zeros((), jnp.float32)))[1]

    return _time_best(lambda n_: jax.device_get(run(n_, a, b)), iters, bursts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bursts", type=int, default=4)
    args = ap.parse_args(argv)

    flops = 2.0 * args.m * args.k * args.n
    for dtype in ("bfloat16", "int8"):
        sec = bench_gemm(args.m, args.k, args.n, dtype, args.iters,
                         args.bursts)
        print(f"{dtype:8s}: {sec*1e3:7.3f} ms  {flops/sec/1e12:7.1f} "
              f"T{'OPS' if dtype == 'int8' else 'FLOPS'}")


if __name__ == "__main__":
    main()
