"""Serving-daemon throughput under concurrency: does dynamic batching pay?

Runs the BatchingServer in-process (unix socket) with C concurrent clients
each issuing R sequential requests, and compares max_batch=1 (every request
its own device dispatch) against real coalescing. On a device where a
B=16 forward costs barely more than B=1 (DESIGN.md: the PHD forward is one
big GEMM), batching should multiply request throughput by nearly the
concurrency factor.

Usage: python -m benchmarks.serve_daemon_bench [--clients 16] [--reqs 20]
"""

from __future__ import annotations

import argparse
import asyncio
import time

import numpy as np

from h36x.utils.runtime import setup_jax_cache

setup_jax_cache()


def build_predict(seq_len: int, feature_dim: int, latent: int, blocks: int):
    import jax
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.step import make_forward

    model = PHDFor3DJoints(latent_dim=latent, feature_dim=feature_dim,
                           number_blocks=blocks)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, seq_len, feature_dim)))["params"]
    forward = make_forward(model)
    return lambda feats: forward(params, feats)


async def run_load(server, sock, clients: int, reqs: int, seq_len: int,
                   feature_dim: int) -> float:
    from h36x.serve_daemon import request_async

    rng = np.random.default_rng(0)
    feats = [rng.normal(size=(seq_len, feature_dim)).astype(np.float32)
             for _ in range(clients)]

    async def client(i):
        for _ in range(reqs):
            await request_async(feats[i], unix_path=sock)

    # one warm pass compiles every padded shape before timing
    await request_async(feats[0], unix_path=sock)
    t0 = time.perf_counter()
    await asyncio.gather(*[client(i) for i in range(clients)])
    return clients * reqs / (time.perf_counter() - t0)


def bench(predict_fn, tmp, max_batch: int, max_wait_ms: float,
          clients: int, reqs: int, seq_len: int, feature_dim: int):
    from h36x.serve_daemon import BatchingServer

    sock = f"{tmp}/bench_{max_batch}.sock"
    server = BatchingServer(predict_fn, seq_len=seq_len,
                            feature_dim=feature_dim, max_batch=max_batch,
                            max_wait_ms=max_wait_ms, pad_to=max_batch)

    async def go():
        srv = await server.start(unix_path=sock)
        try:
            return await run_load(server, sock, clients, reqs, seq_len,
                                  feature_dim)
        finally:
            server.stop()
            srv.close()
            await srv.wait_closed()

    rps = asyncio.run(go())
    batches = max(server.stats["batches"], 1)
    return rps, server.stats["rows"] / batches


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--reqs", type=int, default=20)
    ap.add_argument("--seq-len", type=int, default=40)
    ap.add_argument("--feature-dim", type=int, default=2048)
    ap.add_argument("--latent", type=int, default=1024)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    args = ap.parse_args(argv)

    import tempfile

    predict = build_predict(args.seq_len, args.feature_dim, args.latent,
                            args.blocks)
    with tempfile.TemporaryDirectory() as tmp:
        base, bsz1 = bench(predict, tmp, 1, 0.0, args.clients, args.reqs,
                           args.seq_len, args.feature_dim)
        print(f"max_batch= 1: {base:7.1f} req/s (mean batch {bsz1:.1f})")
        coal, bszN = bench(predict, tmp, args.clients, args.max_wait_ms,
                           args.clients, args.reqs, args.seq_len,
                           args.feature_dim)
        print(f"max_batch={args.clients:2d}: {coal:7.1f} req/s "
              f"(mean batch {bszN:.1f})  -> {coal/base:.2f}x")


if __name__ == "__main__":
    main()
