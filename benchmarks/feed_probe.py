"""Host->device feed probe: full-round-trip cost of a training batch's
feature payload, f32 vs bf16/f16 (the `--data.feed-dtype` lever).

Methodology (see DESIGN.md "Feed dtype" / "Benchmarking on this runtime"):
`device_put` alone is untrustworthy on this tunneled runtime —
block_until_ready does not reliably block, so upload-only timings look
~20x faster than reality. One trustworthy unit is the full round trip:
device_put(batch) -> jitted scalar reduce -> host fetch. The reduce is
trivial, so the dtype difference is transfer bytes + fixed dispatch
latency. Distinct payloads per rep keep any caching layer from eliding
the upload; best-of-N rides out pool jitter.

Usage: python -m benchmarks.feed_probe [--batch 16] [--seq-len 40]
       [--feature-dim 2048] [--reps 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def probe(batch: int, seq_len: int, feature_dim: int, reps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    rng = np.random.default_rng(0)
    base = rng.standard_normal((batch, seq_len, feature_dim),
                               dtype=np.float32)

    @jax.jit
    def reduce(x):
        return jnp.sum(x.astype(jnp.float32))

    results = {}
    for name, arr in (("float32", base),
                      ("bfloat16", base.astype(ml_dtypes.bfloat16)),
                      ("float16", base.astype(np.float16))):
        payloads = [arr + np.float32(i).astype(arr.dtype)
                    for i in range(reps)]
        float(reduce(jax.device_put(payloads[0])))  # warm compile per dtype
        times = []
        for p in payloads:
            t0 = time.perf_counter()
            float(reduce(jax.device_put(p)))
            times.append(time.perf_counter() - t0)
        best = min(times)
        med = sorted(times)[len(times) // 2]
        mb = arr.nbytes / 1e6
        results[name] = {"mb": mb, "best_s": best, "median_s": med}
        print(f"{name:9s} {mb:6.2f} MB  best {best * 1e3:7.1f} ms  "
              f"median {med * 1e3:7.1f} ms  -> {mb / best:6.1f} MB/s")
    f32, bf16 = results["float32"], results["bfloat16"]
    print(f"bf16 round-trip speedup (best): "
          f"{f32['best_s'] / bf16['best_s']:.2f}x at "
          f"{f32['mb'] / bf16['mb']:.0f}/1 byte ratio")
    return results


def main(argv=None):
    from h36x.utils.runtime import setup_jax_cache

    setup_jax_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq-len", type=int, default=40)
    p.add_argument("--feature-dim", type=int, default=2048)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args(argv)
    probe(args.batch, args.seq_len, args.feature_dim, args.reps)


if __name__ == "__main__":
    main()
