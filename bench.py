"""h36x benchmark — prints ONE JSON line for the driver.

Headline metric: H36M frames/sec/chip through the feature-extraction compute
path (fused preprocess + ResNet-50 forward) when available, otherwise PHD
train-step throughput. Baseline: the reference's optimized GPU pipeline at
~445 frames/s (BASELINE.md: ~11 clips/s x 40 frames on 1x A40).
"""

import json
import time

import numpy as np

BASELINE_FRAMES_PER_SEC = 445.0


def bench_feature_extraction():
    """Frames/s through bf16 fused preprocess + ResNet-50 on one chip."""
    import jax
    import jax.numpy as jnp

    from h36x.extract.pipeline import make_backbone_fn
    from h36x.models.resnet import ResNet50, init_resnet_params

    model = ResNet50(dtype=jnp.bfloat16)
    params = init_resnet_params(model, jax.random.key(0))
    fn = make_backbone_fn(model)

    batch_frames = 256  # frames per device batch (B*T flattened)
    x = jnp.asarray(
        np.random.default_rng(0).random((batch_frames, 224, 224, 3)), dtype=jnp.bfloat16
    )

    # warmup/compile
    fn(params, x).block_until_ready()
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = fn(params, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch_frames * iters / dt


def bench_train_step():
    """PHD train-step clips/s -> frames/s on one chip (fallback metric)."""
    import jax
    import jax.numpy as jnp

    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.state import create_train_state, make_optimizer
    from h36x.train.step import make_train_step

    model = PHDFor3DJoints(latent_dim=1024, feature_dim=2048, number_blocks=2)
    optimizer, _ = make_optimizer(lr=1e-4, freeze_ar=True)
    b, t = 32, 40
    state = create_train_state(
        model, optimizer, jax.random.key(0), jnp.zeros((b, t, 2048))
    )
    step = make_train_step(model, optimizer, donate=False)
    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.normal(size=(b, t, 2048)), dtype=jnp.float32),
        jnp.asarray(rng.normal(size=(b, t, 17, 3)) * 0.1, dtype=jnp.float32),
        jnp.asarray(rng.normal(size=(b, t, 17, 2)), dtype=jnp.float32),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))),
    )
    key = jax.random.key(1)
    state, m = step(state, batch, key)
    jax.block_until_ready(m)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, key)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return b * t * iters / dt


def main():
    try:
        value = bench_feature_extraction()
        metric = "h36m_feature_extract_frames_per_sec_per_chip"
    except Exception:
        value = bench_train_step()
        metric = "phd_train_step_frames_per_sec_per_chip"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": "frames/s/chip",
                "vs_baseline": round(value / BASELINE_FRAMES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
