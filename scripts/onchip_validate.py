"""On-chip validation suite: re-certify the TPU paths after a toolchain,
pool, or kernel change.

The pytest suite runs on a forced-CPU 8-virtual-device mesh
(tests/conftest.py), so Mosaic lowerings and the real-chip CLI chain are
NOT covered by `pytest` — this script is the on-hardware complement. Run
it whenever the jax/libtpu toolchain moves, after a pool outage, or after
touching any pallas_* kernel:

    python scripts/onchip_validate.py            # all stages
    python scripts/onchip_validate.py --stage fused e2e

Stages:

  fused   fused (Pallas fwd+bwd) train step vs the XLA step, judged
          against an XLA HIGHEST-precision ground truth. Methodology
          (DESIGN.md "Round-3 revalidation"): NEVER diff the two
          default-precision paths directly — at tiny gradient scales two
          independently-rounded bf16 pipelines legitimately diverge by
          ~6e-2 worst-leaf relative; each path's error vs HIGHEST is the
          meaningful number. PASS = fused error <= 2x XLA-default error.
  e2e     synthetic mp4 tree -> h36x-extract (dedup scheduler + native
          jitter) -> h36x-train (1 epoch) -> h36x-results, all through
          the real CLI mains on the real chip; results runs with NO model
          flags to also certify checkpoint-manifest architecture
          resolution (h36x/cli/common.py).
  step    5-step train-step timing burst (in-jit fori_loop, data
          dependence, tiny readout — the tunnel rules from CLAUDE.md);
          prints ms/step for the XLA and fused paths. Informational: the
          pool's throughput varies hour to hour, so no PASS gate.

Exit code 0 = every requested stage passed.
"""

from __future__ import annotations

import argparse
import pickle
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def _model_and_batch(batch: int = 8):
    import jax
    import jax.numpy as jnp
    import optax

    from h36x.models.phd import PHDFor3DJoints
    from h36x.train.state import create_train_state

    model = PHDFor3DJoints(latent_dim=1024, feature_dim=2048, joints_num=17,
                           number_blocks=2, dropout=0.0)
    state = create_train_state(model, optax.sgd(1e-2), jax.random.key(0),
                               jnp.zeros((2, 40, 2048)))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(batch, 40, 2048)).astype(np.float32))
    j3d = jnp.asarray(
        rng.normal(size=(batch, 40, 17, 3)).astype(np.float32) * 0.1)
    return model, state, feats, j3d


def stage_fused() -> bool:
    """Fused-vs-XLA gradient accuracy, each judged against HIGHEST."""
    import jax

    from h36x.infer import phd_forward_train_fused
    from h36x.train.losses import mse3d

    model, state, feats, j3d = _model_and_batch()
    key = jax.random.key(1)

    def loss_xla(p):
        pred = model.apply({"params": p}, feats, train=True,
                           rngs={"dropout": key})[2]
        return mse3d(pred, j3d)

    def loss_fused(p):
        _, pred = phd_forward_train_fused(
            p, feats, key, dropout=model.dropout,
            joints_num=model.joints_num, groups=model.groups,
            regressor_iters=model.regressor_iters,
            interpret=False, precise=True)
        return mse3d(pred, j3d)

    with jax.default_matmul_precision("highest"):
        gt = jax.device_get(jax.jit(jax.grad(loss_xla))(state.params))
    gx = jax.device_get(jax.jit(jax.grad(loss_xla))(state.params))
    gf = jax.device_get(jax.jit(jax.grad(loss_fused))(state.params))

    def worst_err(g):
        worst = 0.0
        for a, b in zip(jax.tree.leaves(gt), jax.tree.leaves(g)):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            worst = max(worst,
                        float(np.abs(a - b).max() / (np.abs(a).max() + 1e-12)))
        return worst

    ex, ef = worst_err(gx), worst_err(gf)
    print(f"[fused] grad err vs HIGHEST: xla-default {ex:.3e} "
          f"fused-precise {ef:.3e} (ratio {ef / max(ex, 1e-12):.2f}x)")
    ok = ef <= 2.0 * ex + 1e-12
    print(f"[fused] {'PASS' if ok else 'FAIL'} "
          "(gate: fused error <= 2x XLA-default error)")
    return ok


def _synth_tree(root: Path, n_frames: int = 40, hw: int = 64) -> None:
    import cv2

    rng = np.random.default_rng(7)
    for subject, action in ((1, "Walking_0"), (5, "Eating_0"),
                            (9, "Posing_0")):
        cam_dir = root / f"S{subject}" / action / "cam_0"
        cam_dir.mkdir(parents=True)
        vw = cv2.VideoWriter(
            str(cam_dir / f"S{subject}_{action}_cam_0.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 25, (hw, hw))
        for _ in range(n_frames):
            vw.write(rng.integers(0, 255, size=(hw, hw, 3)).astype(np.uint8))
        vw.release()
        j3d = rng.normal(size=(n_frames, 17, 3)).astype(np.float32) * 100
        j2d = (rng.random((n_frames, 17, 2)) * 40 + 12).astype(np.float32)
        with open(cam_dir / "gt_poses.pkl", "wb") as f:
            pickle.dump({"2d": j2d, "3d": j3d}, f)
        with open(cam_dir / "camera_wext.pkl", "wb") as f:
            pickle.dump({"f": np.array([90.0, 90.0]),
                         "c": np.array([30.0, 33.0]), "k": np.zeros(5),
                         "rt": np.eye(3), "t": np.zeros(3)}, f)


def stage_e2e() -> bool:
    """extract -> train -> results through the CLI mains on the chip."""
    from h36x.cli.extract import main as extract_main
    from h36x.cli.results import main as results_main
    from h36x.cli.train import main as train_main

    tmp = Path(tempfile.mkdtemp(prefix="h36x_onchip_e2e_"))
    root, features, runs = tmp / "ingested", tmp / "features", tmp / "runs"
    _synth_tree(root)

    extract_main(["--root", str(root), "--out", str(features),
                  "--seq-len", "8", "--stride", "4", "--frame-skip", "2",
                  "--resize", "32", "--batch-size", "2", "--num-workers",
                  "2", "--augment", "true", "--shard-size", "2",
                  "--shuffle-pool", "50", "--subjects", "1", "5", "9"])
    assert (features / "index.json").exists(), "extract wrote no index"
    print("[e2e] extract OK")

    train_main(["--train-root", str(features), "--train-subjects", "1",
                "--val-subjects", "5", "--outdir", str(runs),
                "--optim.epochs", "1", "--optim.batch-size", "4",
                "--optim.log-every", "0", "--model.latent-dim", "64",
                "--model.num-blocks", "1", "--data.seq-len", "8"])
    assert (runs / "best.msgpack").exists(), "train wrote no checkpoint"
    print("[e2e] train OK")

    out_npz = tmp / "result.npz"
    # deliberately NO model flags: the manifest must supply latent_dim=64 /
    # num_blocks=1 (the 1024/2 defaults would fail the param restore)
    results_main(["--features-root", str(features),
                  "--preprocessed-root", str(root),
                  "--model-path", str(runs / "best.msgpack"),
                  "--out", str(out_npz), "--seq-len", "8",
                  "--batch-size", "2", "--save-n", "2",
                  "--video-size", "32", "--subjects", "9"])
    data = np.load(out_npz, allow_pickle=True)
    ok = (data["predicted3djoints"].shape == (2, 8, 17, 3)
          and np.isfinite(data["test_metrics"]).all())
    print(f"[e2e] results {'PASS' if ok else 'FAIL'} (workdir {tmp})")
    if not ok:
        return False

    # integrity surfaces: store CRCs, checkpoint sha256, artifact sidecar
    # (doctor exits nonzero -> SystemExit fails the stage)
    from h36x.cli.doctor import main as doctor_main
    from h36x.cli.export import main as export_main

    doctor_main(["--verify-store", str(features),
                 "--ckpt", str(runs / "best.msgpack")])
    art = tmp / "phd.fwd.hlo"
    export_main(["--model-path", str(runs / "best.msgpack"),
                 "--out", str(art), "--platforms", "cpu,tpu"])
    doctor_main(["--artifact", str(art)])
    print("[e2e] integrity OK (store CRC, checkpoint sha256, artifact)")

    # serving daemon on the chip: coalesced batch, stats op, graceful drain
    import asyncio

    from h36x.serve_daemon import (BatchingServer, build_predict_fn,
                                   request_async, stats_async)

    predict_fn, pad_to = build_predict_fn(
        model_path=str(runs / "best.msgpack"), seq_len=8, feature_dim=2048,
        latent_dim=64, num_blocks=1, max_batch=4, warm=True)

    async def serve_check():
        server = BatchingServer(predict_fn, seq_len=8, feature_dim=2048,
                                max_batch=4, max_wait_ms=50.0, pad_to=pad_to)
        sock = str(tmp / "serve.sock")
        srv = await server.start(unix_path=sock)
        try:
            rng = np.random.default_rng(0)
            feats = [rng.normal(size=(8, 2048)).astype(np.float32)
                     for _ in range(3)]
            outs = await asyncio.gather(*[
                request_async(f, unix_path=sock, timeout_s=300)
                for f in feats])
            stats = await stats_async(unix_path=sock)
            assert all(o.shape == (8, 17, 3) for o in outs), "bad reply shape"
            assert stats["requests"] == 3, stats
            srv.close()
            assert await server.drain(30.0), "drain timed out"
            return stats
        finally:
            server.stop()
            srv.close()
            await srv.wait_closed()

    stats = asyncio.run(serve_check())
    print(f"[e2e] serve OK ({stats['batches']} device batch(es), "
          f"device p50 {stats['batch_device_ms']['p50']:.1f} ms, "
          f"request p50 {stats['request_ms']['p50']:.1f} ms)")
    return True


def stage_step() -> bool:
    """Informational timing burst; follows the tunnel benchmarking rules."""
    import jax
    import jax.numpy as jnp

    from h36x.train.state import make_optimizer, create_train_state
    from h36x.train.step import make_train_step
    from h36x.models.phd import PHDFor3DJoints

    model = PHDFor3DJoints(latent_dim=1024, feature_dim=2048, joints_num=17,
                           number_blocks=2, dropout=0.5)
    optimizer, _ = make_optimizer(lr=1e-4, freeze_ar=True)
    state = create_train_state(model, optimizer, jax.random.key(0),
                               jnp.zeros((2, 40, 2048)))
    rng = np.random.default_rng(0)
    B = 64
    batch = (
        jnp.asarray(rng.normal(size=(B, 40, 2048)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 40, 17, 3)).astype(np.float32) * .1),
        jnp.asarray(rng.normal(size=(B, 40, 17, 2)).astype(np.float32)),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))),
    )
    key = jax.random.key(1)
    for fused in (False, True):
        step = make_train_step(model, optimizer, donate=False, fused=fused)

        def burst(state, n):
            def body(i, st):
                st2, _ = step(st, batch, jax.random.fold_in(key, i))
                return st2
            st = jax.lax.fori_loop(0, n, body, state)
            # the readout must depend on the PARAMS, not st.step: the step
            # counter is just `step + n`, so returning it lets XLA dead-code
            # the entire gradient computation and the "measurement" becomes
            # one tunnel round trip (observed: 4.6 ms/step for BOTH paths)
            return st.params["input_proj"]["bias"][:1]

        run = jax.jit(burst, static_argnums=1)
        run(state, 5).block_until_ready()  # compile + warm
        best = min(
            (lambda t0: (run(state, 5).block_until_ready(),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(3))
        print(f"[step] {'fused' if fused else 'XLA  '}: "
              f"{best / 5 * 1e3:7.2f} ms/step (B={B}, best of 3 bursts)")
    return True


STAGES = {"fused": stage_fused, "e2e": stage_e2e, "step": stage_step}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", nargs="+", choices=sorted(STAGES),
                   default=sorted(STAGES))
    args = p.parse_args(argv)

    import jax

    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    if platform != "tpu":
        print("WARNING: not a TPU — this suite certifies Mosaic lowerings "
              "and the real-chip CLI chain; CPU results prove nothing the "
              "pytest suite doesn't already.")

    failed = [name for name in args.stage if not STAGES[name]()]
    if failed:
        print(f"FAILED stages: {failed}")
        return 1
    print("ALL REQUESTED STAGES PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
