"""CLI: online serving — streaming per-frame 3D pose and AR future rollout.

The reference ships the forecasting machinery (predict_future in
src/model.py:158-178, INPUT_LEN/PRED_LEN in src/config.py) but no driver
for it; this stage exposes h36x's serving engines (h36x/serve.py) over a
feature shard store:

  batch mode (default)  one AR rollout per clip: context joints for the
                        whole window + `--forecast` future frames, saved
                        as an NPZ.
  --streaming           replay each clip frame-by-frame through the
                        StreamingPredictor (optionally --freeze after the
                        window fills: O(1) incremental pushes) and save the
                        per-frame online predictions. The streamed result
                        at frame t uses only features <= t — what a live
                        deployment would have seen.

Output NPZ fields: predicted3djoints (B, T, J, 3), future3djoints
(B, steps, J, 3) [batch mode], joints3d (GT), meta.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features-root", required=True)
    p.add_argument("--model-path", required=True, help="checkpoint .msgpack")
    p.add_argument("--out", default="outputs/predictions.npz")
    p.add_argument("--subjects", type=int, nargs="+", default=[9])
    p.add_argument("--clips", type=int, default=8, help="clips to serve")
    p.add_argument("--forecast", type=int, default=25,
                   help="AR future frames past each window (0 disables)")
    p.add_argument("--window", type=int, default=0,
                   help="streaming window (0: seq-len; with --freeze it "
                        "defaults to seq-len//2 so the frozen O(1) path "
                        "actually serves the second half of each clip)")
    p.add_argument("--streaming", action="store_true",
                   help="per-frame online replay instead of batch rollout")
    p.add_argument("--freeze", action="store_true",
                   help="with --streaming: pin GN statistics once the "
                        "window is full and push in O(1) per frame")
    from h36x.cli.common import (add_model_config_flags,
                                 build_model_from_arch,
                                 resolve_model_config)

    add_model_config_flags(p)
    args = p.parse_args(argv)

    from h36x.utils.runtime import setup_jax_cache

    setup_jax_cache()

    from h36x.data.features import FeatureClipDataset
    from h36x.serve import StreamingPredictor, make_rollout_fn
    from h36x.train import checkpoint as ckpt

    from h36x.train.checkpoint import checkpoint_ref_exists

    if not checkpoint_ref_exists(args.model_path):
        # fail before model init (which costs minutes on a remote backend);
        # orbax-aware: `outdir/last` resolves to a slot dir, so a bare
        # os.path.exists would wrongly reject orbax-backend checkpoints
        raise FileNotFoundError(f"checkpoint not found: {args.model_path}")

    ds = FeatureClipDataset(args.features_root, subjects=args.subjects,
                            test_set=True)  # raises on an empty clip list
    n = min(args.clips, len(ds))
    feats, joints3d, _, _, meta = ds.get_batch(list(range(n)))
    feature_dim = feats.shape[-1]
    seq_len = feats.shape[1]

    mc = resolve_model_config(
        args.model_path,
        {"latent_dim": args.latent_dim, "num_blocks": args.num_blocks,
         "groups": args.groups, "regressor_iters": args.regressor_iters},
        ignore_recorded=args.ignore_model_config)
    model = build_model_from_arch(mc, feature_dim=feature_dim)
    template = model.init(
        jax.random.key(0), jnp.zeros((1, seq_len, feature_dim))
    )["params"]
    params = ckpt.load_params_only(args.model_path, jax.device_get(template))
    # upload once: host-numpy params re-transfer on EVERY jitted call, and
    # the streaming path dispatches one per pushed frame — per-frame ~50 MB
    # weight uploads over the tunnel would cost minutes for milliseconds of
    # compute (same fix as serve_daemon.build_predict_fn)
    params = jax.tree.map(jnp.asarray, params)

    out: dict = {"joints3d": np.asarray(joints3d, np.float32),
                 "meta": np.asarray(meta, dtype=object)}

    if args.streaming:
        # window == seq_len would only become warm after a clip's LAST push
        # (freeze would never engage during replay), so --freeze defaults
        # to a half-clip window: warm+freeze on the first half, frozen O(1)
        # pushes on the second.
        window = args.window or (seq_len // 2 if args.freeze else seq_len)
        window = max(1, min(window, seq_len))
        preds = np.zeros((n, seq_len, mc["joints_num"], 3), np.float32)
        # --forecast applies in streaming mode too: roll each clip's AR
        # predictor past its last pushed frame (was silently ignored)
        futures = np.zeros((n, max(args.forecast, 0), mc["joints_num"], 3),
                           np.float32)
        for b in range(n):
            sp = StreamingPredictor(params, window=window,
                                    feature_dim=feature_dim,
                                    joints_num=mc["joints_num"],
                                    groups=mc["groups"],
                                    regressor_iters=mc["regressor_iters"])
            for t in range(seq_len):
                preds[b, t] = sp.push(feats[b, t])
                if args.freeze and sp.warm and not sp.frozen:
                    sp.freeze()
            if args.forecast > 0:
                futures[b] = sp.forecast(args.forecast)
        out["predicted3djoints"] = preds
        if args.forecast > 0:
            out["future3djoints"] = futures
        mode = ("streaming" + (" (frozen-stats O(1) push)" if args.freeze
                               else "")
                + (f" +{args.forecast} forecast frames" if args.forecast > 0
                   else ""))
    elif args.forecast > 0:
        rollout = make_rollout_fn(args.forecast, mc["joints_num"],
                                  mc["groups"],
                                  regressor_iters=mc["regressor_iters"])
        ctx, fut = rollout(params, jnp.asarray(feats))
        out["predicted3djoints"] = np.asarray(ctx, np.float32)
        out["future3djoints"] = np.asarray(fut, np.float32)
        mode = f"batch rollout (+{args.forecast} future frames)"
    else:
        # --forecast 0: plain context forward — no point paying the AR
        # rollout's masked-GN buffer for a future output we would discard
        from h36x.infer import make_fused_forward

        forward = make_fused_forward(mc["joints_num"], mc["groups"],
                                     use_pallas=False,
                                     regressor_iters=mc["regressor_iters"])
        out["predicted3djoints"] = np.asarray(
            forward(params, jnp.asarray(feats)), np.float32)
        mode = "batch forward"

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, **out)
    err = np.linalg.norm(
        out["predicted3djoints"] - out["joints3d"], axis=-1
    ).mean()
    print(f"Served {n} clips ({mode}); context MPJPE {err*1000:.2f} mm")
    print(f"[OK] Saved predictions to: {args.out}")


if __name__ == "__main__":
    main()
