"""CLI: compile a trained checkpoint into a self-contained serving artifact.

Writes one StableHLO file (jax.export) holding the jitted PHD forward — or
the AR future rollout — with the trained weights baked in. The artifact is
the deployable unit: a serving host needs only jax (no h36x, no model code,
no checkpoint) to run

    import jax
    from jax import export
    fn = jax.jit(export.deserialize(bytearray(open("phd.hlo","rb").read())).call)
    joints = fn(feats)            # feats (B, seq_len, feature_dim) f32

The batch dimension is symbolic unless --batch is given, so the same file
serves any batch size. A `.json` sidecar records shapes/platforms.

The reference pipeline has no counterpart — its "deployment" is loading
last.pt back into the training code (src/results.py:175-187).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", required=True, help="checkpoint .msgpack")
    p.add_argument("--out", default="outputs/phd.hlo")
    p.add_argument("--kind", choices=["forward", "rollout"],
                   default="forward")
    p.add_argument("--forecast", type=int, default=25,
                   help="rollout only: future frames baked into the artifact")
    p.add_argument("--seq-len", type=int, default=None,
                   help="artifact window length; default: the checkpoint "
                        "manifest's data.seq_len (falls back to 40)")
    p.add_argument("--feature-dim", type=int, default=None,
                   help="input feature width; default: the value recorded "
                        "in the checkpoint manifest (falls back to 2048)")
    p.add_argument("--batch", type=int, default=None,
                   help="fix the batch dimension (default: symbolic)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="compute/weight dtype baked into the artifact "
                        "(bfloat16: half the file and serve-time weight "
                        "traffic; interface stays f32)")
    from h36x.cli.common import add_model_config_flags

    add_model_config_flags(p)
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and compare against the flax "
                        "forward on random features")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from h36x.export import (
        artifact_info,
        export_forward,
        export_rollout,
        load_artifact,
        save_artifact,
    )
    from h36x.train import checkpoint as ckpt
    from h36x.utils.runtime import setup_jax_cache

    setup_jax_cache()

    from h36x.cli.common import build_model_from_arch, resolve_model_config

    mc = resolve_model_config(
        args.model_path,
        {"latent_dim": args.latent_dim, "num_blocks": args.num_blocks,
         "groups": args.groups, "regressor_iters": args.regressor_iters,
         "feature_dim": args.feature_dim},
        ignore_recorded=args.ignore_model_config)
    feature_dim = mc["feature_dim"]
    seq_len = args.seq_len
    if seq_len is None and not args.ignore_model_config:
        from h36x.train.checkpoint import load_recorded_config

        seq_len = ((load_recorded_config(args.model_path)
                    .get("data") or {}).get("seq_len"))
    if seq_len is None:
        seq_len = 40
    model = build_model_from_arch(mc, feature_dim=feature_dim)
    template = model.init(
        jax.random.key(0), jnp.zeros((1, seq_len, feature_dim))
    )["params"]
    params = ckpt.load_params_only(args.model_path, jax.device_get(template))

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    common = dict(
        seq_len=seq_len, feature_dim=feature_dim,
        joints_num=mc["joints_num"], groups=mc["groups"], batch=args.batch,
        regressor_iters=mc["regressor_iters"],
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        platforms=platforms,
    )
    if args.kind == "rollout":
        blob = export_rollout(params, steps=args.forecast, **common)
    else:
        blob = export_forward(params, **common)

    path = save_artifact(blob, args.out)
    info = artifact_info(blob)
    info["kind"] = args.kind
    info["dtype"] = args.dtype
    import hashlib

    # integrity record: h36x-doctor --artifact re-hashes the blob against
    # this, so a corrupt copy is caught before it reaches a serve host
    info["sha256"] = hashlib.sha256(blob).hexdigest()
    if args.kind == "rollout":
        info["forecast"] = args.forecast
    with open(str(path) + ".json", "w") as f:
        json.dump(info, f, indent=2)
    print(f"[OK] {args.kind} artifact -> {path} "
          f"({info['nbytes'] / 1e6:.1f} MB, platforms {info['platforms']}, "
          f"in {info['in_avals']})")

    if args.check:
        fn = load_artifact(blob)
        feats = np.random.default_rng(0).standard_normal(
            (2, seq_len, feature_dim), dtype=np.float32
        )
        got = fn(feats)
        joints_got = got[0] if args.kind == "rollout" else got
        want = model.apply({"params": params}, jnp.asarray(feats),
                           train=False)[2]
        err = float(jnp.max(jnp.abs(jnp.asarray(joints_got) - want)))
        tol = 1e-4 if args.dtype == "float32" else 2e-2
        print(f"[check] max |artifact - model.apply(f32)| = {err:.3e} "
              f"(tol {tol:g})")
        if err > tol:
            raise SystemExit(f"artifact check failed: {err:.3e} > {tol:g}")


if __name__ == "__main__":
    main()
