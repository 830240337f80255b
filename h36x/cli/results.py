"""CLI: test-subject evaluation + one-batch NPZ dump
(reference results.sh -> results.py main)."""

import argparse

import jax
import jax.numpy as jnp

from h36x.config import SEQ_LEN, TEST_SUBJECTS
from h36x.data.features import FeatureClipDataset
from h36x.train import checkpoint as ckpt
from h36x.train.results import dump_result_batch, evaluate_test


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features-root", required=True)
    p.add_argument("--preprocessed-root", required=True)
    p.add_argument("--model-path", required=True, help="checkpoint .msgpack")
    p.add_argument("--out", default="outputs/batch_result_S9.npz")
    p.add_argument("--seq-len", type=int, default=None,
                   help="clip window length; default: the evaluated store's "
                        f"own seq_len (falls back to {SEQ_LEN})")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--save-n", type=int, default=16)
    p.add_argument("--video-size", type=int, default=224, help="0 disables resize")
    p.add_argument("--subjects", type=int, nargs="+", default=list(TEST_SUBJECTS))
    from h36x.cli.common import (add_model_config_flags,
                                 build_model_from_arch,
                                 resolve_model_config)

    add_model_config_flags(p)
    p.add_argument("--fused", action="store_true",
                   help="use the Pallas fused serving path (h36x.infer) for "
                        "the one-batch prediction dump")
    args = p.parse_args(argv)

    from h36x.utils.runtime import setup_jax_cache

    setup_jax_cache()

    from h36x.train.checkpoint import checkpoint_ref_exists

    if not checkpoint_ref_exists(args.model_path):
        # fail before model init (which costs minutes on a remote backend);
        # orbax-aware: `outdir/last` resolves to a slot dir, so a bare
        # os.path.exists would wrongly reject orbax-backend checkpoints
        raise FileNotFoundError(f"checkpoint not found: {args.model_path}")

    test_set = FeatureClipDataset(args.features_root, subjects=args.subjects,
                                  test_set=True)
    # derive the feature width from the store (predict.py does the same);
    # hardcoding 2048 would mis-shape the restore template for stores
    # produced by a different backbone
    feature_dim = test_set[0][0].shape[-1]
    # the store being evaluated is authoritative for T (a mismatched flag
    # would mis-window the NPZ video dump)
    seq_len = args.seq_len if args.seq_len is not None \
        else int(test_set[0][0].shape[0])
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

    mesh = None
    if len(jax.devices()) > 1:
        from h36x.parallel.mesh import make_mesh

        mesh = make_mesh(data=-1, model=1)
        print(f"Test eval over {mesh.shape['data']} chips (data-parallel)")
    else:
        # one upload now, not one per eval batch: jitted steps re-transfer
        # host-numpy params on EVERY call, and over the ~50-70 MB/s tunnel
        # a ~50 MB weight tree per batch dwarfs the compute (the round-3
        # per-batch re-broadcast fix, applied to the results stage). Mesh
        # path skips this: evaluate_test device_get's + re-shards params
        # itself, so a device-0 upload would be a wasted full round trip.
        params = jax.tree.map(jnp.asarray, params)
    loss, mp, l3d, l2d = evaluate_test(model, params, test_set,
                                       args.batch_size, mesh=mesh)
    print(
        f"Test metrics | loss: {loss:.6f} | mpjpe (m): {mp:.6f} "
        f"| mpjpe (mm): {mp*1000.0:.2f} | l3d: {l3d:.6f} "
        "| l2d: n/a (not computed; NPZ stores 0.0 for field parity)"
    )

    out_hw = None if args.video_size == 0 else args.video_size
    forward_fn = None
    if args.fused:
        from h36x.infer import make_fused_forward

        forward_fn = make_fused_forward(joints_num=model.joints_num,
                                        groups=model.groups,
                                        regressor_iters=model.regressor_iters)
    dump_result_batch(
        model, params, test_set, args.preprocessed_root, args.out,
        seq_len=seq_len, batch_size=args.batch_size, save_n=args.save_n,
        video_size=out_hw, test_metrics=(loss, mp, l3d, l2d),
        forward_fn=forward_fn,
    )
    print(f"[OK] Saved batch to: {args.out}")


if __name__ == "__main__":
    main()
