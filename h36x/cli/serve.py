"""CLI: online serving daemon with dynamic batching (h36x/serve_daemon.py).

The reference has no serving entry point (its checkpoints are re-loaded
into the training code for offline eval, src/results.py:175-187); this is
the deployment surface: point it at an `h36x-export` AOT artifact (weights
baked in, symbolic batch — the recommended path) or a training checkpoint.

Any h36x-export artifact serves: a forward artifact replies (T, J, 3)
per request, a rollout artifact (future AR prediction) replies with its
own output shape — the wire protocol carries shapes per message.

Smoke: h36x-serve --artifact model.fwd.bf16.hlo --port 7036
Observability: h36x-serve --stats --port 7036 queries a RUNNING daemon
(counts, coalesced batch sizes, device/request latency percentiles) and
exits — it never touches jax, so it is safe from any host.
"""

import argparse
import asyncio
import json

from h36x.config import FEATURE_DIM, SEQ_LEN


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group()
    src.add_argument("--artifact", default="",
                     help="AOT artifact from h36x-export (one artifact for "
                          "all batch sizes, no re-export; batches are "
                          "padded to pre-warmed power-of-two buckets)")
    src.add_argument("--model-path", default="", help="checkpoint .msgpack")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7036)
    p.add_argument("--unix", default="", help="unix socket path (overrides "
                                              "host/port)")
    p.add_argument("--seq-len", type=int, default=None,
                   help="wire T; default: derived from the artifact's input "
                        "aval / the checkpoint manifest's data.seq_len "
                        f"(falls back to {SEQ_LEN})")
    p.add_argument("--feature-dim", type=int, default=None,
                   help="wire D; default: derived from the artifact's input "
                        "aval / the checkpoint manifest's model.feature_dim "
                        f"(falls back to {FEATURE_DIM})")
    from h36x.cli.common import add_model_config_flags, resolve_model_config

    add_model_config_flags(p)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--max-queue", type=int, default=1024,
                   help="reject requests past this queue depth with an "
                        "explicit overload error instead of queueing "
                        "without bound (0 = unbounded)")
    p.add_argument("--drain-s", type=float, default=10.0,
                   help="on SIGTERM/SIGINT: stop accepting and give queued "
                        "+ in-flight batches this long to finish before "
                        "stopping (graceful rolling-restart shutdown)")
    p.add_argument("--stats", action="store_true",
                   help="query a RUNNING daemon's operational stats "
                        "(request/batch counts, latency percentiles) at "
                        "--host/--port or --unix, print JSON, and exit")
    args = p.parse_args(argv)

    if args.stats:
        if args.artifact or args.model_path:
            raise SystemExit(
                "--stats queries a running daemon — it takes no model "
                "source; drop --artifact/--model-path")
        from h36x.serve_daemon import get_stats

        bind = ({"unix_path": args.unix} if args.unix
                else {"host": args.host, "port": args.port})
        # bounded: the diagnostic for a wedged daemon must not itself hang
        # (a stats reply is a dict off the event loop — 10 s is generous)
        print(json.dumps(get_stats(**bind, timeout_s=10.0), indent=2))
        return
    if not args.artifact and not args.model_path:
        raise SystemExit(
            "one of --artifact or --model-path is required (or --stats)")

    from h36x.utils.runtime import setup_jax_cache

    setup_jax_cache()

    from h36x.serve_daemon import BatchingServer, build_predict_fn, serve_forever

    # artifact mode has the weights AND architecture baked in — an explicit
    # model flag cannot take effect, and silently ignoring it would let an
    # operator believe it did (checkpoint mode errors loudly on conflicts,
    # so artifact mode must not be the quiet exception)
    if args.artifact:
        ignored = [name for name, v in
                   (("--latent-dim", args.latent_dim),
                    ("--num-blocks", args.num_blocks),
                    ("--groups", args.groups),
                    ("--regressor-iters", args.regressor_iters))
                   if v is not None]
        if ignored:
            raise SystemExit(
                f"{' '.join(ignored)}: artifact mode serves the architecture "
                "baked into the artifact at export time — these flags cannot "
                "take effect; drop them (re-export with h36x-export to "
                "change the architecture)")
    mc = resolve_model_config(
        args.model_path or "",
        {"latent_dim": args.latent_dim, "num_blocks": args.num_blocks,
         "groups": args.groups, "regressor_iters": args.regressor_iters},
        ignore_recorded=args.ignore_model_config or bool(args.artifact))

    # wire shapes (T, D): the artifact's input aval / the checkpoint
    # manifest are authoritative — a hand-typed mismatch would reject or
    # mis-shape every request
    seq_len, feature_dim = args.seq_len, args.feature_dim
    if args.artifact:
        from h36x.export import artifact_input_shape

        _, art_t, art_d = artifact_input_shape(args.artifact)
        for flag, art, name in ((seq_len, art_t, "--seq-len"),
                                (feature_dim, art_d, "--feature-dim")):
            if flag is not None and flag != art:
                raise SystemExit(
                    f"{name} {flag} contradicts the artifact's input shape "
                    f"(T={art_t}, D={art_d}) — drop the flag; the artifact "
                    "is authoritative")
        seq_len, feature_dim = art_t, art_d
    else:
        if feature_dim is None:
            feature_dim = mc["feature_dim"]
        if seq_len is None and not args.ignore_model_config:
            from h36x.train.checkpoint import load_recorded_config

            seq_len = ((load_recorded_config(args.model_path)
                        .get("data") or {}).get("seq_len"))
        if seq_len is None:
            seq_len = SEQ_LEN
    print(f"wire shapes: T={seq_len} D={feature_dim}")

    predict_fn, pad_to = build_predict_fn(
        artifact=args.artifact, model_path=args.model_path,
        seq_len=seq_len, feature_dim=feature_dim,
        latent_dim=mc["latent_dim"], num_blocks=mc["num_blocks"],
        groups=mc["groups"], ar_blocks=mc["ar_num_blocks"],
        kernel_size=mc["kernel_size"], joints_num=mc["joints_num"],
        regressor_hidden=mc["regressor_hidden"],
        regressor_iters=mc["regressor_iters"],
        # warm both modes: artifact mode pre-compiles every bucket size,
        # checkpoint mode its single padded shape — either way the first
        # request must not eat the XLA compile in its latency
        max_batch=args.max_batch, warm=True,
    )
    server = BatchingServer(
        predict_fn, seq_len=seq_len, feature_dim=feature_dim,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms, pad_to=pad_to,
        bucket_pad=not pad_to, max_queue=args.max_queue,
    )
    bind = ({"unix_path": args.unix} if args.unix
            else {"host": args.host, "port": args.port})
    try:
        asyncio.run(serve_forever(server, drain_s=args.drain_s, **bind))
    except KeyboardInterrupt:
        pass  # platforms where the loop signal handler is unavailable


if __name__ == "__main__":
    main()
