"""CLI: environment + artifact diagnostics (`h36x-doctor`).

One command that answers "why doesn't my setup work": JAX backend and
device inventory, native library build status, optional host dependencies
(cv2 / spacepy / torch / orbax), and — when pointed at artifacts — shard
store and checkpoint sanity. The reference has no equivalent; its failure
mode is a stack trace nine layers into a SLURM job.

Exit code is non-zero if any REQUIRED check fails (store/checkpoint checks
are required once their flag is given; optional deps only warn).
"""

import argparse
import importlib


def _check(name, fn, problems, required=True):
    try:
        detail = fn()
        print(f"  [ok] {name}: {detail}")
    except Exception as e:  # noqa: BLE001 - diagnostics must not crash
        tag = "FAIL" if required else "warn"
        print(f"  [{tag}] {name}: {type(e).__name__}: {e}")
        if required:
            problems.append(name)


def _jax_info():
    import jax

    devs = jax.devices()
    kinds = {d.platform for d in devs}
    return (f"jax {jax.__version__}, {len(devs)} device(s) "
            f"[{', '.join(sorted(kinds))}], "
            f"process {jax.process_index()}/{jax.process_count()}")


def _native_info():
    from h36x import native

    lib = native.load()
    if lib is None:
        raise RuntimeError("libh36xio.so not built and build failed "
                           "(falling back to cv2 host ops)")
    return f"libh36xio loaded ({lib._name})"


def _optional(mod):
    def probe():
        m = importlib.import_module(mod)
        return getattr(m, "__version__", "present")

    return probe


def _store_info(root):
    def probe():
        from h36x.data.shards import load_index, read_shard, shard_path

        idx = load_index(root)
        n = idx["n_shards"]
        if n is None:  # reference index.pt may omit it; recompute from clips
            n = 1 + max(c["shard_id"] for c in idx["clips"])
        missing = [s for s in range(n)
                   if not shard_path(root, s).exists()]
        if missing and not idx.get("torch_format"):
            raise FileNotFoundError(
                f"{len(missing)}/{n} shard files missing (first: "
                f"shard_{missing[0]:05d}.h36x)")
        detail = (f"{idx['n_clips']} clips x {idx['n_variants']} variants, "
                  f"{n} shards, seq_len={idx['seq_len']}, "
                  f"dtype={idx['feat_dtype']}")
        if not idx.get("torch_format"):
            shard = read_shard(shard_path(root, 0))
            rows = shard["feats"].shape[0]
            detail += f"; shard 0 reads ok ({rows} rows)"
        return detail

    return probe


def _ckpt_info(path):
    def probe():
        import json
        from pathlib import Path

        p = Path(path)
        if p.is_dir():  # orbax directory or a run dir
            for name in ("last", "best"):
                if (p / f"{name}.json").exists():
                    man = json.loads((p / f"{name}.json").read_text())
                    return (f"{name}: epoch {man['epoch']}, step "
                            f"{man['step']}, best_val {man['best_val']:.4f}")
            raise FileNotFoundError("no last.json/best.json manifest found")
        man_path = p.with_suffix(".json")
        if not p.exists():
            raise FileNotFoundError(str(p))
        size_mb = p.stat().st_size / 1e6
        detail = f"{size_mb:.1f} MB"
        if man_path.exists():
            man = json.loads(man_path.read_text())
            detail += (f", epoch {man['epoch']}, step {man['step']}, "
                       f"best_val {man['best_val']:.4f}")
        return detail

    return probe


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="", help="feature-shard store to check")
    p.add_argument("--ckpt", default="",
                   help="checkpoint file or run directory to check")
    args = p.parse_args(argv)

    problems: list = []
    print("h36x doctor")
    _check("jax backend", _jax_info, problems)
    _check("native library", _native_info, problems, required=False)
    for mod, why in (("cv2", "video decode"), ("spacepy", "raw CDF ingest"),
                     ("torch", "test oracles / weight import"),
                     ("orbax.checkpoint", "orbax ckpt backend")):
        _check(f"{mod} ({why})", _optional(mod), problems, required=False)
    if args.root:
        _check(f"store {args.root}", _store_info(args.root), problems)
    if args.ckpt:
        _check(f"checkpoint {args.ckpt}", _ckpt_info(args.ckpt), problems)

    if problems:
        raise SystemExit(f"doctor found problems: {', '.join(problems)}")
    print("all required checks passed")


if __name__ == "__main__":
    main()
