"""CLI: ResNet-50 feature-extraction stage
(reference preprocess_h36m.sh -> preprocess_resnet_features.py)."""

from h36x.config import ExtractConfig, parse_into
from h36x.extract.pipeline import run_extract


def main(argv=None):
    from h36x.utils.runtime import setup_jax_cache

    setup_jax_cache()

    cfg = parse_into(ExtractConfig(), argv, description=__doc__)
    if not cfg.root or not cfg.out:
        raise SystemExit("--root and --out are required")
    run_extract(cfg)
    if cfg.verify_after:
        from h36x.data.shards import verify_store

        rep = verify_store(cfg.out)
        if rep["errors"]:
            for e in rep["errors"][:10]:
                print(f"  - {e}")
            raise SystemExit(
                f"--verify-after: the store failed its read-back CRC scan "
                f"({len(rep['errors'])} error(s)) — do not train on it")
        print(f"[verify-after] {rep['n_shards']} shards, {rep['rows']} rows, "
              f"{rep['arrays_checked']} arrays CRC-verified")


if __name__ == "__main__":
    main()
