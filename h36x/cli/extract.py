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


if __name__ == "__main__":
    main()
