"""CLI: raw H36M ingestion stage (reference run_read_h36m.sh -> read_human_36m)."""

from h36x.config import IngestConfig, parse_into
from h36x.data.ingest import ingest


def main(argv=None):
    cfg = parse_into(IngestConfig(), argv, description=__doc__)
    if not cfg.source_dir or not cfg.out_dir:
        raise SystemExit("--source-dir and --out-dir are required")
    n = ingest(cfg.source_dir, cfg.out_dir, subjects=cfg.subjects)
    print(f"ingested {n} (sequence, camera) cells -> {cfg.out_dir}")


if __name__ == "__main__":
    main()
