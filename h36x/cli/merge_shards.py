"""CLI: merge partitioned extraction stores into one shard store.

Multi-host feature extraction is coordination-free: N hosts each run
`h36x-extract --partition i/N --out <shared>/part_i`, then one
`h36x-merge-shards --parts <shared>/part_* --out <shared>/features` unifies
the part stores (shard renumber + index concat; no tensor data rewritten).
The reference's extraction is single-node only
(src/preprocess_resnet_features.py:214-217 — in-process DataParallel).
"""

import argparse

from h36x.data.shards import merge_stores


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--parts", nargs="+", required=True,
                    help="part store directories, in partition order")
    ap.add_argument("--out", required=True, help="merged store directory")
    ap.add_argument("--keep-parts", action="store_true",
                    help="hard-link/copy shards instead of moving them")
    ap.add_argument("--verify", action="store_true",
                    help="CRC-verify every part before merging (full read; "
                         "a part that crossed the network corrupted would "
                         "otherwise poison the merged store silently)")
    args = ap.parse_args(argv)

    if args.verify:
        from h36x.data.shards import verify_store

        for part in args.parts:
            rep = verify_store(part)
            if rep["errors"]:
                for e in rep["errors"][:10]:
                    print(f"  - {e}")
                raise SystemExit(
                    f"part {part} failed integrity verification "
                    f"({len(rep['errors'])} error(s)); not merging")
            print(f"  [ok] {part}: {rep['arrays_checked']} arrays "
                  f"CRC-verified, {rep['rows']} rows")

    idx = merge_stores(args.parts, args.out, move=not args.keep_parts)
    print(f"Merged {len(args.parts)} part stores -> {args.out}: "
          f"{idx['n_clips']} clips x {idx['n_variants']} variants in "
          f"{idx['n_shards']} shards")


if __name__ == "__main__":
    main()
