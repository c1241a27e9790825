"""CLI — the engine's answer to the reference's hadoop-streaming
invocation (README.rst:217-219 / fileformat.rst:37):

  python -m wikihadoop_spark diffdb --input dump.xml[.bz2] --output out/ \
      [--exclude-pages-with REGEX] [--split-size BYTES] [--cores N] \
      [--source-pairing] [--no-sort] [--no-dedup] [--compression gzip]

  python -m wikihadoop_spark revisions --input dump.xml --output out/  # parquet revisions table

Produces the diffdb TSV (py2-repr compatible, fileformat.rst:6-27) or
a typed parquet revisions table.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="wikihadoop_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--input", required=True, help="dump path or glob (.xml/.bz2/.gz)")
    common.add_argument("--output", required=True)
    common.add_argument("--exclude-pages-with", default=None,
                        help="regex; matching page titles are skipped (reference F1)")
    common.add_argument("--split-size", type=int, default=32 * 1024 * 1024)
    common.add_argument("--cores", type=int, default=None)

    d = sub.add_parser("diffdb", parents=[common], help="full diff pipeline -> TSV")
    d.add_argument("--source-pairing", action="store_true",
                   help="pair revisions inside the source (no text shuffle)")
    d.add_argument("--source-diff", action="store_true",
                   help="compute diffs inside the source partition too "
                        "(the reference's in-mapper shape; fastest)")
    d.add_argument("--no-sort", action="store_true")
    d.add_argument("--no-dedup", action="store_true")
    d.add_argument("--compression", default="gzip")

    sub.add_parser("revisions", parents=[common], help="typed revisions -> parquet")

    s = sub.add_parser(
        "shard",
        help="split a (bz2/gz/plain) dump into page-aligned shards for parallel reads",
    )
    s.add_argument("--input", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--shard-size", type=int, default=64 * 1024 * 1024)
    s.add_argument("--compress", choices=["bz2", "gz"], default=None)

    args = ap.parse_args(argv)

    if args.cmd == "shard":
        from .sources.shard import shard_dump

        paths = shard_dump(
            args.input,
            args.output,
            shard_bytes=args.shard_size,
            compress=args.compress,
        )
        print(f"{len(paths)} shards -> {args.output}")
        return 0

    from .observability import observed_counts
    from .plans.diffdb import build_diffdb, write_diffdb_tsv
    from .session import get_spark
    from .sources.wikidump import read_wikidump

    spark = get_spark("wikihadoop-cli", cpus=args.cores)
    try:
        opts = {"splitSize": str(args.split_size)}
        if args.cmd == "diffdb" and getattr(args, "source_diff", False):
            opts["compute_diffs"] = "true"
        elif args.cmd == "diffdb" and args.source_pairing:
            opts["pair_revisions"] = "true"
        revs = read_wikidump(spark, args.input, **opts)

        if args.cmd == "revisions":
            if args.exclude_pages_with:
                from pyspark.sql import functions as F

                revs = revs.filter(~F.col("title").rlike(args.exclude_pages_with))
            revs, obs = observed_counts(revs, written_revisions=None)
            revs.write.mode("overwrite").parquet(args.output)
            print(f"revisions written: {obs.get['written_revisions']} -> {args.output}")
            return 0

        diff = build_diffdb(
            revs,
            exclude_pages_with=args.exclude_pages_with,
            paired=args.source_pairing or getattr(args, "source_diff", False),
        )
        write_diffdb_tsv(
            diff,
            args.output,
            sort=not args.no_sort,
            dedup=not args.no_dedup,
            compression=args.compression or None,
        )
        print(f"diffdb written -> {args.output}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
