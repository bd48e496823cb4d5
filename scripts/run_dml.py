"""spark-submit entry point: table maintenance + row-level DML on an
EncodedTable (the Iceberg-maintenance analogue of the engine's job API).

Usage:
    spark-submit --master local[8] --py-files dist/engine.zip \
        scripts/run_dml.py delete --table /tmp/enc --where 'doc_id==7'
    ... update  --table T --where 'doc_id<50' --set "lang='xx'" \
                --set 'n_chars=n_chars + 1000'
    ... merge   --table T --source /path/src.parquet --on doc_id
    ... compact --table T [--cluster-by col1,col2]
    ... vacuum  --table T [--dry-run]
    ... snapshots --table T [--retain N]          # list / set retention
    ... rollback --table T --to-gen G             # undo rewrites atomically
    ... diff    --table T --from-gen G [--to-gen H] [--out /path.parquet]
    ... verify  --table T

Every subcommand prints ONE JSON report line (the job API's return value),
so the CLI is scriptable the way the reference plugin's TaskReports were.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

# plain `python scripts/run_dml.py` (no spark-submit --py-files) works for
# the Spark-free metadata subcommands (snapshots, verify, vacuum --dry-run):
# resolve the repo root like run_decode.py does
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WHERE_RE = re.compile(r"^(\w+)\s*(==|>=|<=|>|<)\s*(.+)$")
_SET_RE = re.compile(r"^(\w+)\s*=\s*(.+)$")


def _parse_where(exprs: list[str]) -> list[tuple]:
    out = []
    for e in exprs:
        m = _WHERE_RE.match(e.strip())
        if not m:
            raise SystemExit(f"--where must look like 'col>=literal', got {e!r}")
        col, op, lit = m.groups()
        try:
            val: object = int(lit)
        except ValueError:
            try:
                val = float(lit)
            except ValueError:
                val = lit.strip("'\"")
        out.append((col, op, val))
    return out


def _parse_set(exprs: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for e in exprs:
        m = _SET_RE.match(e.strip())
        if not m:
            raise SystemExit(f"--set must look like 'col=expression', got {e!r}")
        out[m.group(1)] = m.group(2)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser(
        "delete", help="row-level DELETE (copy-on-write or merge-on-read)"
    )
    p.add_argument("--table", required=True)
    p.add_argument("--where", action="append", required=True)
    p.add_argument(
        "--mode", choices=("cow", "mor"), default="cow",
        help="cow rewrites affected parts; mor records delete vectors "
        "(O(matched rows) bitmap bytes, zero payload writes) that readers "
        "mask and the next rewrite/compaction materializes",
    )

    p = sub.add_parser(
        "update", help="row-level UPDATE (copy-on-write or merge-on-read)"
    )
    p.add_argument("--table", required=True)
    p.add_argument("--where", action="append", required=True)
    p.add_argument("--set", action="append", required=True, dest="set_exprs")
    p.add_argument(
        "--mode", choices=("cow", "mor"), default="cow",
        help="cow rewrites affected parts; mor delete-vectors the matched "
        "rows and appends their updated images as new parts in one flip",
    )

    p = sub.add_parser("merge", help="MERGE/upsert a parquet source by key")
    p.add_argument("--table", required=True)
    p.add_argument("--source", required=True, help="parquet path, table columns")
    p.add_argument("--on", required=True, help="comma-separated key columns")
    p.add_argument(
        "--mode", choices=("cow", "mor"), default="cow",
        help="cow rewrites matched parts; mor vectors matched rows in "
        "place and appends the new images (trickle upserts)",
    )

    p = sub.add_parser("compact", help="rewrite into byte-balanced parts")
    p.add_argument("--table", required=True)
    p.add_argument("--cluster-by", help="comma-separated re-cluster columns")

    p = sub.add_parser(
        "optimize",
        help="selective small-part compaction (Iceberg rewrite_data_files "
        "size threshold / Delta OPTIMIZE): merge only parts below "
        "--min-part-bytes, healthy parts untouched",
    )
    p.add_argument("--table", required=True)
    p.add_argument(
        "--min-part-bytes", type=int, default=None,
        help="rewrite parts with encoded bytes below this (default: half "
        "the table policy's target partition bytes)",
    )
    p.add_argument(
        "--max-parts", type=int, default=None,
        help="bound one run to the N smallest selected parts",
    )
    p.add_argument(
        "--max-delete-ratio", type=float, default=None,
        help="also rewrite parts whose merge-on-read deleted fraction "
        "exceeds this (Iceberg rewrite_position_delete_files analogue)",
    )

    p = sub.add_parser("vacuum", help="remove orphans + expired snapshots")
    p.add_argument("--table", required=True)
    p.add_argument("--dry-run", action="store_true")
    p.add_argument(
        "--expire-older-than", dest="expire_older_than",
        help="also expire retained generations committed before this "
        "epoch-seconds or ISO-8601 instant (current + tagged always kept)",
    )

    p = sub.add_parser("snapshots", help="list generations / set retention")
    p.add_argument("--table", required=True)
    p.add_argument("--retain", type=int, help="set snapshot-retention to N")

    p = sub.add_parser(
        "tag", help="named refs: pin / unpin / list snapshot tags"
    )
    p.add_argument("--table", required=True)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--create", metavar="NAME", help="pin a generation")
    g.add_argument("--drop", metavar="NAME", help="unpin (vacuum reclaims)")
    g.add_argument("--list", action="store_true", dest="list_refs")
    p.add_argument(
        "--gen", type=int,
        help="with --create: pin this retained generation (default: "
        "freeze and pin the current one)",
    )

    p = sub.add_parser(
        "rollback", help="roll back to a retained snapshot generation"
    )
    p.add_argument("--table", required=True)
    p.add_argument(
        "--to-gen", required=True, dest="to_gen",
        help="generation number or tag name",
    )

    p = sub.add_parser(
        "diff", help="row-level changelog between two retained generations"
    )
    p.add_argument("--table", required=True)
    p.add_argument(
        "--from-gen", required=True, dest="from_gen",
        help="generation number or tag name",
    )
    p.add_argument("--to-gen", dest="to_gen", help="number or tag name")
    p.add_argument("--out", help="write changelog rows to this parquet path")

    p = sub.add_parser("verify", help="sha256 lineage audit")
    p.add_argument("--table", required=True)

    p = sub.add_parser("history", help="operation log (Iceberg snapshot-summary analogue)")
    p.add_argument("--table", required=True)

    p = sub.add_parser(
        "evolve",
        help="metadata-only schema evolution: ADD/DROP/WIDEN a column",
    )
    p.add_argument("--table", required=True)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--add", metavar="col:type", help="e.g. quality:double")
    g.add_argument("--drop", metavar="col")
    g.add_argument(
        "--widen", metavar="col:type",
        help="lossless promotion only, e.g. qty:bigint, amt:decimal(20,2)",
    )
    g.add_argument(
        "--rename", metavar="old:new",
        help="metadata-only RENAME COLUMN (readers translate old part data)",
    )

    args = ap.parse_args()

    t0 = time.time()
    # vacuum + snapshots are metadata-only: no SparkSession needed, which
    # keeps them runnable from a cron shell, not just spark-submit
    if args.cmd == "vacuum":
        from embulk_output_s3_parquet_spark.jobs import vacuum_job

        rep = vacuum_job(
            args.table,
            dry_run=args.dry_run,
            expire_older_than=args.expire_older_than,
        )
    elif args.cmd == "history":
        from embulk_output_s3_parquet_spark.sources.tables import EncodedTable

        rep = {"history": EncodedTable(args.table).history()}
    elif args.cmd == "evolve":
        from pyspark.sql import types as T

        from embulk_output_s3_parquet_spark.sources.tables import EncodedTable

        # local name->type table (T._parse_datatype_string needs a live
        # SparkSession; evolution is metadata-only and must run Spark-free)
        scalars = {
            "boolean": T.BooleanType(), "tinyint": T.ByteType(),
            "smallint": T.ShortType(), "int": T.IntegerType(),
            "integer": T.IntegerType(), "bigint": T.LongType(),
            "long": T.LongType(), "float": T.FloatType(),
            "double": T.DoubleType(), "string": T.StringType(),
            "binary": T.BinaryType(), "date": T.DateType(),
            "timestamp": T.TimestampType(),
            "timestamp_ntz": T.TimestampNTZType(),
        }
        dec_re = re.compile(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")

        def _coltype(spec: str):
            col, _, tname = spec.partition(":")
            tname = tname.strip().lower()
            if not tname:
                raise SystemExit(f"expected col:type, got {spec!r}")
            if tname in scalars:
                return col, scalars[tname]
            m = dec_re.match(tname)
            if m:
                return col, T.DecimalType(int(m.group(1)), int(m.group(2)))
            raise SystemExit(
                f"bad type {tname!r} (supported: {sorted(scalars)}, decimal(p,s))"
            )

        t = EncodedTable(args.table)
        if args.add:
            col, dt = _coltype(args.add)
            t.add_column(col, dt)
            rep = {"op": "add_column", "column": col, "type": dt.simpleString()}
        elif args.drop:
            t.drop_column(args.drop)
            rep = {"op": "drop_column", "column": args.drop}
        elif args.rename:
            old, _, new = args.rename.partition(":")
            if not new:
                raise SystemExit(f"expected old:new, got {args.rename!r}")
            t.rename_column(old, new)
            rep = {"op": "rename_column", "from": old, "to": new}
        else:
            col, dt = _coltype(args.widen)
            t.widen_column(col, dt)
            rep = {"op": "widen_column", "column": col, "type": dt.simpleString()}
        rep["schema"] = [
            f"{f.name}:{f.dataType.simpleString()}" for f in t.schema().fields
        ]
    elif args.cmd == "rollback":
        from embulk_output_s3_parquet_spark.jobs import rollback_job

        rep = rollback_job(args.table, args.to_gen)
    elif args.cmd == "snapshots":
        from embulk_output_s3_parquet_spark.sources.tables import EncodedTable

        t = EncodedTable(args.table)
        if args.retain is not None:
            t.set_snapshot_retention(args.retain)
        rep = {
            "generations": t.generations(),
            "retained": t.retained_generations(),
            "snapshot_retention": t.snapshot_retention(),
            "refs": t.refs(),
            "committed_at": {
                g: t.gen_timestamps().get(g) for g in t.generations()
            },
        }
    elif args.cmd == "tag":
        from embulk_output_s3_parquet_spark.sources.tables import EncodedTable

        t = EncodedTable(args.table)
        if args.create:
            gen = t.create_tag(args.create, gen=args.gen)
            rep = {"created": args.create, "gen": gen, "refs": t.refs()}
        elif args.drop:
            gen = t.drop_tag(args.drop)
            rep = {"dropped": args.drop, "gen": gen, "refs": t.refs()}
        else:
            rep = {"refs": t.refs(), "retained": t.retained_generations()}
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        if args.cmd == "delete":
            from embulk_output_s3_parquet_spark.jobs import delete_job

            rep = delete_job(
                spark, args.table, _parse_where(args.where), mode=args.mode
            )
        elif args.cmd == "update":
            from embulk_output_s3_parquet_spark.jobs import update_job

            rep = update_job(
                spark, args.table, _parse_where(args.where),
                _parse_set(args.set_exprs), mode=args.mode,
            )
        elif args.cmd == "merge":
            from embulk_output_s3_parquet_spark.jobs import merge_job

            src = spark.read.parquet(args.source)
            rep = merge_job(
                spark, args.table, src, on=args.on.split(","), mode=args.mode
            )
        elif args.cmd == "compact":
            from embulk_output_s3_parquet_spark.jobs import compact_job

            cb = args.cluster_by.split(",") if args.cluster_by else None
            t = compact_job(spark, args.table, cluster_by=cb)
            rep = {"parts": len(t.lineage())}
        elif args.cmd == "optimize":
            from embulk_output_s3_parquet_spark.jobs import (
                rewrite_small_parts,
            )

            rep = rewrite_small_parts(
                spark, args.table, min_part_bytes=args.min_part_bytes,
                max_parts=args.max_parts,
                max_delete_ratio=args.max_delete_ratio,
            )
        elif args.cmd == "diff":
            from embulk_output_s3_parquet_spark.jobs import (
                diff_job, diff_summary,
            )

            rep = diff_summary(args.table, args.from_gen, args.to_gen)
            if args.out:
                df = diff_job(spark, args.table, args.from_gen, args.to_gen)
                df.write.mode("error").parquet(args.out)
                rep["out"] = args.out
                rep["changelog_rows"] = spark.read.parquet(args.out).count()
        elif args.cmd == "verify":
            from embulk_output_s3_parquet_spark.jobs import verify_table

            problems = verify_table(spark, args.table)
            rep = {"problems": problems, "ok": not problems}
        else:  # pragma: no cover
            raise SystemExit(f"unknown command {args.cmd}")

    rep["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(rep))
    return 0 if rep.get("ok", True) else 1


if __name__ == "__main__":
    sys.exit(main())
