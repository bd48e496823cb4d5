"""spark-submit entry point: decode an EncodedTable back to parquet.

Usage:
    spark-submit --master local[8] --py-files dist/engine.zip \
        scripts/run_decode.py --table /tmp/enc --out /tmp/decoded.parquet \
        [--columns repo,lang] [--where 'lang==go' --where 'n>=100']
    ... --count [--where ...]   # metadata-first COUNT(*), no --out needed
    ... --minmax col1,col2 [--where ...]   # metadata-first MIN/MAX
    ... --sum col1,col2 [--where ...]      # metadata-first SUM/AVG
    ... --ndv col1,col2                    # approx COUNT(DISTINCT), HLL
    ... --quantile col --q 0.1,0.5,0.9    # percentile bounds from zones
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

# plain `python scripts/run_decode.py` (no spark-submit --py-files) works
# for the Spark-free metadata paths (--ndv): resolve the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WHERE_RE = re.compile(r"^(\w+)\s*(==|>=|<=|>|<)\s*(.+)$")


def _parse_where(exprs: list[str]) -> list[tuple] | None:
    """'col==lit' / 'col>=lit' strings -> zone conjuncts; numeric literals
    are coerced so they compare against int/float zone bounds."""
    out = []
    for e in exprs:
        m = _WHERE_RE.match(e.strip())
        if not m:
            raise SystemExit(f"--where must look like 'col>=literal', got {e!r}")
        col, op, lit = m.groups()
        try:
            val = int(lit)
        except ValueError:
            try:
                val = float(lit)
            except ValueError:
                val = lit.strip("'\"")
        out.append((col, op, val))
    return out or None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--out")
    ap.add_argument(
        "--count", action="store_true",
        help="exact COUNT(*) under --where via jobs.count_job: payload bytes "
        "are read only for boundary chunks the zone/null metadata can't "
        "decide (no --out required)",
    )
    ap.add_argument("--columns", help="comma-separated projection (pruned scan)")
    ap.add_argument(
        "--minmax", metavar="COL,COL",
        help="exact MIN/MAX per column under --where via jobs.minmax_job: "
        "with no predicate this is a pure manifest pass (no --out required)",
    )
    ap.add_argument(
        "--sum", metavar="COL,COL", dest="sum_cols",
        help="exact SUM/AVG per numeric column under --where via "
        "jobs.sum_job (per-chunk sums recorded at encode time; no --out "
        "required)",
    )
    ap.add_argument(
        "--ndv", metavar="COL,COL", dest="ndv_cols",
        help="approximate COUNT(DISTINCT) per column from the per-part "
        "HyperLogLog sketches (encode with --ndv-columns; Spark-free "
        "manifest pass, no --out required)",
    )
    ap.add_argument(
        "--quantile", metavar="COL", dest="quantile_col",
        help="approximate percentiles with PROVABLE bounds from chunk zone "
        "maps alone (payloads never read); quantiles via --q",
    )
    ap.add_argument(
        "--q", default="0.5", metavar="Q[,Q...]",
        help="comma-separated quantiles in [0,1] for --quantile "
        "(default 0.5)",
    )
    ap.add_argument(
        "--at-gen",
        help="time travel: read a retained part-set generation by number "
        "OR tag name (requires snapshot-retention > 0 or a tag; see "
        "run_dml.py snapshots/tag)",
    )
    ap.add_argument(
        "--at-ts",
        help="time travel by wall clock: latest generation committed at "
        "or before this epoch-seconds float or ISO-8601 timestamp",
    )
    ap.add_argument(
        "--since-part", type=int, default=None,
        help="with --direct: incremental export of parts ABOVE this "
        "watermark (appends beside the previous export; returned "
        "max_part_id is the next watermark)",
    )
    ap.add_argument(
        "--expect-gen", type=int, default=None,
        help="with --since-part: refuse if the table generation moved (a "
        "rewrite changed history)",
    )
    ap.add_argument(
        "--direct", action="store_true",
        help="executor-side export (jobs.export_job): tasks decode with "
        "pyarrow and write parquet straight to --out, no JVM<->Python hop; "
        "--where is applied EXACTLY",
    )
    ap.add_argument(
        "--sample", type=float, metavar="FRACTION",
        help="TABLESAMPLE SYSTEM via jobs.sample_job: deterministic cluster "
        "sample whose IO (and task count at --sample-by part) scales with "
        "the fraction; composes with --where/--columns/--out",
    )
    ap.add_argument(
        "--seed", type=int, default=42, help="sample determinism seed",
    )
    ap.add_argument(
        "--sample-by", choices=("part", "chunk"), default="part",
        help="sampling granularity: 'part' skips whole parts driver-side "
        "(no task scheduled), 'chunk' samples chunks inside every "
        "surviving part",
    )
    ap.add_argument(
        "--where", action="append", default=[], metavar="COL OP LIT",
        help="zone-map conjunct, e.g. 'n_chars>=100' (repeatable, ANDed; "
        "may-match contract -- rows are pre-filtered by chunk zones, the "
        "exact filter is applied after decode)",
    )
    ap.add_argument(
        "--changes-from", metavar="GEN_OR_TAG",
        help="Spark-free batch change feed (pyreader.changes_table): the "
        "row-level delta from this generation/tag to --changes-to (default "
        "live) as parquet at --out, with _change_type/_commit_gen/"
        "_commit_ts; tag-after-drain makes this an incremental consumer "
        "with no running Spark",
    )
    ap.add_argument(
        "--changes-to", metavar="GEN_OR_TAG", default=None,
        help="closing bound for --changes-from (default: live table)",
    )
    args = ap.parse_args()

    if args.changes_from is not None:
        import pyarrow.parquet as pq

        from embulk_output_s3_parquet_spark.sources.pyreader import (
            changes_table,
        )

        t0 = time.time()
        cols = args.columns.split(",") if args.columns else None
        tbl = changes_table(
            args.table, args.changes_from, args.changes_to, columns=cols
        )
        import pyarrow.compute as pc

        vc = pc.value_counts(tbl.column("_change_type"))
        rep = {
            "rows": tbl.num_rows,
            "by_change_type": {
                str(e["values"]): int(e["counts"]) for e in vc.to_pylist()
            },
            "wall_s": round(time.time() - t0, 2),
        }
        if args.out:
            pq.write_table(tbl, args.out)
            rep["out"] = args.out
        print(json.dumps(rep))
        return 0

    if args.at_ts:
        if args.at_gen is not None:
            raise SystemExit("--at-ts and --at-gen are mutually exclusive")
        from embulk_output_s3_parquet_spark.sources.tables import EncodedTable

        args.at_gen = EncodedTable(args.table).resolve_at_ts(args.at_ts)

    if args.ndv_cols:
        # Spark-free driver manifest pass: answer BEFORE paying JVM startup
        from embulk_output_s3_parquet_spark.jobs import distinct_job

        if args.where:
            raise SystemExit("--ndv does not support --where (sketches are "
                             "table-wide; filter-scoped NDV needs a scan)")
        t0 = time.time()
        rep = distinct_job(args.table, args.ndv_cols.split(","), at_gen=args.at_gen)
        print(json.dumps({"ndv": rep, "wall_s": round(time.time() - t0, 2)}))
        return 0

    from pyspark.sql import SparkSession

    from embulk_output_s3_parquet_spark.jobs import decode_job

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cols = args.columns.split(",") if args.columns else None
    where = _parse_where(args.where)
    t0 = time.time()
    if args.count:
        from embulk_output_s3_parquet_spark.jobs import count_job

        n = count_job(spark, args.table, where=where, at_gen=args.at_gen)
        print(json.dumps({"count": n, "wall_s": round(time.time() - t0, 2)}))
        return 0
    if args.quantile_col:
        from embulk_output_s3_parquet_spark.jobs import quantile_job

        rep = quantile_job(
            spark, args.table, args.quantile_col,
            [float(x) for x in args.q.split(",")],
            at_gen=args.at_gen,
        )
        print(json.dumps({
            "n": rep["n"],
            "quantiles": {str(q): v for q, v in rep["quantiles"].items()},
            "deleted": rep.get("deleted", 0),
            "wall_s": round(time.time() - t0, 2),
        }))
        return 0
    if args.sum_cols:
        from embulk_output_s3_parquet_spark.jobs import sum_job

        agg = sum_job(
            spark, args.table, args.sum_cols.split(","), where=where,
            at_gen=args.at_gen,
        )
        print(json.dumps(
            {"sum": {c: {k: (str(v) if v is not None else None) for k, v in e.items()}
                     for c, e in agg.items()},
             "wall_s": round(time.time() - t0, 2)}
        ))
        return 0
    if args.minmax:
        from embulk_output_s3_parquet_spark.jobs import minmax_job

        mm = minmax_job(
            spark, args.table, args.minmax.split(","), where=where,
            at_gen=args.at_gen,
        )
        print(json.dumps(
            {"minmax": {c: [str(lo), str(hi)] if lo is not None else [None, None]
                        for c, (lo, hi) in mm.items()},
             "wall_s": round(time.time() - t0, 2)}
        ))
        return 0
    if args.sample is not None:
        from embulk_output_s3_parquet_spark.jobs import sample_job

        df = sample_job(
            spark, args.table, args.sample, seed=args.seed, columns=cols,
            where=where, granularity=args.sample_by,
        )
        if where:
            from pyspark.sql import functions as F

            ops = {"==": "==", ">=": ">=", "<=": "<=", ">": ">", "<": "<"}
            for c, op, v in where:  # exact filter over the may-match scan
                df = df.filter(F.expr(f"`{c}` {ops[op]} {v!r}"))
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(json.dumps({
                "rows": spark.read.parquet(args.out).count(),
                "fraction": args.sample, "seed": args.seed,
                "wall_s": round(time.time() - t0, 2), "out": args.out,
            }))
        else:
            print(json.dumps({
                "rows": df.count(), "fraction": args.sample,
                "seed": args.seed, "wall_s": round(time.time() - t0, 2),
            }))
        return 0
    if not args.out:
        raise SystemExit("--out is required unless --count is given")
    if args.direct:
        from embulk_output_s3_parquet_spark.jobs import export_job

        rep = export_job(
            spark, args.table, args.out, columns=cols, where=where,
            at_gen=args.at_gen, since_part=args.since_part,
            expect_gen=args.expect_gen,
        )
        print(json.dumps({**rep, "out": args.out}))
        return 0
    df = decode_job(spark, args.table, columns=cols, where=where, at_gen=args.at_gen)
    if where:
        from pyspark.sql import functions as F

        ops = {"==": "==", ">=": ">=", "<=": "<=", ">": ">", "<": "<"}
        for col, op, val in where:  # exact filter over the may-match scan
            df = df.filter(F.expr(f"`{col}` {ops[op]} {val!r}"))
    df.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"rows": n, "wall_s": round(time.time() - t0, 2), "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
