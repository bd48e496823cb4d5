"""spark-submit entry point: encode a corpus into an EncodedTable and verify.

Usage (north_rule packaging):
    python scripts/make_pyfiles.py   # builds dist/engine.zip
    spark-submit --master local[8] --py-files dist/engine.zip \
        scripts/run_encode.py --rows 20000 --out /tmp/enc_table [--verify]

Re-running the same command resumes from the manifest checkpoint: completed
partitions are skipped (the reference cannot do this, README.md:11).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--input-parquet", help="encode this parquet instead of the synthetic corpus")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--chunk-rows", type=int, default=32768)
    ap.add_argument("--target-part-mb", type=int, default=64)
    ap.add_argument("--codec", default="auto", help="default codec policy")
    ap.add_argument("--column-option", action="append", default=[], metavar="COL=CODEC")
    ap.add_argument(
        "--embulk-config",
        help="YAML/JSON file with an embulk-style out: section (column_options/"
        "type_options with logical_type etc.); the cast plan is applied "
        "before encoding",
    )
    ap.add_argument("--if-exists", default="skip", choices=["error", "skip", "delete"])
    ap.add_argument("--max-parts", type=int, default=None, help="commit at most N partitions (kill simulation)")
    ap.add_argument(
        "--cluster-by", default=None, metavar="COL[,COL...]",
        help="sort rows by these columns within each part before chunking "
        "(tight zone maps; Iceberg write-order analogue)",
    )
    ap.add_argument(
        "--zorder", action="store_true",
        help="with --cluster-by: Z-curve (rank-interleaved) clustering "
        "instead of lexicographic -- range predicates on ANY clustered "
        "column prune chunks (Delta OPTIMIZE ZORDER analogue)",
    )
    ap.add_argument(
        "--bucket-by", default=None, metavar="COL:N",
        help="bucket-major layout (Iceberg bucket transform): every part "
        "holds one pmod(xxhash64(COL), N) bucket -- enables the "
        "shuffle-free bucketed equi-join (operators.bucketjoin)",
    )
    ap.add_argument(
        "--bloom-columns", default=None, metavar="COL[,COL...]",
        help="record per-chunk Bloom filters on these columns (equality/IN "
        "data skipping for point lookups; string/binary/int only)",
    )
    ap.add_argument(
        "--ndv-columns", default=None, metavar="COL[,COL...]",
        help="record per-part HyperLogLog sketches on these columns for "
        "approximate COUNT(DISTINCT) (run_decode --ndv / jobs.distinct_job)",
    )
    ap.add_argument(
        "--direct", action="store_true",
        help="with --input-parquet: executor-side pyarrow split scans "
        "(encode_parquet_job) instead of the DataFrame path -- no "
        "JVM->Python raw-byte hop; same commit/resume protocol",
    )
    ap.add_argument("--verify", action="store_true", help="decode + per-row sha256 equality check")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from embulk_output_s3_parquet_spark.corpus import repos_df
    from embulk_output_s3_parquet_spark.jobs import (
        decode_job,
        encode_job,
        encode_parquet_job,
        table_metrics,
    )
    from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    col_opts = dict(kv.split("=", 1) for kv in args.column_option)
    policy = CodecPolicy(
        default=args.codec,
        column_options=col_opts,
        chunk_rows=args.chunk_rows,
        target_partition_bytes=args.target_part_mb * 1024 * 1024,
        bloom_columns=tuple(args.bloom_columns.split(",")) if args.bloom_columns else (),
        ndv_columns=tuple(args.ndv_columns.split(",")) if args.ndv_columns else (),
    )
    import os

    if args.input_parquet and not os.environ.get("SPARK_GRAFT_FIXED_SPLITS"):
        # size input splits so every core gets >=3 waves of tasks -- the
        # 128MB default reads a sub-GB corpus as a handful of partitions
        # and the last wave dominates wall time. SPARK_GRAFT_FIXED_SPLITS
        # disables this so scaling runs use identical config at all levels
        # (strong-scaling protocol).
        import glob

        n_cores = spark.sparkContext.defaultParallelism
        total = sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(args.input_parquet, "**"), recursive=True)
            if os.path.isfile(p)
        )
        split = min(max(total // (n_cores * 3), 4 << 20), 128 << 20)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
        spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 20))
        df = spark.read.parquet(args.input_parquet)
    elif args.input_parquet:
        df = spark.read.parquet(args.input_parquet)
    else:
        df = repos_df(spark, args.rows)

    if args.embulk_config:
        import yaml

        from embulk_output_s3_parquet_spark.plans.embulk_config import load_output_config

        with open(args.embulk_config) as fh:
            cfg = yaml.safe_load(fh)
        cfg = cfg.get("out", cfg)
        plan = load_output_config(cfg, df.schema)
        df = plan.apply(df)
        # engine-extension keys in the config (per-column codec / bloom)
        # merge into the CLI policy; explicit CLI flags win on conflict
        policy.column_options = {**plan.policy.column_options, **policy.column_options}
        policy.bloom_columns = tuple(
            dict.fromkeys(plan.policy.bloom_columns + policy.bloom_columns)
        )
        policy.ndv_columns = tuple(
            dict.fromkeys(plan.policy.ndv_columns + policy.ndv_columns)
        )
        if plan.cluster_by and not args.cluster_by:
            args.cluster_by = ",".join(plan.cluster_by)
        if plan.zorder and not args.zorder:
            args.zorder = True
        if plan.bucket_by and not args.bucket_by:
            args.bucket_by = f"{plan.bucket_by[0]}:{plan.bucket_by[1]}"

    # warm Python UDF workers on all cores so measured wall is steady-state
    import pyarrow as pa

    def _noop(batches):
        for b in batches:
            yield pa.RecordBatch.from_pydict({"n": pa.array([b.num_rows], pa.int32())})

    n_cores = spark.sparkContext.defaultParallelism
    spark.range(0, n_cores * 2, 1, n_cores * 2).mapInArrow(_noop, "n int").count()

    bucket_by = None
    if args.bucket_by:
        col, _, n = args.bucket_by.rpartition(":")
        if not col or not n.isdigit():
            raise SystemExit("--bucket-by must be COL:N (e.g. repo:64)")
        bucket_by = (col, int(n))

    t0 = time.time()
    if args.direct:
        if not args.input_parquet:
            raise SystemExit("--direct requires --input-parquet")
        if bucket_by:
            raise SystemExit(
                "--direct encodes split-index parts (file geometry); "
                "--bucket-by needs the DataFrame path"
            )
        table = encode_parquet_job(
            spark, args.input_parquet, args.out, policy,
            if_exists=args.if_exists, max_parts=args.max_parts,
            cluster_by=args.cluster_by.split(",") if args.cluster_by else None,
            zorder=args.zorder,
        )
    else:
        table = encode_job(
            spark, df, args.out, policy, if_exists=args.if_exists,
            max_parts=args.max_parts,
            cluster_by=args.cluster_by.split(",") if args.cluster_by else None,
            zorder=args.zorder,
            bucket_by=bucket_by,
        )
    wall = time.time() - t0
    m = table_metrics(table)
    m.update(wall_s=round(wall, 2), gbps=round(m["raw_bytes"] / max(wall, 1e-9) / 1e9, 4))

    if args.verify:
        decoded = decode_job(spark, args.out)
        key = ["repo", "path", "commit"]
        sha = lambda c: F.coalesce(F.sha2(F.col(c), 256), F.lit("NULL"))
        mismatches = (
            df.select(*key, sha("content").alias("a"))
            .join(decoded.select(*key, sha("content").alias("b")), key, "full_outer")
            .filter(F.col("a").isNull() | F.col("b").isNull() | (F.col("a") != F.col("b")))
            .count()
        )
        m["verify_mismatches"] = mismatches
        if mismatches:
            print(json.dumps(m))
            return 1
    print(json.dumps(m))
    return 0


if __name__ == "__main__":
    sys.exit(main())
