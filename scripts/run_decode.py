"""spark-submit entry point: decode an EncodedTable back to parquet.

Usage:
    spark-submit --master local[8] --py-files dist/engine.zip \
        scripts/run_decode.py --table /tmp/enc --out /tmp/decoded.parquet \
        [--columns repo,lang]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--columns", help="comma-separated projection (pruned scan)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from embulk_output_s3_parquet_spark.jobs import decode_job

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cols = args.columns.split(",") if args.columns else None
    t0 = time.time()
    df = decode_job(spark, args.table, columns=cols)
    df.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"rows": n, "wall_s": round(time.time() - t0, 2), "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
