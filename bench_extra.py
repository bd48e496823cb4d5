"""Stage-isolation benchmarks (guide §1.4): time each expensive query's
pieces with the noop sink so optimization targets the real cost, not the
sink or the driver. NOT part of the frozen bench contract; numbers are
cited in OPTIMIZATION_r06.md.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [section]
Sections: rt, minhash, corpus, q3, ann (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from embulk_output_s3_parquet_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, repeats=2):
    best = None
    for _ in range(repeats):
        os.sync()
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(app="bench_extra", cores=cores)

    import pyarrow as pa

    def _noop_udf(batches):
        for b in batches:
            yield pa.RecordBatch.from_pydict({"n": pa.array([b.num_rows], pa.int32())})

    spark.range(0, cores * 2, 1, cores * 2).mapInArrow(_noop_udf, "n int").count()

    from embulk_output_s3_parquet_spark.operators.decode import decode_inline, roundtrip
    from embulk_output_s3_parquet_spark.operators.encode import encode_map
    from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy

    if section in ("all", "rt"):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        print(f"lineitem partitions: {li.rdd.getNumPartitions()}")
        timed(spark, "rt/scan_noop", lambda: noop(li))

        def passthrough(batches):
            yield from batches

        ipc = li.mapInArrow(passthrough, li.schema)
        timed(spark, "rt/scan_ipc_noop", lambda: noop(ipc))
        pol = CodecPolicy(chunk_rows=8192)
        enc = encode_map(li, pol)
        timed(spark, "rt/encode_map_count", lambda: enc.count())
        timed(spark, "rt/roundtrip_count", lambda: roundtrip(li, pol).count())
        out = roundtrip(li, pol).withColumn(
            "l_shipdate", F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss")
        )
        timed(spark, "rt/full_query_count", lambda: out.count())

    if section in ("all", "minhash"):
        from embulk_output_s3_parquet_spark.functions.dedup import (
            minhash_lsh_candidates,
            minhash_signatures,
            shingle_stream,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        timed(spark, "mh/docs_scan_noop", lambda: noop(docs))
        timed(
            spark,
            "mh/shingle_stream_noop",
            lambda: noop(shingle_stream(docs, 5, "text", "doc_id", dedupe=False)),
        )
        timed(
            spark,
            "mh/signatures_noop",
            lambda: noop(
                minhash_signatures(docs, 32, 5, "text", "doc_id", "md5", sample_mod=2)
            ),
        )
        timed(
            spark,
            "mh/full_count",
            lambda: minhash_lsh_candidates(
                docs, num_hashes=32, bands=8, hasher="md5", sample_mod=2
            )
            .orderBy("id_a", "id_b")
            .count(),
        )

    if section in ("all", "q3"):
        from __spark_entry__ import _q3

        timed(spark, "q3/full_count", lambda: _q3(spark, sf_dir).count())

    if section in ("all", "ann"):
        from __spark_entry__ import _ann_topk

        timed(spark, "ann/full_count", lambda: _ann_topk(spark, sf_dir).count())

    if section in ("all", "corpus"):
        from embulk_output_s3_parquet_spark.operators.encode import encode_direct

        corpus_path = "/tmp/bench_corpus_100000.parquet"
        if os.path.exists(corpus_path):
            pol = CodecPolicy(chunk_rows=32768)
            timed(
                spark,
                "corpus/encode_direct_agg",
                lambda: encode_direct(
                    spark, corpus_path, pol, parallelism=max(cores // 2, 1)
                )
                .agg(F.sum("raw_bytes"), F.sum("enc_bytes"))
                .first(),
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
