"""Streaming encode sink: multi-micro-batch run drains a file source into an
EncodedTable; decode must reproduce every row exactly once (the engine's
extension beyond the strictly-batch reference, reference README.md:10-12)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_output_s3_parquet_spark.corpus import repos_df
from embulk_output_s3_parquet_spark.jobs import decode_job
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
from embulk_output_s3_parquet_spark.sources.tables import EncodedTable
from embulk_output_s3_parquet_spark.streaming.encode_stream import (
    PART_STRIDE,
    encode_stream,
)


@pytest.mark.timeout(600)
def test_stream_encode_exactly_once(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    corpus = repos_df(spark, 1200, partitions=6).cache()
    corpus.write.parquet(src_dir)

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 2)  # force several micro-batches
        .parquet(src_dir)
    )
    table_path = str(tmp_path / "enc")
    q = encode_stream(
        stream,
        table_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        policy=CodecPolicy(chunk_rows=512, target_partition_bytes=256 * 1024),
    )
    q.awaitTermination(300)

    t = EncodedTable(table_path)
    parts = t.completed_parts()
    batches = {p // PART_STRIDE for p in parts}
    assert len(batches) >= 2, f"expected multiple micro-batches, got {batches}"

    decoded = decode_job(spark, table_path)
    key = ["repo", "path", "commit"]
    assert decoded.count() == 1200
    sha = lambda c: F.coalesce(F.sha2(F.col(c), 256), F.lit("N"))
    bad = (
        corpus.select(*key, sha("content").alias("a"))
        .join(decoded.select(*key, sha("content").alias("b")), key, "full_outer")
        .filter(F.col("a").isNull() | F.col("b").isNull() | (F.col("a") != F.col("b")))
        .count()
    )
    assert bad == 0
