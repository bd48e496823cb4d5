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


@pytest.mark.timeout(600)
def test_stream_restart_no_duplicates(spark, tmp_path):
    """Restarting the stream with the same checkpoint after new files arrive
    processes only the new batch; earlier parts stay committed untouched."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    first = repos_df(spark, 400, partitions=2).cache()
    first.write.parquet(str(src_dir / "w1"))

    schema = first.schema
    table_path = str(tmp_path / "enc")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 4
        ).parquet(str(src_dir) + "/*")
        q = encode_stream(
            stream, table_path, ckpt,
            policy=CodecPolicy(chunk_rows=256, target_partition_bytes=128 * 1024),
        )
        q.awaitTermination(300)

    drain()
    t = EncodedTable(table_path)
    parts1 = t.completed_parts()
    rows1 = decode_job(spark, table_path).count()
    assert rows1 == 400

    from pyspark.sql import functions as F2

    second = repos_df(spark, 700, partitions=2).where(F2.xxhash64("commit") % 2 == 0)
    n2 = second.count()
    second.write.parquet(str(src_dir / "w2"))

    drain()  # restart with same checkpoint
    t2 = EncodedTable(table_path)
    assert parts1 <= t2.completed_parts()
    total = decode_job(spark, table_path).count()
    assert total == 400 + n2


@pytest.mark.timeout(600)
@pytest.mark.slow
def test_compaction_after_streaming(spark, tmp_path):
    """Micro-batches leave many small parts; compact_job rewrites them into
    freshly planned parts with identical content."""
    from pyspark.sql import functions as F

    from embulk_output_s3_parquet_spark.jobs import compact_job

    src_dir = str(tmp_path / "src")
    corpus = repos_df(spark, 900, partitions=6).cache()
    corpus.write.parquet(src_dir)
    table_path = str(tmp_path / "enc")
    q = encode_stream(
        spark.readStream.schema(corpus.schema).option("maxFilesPerTrigger", 1).parquet(src_dir),
        table_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        policy=CodecPolicy(chunk_rows=128, target_partition_bytes=64 * 1024),
    )
    q.awaitTermination(300)
    before = len(EncodedTable(table_path).completed_parts())
    assert before > 4  # several micro-batches x several parts

    t = compact_job(
        spark, table_path, CodecPolicy(chunk_rows=1024, target_partition_bytes=1 << 20)
    )
    after = len(t.completed_parts())
    assert after < before

    decoded = decode_job(spark, table_path)
    assert decoded.count() == 900
    key = ["repo", "path", "commit"]
    sha = lambda c: F.coalesce(F.sha2(F.col(c), 256), F.lit("N"))
    bad = (
        corpus.select(*key, sha("content").alias("a"))
        .join(decoded.select(*key, sha("content").alias("b")), key, "full_outer")
        .filter(F.col("a").isNull() | F.col("b").isNull() | (F.col("a") != F.col("b")))
        .count()
    )
    assert bad == 0
    # no stray dirs beyond the manifest
    import os

    dirs = {d for d in os.listdir(t.data_dir) if d.startswith("part_id=")}
    assert dirs == {f"part_id={p}" for p in t.completed_parts()}


def test_large_batch_id_part_ids_stay_long(spark, tmp_path):
    """batch_id >= 2048 pushes part_base past int32 (ADVICE round 1: a
    narrowing cast crashed under ANSI / silently collided without it);
    part_id must stay long end-to-end and round-trip."""
    from embulk_output_s3_parquet_spark.jobs import decode_job, encode_job
    from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
    from embulk_output_s3_parquet_spark.streaming.encode_stream import PART_STRIDE

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], "doc_id long, text string"
    )
    path = str(tmp_path / "enc")
    big_base = 5000 * PART_STRIDE  # > 2^31
    assert big_base > 2**31
    t = encode_job(
        spark, df, path, CodecPolicy(chunk_rows=16), if_exists="skip", part_base=big_base
    )
    parts = t.completed_parts()
    assert parts and all(p >= big_base for p in parts)
    out = decode_job(spark, path)
    assert out.count() == 50
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == set(range(50))
    # replay of the same batch is a no-op (exactly-once argument)
    t2 = encode_job(
        spark, df, path, CodecPolicy(chunk_rows=16), if_exists="skip", part_base=big_base
    )
    assert t2.completed_parts() == parts


@pytest.mark.timeout(600)
def test_windowed_event_stats_matches_batch(spark, tmp_path):
    """Streaming watermarked windowed agg over the events table (file source,
    several micro-batches) must equal the same aggregation run in batch --
    no event lost or double-counted, late rows inside the watermark kept."""
    from embulk_output_s3_parquet_spark.streaming.analytics import windowed_event_stats

    import time as _time

    from pyspark.sql import Window

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_src")
    # a real event stream arrives near-ordered; emulate it by writing 12
    # time-slices as separate files with increasing mtimes (the file source
    # processes by timestamp) -- events later than the watermark are MEANT
    # to be dropped, so an unordered source would (correctly) lose rows and
    # the batch comparison would not hold
    sliced = events.withColumn("b", F.ntile(12).over(Window.orderBy("ts")))
    for i in range(1, 13):
        sliced.filter(F.col("b") == i).drop("b").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(0.05)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)  # 12 micro-batches: the watermark
        # advances 11 times, closing all but the final sliver of windows
        .parquet(src)
    )
    out_rows = []
    q = (
        windowed_event_stats(stream, window="1 hour", watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("win_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_stats").collect()
    }
    want_df = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    want = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in want_df.collect()}
    # append mode only emits windows the watermark has CLOSED; every emitted
    # window must match batch exactly, and most windows must have closed
    assert got, "no windows emitted"
    for k, v in got.items():
        assert want[k] == v, (k, v, want[k])
    # windows from the final trigger(s) stay open (the watermark only closes
    # them on a subsequent batch); everything older must have been emitted
    assert len(got) >= len(want) * 0.6, (len(got), len(want))


@pytest.mark.timeout(600)
def test_running_user_totals_stateful(spark, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches:
    the LAST update per user equals the batch per-user totals."""
    from embulk_output_s3_parquet_spark.streaming.analytics import running_user_totals

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_src2")
    events.repartition(6).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # memory sink in update mode appends each update; the max events_so_far
    # per user is the final state
    final = {
        r["user_id"]: (r["events_so_far"], r["value_so_far"])
        for r in spark.sql(
            """SELECT user_id, events_so_far, value_so_far FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY events_so_far DESC) AS rn
                 FROM user_totals) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 6).alias("s"),
        )
        .collect()
    }
    assert final.keys() == want.keys()
    for u in want:
        assert final[u][0] == want[u][0]
        assert abs(final[u][1] - want[u][1]) < 1e-6


@pytest.mark.timeout(600)
@pytest.mark.slow
def test_windowed_stats_into_encode_sink(spark, tmp_path):
    """The streaming composition the engine exists for: watermarked windowed
    aggregates drained straight into the columnar-encode sink, decoded back
    exactly."""
    from embulk_output_s3_parquet_spark.streaming.analytics import windowed_event_stats

    import time as _time

    from pyspark.sql import Window

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_src3")
    # time-ordered slice files with increasing mtimes (see
    # test_windowed_event_stats_matches_batch): guarantees the watermark
    # advances monotonically, so early windows always close and emit
    sliced = events.withColumn("b", F.ntile(6).over(Window.orderBy("ts")))
    for i in range(1, 7):
        sliced.filter(F.col("b") == i).drop("b").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(0.05)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stats = windowed_event_stats(stream, window="1 hour", watermark="2 hours")
    # encode sink expects stable column types; timestamps encode natively
    table_path = str(tmp_path / "enc_stats")
    q = encode_stream(
        stats,
        table_path,
        checkpoint_dir=str(tmp_path / "ckpt3"),
        policy=CodecPolicy(chunk_rows=256, target_partition_bytes=64 * 1024),
    )
    q.awaitTermination(300)

    decoded = decode_job(spark, table_path)
    rows = decoded.count()
    assert rows > 0
    # every decoded window row matches the batch aggregation exactly
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["s"])
        for r in events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
        .collect()
    }
    for r in decoded.collect():
        k = (r["window_start"], r["event_type"])
        assert want[k] == (r["n_events"], r["sum_value"]), (k, r)


def test_enctable_source_feeds_windowed_analytics(spark, tmp_path):
    """Full loop: events encoded into an EncodedTable in two appended waves,
    then STREAMED back out via the enctable source into the watermarked
    windowed aggregate -- wave 2's micro-batch advances the watermark past
    wave 1's windows, so append mode emits them; every emitted row must
    equal the batch aggregate."""
    from pyspark.sql import functions as F

    from embulk_output_s3_parquet_spark.jobs import encode_job
    from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )
    from embulk_output_s3_parquet_spark.streaming.analytics import (
        windowed_event_stats,
    )
    from embulk_output_s3_parquet_spark.streaming.encode_stream import PART_STRIDE

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cut = ev.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.8) p"
    ).first()["p"]
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wave1 = ev.filter(us <= cut)
    wave2 = ev.filter(us > cut)
    table = str(tmp_path / "evt")
    pol = CodecPolicy(chunk_rows=256)
    encode_job(spark, wave1, table, pol, if_exists="error")
    spark.dataSource.register(EncodedTableDataSource)

    out_dir, chk = str(tmp_path / "out"), str(tmp_path / "chk")

    def drain():
        q = (
            windowed_event_stats(
                spark.readStream.format("enctable").load(table),
                window="1 hour", watermark="0 seconds",
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()  # batch 1: wave1 ingested, its windows still open
    encode_job(spark, wave2, table, pol, if_exists="skip", part_base=PART_STRIDE)
    drain()  # batch 2: watermark passes wave1's windows -> emitted

    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    want = {
        tuple(r)
        for r in windowed_event_stats(ev, window="1 hour", watermark="0 seconds").collect()
    }
    assert len(got) > 0
    assert got <= want
    assert len(got) >= len(want) * 0.5


def test_enctable_stream_reads_evolved_schema(spark, tmp_path):
    """Schema evolution meets the stream source (r4): a table that gained a
    column mid-life streams coherently -- parts predating add_column yield
    nulls for it, later parts yield real values."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from embulk_output_s3_parquet_spark.jobs import encode_job
    from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )
    from embulk_output_s3_parquet_spark.sources.tables import EncodedTable
    from embulk_output_s3_parquet_spark.streaming.encode_stream import PART_STRIDE

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    table = str(tmp_path / "evo")
    pol = CodecPolicy(chunk_rows=128)
    encode_job(spark, docs.limit(100), table, pol, if_exists="error")
    EncodedTable(table).add_column("score", T.DoubleType())
    encode_job(
        spark,
        docs.limit(140).subtract(docs.limit(100)).withColumn(
            "score", F.lit(0.5)
        ),
        table, pol, if_exists="skip", part_base=PART_STRIDE,
    )
    spark.dataSource.register(EncodedTableDataSource)
    out_dir, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    q = (
        spark.readStream.format("enctable").load(table)
        .writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", chk)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir)
    assert got.count() == 140
    assert got.filter(F.col("score").isNull()).count() == 100
    assert got.filter(F.col("score") == 0.5).count() == 40
