"""Merge-on-read MERGE (merge_job(mode="mor")): the trickle-upsert path
that completes the MoR DML matrix (delete/update/merge).

Matched TARGET rows are delete-vectored in place and the source's updated
images + inserts append as NEW parts, one atomic generation flip -- the
affected parts are never rewritten (pytest pins file mtimes). Composite
keys stay exact through the tuple-membership refine: per-column IN lists
admit the cross product, the refine mask narrows to the source's actual
key tuples.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from embulk_output_s3_parquet_spark.jobs import (
    compact_job,
    count_job,
    decode_job,
    encode_job,
    merge_job,
    verify_table,
)
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy, ConfigException
from embulk_output_s3_parquet_spark.sources.pyreader import read_table
from embulk_output_s3_parquet_spark.sources.tables import EncodedTable


def _pol(**kw):
    kw.setdefault("target_partition_bytes", 64 * 1024)
    kw.setdefault("chunk_rows", 64)
    return CodecPolicy(**kw)


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture()
def table(spark, docs, tmp_path):
    path = str(tmp_path / "mor_merge")
    encode_job(spark, docs, path, _pol(), if_exists="error")
    return path


def _mtimes(t: EncodedTable, pids: set[int]) -> dict[str, float]:
    return {
        f: os.path.getmtime(f)
        for d in t.committed_part_dirs()
        if int(os.path.basename(d).split("=")[1]) in pids
        for f in [os.path.join(d, x) for x in os.listdir(d)]
    }


def test_mor_merge_vectors_and_appends(spark, docs, table):
    n = docs.count()
    t = EncodedTable(table)
    parts_before = set(t.completed_parts())
    before = _mtimes(t, parts_before)

    # 40 updated images of existing keys + 10 brand-new keys
    src = (
        docs.where(F.col("doc_id") < 40)
        .withColumn("lang", F.lit("xx"))
        .unionByName(
            docs.where(F.col("doc_id") < 10).withColumn(
                "doc_id", F.col("doc_id") + n
            )
        )
    )
    rep = merge_job(spark, table, src, on=["doc_id"], mode="mor")
    assert rep["mode"] == "mor"
    assert rep["rows_updated"] == 40 and rep["rows_inserted"] == 10
    assert rep["parts_rewritten"] == 0
    assert rep["parts_appended"] >= 1 and rep["dv_parts"] >= 1

    # zero payload rewrites: the pre-merge part files are byte-untouched
    t2 = EncodedTable(table)
    assert parts_before < set(t2.completed_parts())
    assert _mtimes(t2, parts_before) == before

    # exactly one image of every key; updates and inserts both visible
    got = decode_job(spark, table)
    assert got.count() == n + 10
    assert got.where(F.col("lang") == "xx").count() == 40
    assert (
        got.where((F.col("doc_id") < 40) & (F.col("lang") != "xx")).count() == 0
    )
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == list(
        range(n + 10)
    )
    # Spark-free reader and metadata-first count agree
    assert read_table(table).num_rows == n + 10
    assert count_job(spark, table) == n + 10
    assert verify_table(spark, table) == []


def test_mor_merge_composite_key_exact(spark, tmp_path):
    """Per-column IN admission over-matches composite keys (the cross
    product); the tuple refine must vector ONLY the source's key pairs."""
    path = str(tmp_path / "composite")
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (2, 1, "c"), (2, 2, "d")],
        "k1 int, k2 int, v string",
    )
    encode_job(spark, df, path, _pol(chunk_rows=2), if_exists="error")

    src = spark.createDataFrame(
        [(1, 1, "A"), (2, 2, "D"), (3, 3, "NEW")], "k1 int, k2 int, v string"
    )
    rep = merge_job(spark, path, src, on=["k1", "k2"], mode="mor")
    assert rep["rows_updated"] == 2 and rep["rows_inserted"] == 1

    got = {
        (r["k1"], r["k2"]): r["v"]
        for r in decode_job(spark, path).collect()
    }
    # cross-product keys (1,2)/(2,1) untouched; exact pairs updated
    assert got == {
        (1, 1): "A",
        (1, 2): "b",
        (2, 1): "c",
        (2, 2): "D",
        (3, 3): "NEW",
    }
    assert len(got) == 5  # one image per key
    assert verify_table(spark, path) == []


@pytest.mark.slow
def test_mor_merge_composes_then_compacts(spark, docs, table):
    n = docs.count()
    src1 = docs.where(F.col("doc_id") < 20).withColumn("lang", F.lit("xx"))
    merge_job(spark, table, src1, on=["doc_id"], mode="mor")
    # second mor merge updates the rows the first one appended
    src2 = (
        decode_job(spark, table)
        .where(F.col("doc_id") < 20)
        .withColumn("lang", F.lit("yy"))
    )
    rep2 = merge_job(spark, table, src2, on=["doc_id"], mode="mor")
    assert rep2["rows_updated"] == 20 and rep2["rows_inserted"] == 0

    got = decode_job(spark, table)
    assert got.count() == n
    assert got.where(F.col("lang") == "yy").count() == 20
    assert got.where(F.col("lang") == "xx").count() == 0

    # compaction materializes vectors away; nothing resurrects
    compact_job(spark, table)
    t = EncodedTable(table)
    assert t.part_dv() == {}
    got2 = decode_job(spark, table)
    assert got2.count() == n
    assert got2.where(F.col("lang") == "yy").count() == 20
    assert verify_table(spark, table) == []


def test_mor_merge_pure_inserts_no_vectors(spark, docs, table):
    n = docs.count()
    src = docs.where(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    rep = merge_job(spark, table, src, on=["doc_id"], mode="mor")
    assert rep["rows_inserted"] == 5 and rep["rows_updated"] == 0
    assert rep["dv_parts"] == 0
    assert decode_job(spark, table).count() == n + 5


def test_mor_merge_snapshot_time_travel(spark, docs, table):
    t = EncodedTable(table)
    t.set_snapshot_retention(2)
    g0 = t.generations()[-1]
    n = docs.count()
    src = docs.where(F.col("doc_id") < 15).withColumn("lang", F.lit("xx"))
    merge_job(spark, table, src, on=["doc_id"], mode="mor")
    # the pre-merge snapshot still shows every original image
    old = decode_job(spark, table, at_gen=g0)
    assert old.count() == n
    assert old.where(F.col("lang") == "xx").count() == 0


def test_mor_merge_bulk_refused(spark, docs, table, monkeypatch):
    import embulk_output_s3_parquet_spark.jobs as J

    monkeypatch.setattr(J, "_MERGE_KEY_PROBE_CAP", 3)
    src = docs.where(F.col("doc_id") < 10)
    with pytest.raises(ConfigException, match="mor"):
        merge_job(spark, table, src, on=["doc_id"], mode="mor")
    with pytest.raises(ConfigException, match="mode"):
        merge_job(spark, table, src, on=["doc_id"], mode="nope")
