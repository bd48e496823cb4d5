"""Schema evolution: RENAME COLUMN (Iceberg parity, metadata-only).

``EncodedTable.rename_column`` completes the evolution set
(add/drop/widen/rename): one lineage re-key (zones/blooms/NDV sidecars
move under the new name, O(manifest)) plus one atomic schema flip that
records the historical spelling in ``renamed-columns``. Part payload
bytes are NEVER touched -- every chunk-file reader translates stored
chunk names through ``stored_aliases()``, so pre-rename parts, post-
rename appends, and DML-rewritten parts all read coherently under the
current logical name.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_s3_parquet_spark.jobs import (
    count_job,
    decode_job,
    decode_job_chunks,
    delete_job,
    encode_job,
    minmax_job,
    sum_job,
    verify_table,
)
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy, ConfigException
from embulk_output_s3_parquet_spark.sources.pyreader import count_table, read_table
from embulk_output_s3_parquet_spark.sources.tables import EncodedTable


def _pol(**kw):
    kw.setdefault("target_partition_bytes", 256 * 1024)
    kw.setdefault("chunk_rows", 512)
    return CodecPolicy(**kw)


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _renamed_table(spark, docs, tmp_path, **pol_kw):
    path = str(tmp_path / "ren")
    encode_job(spark, docs, path, _pol(**pol_kw), if_exists="error")
    EncodedTable(path).rename_column("doc_id", "document_id")
    return path


def test_rename_reads_back_through_every_surface(spark, docs, tmp_path):
    path = _renamed_table(spark, docs, tmp_path)
    t = EncodedTable(path)
    assert "document_id" in {f.name for f in t.schema().fields}
    assert t.stored_aliases() == {"doc_id": "document_id"}

    want = sorted(r["doc_id"] for r in docs.select("doc_id").collect())

    # decode_job (part-aligned scan) + the groupBy decode
    got = decode_job(spark, path)
    assert "document_id" in got.columns and "doc_id" not in got.columns
    assert sorted(r["document_id"] for r in got.collect()) == want
    got2 = decode_job_chunks(spark, path, columns=["document_id"])
    assert sorted(r["document_id"] for r in got2.collect()) == want

    # Spark-free pyreader, projected to the renamed column only
    tbl = read_table(path, columns=["document_id"])
    assert sorted(tbl.column("document_id").to_pylist()) == want

    # counts agree across both counting surfaces
    assert count_job(spark, path) == len(want)
    assert count_table(path) == len(want)

    # enctable DataSource (batch)
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )

    spark.dataSource.register(EncodedTableDataSource)
    df = spark.read.format("enctable").load(path)
    assert sorted(r["document_id"] for r in df.collect()) == want


def test_rename_keeps_pruning_and_predicates_exact(spark, docs, tmp_path):
    path = _renamed_table(spark, docs, tmp_path)
    t = EncodedTable(path)

    # lineage zones were re-keyed: part pruning fires on the NEW name
    zones = t.part_zones()
    assert all("document_id" in z and "doc_id" not in z for z in zones.values())
    assert t.pruned_part_dirs([("document_id", ">=", 10**9)]) == []

    exact = docs.where(F.col("doc_id") >= 250).count()
    assert count_job(spark, path, where=("document_id", ">=", 250)) == exact
    st: dict = {}
    assert count_table(path, where=("document_id", ">=", 250), scan_stats=st) == exact
    got = decode_job(spark, path, where=("document_id", ">=", 250))
    assert got.where(F.col("document_id") >= 250).count() == exact


def test_rename_then_append_mixes_stored_spellings(spark, docs, tmp_path):
    path = _renamed_table(spark, docs, tmp_path)
    extra = docs.limit(100).select(
        (F.col("doc_id") + 100_000).alias("document_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    # append under the NEW schema: new parts store chunk col "document_id",
    # old parts still store "doc_id" -- one logical column either way
    cols = [f.name for f in EncodedTable(path).schema().fields]
    encode_job(spark, extra.select(*cols), path, if_exists="skip", part_base=1000)

    want = sorted(
        [r["doc_id"] for r in docs.select("doc_id").collect()]
        + [r["document_id"] for r in extra.select("document_id").collect()]
    )
    got = decode_job(spark, path).select("document_id").collect()
    assert sorted(r["document_id"] for r in got) == want
    # a predicate spanning both epochs stays exact
    n_hi = sum(1 for v in want if v >= 100_000)
    assert count_job(spark, path, where=("document_id", ">=", 100_000)) == n_hi


def test_rename_chain_and_rename_back(spark, docs, tmp_path):
    path = _renamed_table(spark, docs, tmp_path)
    t = EncodedTable(path)
    t.rename_column("document_id", "did")
    # chains collapse: the original spelling points at the CURRENT name
    assert t.stored_aliases() == {"doc_id": "did", "document_id": "did"}
    n = docs.count()
    assert count_table(path) == n
    assert sorted(read_table(path, columns=["did"]).column("did").to_pylist()) == \
        sorted(r["doc_id"] for r in docs.select("doc_id").collect())

    # renaming BACK to an own historical spelling is legal
    t.rename_column("did", "doc_id")
    assert t.stored_aliases() == {"document_id": "doc_id", "did": "doc_id"}
    assert count_job(spark, path, where=("doc_id", ">=", 0)) == n


def test_rename_refusals(spark, docs, tmp_path):
    path = str(tmp_path / "ref")
    encode_job(spark, docs, path, _pol(), if_exists="error")
    t = EncodedTable(path)
    with pytest.raises(ConfigException, match="does not exist"):
        t.rename_column("nope", "x")
    with pytest.raises(ConfigException, match="already exists"):
        t.rename_column("doc_id", "lang")
    t.drop_column("source")
    with pytest.raises(ConfigException, match="previously dropped"):
        t.rename_column("doc_id", "source")
    # a foreign column's historical spelling is still claimed by its data
    t.rename_column("lang", "language")
    with pytest.raises(ConfigException, match="historical spelling"):
        t.rename_column("doc_id", "lang")


def test_rename_interplay_with_stats_dml_and_verify(spark, docs, tmp_path):
    path = _renamed_table(spark, docs, tmp_path)

    # metadata-first aggregates answer under the new name
    lo = docs.agg(F.min("doc_id")).first()[0]
    hi = docs.agg(F.max("doc_id")).first()[0]
    mm = minmax_job(spark, path, ["document_id"])
    assert mm["document_id"] == (lo, hi)
    sm = sum_job(spark, path, ["document_id"])
    assert sm["document_id"]["sum"] == docs.agg(F.sum("doc_id")).first()[0]

    # copy-on-write DELETE scoped by the renamed column
    n = docs.count()
    killed = docs.where(F.col("doc_id") < 100).count()
    rep = delete_job(spark, path, ("document_id", "<", 100))
    assert rep["rows_deleted"] == killed
    assert count_job(spark, path) == n - killed

    # lineage audit stays green across old-name parts and rewritten parts
    assert verify_table(spark, path) == []


def test_rename_updates_layout_and_policy_metadata(spark, docs, tmp_path):
    path = str(tmp_path / "layout")
    encode_job(
        spark, docs, path,
        _pol(column_options={"doc_id": "for"}, ndv_columns=("doc_id",)),
        cluster_by=("doc_id",), if_exists="error",
    )
    t = EncodedTable(path)
    t.rename_column("doc_id", "document_id")
    props = t.properties()
    assert props.get("write-order") == ["document_id"]
    pol = props["codec-policy"]
    assert "document_id" in (pol.get("column_options") or {})
    assert "doc_id" not in (pol.get("column_options") or {})
    assert list(pol.get("ndv_columns") or []) == ["document_id"]

    # NDV sketches moved with the rename: distinct_job answers the new name
    from embulk_output_s3_parquet_spark.jobs import distinct_job

    r = distinct_job(path, ["document_id"])
    exact = docs.select("doc_id").distinct().count()
    assert abs(r["document_id"]["ndv"] - exact) <= 4 * r["document_id"]["rel_std_error"] * exact

    # quantile bounds work through historical spellings in chunk metas
    from embulk_output_s3_parquet_spark.jobs import quantile_job

    q = quantile_job(spark, path, "document_id", [0.5])
    med = sorted(r["doc_id"] for r in docs.select("doc_id").collect())[docs.count() // 2]
    assert q["quantiles"][0.5]["lb"] <= med <= q["quantiles"][0.5]["ub"]


def test_rename_added_column_tracks_fillable(spark, docs, tmp_path):
    path = str(tmp_path / "addren")
    encode_job(spark, docs, path, _pol(), if_exists="error")
    t = EncodedTable(path)
    t.add_column("quality", T.DoubleType())
    t.rename_column("quality", "q_score")
    assert "q_score" in t.added_columns() and "quality" not in t.added_columns()
    got = decode_job(spark, path).select("q_score")
    assert got.where(F.col("q_score").isNull()).count() == docs.count()
