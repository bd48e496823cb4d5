"""TABLESAMPLE SYSTEM (jobs.sample_job): deterministic cluster sampling
whose payload IO -- and at part granularity, TASK COUNT -- scales with
the fraction. Pins determinism, fraction accuracy at cluster level,
sample-is-a-subset, composition with where/columns, and the scheduling
contract (sampled-out parts never open a file)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_output_s3_parquet_spark.jobs import encode_job, sample_job
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy, ConfigException
from embulk_output_s3_parquet_spark.sources.chunkscan import sampled_chunk
from embulk_output_s3_parquet_spark.sources.tables import EncodedTable


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path_factory.mktemp("sample") / "t")
    encode_job(
        spark, docs, path,
        CodecPolicy(chunk_rows=64, target_partition_bytes=64 * 1024),
        if_exists="error",
    )
    return path, docs


def test_sample_membership_is_deterministic_and_calibrated():
    keep = [
        sampled_chunk(f"part_id={p}", s, 0.25, seed=7)
        for p in range(200) for s in range(20)
    ]
    again = [
        sampled_chunk(f"part_id={p}", s, 0.25, seed=7)
        for p in range(200) for s in range(20)
    ]
    assert keep == again
    rate = sum(keep) / len(keep)
    assert 0.20 <= rate <= 0.30  # 4000 draws at p=.25: far beyond 5 sigma
    other = [
        sampled_chunk(f"part_id={p}", s, 0.25, seed=8)
        for p in range(200) for s in range(20)
    ]
    assert other != keep  # the seed matters


@pytest.mark.parametrize("granularity", ["part", "chunk"])
def test_sample_is_deterministic_subset(spark, table, granularity):
    path, docs = table
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    s1 = sample_job(spark, path, 0.5, seed=3, granularity=granularity)
    s2 = sample_job(spark, path, 0.5, seed=3, granularity=granularity)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2  # same seed, same rows
    assert ids1 <= all_ids and 0 < len(ids1) < len(all_ids)
    # cluster-level calibration: the kept row share tracks the fraction
    # loosely (clusters are coarse strata, not Bernoulli rows)
    assert 0.2 <= len(ids1) / len(all_ids) <= 0.8


def test_sample_fraction_one_is_the_full_table(spark, table):
    path, docs = table
    got = sample_job(spark, path, 1.0, granularity="part")
    assert got.count() == docs.count()
    got_c = sample_job(spark, path, 1.0, granularity="chunk")
    assert got_c.count() == docs.count()


def test_part_granularity_skips_tasks_not_just_bytes(spark, table):
    """The scheduling contract: a sampled-out part contributes NO task --
    the sampled part set alone feeds decode_table_scan(parts=...)."""
    path, _ = table
    t = EncodedTable(path)
    pids = sorted(t.completed_parts())
    assert len(pids) >= 4, "need several parts"
    frac = 0.3
    expect = {
        p for p in pids if sampled_chunk(f"part_id={p}", -1, frac, 11)
    }
    got = sample_job(spark, path, frac, seed=11, granularity="part")
    # every decoded row's doc_id belongs to an expected part: cross-check
    # via per-part decode of the expected set
    from embulk_output_s3_parquet_spark.operators.decode import decode_table_scan

    want_rows = (
        decode_table_scan(spark, t, parts=expect).count() if expect else 0
    )
    assert got.count() == want_rows


def test_sample_composes_with_where_and_columns(spark, table):
    path, docs = table
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    got = sample_job(
        spark, path, 0.6, seed=5, columns=["doc_id", "n_chars"],
        where=("doc_id", ">=", mid), granularity="chunk",
    )
    assert set(got.columns) == {"doc_id", "n_chars"}
    # may-match contract: exact filter on top, still a subset of the truth
    exact = got.where(F.col("doc_id") >= mid)
    full = {r["doc_id"] for r in docs.where(F.col("doc_id") >= mid).collect()}
    ids = {r["doc_id"] for r in exact.collect()}
    assert ids <= full and ids


def test_sample_refusals(spark, table):
    path, _ = table
    with pytest.raises(ConfigException, match="fraction"):
        sample_job(spark, path, 0.0)
    with pytest.raises(ConfigException, match="fraction"):
        sample_job(spark, path, 1.5)
    with pytest.raises(ConfigException, match="granularity"):
        sample_job(spark, path, 0.5, granularity="row")
