"""Partition planner tests: byte balance + hot-key salting on the Zipf
corpus (north_rule: "salted, size-balanced partitions ... explicit
repartitionByRange + skew salting on repo/lang hot keys")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_output_s3_parquet_spark.corpus import repos_df
from embulk_output_s3_parquet_spark.plans.partitioning import assign_partitions

TARGET = 128 * 1024


@pytest.fixture(scope="module")
def planned(spark):
    df = repos_df(spark, 4000).cache()
    out, plan = assign_partitions(df, target_bytes=TARGET)
    return df, out.cache(), plan


def test_every_row_assigned(planned):
    df, out, plan = planned
    assert out.filter(F.col("part_id").isNull()).count() == 0
    assert out.count() == df.count()
    ids = [r["part_id"] for r in out.select("part_id").distinct().collect()]
    assert min(ids) >= 0 and max(ids) < plan.n_parts


def test_byte_balance(planned):
    """No partition way over target (salting splits hot groups); the Zipf
    head would otherwise put ~20% of all bytes in one partition."""
    _, out, plan = planned
    sizes = (
        out.groupBy("part_id")
        .agg(F.sum(F.coalesce(F.length("content"), F.lit(0))).alias("b"))
        .collect()
    )
    biggest = max(r["b"] for r in sizes)
    # a single row can exceed target (can't split a row); otherwise bounded
    assert biggest <= 4 * TARGET, f"hot partition {biggest} >> target {TARGET}"


def test_hot_repo_is_salted(planned):
    df, out, plan = planned
    # the Zipf-hottest repo holds far more than target bytes -> must span
    # multiple part_ids (salt on path/commit)
    hot = (
        df.groupBy("repo")
        .agg(F.sum(F.length("content")).alias("b"))
        .orderBy(F.desc("b"))
        .first()
    )
    assert hot["b"] > 2 * TARGET  # fixture really is skewed
    n_parts_hot = (
        out.filter(F.col("repo") == hot["repo"]).select("part_id").distinct().count()
    )
    assert n_parts_hot >= 2, "hot repo not salted across partitions"


def test_deterministic_assignment(spark, planned):
    """Same input -> identical part_ids (resume correctness depends on it)."""
    df, out, plan = planned
    out2, plan2 = assign_partitions(df, target_bytes=TARGET)
    assert plan2.n_parts == plan.n_parts
    key = ["repo", "path", "commit"]
    diff = (
        out.select(*key, "part_id")
        .join(out2.select(*key, F.col("part_id").alias("p2")), key)
        .filter(F.col("part_id") != F.col("p2"))
        .count()
    )
    assert diff == 0


def test_null_group_keys_are_assigned(spark):
    df = spark.createDataFrame(
        [(None, "p1", "c1", None, "x" * 100), ("r", "p2", "c2", "go", "y" * 100)],
        "repo string, path string, commit string, lang string, content string",
    )
    out, plan = assign_partitions(df, target_bytes=TARGET)
    assert out.filter(F.col("part_id").isNull()).count() == 0


def test_empty_input_plan(spark, tmp_path):
    """Empty DataFrame: plan builds, job commits nothing, no crash."""
    from embulk_output_s3_parquet_spark.jobs import encode_job
    from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy

    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, content string"
    )
    t = encode_job(
        spark, empty, str(tmp_path / "e"),
        CodecPolicy(chunk_rows=128, target_partition_bytes=1 << 20),
        if_exists="delete",
    )
    assert t.completed_parts() == set()


def test_hot_group_bins_are_exclusive(planned):
    # a hot group's salted bin range must never be shared with any other
    # group -- overlaps merge parts past the size target
    df, out, plan = planned
    g = plan.groups.collect()
    by_lang: dict[str, list] = {}
    for r in g:
        by_lang.setdefault(r["lang"], []).append(r)
    for rows in by_lang.values():
        hot_ranges = [
            (r["start_part"], r["start_part"] + r["splits"])
            for r in rows
            if r["gbytes"] > TARGET
        ]
        others = [
            (r["start_part"], r["start_part"] + r["splits"])
            for r in rows
            if r["gbytes"] <= TARGET
        ]
        for lo, hi in hot_ranges:
            for olo, ohi in hot_ranges + others:
                if (olo, ohi) == (lo, hi):
                    continue
                assert ohi <= lo or olo >= hi, (
                    f"bin overlap: hot [{lo},{hi}) vs [{olo},{ohi})"
                )


def test_driver_plan_matches_window_plan(spark, monkeypatch):
    """r6 fast path: the driver-side bin-packing layout must assign every
    row the SAME part_id as the distributed window layout (resume
    determinism across the threshold, and across engine versions)."""
    import embulk_output_s3_parquet_spark.plans.partitioning as P

    df = repos_df(spark, 1500).cache()
    out_fast, plan_fast = assign_partitions(df, target_bytes=TARGET)
    monkeypatch.setattr(P, "DRIVER_PLAN_MAX_GROUPS", 0)  # force window path
    out_win, plan_win = assign_partitions(df, target_bytes=TARGET)
    assert plan_fast.n_parts == plan_win.n_parts
    key = ["repo", "path", "commit"]
    diff = (
        out_fast.select(*key, "part_id")
        .join(out_win.select(*key, F.col("part_id").alias("p2")), key)
        .filter(F.col("part_id") != F.col("p2"))
        .count()
    )
    assert diff == 0
    gf = sorted(map(tuple, plan_fast.groups.collect()))
    gw = sorted(map(tuple, plan_win.groups.collect()))
    assert gf == gw


def test_constant_group_key_no_unpartitioned_window(spark):
    """The BENCH_r05 warning shape: a frame whose lang/path are literal
    constants (foldable) must still plan and assign correctly through the
    driver path (no WindowExec involved at all)."""
    docs = spark.createDataFrame(
        [(f"r{i % 7}", f"t{i}.py", f"c{i}", "python", "z" * (50 + i % 99)) for i in range(400)],
        "repo string, path string, commit string, lang string, content string",
    ).select(
        "repo", F.lit("t.py").alias("path"), "commit",
        F.lit("python").alias("lang"), "content",
    )
    out, plan = assign_partitions(docs, target_bytes=4096)
    assert out.filter(F.col("part_id").isNull()).count() == 0
    assert out.count() == 400
    ids = {r["part_id"] for r in out.select("part_id").distinct().collect()}
    assert min(ids) >= 0 and max(ids) < plan.n_parts
