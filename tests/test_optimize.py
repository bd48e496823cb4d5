"""Selective small-part compaction (jobs.rewrite_small_parts): the
Iceberg rewrite_data_files-with-size-threshold / Delta OPTIMIZE analogue.

The 100 TB maintenance shape: a day of streaming micro-batches leaves
thousands of kilobyte-sized parts under terabytes of healthy ones.
compact_job rewrites the whole table; rewrite_small_parts merges ONLY the
parts below a byte threshold -- healthy parts keep their bytes, lineage
rows, and file mtimes, the flip is the partial-generation _update_parts,
and merge-on-read vectors of the selected parts materialize away.
"""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from embulk_output_s3_parquet_spark.jobs import (
    count_job,
    delete_job,
    encode_job,
    rewrite_small_parts,
    verify_table,
)
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
from embulk_output_s3_parquet_spark.sources.tables import EncodedTable


def _sizes(t: EncodedTable) -> dict[int, int]:
    return {p: int(r["enc_bytes"]) for p, r in t.lineage().items()}


def _decoded_sorted(spark, path):
    from embulk_output_s3_parquet_spark.jobs import decode_job

    return sorted(
        map(tuple, decode_job(spark, path).collect()), key=str
    )


def _stat_of(t: EncodedTable, pid: int):
    d = os.path.join(t.data_dir, f"part_id={pid}")
    f = sorted(os.listdir(d))[0]
    st = os.stat(os.path.join(d, f))
    return (st.st_ino, st.st_mtime_ns, st.st_size)


def _mixed_table(spark, tmp_path) -> tuple[str, int]:
    """Healthy full-corpus parts + a trickle of tiny appended parts (each
    append wave carries ~1/6 of the rows, the streaming micro-batch
    shape); returns (path, byte threshold separating the two groups)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "opt")
    pol = CodecPolicy(target_partition_bytes=1 << 20, chunk_rows=64)
    encode_job(spark, docs, path, pol)
    for i in range(6):
        sl = docs.where((F.col("doc_id") % 6) == i).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000 * (i + 1)
        )
        encode_job(
            spark, sl, path, pol, if_exists="skip",
            part_base=(1 << 12) * (i + 1),
        )
    sizes = _sizes(EncodedTable(path))
    small_max = max(b for p, b in sizes.items() if p >= 1 << 12)
    big_min = min(b for p, b in sizes.items() if p < 1 << 12)
    assert small_max < big_min, (small_max, big_min)  # real separation
    return path, (small_max + big_min) // 2


@pytest.mark.slow
def test_optimize_merges_only_small_parts(spark, tmp_path):
    path, thr = _mixed_table(spark, tmp_path)
    t = EncodedTable(path)
    sizes = _sizes(t)
    small = {p for p, b in sizes.items() if b < thr}
    healthy = set(sizes) - small
    assert len(small) >= 2 and healthy  # a real mix or the test is vacuous
    before = _decoded_sorted(spark, path)
    healthy_stats = {p: _stat_of(t, p) for p in sorted(healthy)[:4]}

    rep = rewrite_small_parts(spark, path, min_part_bytes=thr)
    assert rep["parts_rewritten"] == len(small)
    assert 0 < rep["parts_written"] < len(small)  # actually merged

    assert _decoded_sorted(spark, path) == before  # bit-exact rows
    live = set(t.completed_parts())
    assert healthy <= live and not (small & live)
    assert small <= t.retired_parts()  # replay can't resurrect them
    for p, st in healthy_stats.items():
        assert _stat_of(t, p) == st  # healthy payload bytes untouched
    assert verify_table(spark, path) == []


@pytest.mark.slow
def test_optimize_materializes_vectors_and_respects_max_parts(
    spark, tmp_path
):
    path, thr = _mixed_table(spark, tmp_path)
    t = EncodedTable(path)
    delete_job(spark, path, ("doc_id", "<", 7), mode="mor")
    n_live = count_job(spark, path)
    assert t.part_dv()  # vectors exist before

    sizes = _sizes(t)
    small = sorted(
        (p for p, b in sizes.items() if b < thr),
        key=lambda p: (sizes[p], p),
    )
    rep = rewrite_small_parts(
        spark, path, min_part_bytes=thr, max_parts=2
    )
    assert rep["parts_rewritten"] == 2  # bounded wave: the 2 smallest
    assert set(small[:2]) <= t.retired_parts()

    rep2 = rewrite_small_parts(spark, path, min_part_bytes=thr)
    assert rep2["parts_rewritten"] >= 2
    assert count_job(spark, path) == n_live
    # every remaining vector (if any) belongs to an untouched healthy part
    assert all(
        int(p) not in rep2 or False for p in t.part_dv()
    ) or set(t.part_dv()) <= (set(sizes) - set(small))
    assert verify_table(spark, path) == []


def test_optimize_noop_below_two_parts(spark, tmp_path):
    path, _thr = _mixed_table(spark, tmp_path)
    t = EncodedTable(path)
    gen = t.manifest().get("parts_gen", 0)
    rep = rewrite_small_parts(spark, path, min_part_bytes=1)
    assert rep["parts_selected"] == 0 and rep["parts_rewritten"] == 0
    assert t.manifest().get("parts_gen", 0) == gen  # no flip, no-op


@pytest.mark.slow
def test_optimize_purges_heavily_vectored_parts(spark, tmp_path):
    """max_delete_ratio (Iceberg rewrite_position_delete_files / Delta
    purge): a part whose merge-on-read deleted fraction exceeds the ratio
    is rewritten regardless of size, its vector materializes away, and
    lightly-vectored healthy parts keep their vectors and bytes."""
    path, _thr = _mixed_table(spark, tmp_path)
    t = EncodedTable(path)
    # hammer one healthy part's keys: docs ids 0..499 spread over the big
    # parts; delete most of the 0..249 range -> some parts cross 40%
    delete_job(spark, path, ("doc_id", "<", 220), mode="mor")
    n_live = count_job(spark, path)
    dv = t.part_dv()
    assert dv
    rows_of = {p: int(r["rows"]) for p, r in t.lineage().items()}
    heavy = {
        p for p, e in dv.items() if int(e["n"]) / rows_of[p] > 0.4
    }
    light = set(dv) - heavy
    assert heavy, "predicate did not produce a >40%-deleted part"

    rep = rewrite_small_parts(
        spark, path, min_part_bytes=1, max_delete_ratio=0.4
    )
    assert rep["parts_vectored_selected"] == len(heavy)
    assert rep["parts_rewritten"] == len(heavy)  # size selected nothing

    assert count_job(spark, path) == n_live  # live rows invariant
    assert heavy <= t.retired_parts()
    dv_after = t.part_dv()
    assert not (heavy & set(dv_after))  # vectors materialized
    assert light <= set(dv_after)  # light parts keep theirs, untouched
    assert verify_table(spark, path) == []


@pytest.mark.slow
def test_optimize_max_parts_trim_prefers_vectored(spark, tmp_path):
    """r6 (advisor finding): a size-sorted max_parts trim must not evict
    the ratio-selected heavily-vectored parts -- they lead the trim order,
    and a single surviving vectored part is still rewritten (vector
    materialization is the point)."""
    path, thr = _mixed_table(spark, tmp_path)
    t = EncodedTable(path)
    delete_job(spark, path, ("doc_id", "<", 220), mode="mor")
    dv = t.part_dv()
    rows_of = {p: int(r["rows"]) for p, r in t.lineage().items()}
    heavy = {p for p, e in dv.items() if int(e["n"]) / rows_of[p] > 0.4}
    assert heavy
    n_live = count_job(spark, path)
    # max_parts=1 with tiny unvectored parts present: the old sort by size
    # picked a tiny append part and early-returned with inconsistent
    # counters; now the vectored part wins the slot
    rep = rewrite_small_parts(
        spark, path, min_part_bytes=thr, max_delete_ratio=0.4, max_parts=1
    )
    assert rep["parts_selected"] == 1
    assert rep["parts_vectored_selected"] == 1
    assert rep["parts_rewritten"] == 1
    assert count_job(spark, path) == n_live
    assert verify_table(spark, path) == []


def test_optimize_noop_report_is_consistent(spark, tmp_path):
    """The early-return no-op must zero ALL selection counters, not just
    parts_selected (advisor finding: bytes_selected stayed nonzero)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "one")
    encode_job(
        spark, docs, path,
        CodecPolicy(target_partition_bytes=1 << 30, chunk_rows=512),
    )
    rep = rewrite_small_parts(spark, path, min_part_bytes=1 << 40)
    if rep["parts_rewritten"] == 0 and rep["parts_selected"] == 0:
        assert rep["bytes_selected"] == 0
        assert rep["parts_vectored_selected"] == 0
