"""Named refs (Iceberg tags) + timestamp time travel.

A tag pins a snapshot generation OUTSIDE the retention window: its shard
dir and part files survive rewrites and vacuum even at snapshot-retention
0, until drop_tag. Tagging the CURRENT generation first freezes it with an
empty partial flip (hard links only), so later appends/mutations never
leak into the tag -- a tag is an immutable snapshot, not a moving head.
``resolve_at_ts`` maps a wall-clock instant to the latest generation
committed at or before it (generation flips are stamped in ``gen-ts``;
generation 0 falls back to the manifest's ``created_at``).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from embulk_output_s3_parquet_spark.jobs import (
    count_job,
    decode_job,
    delete_job,
    diff_summary,
    encode_job,
    merge_job,
    rollback_job,
    vacuum_job,
    verify_table,
)
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy, ConfigException
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
    path = str(tmp_path / "tags")
    encode_job(spark, docs, path, _pol(), if_exists="error")
    return path


def test_tag_pins_snapshot_through_cow_rewrite_without_retention(
    spark, docs, table
):
    """snapshot-retention stays 0: the tag ALONE must keep the pinned
    generation's shards and part files alive through a rewrite."""
    n = docs.count()
    t = EncodedTable(table)
    assert t.snapshot_retention() == 0
    gen = t.create_tag("v1")  # freeze-flip: tag never moves with appends
    assert t.refs() == {"v1": gen}
    assert t.generations()[-1] == gen + 1  # frozen; successor is current

    killed = docs.where(F.col("doc_id") < 200).count()
    delete_job(spark, table, ("doc_id", "<", 200))  # cow rewrite
    assert decode_job(spark, table).count() == n - killed

    # the tagged snapshot still reads in full, by name and by number
    assert decode_job(spark, table, at_gen="v1").count() == n
    assert decode_job(spark, table, at_gen=gen).count() == n
    assert count_job(spark, table, at_gen="v1") == n
    # predicates on the snapshot answer from ITS rows (live table lost
    # them), through the snapshot-zone part-pruning path; decode_job's
    # where is may-match skipping, so apply the exact filter on top
    snap = decode_job(spark, table, at_gen="v1", where=("doc_id", "<", 10))
    assert snap.where(F.col("doc_id") < 10).count() == 10
    assert verify_table(spark, table) == []


def test_tag_is_immutable_appends_go_to_successor(spark, docs, table):
    n = docs.count()
    t = EncodedTable(table)
    t.create_tag("baseline")
    # append 7 brand-new rows (merge-on-read insert path = pure append)
    src = docs.limit(7).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    merge_job(spark, table, src, on=["doc_id"], mode="mor")
    assert decode_job(spark, table).count() == n + 7
    assert decode_job(spark, table, at_gen="baseline").count() == n


def test_vacuum_protects_tag_then_reclaims_after_drop(spark, docs, table):
    n = docs.count()
    t = EncodedTable(table)
    gen = t.create_tag("keepme")
    delete_job(spark, table, ("doc_id", "<", 300))  # cow: supersedes parts

    rep = vacuum_job(table)
    assert rep["stale_shard_dirs"] == 0  # tagged gen not expired
    assert decode_job(spark, table, at_gen="keepme").count() == n

    t.drop_tag("keepme")
    with pytest.raises(ConfigException, match="unknown tag"):
        decode_job(spark, table, at_gen="keepme")
    rep2 = vacuum_job(table)
    assert rep2["stale_shard_dirs"] >= 1  # the pinned gen is now expirable
    assert rep2["orphan_parts"]  # its exclusive (pre-delete) parts swept
    assert not os.path.isdir(os.path.join(table, f"parts-{gen}"))
    # the live table is untouched
    assert decode_job(spark, table).count() == n - 300
    assert verify_table(spark, table) == []


def test_tag_validation_and_ref_resolution(spark, docs, table):
    t = EncodedTable(table)
    with pytest.raises(ConfigException, match="tag name"):
        t.create_tag("9lives")  # must start with a letter
    with pytest.raises(ConfigException, match="tag name"):
        t.create_tag("a/b")
    with pytest.raises(ConfigException, match="never committed"):
        t.create_tag("future", gen=99)
    gen = t.create_tag("v1")
    t.create_tag("v1", gen=gen)  # same target: idempotent no-op
    with pytest.raises(ConfigException, match="already points"):
        t.create_tag("v1", gen=gen + 1)
    with pytest.raises(ConfigException, match="unknown tag"):
        t.drop_tag("nope")
    with pytest.raises(ConfigException, match="unknown tag"):
        t.resolve_ref("nope")
    assert t.resolve_ref("v1") == gen
    assert t.resolve_ref(str(gen + 1)) == gen + 1  # numeric strings pass
    assert t.resolve_ref(None) is None


def test_timestamp_time_travel(spark, docs, table):
    n = docs.count()
    t = EncodedTable(table)
    t.set_snapshot_retention(4)
    t0 = time.time()  # after initial encode: generation 0 (created_at)
    time.sleep(0.05)
    delete_job(spark, table, ("doc_id", "<", 100))
    t1 = time.time()
    time.sleep(0.05)
    delete_job(spark, table, [("doc_id", ">=", 100), ("doc_id", "<", 150)])
    t2 = time.time()

    assert t.resolve_at_ts(t0) == 0
    g1, g2 = t.resolve_at_ts(t1), t.resolve_at_ts(t2)
    assert 0 < g1 < g2 == t.generations()[-1]
    assert decode_job(spark, table, at_gen=t.resolve_at_ts(t0)).count() == n
    assert decode_job(spark, table, at_gen=g1).count() == n - 100
    assert decode_job(spark, table, at_gen=g2).count() == n - 150

    # ISO-8601 string input resolves the same instant
    from datetime import datetime

    assert t.resolve_at_ts(datetime.fromtimestamp(t1).isoformat()) == g1
    with pytest.raises(ConfigException, match="no generation"):
        t.resolve_at_ts(t0 - 10_000)


def test_catalyst_reader_time_travel(spark, docs, table):
    """spark.read.format("enctable").option("at_gen"/"at_ts") -- the SQL
    surface of snapshot reads (Iceberg's VERSION AS OF / TIMESTAMP AS OF):
    tag names, generation numbers and wall-clock instants all pin the
    snapshot; zone pruning still fires on the pinned lineage; streams
    refuse the option instead of silently tailing the live table."""
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )

    spark.dataSource.register(EncodedTableDataSource)
    n = docs.count()
    t = EncodedTable(table)
    ts_pre = time.time()  # generation 0 is current at this instant
    time.sleep(0.05)
    gen = t.create_tag("v1")
    delete_job(spark, table, ("doc_id", "<", 100))

    def rd(**opts):
        r = spark.read.format("enctable")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load(table)

    assert rd().count() == n - 100  # live
    assert rd(at_gen="v1").count() == n  # tag name
    assert rd(at_gen=str(gen)).count() == n  # generation number
    assert rd(at_ts=str(ts_pre)).count() == n  # wall clock
    # predicates answer against the SNAPSHOT (rows the live table deleted)
    pinned = rd(at_gen="v1")
    assert pinned.where(F.col("doc_id") < 100).count() == 100
    assert rd(at_gen="v1", columns="doc_id").columns == ["doc_id"]

    with pytest.raises(Exception, match="mutually exclusive"):
        rd(at_gen="v1", at_ts=str(ts_pre)).count()
    with pytest.raises(Exception, match="unknown tag"):
        rd(at_gen="nope").count()
    q = (
        spark.readStream.format("enctable")
        .option("at_gen", "v1")
        .load(table)
        .writeStream.format("noop")
        .start()
    )
    try:
        with pytest.raises(Exception, match="batch reads only"):
            q.processAllAvailable()  # init error surfaces asynchronously
    finally:
        q.stop()

    # a merge-on-read delete masks live reads but never the pinned snapshot
    delete_job(spark, table, ("doc_id", "<", 150), mode="mor")
    assert rd().count() == n - 150
    assert rd(at_gen="v1").count() == n


def test_vacuum_expire_older_than(spark, docs, table):
    """Age-based snapshot expiry (Iceberg expire_snapshots(older_than)):
    a cutoff expires retained generations committed before it; the
    current generation and tagged ones always survive; undatable
    generations are kept fail-safe."""
    n = docs.count()
    t = EncodedTable(table)
    t.set_snapshot_retention(10)
    t.create_tag("pinned")  # at gen 0; freeze-flips head to gen 1
    delete_job(spark, table, ("doc_id", "<", 100))
    cut1 = time.time()
    time.sleep(0.05)
    delete_job(spark, table, [("doc_id", ">=", 100), ("doc_id", "<", 150)])

    # dry run reports, deletes nothing
    rep = vacuum_job(table, dry_run=True, expire_older_than=cut1)
    assert rep["expired_generations"] == [1, 2]  # not 0 (tagged), not cur
    assert decode_job(spark, table, at_gen=2).count() == n - 100

    rep = vacuum_job(table, expire_older_than=cut1)
    assert rep["expired_generations"] == [1, 2]
    assert t.retained_generations() == [0, t.generations()[-1]]
    with pytest.raises(ConfigException, match="not on disk"):
        decode_job(spark, table, at_gen=2)
    # the tag, the live table, and lineage integrity all survive
    assert decode_job(spark, table, at_gen="pinned").count() == n
    assert decode_job(spark, table).count() == n - 150
    assert verify_table(spark, table) == []

    # asking for an instant whose as-of generation was just expired must
    # raise, never silently answer from an older surviving snapshot
    with pytest.raises(ConfigException, match="expired"):
        t.resolve_at_ts(cut1)

    # a future cutoff may never expire the current generation
    rep = vacuum_job(table, expire_older_than=time.time() + 60)
    assert t.generations()[-1] not in rep["expired_generations"]
    assert decode_job(spark, table).count() == n - 150

    # epoch-milliseconds refused instead of landing millennia away
    with pytest.raises(ConfigException, match="milliseconds"):
        vacuum_job(table, dry_run=True, expire_older_than=time.time() * 1000)


def test_rollback_and_diff_by_tag(spark, docs, table):
    n = docs.count()
    t = EncodedTable(table)
    t.set_snapshot_retention(4)
    gen = t.create_tag("stable")
    delete_job(spark, table, ("doc_id", "<", 50))

    s = diff_summary(table, "stable")  # from a tag to current
    assert s["from_gen"] == gen and s["rows_delta"] == -50

    rep = rollback_job(table, "stable")
    assert rep["rolled_back"] and rep["to_gen"] == gen
    assert decode_job(spark, table).count() == n
    # the rollback flip is dated like every other: "as of now" must
    # resolve to the post-rollback generation, not the rolled-back state
    assert t.resolve_at_ts(time.time()) == t.generations()[-1]
    assert verify_table(spark, table) == []

def test_snapshot_reads_under_schema_evolution(spark, docs, table):
    """Time travel x schema evolution: a snapshot pinned BEFORE a
    rename/add/drop is read with the CURRENT schema (decode_job's
    documented semantic) -- renamed columns answer under their new
    spelling via stored-alias translation, added columns fill NULL on
    pre-addition parts, dropped columns disappear, and exact predicates
    on the renamed column (count_job, or the exact filter queries apply
    over decode_job's may-match scan) stay CORRECT at the old snapshot."""
    from pyspark.sql import types as T

    n = docs.count()
    t = EncodedTable(table)
    pinned = t.create_tag("pre-evolution")

    t.rename_column("lang", "language")
    t.add_column("score", T.DoubleType())
    t.drop_column("source")
    delete_job(spark, table, ("doc_id", "<", 50))  # moves the live head

    snap = decode_job(spark, table, at_gen="pre-evolution")
    assert snap.count() == n  # pre-delete row set
    cols = set(snap.columns)
    assert "language" in cols and "lang" not in cols
    assert "source" not in cols
    assert "score" in cols
    # renamed column: values identical to the original spelling's
    want = {(r["doc_id"], r["lang"]) for r in docs.select("doc_id", "lang").collect()}
    got = {(r["doc_id"], r["language"])
           for r in snap.select("doc_id", "language").collect()}
    assert got == want
    # added column: NULL on every pre-addition row
    assert snap.where(F.col("score").isNotNull()).count() == 0

    # exact predicates on the RENAMED column at the pinned snapshot:
    # count_job is the exact surface; decode_job's where= is zone pruning
    # (may-match), so queries apply the exact filter on the decoded frame
    one = docs.select("lang").first()["lang"]
    want_n = docs.where(F.col("lang") == one).count()
    assert count_job(spark, table, ("language", "==", one), at_gen=pinned) == want_n
    got_exact = (
        decode_job(spark, table, at_gen=pinned, where=("language", "==", one))
        .where(F.col("language") == one)
        .count()
    )
    assert got_exact == want_n
    # exact predicate on the ADDED column: IS NULL covers the whole snapshot
    assert count_job(spark, table, ("score", "isnull", None), at_gen=pinned) == n

    # live head reflects the delete AND the evolution
    live = decode_job(spark, table)
    assert live.count() == n - 50
    assert "language" in live.columns and "source" not in live.columns
