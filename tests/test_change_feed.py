"""Change data feed (Delta Lake CDF parity) over encoded tables.

Streaming: ``spark.readStream.format("enctable")
.option("readChangeFeed", "true")`` emits every data column plus
``_change_type`` ('insert' | 'delete') and ``_commit_gen``. The delta
between two offsets is reconstructed entirely from metadata the engine
already keeps -- appended part ids become inserts, merge-on-read
delete-vector GROWTH becomes row-exact deletes (``bm_end & ~bm_start``
per chunk, only changed chunks' payload decoded) -- so there is no
change journal, no shuffle, and every partition is an independent part.

Batch: ``spark.read`` with the same option plus ``starting_gen`` /
``ending_gen`` (generation numbers or tag names) is the ``table_changes``
twin: tag after each drain and the next drain reads changes(tag -> live)
-- an incremental-consumer protocol with no running stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_output_s3_parquet_spark.jobs import (
    delete_job,
    encode_job,
    update_job,
)
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
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
    path = str(tmp_path / "cdf")
    encode_job(spark, docs, path, _pol(), if_exists="error")
    EncodedTable(path).set_snapshot_retention(6)
    return path


@pytest.fixture()
def drain(spark, table, tmp_path):
    """availableNow drain of the change feed into a parquet sink under a
    persistent checkpoint; returns the full sink contents."""
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )

    spark.dataSource.register(EncodedTableDataSource)
    out_dir, chk = str(tmp_path / "out"), str(tmp_path / "chk")

    def _drain():
        q = (
            spark.readStream.format("enctable")
            .option("readChangeFeed", "true").load(table)
            .writeStream.format("parquet")
            .option("path", out_dir).option("checkpointLocation", chk)
            .trigger(availableNow=True).start()
        )
        q.processAllAvailable()
        exc = q.exception()
        q.stop()
        if exc is not None:
            raise exc
        return spark.read.parquet(out_dir)

    return _drain


def test_cdf_snapshot_then_appends(spark, docs, table, drain):
    n = docs.count()
    got = drain()
    assert got.count() == n
    assert got.select("_change_type").distinct().collect()[0][0] == "insert"
    g0 = EncodedTable(table).manifest().get("parts_gen", 0)
    assert got.select("_commit_gen").distinct().collect()[0][0] == g0

    extra = docs.limit(7).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    encode_job(spark, extra, table, _pol(), if_exists="skip", part_base=1 << 20)
    got2 = drain()
    assert got2.count() == n + 7
    fresh = got2.where(F.col("doc_id") >= 1_000_000)
    assert fresh.count() == 7
    assert fresh.select("_change_type").distinct().collect()[0][0] == "insert"


def test_cdf_mor_delete_row_exact(spark, docs, table, drain):
    n = docs.count()
    drain()
    delete_job(spark, table, ("doc_id", "<", 10), mode="mor")
    got = drain()
    dels = got.where(F.col("_change_type") == "delete")
    assert dels.count() == 10
    assert sorted(r.doc_id for r in dels.select("doc_id").collect()) == list(
        range(10)
    )
    # delete images carry the full row payload, not just the key
    assert dels.where(F.col("text").isNull()).count() == 0
    assert got.count() == n + 10  # snapshot batch + the delete images
    g = EncodedTable(table).manifest().get("parts_gen", 0)
    assert dels.select("_commit_gen").distinct().collect()[0][0] == g

    # a second mor delete ships ONLY the newly-masked rows
    delete_job(spark, table, ("doc_id", "<", 13), mode="mor")
    got2 = drain()
    dels2 = got2.where(
        (F.col("_change_type") == "delete") & (F.col("_commit_gen") == g + 1)
    )
    assert sorted(r.doc_id for r in dels2.select("doc_id").collect()) == [
        10, 11, 12,
    ]


def test_cdf_mor_update_is_delete_plus_insert(spark, docs, table, drain):
    drain()
    update_job(
        spark, table, ("doc_id", "==", 5), {"lang": "'xx'"}, mode="mor"
    )
    got = drain()
    g = EncodedTable(table).manifest().get("parts_gen", 0)
    changed = got.where(F.col("_commit_gen") == g)
    rows = {
        (r._change_type, r.lang)
        for r in changed.select("_change_type", "lang", "doc_id").collect()
        if r.doc_id == 5
    }
    old_lang = docs.where(F.col("doc_id") == 5).collect()[0].lang
    assert rows == {("delete", old_lang), ("insert", "xx")}
    assert changed.count() == 2


def test_cdf_cow_rewrite_fails_loudly(spark, docs, table, drain):
    drain()
    delete_job(spark, table, ("doc_id", "==", 77))  # copy-on-write
    with pytest.raises(Exception, match="rewritten away|fresh checkpoint"):
        drain()


def test_cdf_metadata_only_flip_is_an_empty_batch(spark, docs, table, drain):
    import pyspark.sql.types as T

    n = docs.count()
    drain()
    EncodedTable(table).add_column("note", T.StringType())
    got = drain()  # gen flipped, zero row changes: must drain cleanly
    assert got.count() == n  # nothing re-shipped, nothing lost


def test_cdf_replay_is_deterministic_across_restart(spark, docs, table):
    """A batch is a pure function of its two offsets: a FRESH reader
    (simulated restart) planning the same offset window yields exactly
    the same rows, including after a mor delete in the window."""
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableChangeFeedReader,
    )

    t = EncodedTable(table)
    schema = t.schema()
    r1 = EncodedTableChangeFeedReader(table, schema, None)
    start = r1.latestOffset()
    delete_job(spark, table, ("doc_id", "<", 5), mode="mor")
    end = r1.latestOffset()
    assert end["gen"] == start["gen"] + 1

    def rows_of(reader):
        out = []
        for p in reader.partitions(start, end):
            for b in reader.read(p):
                out.extend(zip(*[c.to_pylist() for c in b.columns]))
        return sorted(out, key=str)

    got1 = rows_of(r1)
    assert len(got1) == 5  # five delete images, nothing else
    got2 = rows_of(EncodedTableChangeFeedReader(table, schema, None))
    assert got1 == got2


def test_cdf_delete_tasks_touch_only_changed_chunks(spark, docs, table):
    """The delete partition carries the changed chunk_seq allowlist, so
    untouched chunks' payload row groups are never read."""
    import json

    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableChangeFeedReader,
    )

    t = EncodedTable(table)
    r = EncodedTableChangeFeedReader(table, t.schema(), None)
    start = r.latestOffset()
    delete_job(spark, table, ("doc_id", "==", 3), mode="mor")
    end = r.latestOffset()
    tasks = [json.loads(p.value) for p in r.partitions(start, end)]
    assert len(tasks) == 1 and tasks[0][0] == "delete"
    seqs = tasks[0][3]
    assert seqs is not None and len(seqs) == 1  # one row -> one chunk


def test_cdf_batch_table_changes_between_tags(spark, docs, table):
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )

    spark.dataSource.register(EncodedTableDataSource)
    t = EncodedTable(table)
    t.create_tag("v0")
    delete_job(spark, table, ("doc_id", "<", 3), mode="mor")
    extra = docs.limit(2).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    encode_job(spark, extra, table, _pol(), if_exists="skip", part_base=1 << 20)
    t.create_tag("v1")

    got = (
        spark.read.format("enctable").option("readChangeFeed", "true")
        .option("starting_gen", "v0").option("ending_gen", "v1").load(table)
    )
    dels = got.where(F.col("_change_type") == "delete")
    ins = got.where(F.col("_change_type") == "insert")
    assert sorted(r.doc_id for r in dels.select("doc_id").collect()) == [0, 1, 2]
    assert ins.count() == 2
    # every change carries the closing generation's commit wall clock
    assert got.where(F.col("_commit_ts").isNull()).count() == 0
    assert ins.where(F.col("doc_id") >= 1_000_000).count() == 2

    # empty delta: same tag on both bounds -> zero rows, schema intact
    empty = (
        spark.read.format("enctable").option("readChangeFeed", "true")
        .option("starting_gen", "v1").load(table)
    )
    assert empty.count() == 0
    assert "_change_type" in empty.columns


def test_cdf_option_misuse_raises(spark, table):
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )

    spark.dataSource.register(EncodedTableDataSource)
    with pytest.raises(Exception, match="starting_gen"):
        (
            spark.read.format("enctable").option("readChangeFeed", "true")
            .load(table).collect()
        )
    ds = EncodedTableDataSource(
        options={
            "path": table, "readchangefeed": "true", "ignoredeletes": "true",
        }
    )
    with pytest.raises(ValueError, match="append stream"):
        ds.streamReader(EncodedTable(table).schema())


def test_cdf_max_parts_per_trigger_bounds_every_batch(spark, docs, table):
    """Admission control: with maxPartsPerTrigger=2 each offset advance
    covers at most 2 parts, yet the walk reaches the true end -- the
    10^6-part fresh-start snapshot drains as many small committed
    batches, not one giant one."""
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableChangeFeedReader,
    )

    t = EncodedTable(table)
    parts = sorted(t.completed_parts())
    assert len(parts) >= 3  # the cap must actually bite
    r = EncodedTableChangeFeedReader(
        table, t.schema(), None, max_parts_per_trigger=2
    )
    offs = [r.initialOffset()]
    for _ in range(len(parts) + 2):
        o = r.latestOffset()
        if o == offs[-1]:
            break
        r.partitions(offs[-1], o)
        offs.append(o)
    for a, b in zip(offs, offs[1:]):
        covered = [p for p in parts if a["next"] <= p < b["next"]]
        assert 1 <= len(covered) <= 2, (a, b)
    assert offs[-1]["next"] == max(parts) + 1
    assert len(offs) >= 3


def test_append_stream_max_parts_per_trigger_e2e(spark, docs, table):
    """The plain append stream honors the cap end-to-end from the second
    trigger on (batch 0 is structurally uncapped: the Python stream API
    calls latestOffset before any anchor exists): an appended multi-part
    wave arriving mid-stream drains across SEVERAL micro-batches, totals
    exact."""
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )

    spark.dataSource.register(EncodedTableDataSource)
    n = docs.count()
    q = (
        spark.readStream.format("enctable")
        .option("maxPartsPerTrigger", "1").load(table)
        .writeStream.format("memory").queryName("captest").start()
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
        assert spark.table("captest").count() == n
        b0 = q.lastProgress["batchId"]
        # a >=3-part wave lands while the stream runs; cap 1 forces it to
        # drain across at least 3 further micro-batches
        extra = docs.limit(200).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
        encode_job(
            spark, extra, table, _pol(), if_exists="skip", part_base=1 << 20
        )
        from embulk_output_s3_parquet_spark.sources.tables import (
            EncodedTable as _ET,
        )

        new_parts = sum(
            1 for p in _ET(table).completed_parts() if p >= 1 << 20
        )
        assert new_parts >= 3
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
        assert spark.table("captest").count() == n + 200
        assert q.lastProgress["batchId"] - b0 >= new_parts
    finally:
        q.stop()


def test_changes_table_sparkfree_matches_catalyst(spark, docs, table):
    """pyreader.changes_table is the Spark-free twin: identical rows to
    the Catalyst batch CDF between the same tag bounds."""
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )
    from embulk_output_s3_parquet_spark.sources.pyreader import changes_table

    spark.dataSource.register(EncodedTableDataSource)
    t = EncodedTable(table)
    t.create_tag("p0")
    delete_job(spark, table, ("doc_id", "<", 4), mode="mor")
    extra = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    encode_job(spark, extra, table, _pol(), if_exists="skip", part_base=1 << 20)

    free = changes_table(table, "p0").to_pandas()
    via_spark = (
        spark.read.format("enctable").option("readChangeFeed", "true")
        .option("starting_gen", "p0").load(table).toPandas()
    )
    key = ["_change_type", "doc_id"]
    assert sorted(map(tuple, free[key].values.tolist())) == sorted(
        map(tuple, via_spark[key].values.tolist())
    )
    assert len(free) == 4 + 3
    assert free["_commit_ts"].notna().all()


def test_cdf_statdiff_matches_fullplan(spark, docs, table, monkeypatch):
    """The stat-diff planner (EncodedTable.cdf_states: parse only shards
    whose lineage JSON or dv sidecar changed inode between the two
    snapshots) must produce byte-identical task lists to the full
    two-snapshot parse, and must actually SKIP untouched shards."""
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableChangesReader,
    )

    t = EncodedTable(table)
    t.create_tag("s0")
    delete_job(spark, table, ("doc_id", "<", 5), mode="mor")  # dv in shard 0
    extra = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    encode_job(spark, extra, table, _pol(), if_exists="skip", part_base=1 << 20)
    t.create_tag("s1")
    # second wave touching ONLY shard 256: s1 -> live must skip shard 0
    extra2 = docs.limit(2).withColumn("doc_id", F.col("doc_id") + 2_000_000)
    encode_job(
        spark, extra2, table, _pol(), if_exists="skip", part_base=(1 << 20) + 64
    )

    sch = t.schema()
    for bounds in (("s0", None), ("s0", "s1"), ("s1", None)):
        fast = EncodedTableChangesReader(table, sch, None, *bounds)
        monkeypatch.setenv("SPARK_ENCTABLE_CDF_FULLPLAN", "1")
        full = EncodedTableChangesReader(table, sch, None, *bounds)
        monkeypatch.delenv("SPARK_ENCTABLE_CDF_FULLPLAN")
        assert fast._tasks == full._tasks, bounds
        assert fast._tasks, bounds  # every window has a real delta
        assert full.plan_stats == {}  # full path records no stat-diff
    # the s1 -> live window touched only shard 256; shard 0 (original
    # parts + their dv sidecar) is an inode-equal hard link and is skipped
    fast = EncodedTableChangesReader(table, sch, None, "s1", None)
    assert fast.plan_stats["changed_shards"] == 1
    assert fast.plan_stats["total_shards"] >= 2
    assert [k[0] for k in fast._tasks] == ["insert"] * len(fast._tasks)


def test_cdf_states_synthetic_multishard(tmp_path):
    """Spark-free unit test of the stat-diff planner across three lineage
    shards: appends in one shard and dv growth in another parse exactly
    those two shards; the untouched middle shard is never loaded."""
    import base64

    from pyspark.sql import types as T

    from embulk_output_s3_parquet_spark.sources.datasource import _cdf_tasks
    from embulk_output_s3_parquet_spark.sources.tables import SHARD_SIZE

    sch = T.StructType([T.StructField("x", T.LongType())])
    t = EncodedTable.create(str(tmp_path / "syn"), sch, CodecPolicy())
    t.set_snapshot_retention(4)

    def row(pid):
        return {"rows": 8, "chunks": 1, "raw_bytes": 64, "enc_bytes": 32}

    pids0 = [1, 2, SHARD_SIZE + 1, 2 * SHARD_SIZE + 1]
    t._append_parts({p: row(p) for p in pids0})
    g0 = t.create_tag("base")

    # dv growth in shard 0 (via the same _update_parts path delete_job
    # mode='mor' uses) and a fresh append in shard 2
    dv = {
        "n": 1,
        "chunks": {"0": {"n": 1, "bm": base64.b64encode(b"\x80").decode()}},
    }
    t._update_parts(set(), {1: {**row(1), "dv": dv}})
    t._append_parts({2 * SHARD_SIZE + 2: row(0)})
    g1 = int(t.manifest()["parts_gen"])

    (n0, lin0, dv0), (n1, lin1, dv1), stats = t.cdf_states(g0, g1)
    assert stats["changed_shards"] == 2 and stats["total_shards"] == 3
    assert SHARD_SIZE + 1 not in lin0 | lin1  # untouched shard never parsed
    assert n0 == 2 * SHARD_SIZE + 2 and n1 == 2 * SHARD_SIZE + 3

    # task equivalence vs the full two-snapshot parse
    flin0, fdv0 = set(t.lineage_at(g0)), t.part_dv(gen=g0)
    flin1, fdv1 = set(t.lineage_at(g1)), t.part_dv(gen=g1)
    fn0, fn1 = max(flin0) + 1, max(flin1) + 1
    assert (fn0, fn1) == (n0, n1)
    fast = _cdf_tasks(t.path, (g0, n0, lin0, dv0), (g1, n1, lin1, dv1))
    full = _cdf_tasks(t.path, (g0, fn0, flin0, fdv0), (g1, fn1, flin1, fdv1))
    assert fast == full
    kinds = sorted(k[0] for k in fast)
    assert kinds == ["delete", "insert"]

    # a copy-on-write retire between the bounds still fails loudly through
    # the restricted sets (the rewritten shard stats as changed)
    t._update_parts({2}, {})
    g2 = int(t.manifest()["parts_gen"])
    (n0, lin0, dv0), (n1, lin1, dv1), _ = t.cdf_states(g0, g2)
    with pytest.raises(RuntimeError, match="rewritten away"):
        _cdf_tasks(t.path, (g0, n0, lin0, dv0), (g2, n1, lin1, dv1))


def test_cdf_running_feed_sees_same_gen_appends(spark, docs, table):
    """Appends commit into the LIVE generation without flipping parts_gen,
    so a RUNNING feed's witnessed-generation cache must refresh on the
    shard-dir stat fingerprint, not the generation number alone -- a
    long-running CDF stream over an append-only table must deliver new
    parts promptly, not stall until an unrelated generation flip."""
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )

    spark.dataSource.register(EncodedTableDataSource)
    n = docs.count()
    q = (
        spark.readStream.format("enctable")
        .option("readChangeFeed", "true").load(table)
        .writeStream.format("memory").queryName("cdflive").start()
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
        assert spark.table("cdflive").count() == n
        # same-generation append while the stream is RUNNING (no flip)
        g_before = EncodedTable(table).manifest().get("parts_gen", 0)
        extra = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
        encode_job(
            spark, extra, table, _pol(), if_exists="skip", part_base=1 << 20
        )
        assert EncodedTable(table).manifest().get("parts_gen", 0) == g_before
        q.processAllAvailable()
        assert q.exception() is None, q.exception()
        got = spark.table("cdflive")
        assert got.count() == n + 5
        fresh = got.where(F.col("doc_id") >= 1_000_000)
        assert fresh.count() == 5
        assert (
            fresh.select("_change_type").distinct().collect()[0][0] == "insert"
        )
    finally:
        q.stop()


def test_cdf_restart_capped_backlog_replays_fully(spark, docs, table):
    """Restart planning may stat-diff the two snapshots ONLY when the
    start offset has no backlog: with maxPartsPerTrigger the checkpointed
    ``next`` can lag the start generation's true watermark, and those
    undelivered parts live in shards that are inode-equal across the
    window -- the planner must fall back to the full snapshot load and
    deliver them."""
    import json

    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableChangeFeedReader,
    )

    t = EncodedTable(table)
    sch = t.schema()
    r = EncodedTableChangeFeedReader(table, sch, None, max_parts_per_trigger=2)
    r.initialOffset()
    o1 = r.latestOffset()  # capped: covers only the first parts
    parts = sorted(t.completed_parts())
    assert o1["next"] <= parts[-1]  # a real backlog remains
    # delete a row that lives in a DELIVERED part (< o1.next): its image
    # must come back as a delete task; rows vectored in backlog parts are
    # simply excluded from their insert (never delivered, no retraction)
    victim = t.part_zones()[parts[0]]["doc_id"]["mm"][0]
    delete_job(spark, table, ("doc_id", "==", victim), mode="mor")

    r2 = EncodedTableChangeFeedReader(table, sch, None)  # restart
    end = r2.latestOffset()
    assert end["gen"] == o1["gen"] + 1
    tasks = [json.loads(p.value) for p in r2.partitions(o1, end)]
    got_inserts = sorted(
        int(task[1].rsplit("part_id=", 1)[1])
        for task in tasks
        if task[0] == "insert"
    )
    assert got_inserts == [p for p in parts if p >= o1["next"]]
    dels = [task for task in tasks if task[0] == "delete"]
    assert len(dels) == 1
    assert int(dels[0][1].rsplit("part_id=", 1)[1]) == parts[0]


def test_cdf_timestamp_bounds(spark, docs, table):
    """Delta startingTimestamp parity: starting_ts/ending_ts resolve via
    the manifest's flip clocks to the same window as generation bounds;
    mixing the two spellings for one bound raises."""
    import time as _time

    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )

    spark.dataSource.register(EncodedTableDataSource)
    t = EncodedTable(table)
    g0 = t.create_tag("ts0")  # freeze-flip stamps the generation clock
    _time.sleep(0.05)
    ts0 = _time.time()
    _time.sleep(0.05)
    delete_job(spark, table, ("doc_id", "<", 6), mode="mor")

    by_ts = (
        spark.read.format("enctable").option("readChangeFeed", "true")
        .option("starting_ts", str(ts0)).load(table).toPandas()
    )
    by_gen = (
        spark.read.format("enctable").option("readChangeFeed", "true")
        .option("starting_gen", str(g0)).load(table).toPandas()
    )
    key = ["_change_type", "doc_id"]
    assert sorted(map(tuple, by_ts[key].values.tolist())) == sorted(
        map(tuple, by_gen[key].values.tolist())
    )
    assert len(by_ts) == 6 and set(by_ts["_change_type"]) == {"delete"}

    with pytest.raises(Exception, match="exactly one"):
        (
            spark.read.format("enctable").option("readChangeFeed", "true")
            .option("starting_gen", "0").option("starting_ts", str(ts0))
            .load(table).collect()
        )
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            spark.read.format("enctable").option("readChangeFeed", "true")
            .option("starting_ts", str(ts0)).option("ending_gen", "1")
            .option("ending_ts", str(ts0)).load(table).collect()
        )
