"""Driver-side metadata scalability bench: does the manifest survive 10^5+ parts?

Every 100 TB claim the engine makes about part-granular metadata --
O(wave) commits, shard-streamed bloom probes, zone pruning before task
scheduling -- is driver-side work that no sf0.1 bench exercises: at sf0.1
the table has tens of parts, so a 10^6-part table could be O(n^2) in the
driver and still look instant. This bench builds REAL manifests through the
production commit path (EncodedTable._append_parts -> shard files + bloom
sidecars, the exact bytes a 100 TB encode leaves behind) at part counts
where driver cost is measurable, and times the four driver operations a
query/DML pays:

  wave_first/last_s   -- commit wall for the first vs the LAST append wave
                         (equal => commit is O(wave), not O(table))
  lineage_load_s      -- full lineage read (what describe()/verify pay)
  zone_prune_s        -- surviving_parts() for a selective range predicate
                         over per-part zones (what every pruned scan pays)
  bloom_probe_s       -- surviving_parts() for a point predicate with
                         per-shard bloom sidecars streamed one at a time
                         (what a point lookup pays)

No SparkSession and no payload bytes: this isolates the driver, which is
the component that does NOT scale out on a 1000-executor cluster.

Usage: python scripts/metadata_scale_bench.py [--parts 100000] [--wave 2048]
       [--bloom-parts 8192] [--part-rows 100000]
Prints one JSON line; numbers are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
from pyspark.sql import types as T

from embulk_output_s3_parquet_spark.codecs import bloom as bloomlib
from embulk_output_s3_parquet_spark.codecs import hll as hlllib
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
from embulk_output_s3_parquet_spark.sources import tables as tables_mod
from embulk_output_s3_parquet_spark.sources.tables import SHARD_SIZE, EncodedTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("id", T.LongType()),
    ]
)

_LANGS = ["python", "java", "go", "rust", "c", "scala"]


def _zone(t: str, n: int, mm) -> dict:
    return {"t": t, "n": n, "z": 0, "mm": mm}


def lineage_row(
    pid: int, part_rows: int, bloom: dict | None, hl: dict | None = None
) -> dict:
    """One part's lineage row with the same shape lineage_row_from_chunks
    emits (jobs.py): per-column zone summaries over realistic domains --
    id zones are disjoint ranges (prunable), repo/lang/commit zones span
    wide string ranges (mostly unprunable, the honest case for text keys)."""
    base = pid * part_rows
    zones = {
        "repo": _zone("string", part_rows, [f"org{pid % 97}/repo0", f"org{pid % 97}/repo99999"]),
        "path": _zone("string", part_rows, ["cmd/api/a.go", "util/zz/file.py"]),
        "commit": _zone("string", part_rows, ["0000000000", "ffffffffff"]),
        "lang": _zone("string", part_rows, [_LANGS[pid % 3], _LANGS[3 + pid % 3]]),
        "content": _zone("string", part_rows, None),
        "id": _zone("int64", part_rows, [base, base + part_rows - 1]),
    }
    if bloom is not None:
        zones["commit"]["bf"] = bloom
    if hl is not None:
        zones["id"]["hl"] = hl
    return {
        "rows": part_rows,
        "chunks": 32,
        "raw_bytes": part_rows * 3200,
        "enc_bytes": part_rows * 640,
        "sha256_manifest": f"{pid:064x}",
        "codecs": ["dict", "fsst", "raw"],
        "zones": zones,
    }


def build_table(
    root: str,
    parts: int,
    wave: int,
    part_rows: int,
    with_blooms: bool,
    with_ndv: bool = False,
):
    t = EncodedTable.create(
        os.path.join(root, f"meta_{parts}_{int(with_blooms)}_{int(with_ndv)}"),
        SCHEMA,
        CodecPolicy(
            bloom_columns=("commit",) if with_blooms else (),
            ndv_columns=("id",) if with_ndv else (),
        ),
    )
    bloom_m = None
    if with_blooms:
        # the production part-bloom geometry for part_rows rows: ~10
        # bits/row rounded to a power of two, capped by the byte budget
        bloom_m = min(
            1 << max(6, (part_rows * 10).bit_length()),
            bloomlib.PART_BF_MAX_BYTES * 8,
        )
    wave_times: list[float] = []
    for lo in range(0, parts, wave):
        rows = {}
        for pid in range(lo, min(lo + wave, parts)):
            bf = None
            if with_blooms:
                # a sample of the part's keys is enough to exercise probe
                # cost (probe wall depends on m and shard IO, not fill)
                vals = pa.array([f"{pid:08d}{i:032d}" for i in range(128)])
                bf = bloomlib.build(vals, m_bits=bloom_m)
            hl = None
            if with_ndv:
                # 256 globally-disjoint ids per part: the merged estimate
                # must land near parts*256 or the merge path is broken
                base = pid * part_rows
                hl = hlllib.build(
                    pa.array(range(base, base + 256), pa.int64())
                )
            rows[pid] = lineage_row(pid, part_rows, bf, hl)
        t0 = time.time()
        t._append_parts(rows)
        wave_times.append(time.time() - t0)
    return t, wave_times


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=100_000)
    ap.add_argument("--wave", type=int, default=2048)
    ap.add_argument("--bloom-parts", type=int, default=8192)
    ap.add_argument("--part-rows", type=int, default=100_000)
    ap.add_argument(
        "--ndv-parts", type=int, default=None,
        help="parts for the NDV sidecar-merge measurement (default: "
        "--parts; 0 = skip)",
    )
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--spark", type=int, default=0, help="cores for the distributed-prune measurement (0 = skip)")
    args = ap.parse_args()
    if args.ndv_parts is None:
        args.ndv_parts = args.parts

    root = tempfile.mkdtemp(prefix="meta_scale_")
    out: dict = {
        "metric": "metadata_scale",
        "parts": args.parts,
        "wave": args.wave,
        "shard_size": SHARD_SIZE,
        "part_rows": args.part_rows,
        "simulated_rows": args.parts * args.part_rows,
        "simulated_raw_tb": round(args.parts * args.part_rows * 3200 / 1e12, 2),
    }
    try:
        # -- zone table at full part count (no blooms) --------------------
        t, waves = build_table(root, args.parts, args.wave, args.part_rows, False)
        out["wave_first_s"] = round(waves[0], 4)
        out["wave_last_s"] = round(waves[-1], 4)
        out["wave_max_s"] = round(max(waves), 4)

        t0 = time.time()
        lin = t.lineage()
        out["lineage_load_s"] = round(time.time() - t0, 3)
        assert len(lin) == args.parts

        manifest_bytes = sum(
            os.path.getsize(os.path.join(t.parts_dir, f))
            for f in os.listdir(t.parts_dir)
        )
        out["lineage_bytes_per_part"] = manifest_bytes // args.parts

        # -- named tag: freeze-flip cost + snapshot read at full count ----
        # create_tag on the CURRENT generation freezes it with a links-only
        # shard flip: the 100 TB claim is that pinning a snapshot costs
        # O(shards) hard links and zero payload IO, at ANY part count
        t0 = time.time()
        pinned = t.create_tag("bench")
        out["tag_freeze_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        snap = t.lineage_at(pinned)
        out["snapshot_lineage_load_s"] = round(time.time() - t0, 3)
        assert len(snap) == args.parts
        out["extrapolated_1e6_tag_freeze_s"] = round(
            out["tag_freeze_s"] * 1e6 / args.parts, 1
        )

        # selective id range: hits ~10 parts' disjoint zones
        lo = (args.parts // 2) * args.part_rows
        hi = lo + 10 * args.part_rows - 1
        t0 = time.time()
        surv = t.surviving_parts([("id", ">=", lo), ("id", "<=", hi)])
        out["zone_prune_s"] = round(time.time() - t0, 3)
        out["zone_survivors"] = len(surv)
        assert 1 <= len(surv) <= 16, len(surv)

        # unprunable predicate (commit range spans every zone): worst case,
        # the full O(parts) zone sweep with zero exclusions. First with the
        # parsed-shard cache warm from lineage() above, then cold (a fresh
        # driver process planning its first query).
        t0 = time.time()
        surv_all = t.surviving_parts([("commit", ">=", "aa")])
        out["zone_sweep_warm_s"] = round(time.time() - t0, 3)
        out["zone_sweep_worstcase_s"] = out["zone_sweep_warm_s"]
        assert len(surv_all) == args.parts
        tables_mod._SHARD_CACHE.clear()
        t0 = time.time()
        surv_all = t.surviving_parts([("commit", ">=", "aa")])
        out["zone_sweep_cold_s"] = round(time.time() - t0, 3)
        assert len(surv_all) == args.parts

        if args.spark:
            # executor-side pruning (surviving_parts_distributed): driver
            # holds only the shard list + survivor ids, shard JSON parses
            # on the cluster. This is the path a 10^6-part table takes.
            from pyspark.sql import SparkSession

            spark = (
                SparkSession.builder.master(f"local[{args.spark}]")
                .config("spark.sql.shuffle.partitions", str(args.spark))
                .config("spark.ui.enabled", "false")
                .getOrCreate()
            )
            got = t.surviving_parts_distributed(spark, [("commit", ">=", "aa")])
            t0 = time.time()
            got = t.surviving_parts_distributed(spark, [("commit", ">=", "aa")])
            out["zone_sweep_distributed_s"] = round(time.time() - t0, 3)
            assert len(got) == args.parts
            t0 = time.time()
            sel = t.surviving_parts_distributed(
                spark, [("id", ">=", lo), ("id", "<=", hi)]
            )
            out["zone_prune_distributed_s"] = round(time.time() - t0, 3)
            assert sel == surv

        # -- change-feed planning at full part count -----------------------
        # batch table_changes(tag -> live) after one appended wave: the
        # driver pays two lineage loads + an O(parts) id sweep + (here
        # empty) dv sidecar loads, then plans O(changed parts) tasks. The
        # 100 TB claim: incremental consumption of a 10^5-part table costs
        # seconds of planning for a wave-sized delta, and scales linearly.
        t._append_parts(
            {
                pid: lineage_row(pid, args.part_rows, None, None)
                for pid in range(args.parts, args.parts + args.wave)
            }
        )
        from embulk_output_s3_parquet_spark.sources.datasource import (
            EncodedTableChangesReader,
        )

        os.environ["SPARK_ENCTABLE_CDF_FULLPLAN"] = "1"
        t0 = time.time()
        rdr = EncodedTableChangesReader(t.path, SCHEMA, None, "bench", None)
        out["cdf_plan_full_s"] = round(time.time() - t0, 3)
        del os.environ["SPARK_ENCTABLE_CDF_FULLPLAN"]
        out["cdf_plan_tasks"] = len(rdr._tasks)
        assert len(rdr._tasks) == args.wave, len(rdr._tasks)
        assert all(task[0] == "insert" for task in rdr._tasks)
        # stat-diff planner (the default): unchanged shards are inode-equal
        # hard links from the tag's freeze-flip, so only the shards the
        # appended wave touched are parsed -- O(shards + changed parts)
        t0 = time.time()
        fast = EncodedTableChangesReader(t.path, SCHEMA, None, "bench", None)
        out["cdf_plan_s"] = round(time.time() - t0, 3)
        assert fast._tasks == rdr._tasks
        out["cdf_changed_shards"] = fast.plan_stats.get("changed_shards")
        out["cdf_total_shards"] = fast.plan_stats.get("total_shards")
        # full plan parses every shard of both snapshots: linear in parts.
        # The stat-diff plan is O(shards) stats + O(changed parts) parse,
        # so its 1e6 extrapolation scales only the stat sweep (shards
        # grow 1e6/parts-fold; the wave-sized parse cost is constant).
        # streaming feed poll cost at full part count: steady-state
        # latestOffset is the O(shards) liveness fingerprint (nothing
        # parses); a same-generation append pays one stat-diff recapture
        from embulk_output_s3_parquet_spark.sources.datasource import (
            EncodedTableChangeFeedReader,
        )

        feed = EncodedTableChangeFeedReader(t.path, SCHEMA, None)
        feed.latestOffset()
        t0 = time.time()
        for _ in range(10):
            feed.latestOffset()
        out["cdf_poll_steady_ms"] = round((time.time() - t0) * 100, 1)
        t._append_parts(
            {args.parts + args.wave: lineage_row(args.parts + args.wave,
                                                 args.part_rows, None)}
        )
        t0 = time.time()
        o = feed.latestOffset()
        out["cdf_poll_recapture_ms"] = round((time.time() - t0) * 1000, 1)
        assert o["next"] == args.parts + args.wave + 1, o

        out["extrapolated_1e6_cdf_plan_s"] = round(
            out["cdf_plan_full_s"] * 1e6 / args.parts, 1
        )

        # -- bloom table (realistic sidecar bytes, shard-streamed probes) --
        tb, _ = build_table(root, args.bloom_parts, args.wave, args.part_rows, True)
        sidecars = [
            os.path.join(tb.parts_dir, f)
            for f in os.listdir(tb.parts_dir)
            if f.endswith((".bf.json", ".bf.bin"))
        ]
        out["bloom_parts"] = args.bloom_parts
        out["bloom_sidecar_mb"] = round(sum(map(os.path.getsize, sidecars)) / 1e6, 1)
        probe_pid = args.bloom_parts // 3
        t0 = time.time()
        survb = tb.surviving_parts([("commit", "==", f"{probe_pid:08d}{7:032d}")])
        out["bloom_probe_cold_s"] = round(time.time() - t0, 3)
        out["bloom_probe_s"] = out["bloom_probe_cold_s"]
        out["bloom_survivors"] = len(survb)
        assert probe_pid in survb, "bloom pruning dropped the true part"
        # warm page cache: the steady-state latency of a point lookup on a
        # long-lived driver (cold = first query after driver start)
        t0 = time.time()
        survb = tb.surviving_parts([("commit", "==", f"{probe_pid:08d}{7:032d}")])
        out["bloom_probe_warm_s"] = round(time.time() - t0, 3)
        if args.spark:
            # executor-side bloom probing: sidecar IO scatters across the
            # cluster, so a cold point lookup stops paying one-driver IO
            t0 = time.time()
            got = tb.surviving_parts_distributed(
                spark, [("commit", "==", f"{probe_pid:08d}{7:032d}")]
            )
            out["bloom_probe_distributed_s"] = round(time.time() - t0, 3)
            assert got == survb

        # absent key: every part should be excluded by its bloom
        t0 = time.time()
        surv0 = tb.surviving_parts([("commit", "==", "not-a-commit-anywhere")])
        out["bloom_probe_absent_s"] = round(time.time() - t0, 3)
        out["bloom_absent_survivors"] = len(surv0)

        # -- NDV sketch table (per-part HLL sidecars, full part count) -----
        if args.ndv_parts:
            from embulk_output_s3_parquet_spark.jobs import distinct_job

            tn, _ = build_table(
                root, args.ndv_parts, args.wave, args.part_rows, False,
                with_ndv=True,
            )
            hsides = [
                os.path.join(tn.parts_dir, f)
                for f in os.listdir(tn.parts_dir)
                if f.endswith(".hll.json")
            ]
            out["ndv_parts"] = args.ndv_parts
            out["ndv_sidecar_bytes_per_part"] = (
                sum(map(os.path.getsize, hsides)) // args.ndv_parts
            )
            t0 = time.time()
            rep = distinct_job(tn.path, ["id"])
            out["ndv_merge_s"] = round(time.time() - t0, 3)
            out["ndv_est"] = rep["id"]["ndv"]
            out["ndv_true"] = args.ndv_parts * 256
            err = abs(out["ndv_est"] - out["ndv_true"]) / out["ndv_true"]
            out["ndv_rel_err"] = round(err, 4)
            assert err <= 4 * rep["id"]["rel_std_error"], (
                "merged estimate outside 4 sigma: the register union is "
                "broken, not noisy"
            )
            out["extrapolated_1e6_ndv_merge_s"] = round(
                out["ndv_merge_s"] * 1e6 / args.ndv_parts, 1
            )
            if args.spark:
                # executor-side shard premerge: driver receives one sketch
                # per shard, so the per-part work scales out
                rep_d = distinct_job(tn.path, ["id"], spark=spark)
                t0 = time.time()
                rep_d = distinct_job(tn.path, ["id"], spark=spark)
                out["ndv_merge_distributed_s"] = round(time.time() - t0, 3)
                assert rep_d == rep, "distributed NDV diverged from driver"

        # per-part driver costs -> what 10^6 parts would cost, linearly
        out["extrapolated_1e6_zone_sweep_s"] = round(
            out["zone_sweep_worstcase_s"] * 1e6 / args.parts, 1
        )
        out["extrapolated_1e6_bloom_probe_s"] = round(
            out["bloom_probe_s"] * 1e6 / args.bloom_parts, 1
        )
    finally:
        if args.keep:
            out["root"] = root
        else:
            shutil.rmtree(root, ignore_errors=True)
    # r6 (VERDICT #6): driver RSS alongside wall -- a super-linear driver
    # memory curve at 10^6 parts would invalidate the O(metadata) story
    # even with flat walls
    import resource

    out["driver_maxrss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
