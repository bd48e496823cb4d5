"""Spark-free EncodedTable reader: pyarrow + the codec kernels only.

The reference validates its output by re-reading with a *different* reader
(parquet-avro, reference EmbulkPluginTestHelper.scala:222-245); this module
is the engine's second reader -- no Spark session, just the manifest, the
parquet chunk files, and the numpy/pyarrow decode kernels. Used by tests and
usable by any Python consumer of an encoded table.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import decode_array, meta_from_json


def read_table(
    path: str,
    columns: list[str] | None = None,
    where=None,
    scan_stats: dict | None = None,
    parts: list[int] | None = None,
) -> pa.Table:
    """Decode a committed EncodedTable directory into an arrow Table.

    ``where`` is one (col, op, literal) conjunct or a list ANDed together --
    the SAME contract, validation, and zone-map + row-group payload pruning
    as ``operators.decode.decode_table_scan``, because both delegate to
    ``sources.chunkscan`` (the filter column must be in the projection).
    ``scan_stats`` (optional dict) accumulates rg_total/rg_read/
    chunks_total/chunks_skipped counters for pruning assertions.
    ``parts`` restricts the read to those committed part ids (how a
    bucketed-join task reads exactly its bucket's parts); an id that is not
    committed is a loud error, never silently empty."""
    from .chunkscan import iter_part_tables, normalize_where

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    schema_fields = json.loads(manifest["schema"])["fields"]
    names = [f["name"] for f in schema_fields]
    want = columns or names
    missing = set(want) - set(names)
    if missing:
        raise ValueError(f"unknown columns: {sorted(missing)}")
    by_name = {f["name"]: _arrow_type(f["type"]) for f in schema_fields}
    fields = [(n, by_name[n]) for n in want]
    conjuncts = normalize_where(where, want)
    committed = _committed_parts(path, manifest)
    fillable = frozenset(
        manifest.get("properties", {}).get("added-columns", [])
    ) & set(want)
    aliases = manifest.get("properties", {}).get("renamed-columns", {}) or {}
    dv_all = _dv_of(path, manifest)

    from .chunkscan import _survives

    pids = sorted(int(k) for k in committed)
    if parts is not None:
        wanted = {int(p) for p in parts}
        missing_pids = wanted - set(pids)
        if missing_pids:
            raise ValueError(
                f"parts not committed in {path}: {sorted(missing_pids)}"
            )
        pids = sorted(wanted)
    batches: list[pa.Table] = []
    for pid in pids:
        row = committed.get(str(pid)) or committed.get(pid) or {}
        if scan_stats is not None:
            scan_stats["parts_total"] = scan_stats.get("parts_total", 0) + 1
        if conjuncts and not _survives(
            row.get("zones", {}), conjuncts, fillable=fillable
        ):
            # part-zone pruning: the lineage summary proves no chunk in this
            # part can match -- its files are never opened
            if scan_stats is not None:
                scan_stats["parts_skipped"] = scan_stats.get("parts_skipped", 0) + 1
            continue
        part_dir = os.path.join(path, "data", f"part_id={pid}")
        files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"committed part {pid} missing at {part_dir}")
        batches.extend(
            iter_part_tables(
                files, fields, conjuncts, scan_stats,
                fillable=fillable, aliases=aliases, dv=dv_all.get(pid),
            )
        )
    if batches:
        return pa.concat_tables(batches)
    # empty committed table: honor the manifest schema's types instead of
    # null-typed columns, so empty and non-empty tables decode alike
    return pa.table(
        {n: pa.array([], type=by_name[n]) for n in want},
        schema=pa.schema(fields),
    )


def _committed_parts(path: str, manifest: dict) -> dict[str, dict]:
    """Committed parts = legacy inline entries + the current generation's
    lineage shards (the ONE Spark-free mirror of sources/tables.py's commit
    protocol -- shared by read_table and count_table so the two can't
    drift)."""
    from .tables import _is_lineage_shard

    parts: dict[str, dict] = dict(manifest.get("parts", {}))
    shard_dir = os.path.join(path, f"parts-{manifest.get('parts_gen', 0)}")
    if os.path.isdir(shard_dir):
        for name in os.listdir(shard_dir):
            # ONLY lineage shards: the .bf/.hll/.dv.json SIDECARS also
            # match a bare startswith/endswith test, and merging one in
            # would replace lineage rows with sidecar dicts whenever
            # listdir happens to order it after the shard file
            if _is_lineage_shard(name):
                with open(os.path.join(shard_dir, name)) as f:
                    parts.update(json.load(f))
    return parts



def _dv_of(path: str, manifest: dict) -> dict[int, dict]:
    """Spark-free merge-on-read delete-vector map ({pid: dv dict}) from the
    current generation's .dv.json sidecars; {} when none exist."""
    import glob as _glob
    import re as _re

    from .tables import DV_SIDECAR_SUFFIX

    shard_dir = os.path.join(path, f"parts-{manifest.get('parts_gen', 0)}")
    out: dict[int, dict] = {}
    for f in sorted(_glob.glob(os.path.join(shard_dir, f"shard-*{DV_SIDECAR_SUFFIX}"))):
        with open(f) as fh:
            for pid_s, dv in json.load(fh).items():
                out[int(pid_s)] = dv
    return out


def count_table(path: str, where=None, scan_stats: dict | None = None) -> int:
    """Spark-free twin of jobs.count_job: exact COUNT(*) under ``where``
    reading payload bytes only for boundary chunks (same tri-state
    metadata logic, sources/chunkscan.count_file)."""
    from .chunkscan import count_file, normalize_where

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    names = [f["name"] for f in json.loads(manifest["schema"])["fields"]]
    conjuncts = normalize_where(where, names)
    parts = _committed_parts(path, manifest)
    fillable = frozenset(manifest.get("properties", {}).get("added-columns", []))
    aliases = manifest.get("properties", {}).get("renamed-columns", {}) or {}
    dv_all = _dv_of(path, manifest)

    from .chunkscan import conjunct_state_of

    total = 0
    for pid in sorted(int(k) for k in parts):
        row = parts.get(str(pid)) or parts.get(pid) or {}
        if scan_stats is not None:
            scan_stats["parts_total"] = scan_stats.get("parts_total", 0) + 1
        # part-level tri-state from the lineage zone summary: fully
        # included parts contribute their audited row count, excluded
        # parts zero -- files opened only for boundary parts
        dv_n = int(dv_all.get(pid, {}).get("n", 0))
        if conjuncts and row.get("zones") is not None and "rows" in row:
            zones = row.get("zones", {})
            n_rows = int(row.get("rows", 0))
            states = [
                conjunct_state_of(zones, n_rows, c, op, v, fillable)
                for c, op, v in conjuncts
            ]
            if any(s == "none" for s in states):
                if scan_stats is not None:
                    scan_stats["parts_skipped"] = scan_stats.get("parts_skipped", 0) + 1
                continue
            if all(s == "all" for s in states):
                if scan_stats is not None:
                    scan_stats["parts_skipped"] = scan_stats.get("parts_skipped", 0) + 1
                total += int(row["rows"]) - dv_n
                continue
        elif not conjuncts and "rows" in row:
            total += int(row["rows"]) - dv_n
            continue
        part_dir = os.path.join(path, "data", f"part_id={pid}")
        files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"committed part {pid} missing at {part_dir}")
        for fpath in files:
            total += count_file(
                fpath, conjuncts, scan_stats, fillable=fillable,
                aliases=aliases, dv=dv_all.get(pid),
            )
    return total


def stats_table(
    path: str,
    columns: list[str],
    where=None,
    sums: bool = False,
    scan_stats: dict | None = None,
) -> dict[str, dict]:
    """Spark-free twin of the jobs._stats_scan driver: exact per-column
    stats ``{col: {"t", "mm", "sm", "nn"}}`` in the zone storage domain,
    reading payload bytes only where metadata can't answer (see
    chunkscan.minmax_file). jobs.minmax_job/sum_job are the distributed
    counterparts; this one needs no SparkSession at all -- an unpredicated
    MIN/MAX/SUM over any table is a pure manifest pass here too."""
    from .chunkscan import (
        conjunct_state_of,
        merge_sum,
        merge_zone,
        minmax_file,
        normalize_where,
    )

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    names = [f["name"] for f in json.loads(manifest["schema"])["fields"]]
    missing = [c for c in columns if c not in names]
    if missing:
        raise ValueError(f"aggregate columns not in table schema: {missing}")
    conjuncts = normalize_where(where, names)
    parts = _committed_parts(path, manifest)
    fillable = frozenset(manifest.get("properties", {}).get("added-columns", []))
    aliases = manifest.get("properties", {}).get("renamed-columns", {}) or {}
    dv_all = _dv_of(path, manifest)

    acc: dict[str, dict] = {
        c: {"t": "", "mm": None, "sm": None, "nn": 0} for c in columns
    }

    def fold(col: str, e: dict) -> None:
        cur = acc[col]
        t = cur["t"] or e.get("t", "")
        cur["t"] = t
        if e.get("mm") is not None:
            cur["mm"] = (
                list(e["mm"])
                if cur["mm"] is None
                else merge_zone(t, cur["mm"], list(e["mm"]))
            )
        if e.get("sm") is not None:
            cur["sm"] = (
                e["sm"]
                if cur["sm"] is None
                else merge_sum(t, cur["sm"], e["sm"])
            )
        cur["nn"] += int(e.get("nn", 0))

    for pid in sorted(int(k) for k in parts):
        row = parts.get(str(pid)) or parts.get(pid) or {}
        zones = row.get("zones", {})
        n_rows = int(row.get("rows", 0))
        if scan_stats is not None:
            scan_stats["parts_total"] = scan_stats.get("parts_total", 0) + 1
        boundary = False
        if conjuncts:
            states = [
                conjunct_state_of(zones, n_rows, c, op, v, fillable)
                for c, op, v in conjuncts
            ]
            if any(s == "none" for s in states):
                if scan_stats is not None:
                    scan_stats["parts_skipped"] = scan_stats.get("parts_skipped", 0) + 1
                continue
            boundary = any(s != "all" for s in states)
        # columns the lineage row could NOT answer: only these may be
        # re-derived from files, or a folded column's sum/count doubles
        unresolved_cols: list[str] = []
        if pid in dv_all and not boundary:
            unresolved_cols = list(columns)  # vectors poison part zones/sums
        elif not boundary:
            for c in columns:
                e = zones.get(c)
                if e is None:
                    if c not in fillable:
                        unresolved_cols.append(c)
                    continue  # added column: all-null in this part
                if int(e.get("z", 0)) >= int(e.get("n", 0)):
                    fold(c, {"t": e.get("t", "")})
                elif e.get("mm") is not None and (
                    not sums or e.get("sm") is not None
                ):
                    fold(c, {
                        "t": e.get("t", ""),
                        "mm": e["mm"],
                        "sm": e.get("sm") if sums else None,
                        "nn": int(e.get("n", 0)) - int(e.get("z", 0)),
                    })
                else:
                    unresolved_cols.append(c)
        if not (boundary or unresolved_cols):
            if scan_stats is not None and conjuncts:
                scan_stats["parts_skipped"] = scan_stats.get("parts_skipped", 0) + 1
            continue
        part_dir = os.path.join(path, "data", f"part_id={pid}")
        files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"committed part {pid} missing at {part_dir}")
        want_cols = list(columns) if boundary else unresolved_cols
        for fpath in files:
            got = minmax_file(
                fpath, conjuncts if boundary else [], want_cols,
                fillable=fillable, stats_out=scan_stats, sums=sums,
                aliases=aliases, dv=dv_all.get(pid),
            )
            for c, e in got.items():
                fold(c, e)
    return acc


_SPARK_TO_ARROW = {
    "boolean": pa.bool_(),
    "byte": pa.int8(),
    "short": pa.int16(),
    "integer": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "binary": pa.binary(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us", tz="UTC"),
    "timestamp_ntz": pa.timestamp("us"),
}


def _arrow_type(spark_type) -> pa.DataType:
    """Spark schema-JSON type -> arrow type (Spark-free mirror of
    pyspark.sql.pandas.types.to_arrow_schema for the types the engine
    encodes). Handles nested array types so an empty committed table with an
    ``array<float>`` column decodes with the same schema as a non-empty one."""
    if isinstance(spark_type, str):
        if spark_type.startswith("decimal"):
            p, s = spark_type[len("decimal(") : -1].split(",")
            return pa.decimal128(int(p), int(s))
        if spark_type in _SPARK_TO_ARROW:
            return _SPARK_TO_ARROW[spark_type]
    if isinstance(spark_type, dict) and spark_type.get("type") == "array":
        elem = _arrow_type(spark_type["elementType"])
        return pa.list_(
            pa.field("element", elem, nullable=spark_type.get("containsNull", True))
        )
    if isinstance(spark_type, dict) and spark_type.get("type") == "struct":
        return pa.struct(
            [
                pa.field(
                    f["name"], _arrow_type(f["type"]), nullable=f.get("nullable", True)
                )
                for f in spark_type["fields"]
            ]
        )
    if isinstance(spark_type, dict) and spark_type.get("type") == "map":
        return pa.map_(
            _arrow_type(spark_type["keyType"]), _arrow_type(spark_type["valueType"])
        )
    raise NotImplementedError(f"no arrow mapping for spark type {spark_type!r}")


def changes_table(
    path: str,
    from_ref,
    to_ref=None,
    columns: list[str] | None = None,
) -> pa.Table:
    """Spark-free batch change feed: the row-level delta between two
    retained generation snapshots (numbers or tag names; ``to_ref`` None =
    live), as one arrow Table with the ``_change_type`` / ``_commit_gen``
    / ``_commit_ts`` metadata columns -- the cron-shell twin of
    ``spark.read.format("enctable").option("readChangeFeed", "true")``.
    Same planner and decode path as the Catalyst reader
    (sources/datasource.py ``EncodedTableChangesReader``), so semantics --
    appends as inserts, merge-on-read vector growth as row-exact deletes,
    loud failure on copy-on-write rewrites between the bounds -- are
    identical; tag-after-drain makes incremental consumption need no
    running Spark at all."""
    from .datasource import EncodedTableChangesReader
    from .tables import EncodedTable

    rdr = EncodedTableChangesReader(
        path, EncodedTable(path).schema(), columns, from_ref, to_ref
    )
    batches = []
    for p in rdr.partitions():
        batches.extend(rdr.read(p))
    schema = pa.schema(
        [(n, t) for n, t in rdr._fields] + [(n, t) for n, t in rdr._meta_fields]
    )
    return pa.Table.from_batches(batches, schema=schema)
