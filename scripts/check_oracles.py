"""Local mimic of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at a given sf dir; compare row count,
column names, and an order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from embulk_output_s3_parquet_spark.session import get_spark

    spark = get_spark(app="oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []

    # contract-shape guards (round-3 finding: the driver checks at most 50
    # queries and silently drops the rest -- the 51st lost its CORRECTNESS
    # row). Declared rows-only queries are the ONLY allowed oracle gaps.
    DRIVER_QUERY_CAP = 50
    ROWS_ONLY_DECLARED = {"encode_stats_documents"}
    if len(qs) > DRIVER_QUERY_CAP:
        failures.append("contract:query-cap")
        print(
            f"FAIL contract: {len(qs)} queries > driver cap {DRIVER_QUERY_CAP} "
            f"-- the driver drops the tail; merge or reorder entries"
        )
    orphan_oracles = sorted(set(oracles) - set(qs))
    if orphan_oracles:
        failures.append("contract:orphan-oracles")
        print(f"FAIL contract: oracle_sql keys missing from queries(): {orphan_oracles}")
    undeclared_rows_only = sorted(set(qs) - set(oracles) - ROWS_ONLY_DECLARED)
    if undeclared_rows_only:
        failures.append("contract:undeclared-rows-only")
        print(
            "FAIL contract: queries without an oracle and not in the declared "
            f"rows-only set: {undeclared_rows_only}"
        )
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL {name}: 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        ok_h = ok_n and ok_c and value_hash(scols, srows) == value_hash(ocols, orows)
        status = "OK  " if (ok_n and ok_c and ok_h) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)} cols={'=' if ok_c else sorted(scols)}"
            f"{'' if ok_c else sorted(ocols)} hash={'=' if ok_h else '!'}  ({time.time()-t0:.1f}s)"
        )
        if not ok_h and ok_n and ok_c and len(srows) and len(srows) < 200000:
            o_sorted = sorted(
                "|".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                for r in orows
            )
            s_sorted = sorted(
                "|".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                for r in srows
            )
            diffs = [(a, b) for a, b in zip(s_sorted, o_sorted) if a != b][:3]
            for a, b in diffs:
                print(f"   spark : {a[:220]}")
                print(f"   duckdb: {b[:220]}")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
