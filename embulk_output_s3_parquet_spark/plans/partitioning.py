"""Byte-balanced, skew-salted partition assignment (north_rule requirement).

The reference is embarrassingly parallel with whatever task split Embulk
hands it (reference S3ParquetOutputPlugin.scala:29-31,84-98) -- no balancing,
no skew handling. At 10^12-file scale the corpus keys (repo, lang) are
Zipf-skewed, so the engine plans its own partitions:

1. aggregate bytes per (lang, repo) group -- a small shuffle of (group, sum)
   pairs, never the data;
2. per-lang running byte offsets via a window *partitioned by lang* (so the
   cumsum is distributed across langs, never a single global sort);
3. tiny per-lang totals collected to the driver (|langs| rows) for lang base
   offsets;
4. each group covers bins [start_bin, start_bin + splits): small groups
   bin-pack with their neighbors (same bin), hot groups (bytes > target)
   get `splits = ceil(bytes/target)` exclusive bins and rows are *salted*
   across them by xxhash64(path, commit) -- explicit hot-key salting;
5. rows get `part_id = lang_base + start_bin + pmod(hash, splits)` via a
   broadcast join of the (lang, repo) plan back onto the data.

Everything is deterministic for a given input, which is what makes the
checkpoint manifest's part_ids stable across resume runs.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# group-count ceiling for the driver-side bin-packing fast path (r6): the
# plan input is ONE aggregated row per (k1, k2) group -- metadata, never
# data -- so up to this many groups the cumsum/bin layout runs in plain
# Python on the driver instead of two window passes + a collect. This
# removes two exchanges from every encode_job plan AND the single-partition
# WindowExec that Catalyst creates when a constant (foldable) group key is
# folded out of the window spec (BENCH_r05 "No Partition Defined for
# Window" warnings, VERDICT r5 #2). Above the ceiling the original
# distributed window path runs unchanged (the 10^8-group scale shape).
DRIVER_PLAN_MAX_GROUPS = int(
    os.environ.get("SPARK_GRAFT_PLAN_DRIVER_GROUPS", "262144")
)


@dataclass
class PartitionPlan:
    n_parts: int
    groups: DataFrame  # lang, repo, gbytes, start_part, splits (driver-reusable)
    # bucketed plans only: {bucket: (first_part_id, one_past_last)} -- part
    # ids within one bucket are contiguous, ranges across buckets disjoint
    bucket_ranges: dict[int, tuple[int, int]] | None = None


def _contains_map(dt) -> bool:
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _hash_safe(df: DataFrame, name: str):
    """Column expression usable inside xxhash64: Spark prohibits hashing
    anything containing a MAP (undefined entry order), so map-bearing
    columns are rendered to JSON first -- entry order then only perturbs
    the salt distribution, never correctness."""
    dt = df.schema[name].dataType
    return F.to_json(F.col(name)) if _contains_map(dt) else F.col(name)


def assign_partitions(
    df: DataFrame,
    target_bytes: int = 64 * 1024 * 1024,
    group_keys: tuple[str, str] = ("lang", "repo"),
    salt_keys: tuple[str, ...] = ("path", "commit"),
    weight_col: str = "content",
    weight_expr=None,
) -> tuple[DataFrame, PartitionPlan]:
    """Return (df + part_id column, plan). Deterministic for a given input."""
    k1, k2 = group_keys
    g1 = F.coalesce(F.col(k1).cast("string"), F.lit("\x00null"))
    g2 = F.coalesce(F.col(k2).cast("string"), F.lit("\x00null"))
    weight = (
        weight_expr
        if weight_expr is not None
        else F.coalesce(F.length(F.col(weight_col)).cast("long"), F.lit(0)) + F.lit(64)
    )

    sizes = (
        df.select(g1.alias(k1), g2.alias(k2), weight.alias("w"))
        .groupBy(k1, k2)
        .agg(F.sum("w").alias("gbytes"))
    )
    # bin layout per lang: small groups (gbytes <= target) pack by byte cumsum
    # into bins [0, B_small); hot groups get EXCLUSIVE bins [B_small + running
    # split count, +splits) -- hot ranges never overlap packed bins or each
    # other. A small group straddling a bin boundary may push one merged part
    # to < 2x target; that is the cost of packing without splitting groups.
    #
    # Fast path (r6): the group table is one aggregated row per (k1, k2) --
    # pure metadata. Up to DRIVER_PLAN_MAX_GROUPS rows the cumsum layout is
    # computed on the driver in plain Python (bit-identical to the window
    # formulas: Spark's `/` on long is double division, mirrored with float
    # ceil/floor; groups sort by UTF-8 binary order == Python's code-point
    # order). This removes two window exchanges from every encode plan and
    # never plans the single-partition WindowExec a foldable group key
    # produced. Past the ceiling, the distributed window path is unchanged.
    head = sizes.limit(DRIVER_PLAN_MAX_GROUPS + 1).collect()
    if len(head) <= DRIVER_PLAN_MAX_GROUPS:
        by_lang: dict[str, list[tuple[str, int]]] = {}
        for r in head:
            by_lang.setdefault(r[k1], []).append((r[k2], int(r["gbytes"])))
        plan_rows: list[tuple[str, str, int, int, int]] = []
        base = 0
        n_groups = len(head)
        for lang in sorted(by_lang):
            grps = sorted(by_lang[lang])  # k2 distinct per lang: key order
            total_small = sum(g for _, g in grps if g <= target_bytes)
            b_small = int(math.ceil(total_small / target_bytes))
            prev_small = 0
            prev_hot_splits = 0
            bins = 0
            for k2v, g in grps:
                splits = max(1, int(math.ceil(g / target_bytes)))
                if g > target_bytes:
                    start_bin = b_small + prev_hot_splits
                    prev_hot_splits += splits
                else:
                    start_bin = int(math.floor(prev_small / target_bytes))
                    prev_small += g
                plan_rows.append((lang, k2v, g, base + start_bin, splits))
                bins = max(bins, start_bin + splits)
            base += bins
        n_parts = max(base, 1)
        spark = df.sparkSession
        groups = spark.createDataFrame(
            plan_rows,
            T.StructType(
                [
                    T.StructField(k1, T.StringType()),
                    T.StructField(k2, T.StringType()),
                    T.StructField("gbytes", T.LongType()),
                    T.StructField("start_part", T.IntegerType()),
                    T.StructField("splits", T.IntegerType()),
                ]
            ),
        )
    else:
        w_prev = Window.partitionBy(k1).orderBy(k2).rowsBetween(Window.unboundedPreceding, -1)
        w_all = Window.partitionBy(k1)
        hot = F.col("gbytes") > F.lit(target_bytes)
        sizes = (
            sizes.withColumn(
                "splits",
                F.greatest(F.lit(1), F.ceil(F.col("gbytes") / F.lit(target_bytes))).cast("int"),
            )
            .withColumn(
                "prev_small",
                F.coalesce(F.sum(F.when(hot, 0).otherwise(F.col("gbytes"))).over(w_prev), F.lit(0)),
            )
            .withColumn(
                "prev_hot_splits",
                F.coalesce(F.sum(F.when(hot, F.col("splits"))).over(w_prev), F.lit(0)),
            )
            .withColumn(
                "b_small",
                F.ceil(
                    F.sum(F.when(hot, 0).otherwise(F.col("gbytes"))).over(w_all)
                    / F.lit(target_bytes)
                ).cast("int"),
            )
            .withColumn(
                "start_bin",
                F.when(hot, F.col("b_small") + F.col("prev_hot_splits"))
                .otherwise(F.floor(F.col("prev_small") / F.lit(target_bytes)))
                .cast("int"),
            )
            .drop("prev_small", "prev_hot_splits", "b_small")
        )

        # lang base offsets: |langs| rows -> driver
        lang_tot = (
            sizes.groupBy(k1)
            .agg(
                F.max(F.col("start_bin") + F.col("splits")).alias("bins"),
                F.count("*").alias("ng"),
            )
            .orderBy(k1)
            .collect()
        )
        base, bases, n_groups = 0, {}, 0
        for row in lang_tot:
            bases[row[k1]] = base
            base += row["bins"]
            n_groups += row["ng"]
        n_parts = max(base, 1)

        if bases:
            base_map = F.create_map(
                *[x for lang, b in sorted(bases.items()) for x in (F.lit(lang), F.lit(b))]
            )
            start_part = base_map[F.col(k1)] + F.col("start_bin")
        else:  # empty input: no groups at all
            start_part = F.col("start_bin")
        groups = sizes.withColumn("start_part", start_part).select(
            k1, k2, "gbytes", "start_part", "splits"
        )

    salt = F.pmod(
        F.xxhash64(*[_hash_safe(df, c) for c in salt_keys]),
        F.col("splits").cast("long"),
    ).cast("int")
    # broadcast the (lang, repo) plan when it's small; beyond ~2M groups let
    # AQE pick a shuffled join (broadcasting 10^8 groups would OOM executors)
    plan_side = groups.withColumnRenamed(k1, "__g1").withColumnRenamed(k2, "__g2")
    if n_groups <= 2_000_000:
        plan_side = F.broadcast(plan_side)
    joined = df.withColumn("__g1", g1).withColumn("__g2", g2).join(
        plan_side, on=["__g1", "__g2"], how="left"
    )
    out = (
        joined.withColumn("part_id", (F.col("start_part") + salt).cast("long"))
        .drop("__g1", "__g2", "gbytes", "start_part", "splits")
    )
    return out, PartitionPlan(n_parts=n_parts, groups=groups)


def assign_partitions_bucketed(
    df: DataFrame,
    bucket_col: str,
    n_buckets: int,
    target_bytes: int = 64 * 1024 * 1024,
) -> tuple[DataFrame, PartitionPlan]:
    """Bucket-major partition plan (Iceberg ``bucket(N, col)`` transform):
    every row lands in bucket ``pmod(xxhash64(col), N)``, every part holds
    rows of exactly ONE bucket, and each bucket's part ids are a contiguous
    disjoint range (recorded in ``plan.bucket_ranges``). Within a bucket,
    parts stay byte-balanced and hot surrogate groups salt-split exactly
    like the generic planner, so a skewed key column cannot produce a
    monster part -- it produces more parts in its bucket.

    The point of the layout is the shuffle-free bucketed equi-join
    (``operators.bucketjoin``): two tables bucketed ``(key, N)`` with the
    same N can be joined bucket-by-bucket reading only local parts --
    Spark's storage-partitioned join, expressed over the engine's own
    metadata."""
    cols = [_hash_safe(df, c) for c in df.columns]
    weight = sum(
        (
            F.coalesce(
                F.octet_length(
                    c
                    if _contains_map(df.schema[n].dataType)
                    else F.col(n).cast("string")
                ),
                F.lit(0),
            )
            for n, c in zip(df.columns, cols)
        ),
        F.lit(16),
    )
    # string bucket key because assign_partitions coalesces k1 to string;
    # xxhash64 of a NULL key is the seed hash -> all null-key rows share one
    # deterministic bucket (equi-joins never match them anyway)
    bkt = F.pmod(
        F.xxhash64(_hash_safe(df, bucket_col)), F.lit(n_buckets)
    ).cast("string")
    aug = df.withColumn("__bkt", bkt).withColumn(
        "__sgk2", F.pmod(F.xxhash64(*cols), F.lit(512)).cast("string")
    )
    out, plan = assign_partitions(
        aug,
        target_bytes=target_bytes,
        group_keys=("__bkt", "__sgk2"),
        salt_keys=tuple(df.columns),
        weight_expr=weight.cast("long"),
    )
    ranges = (
        plan.groups.groupBy("__bkt")
        .agg(
            F.min("start_part").alias("lo"),
            F.max(F.col("start_part") + F.col("splits")).alias("hi"),
        )
        .collect()  # <= n_buckets rows, never data
    )
    plan.bucket_ranges = {
        int(r["__bkt"]): (int(r["lo"]), int(r["hi"])) for r in ranges
    }
    return out.drop("__bkt", "__sgk2"), plan


def assign_partitions_generic(
    df: DataFrame, target_bytes: int = 64 * 1024 * 1024
) -> tuple[DataFrame, PartitionPlan]:
    """Partition planning for tables WITHOUT the corpus key columns.

    Surrogate group keys are bounded-cardinality hashes of the row (so the
    group table stays collectable at any scale) and the byte weight is the
    octet length of all columns rendered to text -- still deterministic,
    byte-balanced, and salt-split on hot surrogate groups."""
    cols = [_hash_safe(df, c) for c in df.columns]
    weight = sum(
        (
            F.coalesce(
                F.octet_length(
                    # map-to-string casts are also prohibited under ANSI;
                    # the JSON rendering doubles as the byte weight there
                    c if _contains_map(df.schema[n].dataType) else F.col(n).cast("string")
                ),
                F.lit(0),
            )
            for n, c in zip(df.columns, cols)
        ),
        F.lit(16),
    )
    aug = (
        df.withColumn("__sgk1", F.pmod(F.xxhash64(cols[0]), F.lit(16)).cast("string"))
        .withColumn("__sgk2", F.pmod(F.xxhash64(*cols), F.lit(4096)).cast("string"))
    )
    out, plan = assign_partitions(
        aug,
        target_bytes=target_bytes,
        group_keys=("__sgk1", "__sgk2"),
        salt_keys=tuple(df.columns),
        weight_expr=weight.cast("long"),
    )
    return out.drop("__sgk1", "__sgk2"), plan
