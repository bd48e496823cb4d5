"""Fuzz the metadata-first aggregate family (count/minmax/sum) against
exact recomputation over randomized data shapes and chunk layouts.

r5 VERDICT #1: `count_over_encoded` was driver-red (hash mismatch on the
13-value aggregate surface) but locally unreproducible. This suite attacks
the space the adversarial probe covered only point-wise: random nulls /
negatives / band-edge values / outliers / duplicate-heavy columns, random
chunk_rows, random cluster layouts, and merge-on-read delete vectors --
every trial's metadata answer must equal the plain aggregate over the
decoded frame.
"""

from __future__ import annotations

import random

import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from embulk_output_s3_parquet_spark.jobs import (
    count_job,
    decode_job,
    delete_job,
    encode_job,
    minmax_job,
    sum_job,
)
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy


def _random_docs(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        # band-edge heavy value distribution incl. negatives and outliers
        pick = rng.random()
        if pick < 0.3:
            n_chars = rng.choice([199, 200, 201, 399, 400, 401, 449, 450])
        elif pick < 0.5:
            n_chars = rng.randint(-500, 0)
        elif pick < 0.55:
            n_chars = rng.choice([10**9, -(10**9)])
        else:
            n_chars = rng.randint(1, 600)
        lang = rng.choice(["en", "zh", "de", None, "fr"])
        doc_id = rng.randint(0, n * 2) if rng.random() < 0.3 else i
        rows.append(
            (
                doc_id if rng.random() > 0.02 else None,
                f"t{i}" * rng.randint(0, 3),
                lang,
                None if rng.random() < 0.05 else n_chars,
            )
        )
    return rows


WHERES = [
    None,
    ("n_chars", ">=", 450),
    [("n_chars", ">=", 200), ("n_chars", "<", 400)],
    ("lang", "in", ["en", "zh"]),
    ("lang", "notnull", None),
    ("n_chars", "<", 0),
]


def _cond(where):
    if where is None:
        return F.lit(True)
    conjs = where if isinstance(where, list) else [where]
    c = F.lit(True)
    for col, op, v in conjs:
        if op == ">=":
            c = c & (F.col(col) >= v)
        elif op == "<":
            c = c & (F.col(col) < v)
        elif op == "in":
            c = c & F.col(col).isin(v)
        elif op == "notnull":
            c = c & F.col(col).isNotNull()
    return c


@pytest.mark.parametrize("seed", [11, 23, 37, 41])
def test_metadata_aggs_match_exact(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = _random_docs(rng, rng.choice([97, 256, 700]))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    chunk_rows = rng.choice([7, 64, 128])
    cluster = rng.choice([None, ["n_chars"], ["n_chars", "doc_id"]])
    path = str(tmp_path / f"t{seed}")
    encode_job(
        spark, df, path, CodecPolicy(chunk_rows=chunk_rows),
        if_exists="delete",
        cluster_by=cluster,
    )
    if rng.random() < 0.5:
        # merge-on-read vectors poison part zones/sums: the scan fallback
        # must still be exact
        delete_job(spark, path, ("doc_id", "<", 40), mode="mor")
    dec = decode_job(spark, path).cache()
    try:
        for where in WHERES:
            cond = _cond(where)
            exact = dec.filter(cond).agg(
                F.count("*").alias("cnt"),
                F.min("doc_id").alias("mind"),
                F.max("doc_id").alias("maxd"),
                F.min("n_chars").alias("minc"),
                F.max("n_chars").alias("maxc"),
                F.sum("n_chars").alias("sumc"),
                F.sum("doc_id").alias("sumd"),
            ).first()
            assert count_job(spark, path, where=where) == exact["cnt"], (
                seed, where, "count")
            mm = minmax_job(spark, path, ["doc_id", "n_chars"], where=where)
            assert mm["doc_id"] == (exact["mind"], exact["maxd"]), (
                seed, where, "minmax doc_id", mm)
            assert mm["n_chars"] == (exact["minc"], exact["maxc"]), (
                seed, where, "minmax n_chars", mm)
            sm = sum_job(spark, path, ["doc_id", "n_chars"], where=where)
            got_sc = sm["n_chars"]["sum"]
            got_sd = sm["doc_id"]["sum"]
            assert (got_sc is None and exact["sumc"] is None) or int(
                got_sc
            ) == int(exact["sumc"]), (seed, where, "sum n_chars", sm)
            assert (got_sd is None and exact["sumd"] is None) or int(
                got_sd
            ) == int(exact["sumd"]), (seed, where, "sum doc_id", sm)
    finally:
        dec.unpersist()
