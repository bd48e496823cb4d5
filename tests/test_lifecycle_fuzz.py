"""Model-based lifecycle fuzz: a SEEDED random walk of DML, schema
evolution, snapshot, and maintenance operations on one table, checked
after every step against a pandas reference model.

This is the interaction test the per-feature suites can't be: each op
(CoW/MoR DELETE, CoW/MoR UPDATE, RENAME/ADD/DROP COLUMN, tag, rollback,
compact, vacuum) is individually covered elsewhere; here a deterministic
random sequence interleaves them on the SAME table and asserts, at every
step, that (a) exact counts, (b) full decoded values, and (c) every live
tag's pinned snapshot all still match the model. Tag snapshots are
compared through an evolution-replay of the model (snapshot part sets are
read with the CURRENT schema -- decode_job's documented semantic).

The walk is bounded and seeded: failures reproduce exactly.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow

from embulk_output_s3_parquet_spark.jobs import (
    compact_job,
    count_job,
    decode_job,
    delete_job,
    encode_job,
    merge_job,
    rewrite_small_parts,
    rollback_job,
    update_job,
    vacuum_job,
    verify_table,
)
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
from embulk_output_s3_parquet_spark.sources.tables import EncodedTable


def _pol():
    # bloom + NDV sidecars ride along so every walk also maintains them
    # through rename re-keying, DML rewrites, compaction, and appends
    return CodecPolicy(
        target_partition_bytes=64 * 1024,
        chunk_rows=64,
        bloom_columns=("lang",),
        ndv_columns=("doc_id",),
    )


def _replay(frame: pd.DataFrame, log: list[tuple], from_idx: int) -> pd.DataFrame:
    """Re-apply the schema-evolution suffix to a pinned model snapshot:
    snapshot reads use the CURRENT schema, so the expected frame for a tag
    is its pinned rows under today's column set."""
    f = frame.copy()
    for op in log[from_idx:]:
        if op[0] == "rename":
            f = f.rename(columns={op[1]: op[2]})
        elif op[0] == "add":
            f[op[1]] = np.nan
        elif op[0] == "drop" and op[1] in f.columns:
            f = f.drop(columns=[op[1]])
    return f


def _check(spark, path: str, model: pd.DataFrame) -> None:
    assert count_job(spark, path) == len(model)
    got = decode_job(spark, path).toPandas()
    _frames_equal(got, model)
    # the Catalyst surface must agree with the job API on the same walk
    # (evolution translation, MoR vector masking, part pruning)
    via_reader = spark.read.format("enctable").load(path).toPandas()
    _frames_equal(via_reader, model)
    # metadata-first consumers stay exact / in-bounds through every op
    from embulk_output_s3_parquet_spark.jobs import (
        distinct_job,
        minmax_job,
        quantile_job,
        sum_job,
    )

    s = sum_job(spark, path, ["n_chars"])["n_chars"]
    assert s["sum"] == int(model["n_chars"].sum()), "sum_job drifted"
    mm = minmax_job(spark, path, ["doc_id"])["doc_id"]
    assert mm == (int(model.doc_id.min()), int(model.doc_id.max()))
    ndv = distinct_job(path, ["doc_id"], spark=spark)["doc_id"]
    true_ndv = int(model.doc_id.nunique())
    assert abs(ndv["ndv"] - true_ndv) <= max(
        4 * ndv["rel_std_error"] * true_ndv, 2
    ), (ndv, true_ndv)
    q = quantile_job(spark, path, "n_chars", [0.5])["quantiles"][0.5]
    true_med = float(model["n_chars"].quantile(0.5, interpolation="lower"))
    assert q["lb"] <= true_med <= q["ub"], (q, true_med)


def _rows_ms(df: pd.DataFrame):
    """Multiset of rows as NaN-normalized tuples (NaN != NaN would make
    every null-bearing row unique)."""
    from collections import Counter

    return Counter(
        tuple(None if pd.isna(x) else x for x in row)
        for row in df.itertuples(index=False)
    )


def _cdf_check(spark, path: str, g0: int, before: pd.DataFrame,
               after: pd.DataFrame, ctx) -> None:
    """Universal change-feed oracle for one walk step: batch
    table_changes(g0 -> now) must EITHER reproduce the model's row-level
    multiset delta exactly, OR fail loudly for a declared reason (copy-on-
    write rewrite / rollback / snapshot no longer retained). A silently
    wrong delta -- the CDC failure mode that corrupts downstream mirrors --
    is the one outcome this forbids."""
    t = EncodedTable(path)
    g1 = t.manifest().get("parts_gen", 0)
    if g1 == g0:
        return  # no generation flip: nothing was fed
    try:
        pdf = (
            spark.read.format("enctable").option("readChangeFeed", "true")
            .option("starting_gen", str(g0)).option("ending_gen", str(g1))
            .load(path).toPandas()
        )
    except Exception as e:
        msg = str(e)
        assert (
            "rewritten away" in msg or "fresh checkpoint" in msg
            or "rolled back" in msg or "not on disk" in msg
            or "no longer retained" in msg or "expired" in msg
        ), (ctx, msg)
        return
    assert ((pdf["_commit_gen"] > g0) & (pdf["_commit_gen"] <= g1)).all(), ctx
    if set(before.columns) != set(after.columns):
        # metadata-only schema evolution flips the generation with zero
        # row changes: the feed must drain empty
        assert len(pdf) == 0, (ctx, pdf)
        return
    cols = list(before.columns)
    dels = _rows_ms(pdf[pdf["_change_type"] == "delete"][cols])
    ins = _rows_ms(pdf[pdf["_change_type"] == "insert"][cols])
    b, a = _rows_ms(before), _rows_ms(after[cols])
    assert dels == b - a, (ctx, "change feed deletes drifted from the model")
    assert ins == a - b, (ctx, "change feed inserts drifted from the model")


def _frames_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert set(got.columns) == set(want.columns)
    g = got.set_index("doc_id").sort_index()
    w = want.set_index("doc_id").sort_index()
    pd.testing.assert_frame_equal(
        g, w, check_like=True, check_dtype=False, check_column_type=False
    )


@pytest.mark.parametrize("seed", [3, 7, 23, 42, 1106])
def test_lifecycle_random_walk(spark, tmp_path, seed):
    from embulk_output_s3_parquet_spark.sources.datasource import (
        EncodedTableDataSource,
    )

    spark.dataSource.register(EncodedTableDataSource)
    rng = random.Random(seed)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / f"walk{seed}")
    encode_job(spark, docs, path, _pol(), if_exists="error")
    t = EncodedTable(path)
    if seed % 2:  # half the walks keep superseded snapshots readable
        t.set_snapshot_retention(2)

    model = docs.toPandas()
    lo_id, hi_id = int(model.doc_id.min()), int(model.doc_id.max())
    evolution: list[tuple] = []  # ("rename",old,new) | ("add",n) | ("drop",n)
    # tag name -> (pinned model frame, evolution-log position)
    tags: dict[str, tuple[pd.DataFrame, int]] = {}
    lang_col = "lang"  # current spelling of the renameable column
    n_renames = n_adds = 0
    droppable = {"source"}

    def rand_pred():
        v = rng.randint(lo_id, hi_id)
        kind = rng.choice(["eq", "range", "ge", "lang"])
        if kind == "eq":
            return [("doc_id", "==", v)], model.doc_id == v
        if kind == "range":
            return (
                [("doc_id", ">=", v), ("doc_id", "<", v + 25)],
                (model.doc_id >= v) & (model.doc_id < v + 25),
            )
        if kind == "lang":
            # string predicate on the (possibly renamed) column: exercises
            # alias-translated zone/bloom pruning through the DML paths;
            # None values (merge/append inserts) never match, both sides
            langs = sorted(x for x in model[lang_col].dropna().unique())
            lv = rng.choice(langs) if langs else "none-such"
            return [(lang_col, "==", lv)], model[lang_col] == lv
        return [("doc_id", ">=", v)], model.doc_id >= v

    next_id = hi_id + 1  # fresh keys for MERGE inserts (ids never collide)

    ops = [
        "delete_cow", "delete_mor", "delete_mor", "update_cow", "update_mor",
        "rename", "add", "drop", "tag", "tag", "compact", "vacuum", "rollback",
        "merge_cow", "merge_mor", "drop_tag", "append", "optimize",
    ]
    for step in range(14):
        op = rng.choice(ops)
        gen_before = t.manifest().get("parts_gen", 0)
        model_before = model.copy()
        if op in ("delete_cow", "delete_mor"):
            pred, mask = rand_pred()
            if int(mask.sum()) >= len(model):  # never empty the table
                continue
            rep = delete_job(spark, path, pred, mode=op.split("_")[1])
            assert rep["rows_deleted"] == int(mask.sum()), (step, op, pred)
            model = model[~mask]
        elif op in ("update_cow", "update_mor"):
            pred, mask = rand_pred()
            update_job(
                spark, path, pred, {"n_chars": "n_chars + 1"},
                mode=op.split("_")[1],
            )
            model = model.copy()
            model.loc[mask, "n_chars"] += 1
        elif op == "rename":
            new = f"lang_{n_renames}"
            n_renames += 1
            t.rename_column(lang_col, new)
            model = model.rename(columns={lang_col: new})
            evolution.append(("rename", lang_col, new))
            lang_col = new
        elif op == "add":
            name = f"extra_{n_adds}"
            n_adds += 1
            from pyspark.sql import types as T

            t.add_column(name, T.DoubleType())
            model = model.copy()
            model[name] = np.nan
            evolution.append(("add", name))
            droppable.add(name)
        elif op == "drop":
            if not droppable:
                continue
            name = rng.choice(sorted(droppable))
            droppable.discard(name)
            t.drop_column(name)
            model = model.drop(columns=[name])
            evolution.append(("drop", name))
        elif op == "tag":
            name = f"t{step}"
            t.create_tag(name)
            tags[name] = (model.copy(), len(evolution))
        elif op == "compact":
            # no explicit policy: compaction inherits the table's recorded
            # one, which rename_column must have re-keyed (bloom/ndv cols)
            compact_job(spark, path)
        elif op == "optimize":
            # selective small-part merge: rows must be invariant, the CDF
            # oracle below sees either an exact delta (only post-window
            # parts merged) or the declared loud CoW failure
            sizes = sorted(
                int(r["enc_bytes"]) for r in t.lineage().values()
            )
            if len(sizes) < 3:
                continue
            thr = sizes[len(sizes) // 2] + 1  # merge the smaller half
            rewrite_small_parts(
                spark, path, min_part_bytes=thr,
                max_parts=rng.choice([None, 3]),
            )
        elif op == "vacuum":
            vacuum_job(path)
        elif op == "rollback":
            if not tags:
                continue
            name = rng.choice(sorted(tags))
            rollback_job(path, name)
            frame, idx = tags[name]
            model = _replay(frame, evolution, idx)
        elif op in ("merge_cow", "merge_mor"):
            # upsert: replace 2 random existing rows + insert 2 fresh keys,
            # with real values in post-ADD columns (stored-vs-fill interplay)
            k = min(2, len(model))
            upd = model.sample(n=k, random_state=rng.randint(0, 10**6)).copy()
            upd["n_chars"] = upd["n_chars"] + 100
            if "text" in upd.columns:
                upd["text"] = [f"merged-{i}" for i in upd["doc_id"]]
            ins = upd.head(0).copy()
            for _ in range(2):
                row = {c: None for c in model.columns}
                row.update(
                    doc_id=next_id,
                    text=f"inserted-{next_id}",
                    n_chars=int(7 + next_id % 13),
                )
                for c in model.columns:  # added double columns get values
                    if c.startswith("extra_"):
                        row[c] = float(next_id % 5)
                ins.loc[len(ins)] = row
                next_id += 1
            src_pd = pd.concat([upd, ins], ignore_index=True)
            src_pd = src_pd[[f.name for f in t.schema().fields]]
            source = spark.createDataFrame(src_pd, schema=t.schema())
            rep = merge_job(
                spark, path, source, on=["doc_id"], mode=op.split("_")[1]
            )
            assert rep["rows_updated"] == k and rep["rows_inserted"] == 2
            model = pd.concat(
                [model[~model.doc_id.isin(set(src_pd.doc_id))], src_pd],
                ignore_index=True,
            )
        elif op == "drop_tag":
            if not tags:
                continue
            name = rng.choice(sorted(tags))
            t.drop_tag(name)
            del tags[name]
        elif op == "append":
            # the Catalyst WRITER against the evolved/tagged/vectored table
            rows = []
            for _ in range(3):
                row = {c: None for c in model.columns}
                row.update(
                    doc_id=next_id,
                    text=f"appended-{next_id}",
                    n_chars=int(11 + next_id % 7),
                )
                for c in model.columns:
                    if c.startswith("extra_"):
                        row[c] = float(next_id % 3)
                rows.append(row)
                next_id += 1
            app_pd = pd.DataFrame(rows)[[f.name for f in t.schema().fields]]
            # sidecar options ride the append under the CURRENT spellings
            # (distinct_job refuses tables with sketch-less parts by design)
            spark.createDataFrame(app_pd, schema=t.schema()).write.format(
                "enctable"
            ).mode("append").option("ndv_columns", "doc_id").option(
                "bloom_columns", lang_col
            ).save(path)
            model = pd.concat([model, app_pd], ignore_index=True)

        _check(spark, path, model)
        # change-feed oracle: the step's batch table_changes either equals
        # the model's row-level delta or fails loudly -- never silently off
        _cdf_check(spark, path, gen_before, model_before, model, (step, op))
        if tags:  # one pinned snapshot re-checked per step, full values
            name = rng.choice(sorted(tags))
            frame, idx = tags[name]
            want = _replay(frame, evolution, idx)
            assert count_job(spark, path, at_gen=name) == len(want), (step, op)
            got = decode_job(spark, path, at_gen=name).toPandas()
            _frames_equal(got, want)

    assert verify_table(spark, path) == []
