"""Edge-case tables through the FULL job path (planner -> encode_job ->
manifest -> decode_job/pyreader): unicode text, all-null columns, extreme
numerics, empty strings, single huge rows, and an empty table. The codec
fuzz grid covers kernels; this covers the job plumbing around them."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_s3_parquet_spark.jobs import decode_job, encode_job
from embulk_output_s3_parquet_spark.plans.policy import CodecPolicy
from embulk_output_s3_parquet_spark.sources.pyreader import read_table


def _roundtrip_rows(spark, tmp_path, rows, schema, name):
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / name)
    encode_job(spark, df, path, CodecPolicy(chunk_rows=8), if_exists="error")
    out = decode_job(spark, path)
    return df, out, path


@pytest.mark.slow
def test_unicode_and_empty_strings(spark, tmp_path):
    rows = [
        (0, "καλημέρα κόσμε"),
        (1, "emoji \U0001f600\U0001f680 mixed"),
        (2, ""),
        (3, None),
        (4, "tab\tnewline\nnull-ish\x01"),
        (5, "ascii"),
        (6, "日本語のテキスト、句読点。"),
    ]
    df, out, path = _roundtrip_rows(spark, tmp_path, rows, "id long, s string", "uni")
    got = {r["id"]: r["s"] for r in out.collect()}
    want = {r[0]: r[1] for r in rows}
    assert got == want
    # second reader agrees byte-for-byte
    t = read_table(path)
    py = dict(zip(t.column("id").to_pylist(), t.column("s").to_pylist()))
    assert py == want


def test_extreme_numerics(spark, tmp_path):
    rows = [
        (0, -(2**63), float("inf"), True),
        (1, 2**63 - 1, float("-inf"), False),
        (2, 0, float("nan"), None),
        (3, -1, -0.0, True),
        (4, None, 1e-308, False),
        (5, 42, 1.7976931348623157e308, None),
    ]
    schema = "id long, big long, d double, b boolean"
    df = spark.createDataFrame(
        [(i, *r[1:]) for i, r in enumerate(rows)], schema
    )
    path = str(tmp_path / "num")
    encode_job(spark, df, path, CodecPolicy(chunk_rows=4), if_exists="error")
    out = {r["id"]: r for r in decode_job(spark, path).collect()}
    for r in df.collect():
        o = out[r["id"]]
        assert o["big"] == r["big"]
        assert o["b"] == r["b"]
        if r["d"] is None or math.isnan(r["d"]):
            assert o["d"] is None or math.isnan(o["d"])
        else:
            assert o["d"] == r["d"]
            if r["d"] == 0.0:  # -0.0 sign preserved
                assert math.copysign(1.0, o["d"]) == math.copysign(1.0, r["d"])


def test_all_null_column(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None) for i in range(20)],
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
        ),
    )
    path = str(tmp_path / "nulls")
    encode_job(spark, df, path, CodecPolicy(chunk_rows=8), if_exists="error")
    out = decode_job(spark, path)
    assert out.count() == 20
    assert out.filter(F.col("s").isNotNull()).count() == 0


def test_single_huge_row(spark, tmp_path):
    big = "x" * (8 << 20)  # 8MB value: byte-targeted chunking must not choke
    df = spark.createDataFrame([(0, big), (1, "small")], "id long, s string")
    path = str(tmp_path / "huge")
    encode_job(spark, df, path, CodecPolicy(chunk_rows=1024), if_exists="error")
    got = {r["id"]: len(r["s"]) for r in decode_job(spark, path).collect()}
    assert got == {0: 8 << 20, 1: 5}


def test_empty_table_commit_and_read(spark, tmp_path):
    df = spark.createDataFrame([], "id long, s string")
    path = str(tmp_path / "empty")
    t = encode_job(spark, df, path, CodecPolicy(), if_exists="error")
    assert t.exists()
    # pyreader honors the manifest schema for empty tables
    import pyarrow as pa

    tab = read_table(path)
    assert tab.num_rows == 0
    assert tab.schema.field("id").type == pa.int64()
    assert tab.schema.field("s").type == pa.string()


def test_decimal_columns_full_job(spark, tmp_path):
    """Decimals through planner -> encode_job -> decode_job -> pyreader
    (round-2 gap: DecimalType was rejected by CodecPolicy.validate)."""
    from decimal import Decimal

    rows = [
        (0, Decimal("123.45"), Decimal("99999999999999999999999999.1234567890")),
        (1, Decimal("-0.01"), Decimal("-1.0000000001")),
        (2, None, Decimal("0.0000000000")),
        (3, Decimal("999999999.99"), None),
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("narrow", T.DecimalType(12, 2)),
            T.StructField("wide", T.DecimalType(38, 10)),
        ]
    )
    df, out, path = _roundtrip_rows(spark, tmp_path, rows, schema, "dec")
    got = {r["id"]: (r["narrow"], r["wide"]) for r in out.collect()}
    want = {r[0]: (r[1], r[2]) for r in rows}
    assert got == want
    t = read_table(path)
    py = dict(zip(t.column("id").to_pylist(), zip(t.column("narrow").to_pylist(), t.column("wide").to_pylist())))
    assert py == want


def test_array_columns_full_job(spark, tmp_path):
    """array<float> (the embeddings shape) and ragged array<long> through the
    full job path, bit-identical both readers (round-2 gap #1)."""
    rows = [
        (0, [1.5, 2.5, 3.5], [1, 2, 3]),
        (1, [0.0] * 8, []),
        (2, None, [7]),
        (3, [-1.25], None),
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("emb", T.ArrayType(T.FloatType())),
            T.StructField("xs", T.ArrayType(T.LongType())),
        ]
    )
    df, out, path = _roundtrip_rows(spark, tmp_path, rows, schema, "arr")
    got = {r["id"]: (r["emb"], r["xs"]) for r in out.collect()}
    want = {r[0]: (r[1], r[2]) for r in rows}
    assert got == want
    t = read_table(path)
    py = dict(zip(t.column("id").to_pylist(), zip(t.column("emb").to_pylist(), t.column("xs").to_pylist())))
    assert py == want


def test_empty_table_with_array_column_decodes_alike(spark, tmp_path):
    """ADVICE round-2: an EMPTY committed table with an array column must
    decode with the same arrow schema as a non-empty one (pyreader's
    _arrow_type previously raised NotImplementedError on nested types)."""
    import pyarrow as pa

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("emb", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame([], schema)
    path = str(tmp_path / "empty_arr")
    encode_job(spark, df, path, CodecPolicy(chunk_rows=8), if_exists="error")
    t = read_table(path)
    assert t.num_rows == 0
    assert t.schema.field("emb").type == pa.list_(
        pa.field("element", pa.float32(), nullable=True)
    )


def test_nested_glue_catalog_types(spark, tmp_path):
    from embulk_output_s3_parquet_spark.sources.tables import EncodedTable

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("emb", T.ArrayType(T.FloatType())),
            T.StructField("d", T.DecimalType(12, 2)),
        ]
    )
    df = spark.createDataFrame([(1, [1.0], None)], schema)
    path = str(tmp_path / "glue_nested")
    encode_job(spark, df, path, CodecPolicy(chunk_rows=8), if_exists="error")
    cols = {c["name"]: c["type"] for c in EncodedTable(path).catalog_schema()}
    assert cols == {"id": "BIGINT", "emb": "ARRAY<FLOAT>", "d": "DECIMAL(12,2)"}


def test_struct_and_map_columns_full_job(spark, tmp_path):
    """struct<...> and map<string,long> through the full job path (round-3
    nested-codec coverage): shredded struct fields and map entry-lists must
    round-trip bit-identical through both readers, nulls at every level."""
    rows = [
        (0, {"x": 1, "y": "p"}, {"a": 1, "b": 2}),
        (1, {"x": None, "y": "q"}, {}),
        (2, None, {"c": None}),
        (3, {"x": 4, "y": None}, None),
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "s",
                T.StructType(
                    [
                        T.StructField("x", T.LongType()),
                        T.StructField("y", T.StringType()),
                    ]
                ),
            ),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    df, out, path = _roundtrip_rows(spark, tmp_path, rows, schema, "nested")
    got = {
        r["id"]: (
            None if r["s"] is None else (r["s"]["x"], r["s"]["y"]),
            None if r["m"] is None else dict(r["m"]),
        )
        for r in out.collect()
    }
    want = {
        r[0]: (None if r[1] is None else (r[1]["x"], r[1]["y"]), r[2])
        for r in rows
    }
    assert got == want
    t = read_table(path)
    py = dict(
        zip(
            t.column("id").to_pylist(),
            zip(
                (None if s is None else (s["x"], s["y"]) for s in t.column("s").to_pylist()),
                (None if m is None else dict(m) for m in t.column("m").to_pylist()),
            ),
        )
    )
    assert py == want
    from embulk_output_s3_parquet_spark.sources.tables import EncodedTable

    cols = {c["name"]: c["type"] for c in EncodedTable(path).catalog_schema()}
    assert cols == {
        "id": "BIGINT",
        "s": "STRUCT<x:BIGINT,y:STRING>",
        "m": "MAP<STRING,BIGINT>",
    }


def test_empty_table_with_struct_map_decodes_alike(spark, tmp_path):
    import pyarrow as pa

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "s", T.StructType([T.StructField("x", T.LongType())])
            ),
            T.StructField("m", T.MapType(T.StringType(), T.DoubleType())),
        ]
    )
    df = spark.createDataFrame([], schema)
    path = str(tmp_path / "empty_nested")
    encode_job(spark, df, path, CodecPolicy(chunk_rows=8), if_exists="error")
    t = read_table(path)
    assert t.num_rows == 0
    assert pa.types.is_struct(t.schema.field("s").type)
    assert pa.types.is_map(t.schema.field("m").type)
