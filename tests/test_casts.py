"""Cast-layer grids: boundary values per bit width + HALF_UP parity +
fail-fast overflow, mirroring the reference's table-driven operator tests
(reference TestIntLogicalType.scala:19-34,73-85; TestDecimalLogicalType
rounding asserts :94-163; TestTimeLogicalType :94-198)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.errors import PySparkRuntimeError
from pyspark.sql.utils import PythonException

from embulk_output_s3_parquet_spark.functions import casts as C


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


@pytest.mark.parametrize(
    "bits,lo,hi",
    [(8, -128, 127), (16, -(2**15), 2**15 - 1), (32, -(2**31), 2**31 - 1), (64, -(2**63), 2**63 - 1)],
)
def test_checked_int_bounds_pass(spark, bits, lo, hi):
    df = spark.createDataFrame([(lo,), (hi,), (0,), (None,)], "x long")
    out = [r["v"] for r in df.select(C.checked_int(F.col("x"), bits).alias("v")).collect()]
    assert set(out) == {lo, hi, 0, None}


@pytest.mark.parametrize("bits", [8, 16, 32])
def test_checked_int_overflow_raises(spark, bits):
    df = spark.createDataFrame([(2**bits,)], "x long")
    with pytest.raises(Exception, match="out of range"):
        df.select(C.checked_int(F.col("x"), bits).alias("v")).collect()


def test_double_halfup(spark):
    rows = [(0.5,), (1.5,), (2.5,), (-0.5,), (2.4999,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    out = [r["v"] for r in df.select(C.double_to_int_halfup(F.col("x")).alias("v")).collect()]
    # BigDecimal HALF_UP: 0.5->1, 1.5->2, 2.5->3, -0.5->-1 (away from zero on tie)
    assert out == [1, 2, 3, -1, 2, None]


def test_string_halfup_and_parse_error(spark):
    df = spark.createDataFrame([("10.5",), ("-3.49",)], "x string")
    out = [r["v"] for r in df.select(C.string_to_int_halfup(F.col("x")).alias("v")).collect()]
    assert out == [11, -3]
    bad = spark.createDataFrame([("abc",)], "x string")
    with pytest.raises(Exception, match="cannot parse"):
        bad.select(C.string_to_int_halfup(F.col("x")).alias("v")).collect()


def test_bool_to_int(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "x boolean")
    out = [r["v"] for r in df.select(C.bool_to_int(F.col("x")).alias("v")).collect()]
    assert out == [1, 0, None]


def test_timestamp_epoch_exact(spark):
    """Reference asserts exact epoch arithmetic for millis/micros
    (TestS3ParquetOutputPlugin.scala:114-118,149-155)."""
    ts = dt.datetime(1970, 1, 2, 0, 0, 0, 111111)
    df = spark.createDataFrame([(ts,)], "t timestamp")
    assert _one_ts(spark, df, "millis") == 86400111
    assert _one_ts(spark, df, "micros") == 86400111111
    assert _one_ts(spark, df, "nanos") == 86400111111000


def _one_ts(spark, df, unit):
    return df.select(C.timestamp_to_epoch(F.col("t"), unit).alias("v")).first()["v"]


def test_time_of_day_and_days(spark):
    ts = dt.datetime(2017, 10, 22, 10, 53, 31, 500000)
    df = spark.createDataFrame([(ts,)], "t timestamp")
    tod = df.select(C.timestamp_to_time_of_day(F.col("t"), "micros").alias("v")).first()["v"]
    assert tod == ((10 * 3600 + 53 * 60 + 31) * 1_000_000 + 500000)
    days = df.select(C.timestamp_to_epoch_days(F.col("t")).alias("v")).first()["v"]
    assert days == (dt.date(2017, 10, 22) - dt.date(1970, 1, 1)).days


def test_decimal_halfup_string(spark):
    df = spark.createDataFrame([(1234.565,), (2.0,)], "x double")
    out = [
        r["v"]
        for r in df.select(C.decimal_to_string(F.col("x"), 12, 2).alias("v")).collect()
    ]
    assert out[1] == "2.00"
    assert out[0] in ("1234.57", "1234.56")  # 1234.565 is not exact in binary
    with pytest.raises(ValueError, match="bad decimal"):
        C.decimal_to_string(F.col("x"), 0, 2)


def test_scalar_to_json(spark):
    df = spark.createDataFrame([(5,)], "x long")
    assert df.select(C.scalar_to_json(F.col("x")).alias("v")).first()["v"] == '{"v":5}'


def test_true_nanos_int64_passthrough(spark):
    """C11 NANOS grid at the microsecond boundary: a long column already in
    epoch-nanos passes through TIMESTAMP(NANOS) EXACTLY (sub-us digits
    preserved), while a Spark TIMESTAMP source is us-precision so its nanos
    are us*1000 (documented engine cap; reference
    TimestampLogicalType.scala:66-82 emits real nanos from Embulk's
    (epochSecond, nano) pairs)."""
    from pyspark.sql import types as T

    from embulk_output_s3_parquet_spark.plans.embulk_config import load_output_config

    base = 86400 * 10**9
    grid = [base, base + 1, base + 999, base + 1000, base + 111_111_111]
    df = spark.createDataFrame([(n,) for n in grid], "t long")
    plan = load_output_config(
        {"column_options": {"t": {"logical_type": {"name": "TIMESTAMP", "time_unit": "NANOS"}}}},
        df.schema,
    )
    out = [r["t"] for r in plan.apply(df).collect()]
    assert out == grid  # bit-exact, including the sub-microsecond digits
    assert plan.apply(df).schema["t"].dataType == T.LongType()
