"""Embulk-style config loader tests: golden transformations of the reference
example configs (example/with_logicaltypes.yml:28-34) plus the ConfigException
matrix (reference TestS3ParquetOutputPluginConfigException.scala:9-46)."""

from __future__ import annotations

import datetime as dt

import pytest

from embulk_output_s3_parquet_spark.corpus import six_types_df
from embulk_output_s3_parquet_spark.plans.embulk_config import load_output_config
from embulk_output_s3_parquet_spark.plans.policy import ConfigException


@pytest.fixture(scope="module")
def six(spark):
    return six_types_df(spark).cache()


def test_reference_example_logicaltypes(spark, six):
    """with_logicaltypes.yml: id -> uint64, timestamps -> TIMESTAMP MILLIS."""
    cfg = {
        "compression_codec": "snappy",
        "default_timezone": "Asia/Tokyo",
        "column_options": {"c1": {"logical_type": "uint64"}},
        "type_options": {"timestamp": {"logical_type": "timestamp-millis"}},
    }
    plan = load_output_config(cfg, six.schema)
    out = plan.apply(six).orderBy("c1").collect()
    assert [r["c1"] for r in out] == [0, 1, 2, 3, 9999]
    # 2017-10-22T19:53:31+09:00 -> epoch millis
    want_ms = int(
        dt.datetime(
            2017, 10, 22, 19, 53, 31, tzinfo=dt.timezone(dt.timedelta(hours=9))
        ).timestamp()
        * 1000
    )
    assert out[0]["c4"] == want_ms
    assert plan.properties["compression_codec"] == "snappy"


def test_default_timestamp_is_formatted_text(spark, six):
    """C5 quirk: default timestamp output is TEXT in the configured zone
    (reference DefaultColumnType.scala:70-74, README.md:22-26)."""
    plan = load_output_config({"default_timezone": "Asia/Tokyo"}, six.schema)
    out = plan.apply(six).orderBy("c1").first()
    assert out["c4"].startswith("2017-10-22 19:53:31.000000 +09")


def test_per_column_format_override(spark, six):
    cfg = {
        "column_options": {
            "c4": {"format": "yyyy-MM-dd", "timezone": "Asia/Tokyo"}
        }
    }
    out = load_output_config(cfg, six.schema).apply(six).orderBy("c1").first()
    assert out["c4"] == "2017-10-22"


def test_converted_type_deprecated_but_works(spark, six):
    cfg = {"column_options": {"c1": {"converted_type": "INT32"}}}
    with pytest.warns(DeprecationWarning):
        plan = load_output_config(cfg, six.schema)
    out = plan.apply(six).orderBy("c1").collect()
    assert [r["c1"] for r in out] == [0, 1, 2, 3, 9999]


def test_decimal_and_json_paths(spark, six):
    cfg = {
        "column_options": {
            "c2": {"logical_type": {"name": "DECIMAL", "precision": 10, "scale": 2}},
            "c1": {"logical_type": "json"},
        }
    }
    out = load_output_config(cfg, six.schema).apply(six).orderBy("c3").collect()
    by_c3 = {r["c3"]: r for r in out}
    assert by_c3["aaaaa"]["c2"] == "-0.50"
    assert by_c3["aaaaa"]["c1"] == '{"v":1}'


def test_config_exceptions(spark, six):
    s = six.schema
    with pytest.raises(ConfigException, match="unknown column"):
        load_output_config({"column_options": {"nope": {}}}, s)
    with pytest.raises(ConfigException, match="compression_codec"):
        load_output_config({"compression_codec": "zip"}, s)
    with pytest.raises(ConfigException, match="unknown embulk type"):
        load_output_config({"type_options": {"varchar": {}}}, s)
    with pytest.raises(ConfigException, match="Unsupported logical_type.name"):
        load_output_config({"column_options": {"c1": {"logical_type": "uuid"}}}, s)
    with pytest.raises(ConfigException, match='"precision" must be set'):
        load_output_config(
            {"column_options": {"c2": {"logical_type": "decimal"}}}, s
        )
    with pytest.raises(ConfigException, match="unsupported converted_type"):
        load_output_config({"column_options": {"c1": {"converted_type": "LIST"}}}, s)
    with pytest.raises(ConfigException, match="format/timezone only"):
        load_output_config({"column_options": {"c3": {"format": "x"}}}, s)
    # timestamp logical on a boolean column: unsupported combination
    with pytest.raises(ConfigException, match="unsupported"):
        load_output_config(
            {"column_options": {"c0": {"logical_type": "timestamp-millis"}}}, s
        )


def test_roundtrip_after_config_transform(spark, six, tmp_path):
    """Transformed table goes through the normal encode/decode path."""
    from embulk_output_s3_parquet_spark.jobs import decode_job, encode_job

    cfg = {"type_options": {"timestamp": {"logical_type": "timestamp-micros"}}}
    plan = load_output_config(cfg, six.schema)
    transformed = plan.apply(six)
    path = str(tmp_path / "enc")
    encode_job(spark, transformed, path, plan.policy, if_exists="error")
    back = decode_job(spark, path).orderBy("c1").collect()
    assert [r["c4"] for r in back] == [
        r["c4"] for r in transformed.orderBy("c1").collect()
    ]


def test_engine_extension_codec_and_bloom_options(spark, six):
    """Engine extensions on the reference surface: column_options carry
    `codec` (forced engine codec) and `bloom` (per-chunk Bloom filter) --
    both land in the CodecPolicy; invalid codec names still fail eagerly."""
    cfg = {
        "column_options": {
            "c3": {"codec": "fsst"},
            "c1": {"bloom": True},
        }
    }
    plan = load_output_config(cfg, six.schema)
    assert plan.policy.column_options == {"c3": "fsst"}
    assert plan.policy.bloom_columns == ("c1",)
    plan.policy.validate(plan.apply(six).schema)

    with pytest.raises(ConfigException, match="unknown codec"):
        bad = load_output_config(
            {"column_options": {"c3": {"codec": "lzo"}}}, six.schema
        )
        bad.policy.validate(bad.apply(six).schema)


def test_table_level_cluster_and_zorder_extensions():
    """Engine extensions at the out: level (r5): cluster_by and zorder ride
    the embulk config, validated eagerly (unknown columns / zorder without
    cluster_by are ConfigExceptions before any data moves)."""
    import pytest
    from pyspark.sql import types as T

    from embulk_output_s3_parquet_spark.plans.embulk_config import (
        load_output_config,
    )
    from embulk_output_s3_parquet_spark.plans.policy import ConfigException

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    plan = load_output_config(
        {"cluster_by": ["a", "b"], "zorder": True}, schema
    )
    assert plan.cluster_by == ["a", "b"] and plan.zorder is True
    assert load_output_config({}, schema).cluster_by == []

    with pytest.raises(ConfigException, match="unknown column"):
        load_output_config({"cluster_by": ["nope"]}, schema)
    with pytest.raises(ConfigException, match="requires cluster_by"):
        load_output_config({"zorder": True}, schema)
