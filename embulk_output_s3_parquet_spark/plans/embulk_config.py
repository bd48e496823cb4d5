"""Embulk-compatible output-config loader: the reference's user-facing
surface re-expressed as a Spark transformation plan + codec policy.

A user of the reference configures ``out:`` with ``compression_codec``,
``default_timezone``, ``column_options`` / ``type_options`` carrying
``logical_type`` (shorthand string or {name, bit_width, is_signed, scale,
precision, is_adjusted_to_utc, time_unit}) or the deprecated
``converted_type`` (reference ParquetColumnType.scala:139-233 normalizes
INT8 -> INT_8 etc. and rejects MAP/LIST/DECIMAL/BSON/INTERVAL). This module
accepts the same dict shape (e.g. parsed from the reference's YAML examples,
example/with_logicaltypes.yml:28-34) and produces:

* per-column Spark expressions implementing the cast matrix (C5-C18,
  functions/casts.py) with the reference's fail-fast semantics,
* a CodecPolicy for the encode stage,
* table properties recording the requested compression codec.

Resolution precedence is column option > type option > default, matching
reference ParquetFileWriteSupport.scala:110-117; config errors raise
ConfigException before any data moves (PluginTask.scala:77-127).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import casts as C
from .policy import CodecPolicy, ConfigException

# reference PluginTask.scala:89-107 codec enum
COMPRESSION_CODECS = {"uncompressed", "snappy", "gzip", "lzo", "brotli", "lz4", "zstd"}

# reference default timestamp text format README.md:22-26: %Y-%m-%d %H:%M:%S.%6N %z
DEFAULT_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS xx"

_EMBULK_TYPE = {
    T.BooleanType: "boolean",
    T.ByteType: "long",
    T.ShortType: "long",
    T.IntegerType: "long",
    T.LongType: "long",
    T.FloatType: "double",
    T.DoubleType: "double",
    T.StringType: "string",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp",
}

# ConvertedType -> logical spec (reference ParquetColumnType.scala:186-220);
# the unsupported set throws there too (:215-220)
_CONVERTED = {
    "UTF8": {"name": "STRING"},
    "DATE": {"name": "DATE"},
    "TIME_MILLIS": {"name": "TIME", "time_unit": "MILLIS"},
    "TIME_MICROS": {"name": "TIME", "time_unit": "MICROS"},
    "TIMESTAMP_MILLIS": {"name": "TIMESTAMP", "time_unit": "MILLIS"},
    "TIMESTAMP_MICROS": {"name": "TIMESTAMP", "time_unit": "MICROS"},
    "UINT_8": {"name": "INT", "bit_width": 8, "is_signed": False},
    "UINT_16": {"name": "INT", "bit_width": 16, "is_signed": False},
    "UINT_32": {"name": "INT", "bit_width": 32, "is_signed": False},
    "UINT_64": {"name": "INT", "bit_width": 64, "is_signed": False},
    "INT_8": {"name": "INT", "bit_width": 8, "is_signed": True},
    "INT_16": {"name": "INT", "bit_width": 16, "is_signed": True},
    "INT_32": {"name": "INT", "bit_width": 32, "is_signed": True},
    "INT_64": {"name": "INT", "bit_width": 64, "is_signed": True},
    "JSON": {"name": "JSON"},
}
_CONVERTED_UNSUPPORTED = {"MAP", "LIST", "DECIMAL", "BSON", "INTERVAL", "ENUM", "MAP_KEY_VALUE"}


def _normalize_type_name(s: str) -> str:
    """Legacy normalization (reference ParquetColumnType.scala:139-170):
    'int8'/'INT8' -> INT_8, 'timestamp-millis' -> TIMESTAMP_MILLIS, ..."""
    u = s.strip().upper().replace("-", "_")
    import re

    m = re.fullmatch(r"(U?INT)_?(8|16|32|64)", u)
    if m:
        return f"{m.group(1)}_{m.group(2)}"
    return u


@dataclass
class LogicalSpec:
    name: str
    bit_width: int = 64          # LogicalTypeProxy.scala:17 DEFAULT_BID_WIDTH
    is_signed: bool = True
    scale: int = 0
    precision: int | None = None
    is_adjusted_to_utc: bool = True
    time_unit: str = "MILLIS"    # LogicalTypeProxy.scala:21 DEFAULT_TIME_UNIT
    format: str | None = None
    timezone: str | None = None


def _parse_logical(opt: dict, where: str) -> LogicalSpec | None:
    lt = opt.get("logical_type")
    ct = opt.get("converted_type")
    if lt is None and ct is None:
        if opt.get("format") or opt.get("timezone"):
            return LogicalSpec(name="DEFAULT", format=opt.get("format"), timezone=opt.get("timezone"))
        return None
    if ct is not None:
        warnings.warn(
            f"{where}: 'converted_type' is deprecated; use 'logical_type'",
            DeprecationWarning,
            stacklevel=3,
        )
        norm = _normalize_type_name(str(ct))
        if norm in _CONVERTED_UNSUPPORTED:
            raise ConfigException(f"{where}: unsupported converted_type: {ct}")
        if norm not in _CONVERTED:
            raise ConfigException(f"{where}: unknown converted_type: {ct}")
        lt = dict(_CONVERTED[norm])
    if isinstance(lt, str):
        norm = _normalize_type_name(lt)
        # proxy names first (LogicalTypeProxy.scala:51-62), then the legacy
        # shorthand set; MAP/LIST/... are only illegal as converted_type
        if norm in ("INT", "TIMESTAMP", "TIME", "DECIMAL", "DATE", "JSON", "STRING"):
            lt = {"name": norm}
        elif norm in _CONVERTED:
            lt = dict(_CONVERTED[norm])
        elif norm in _CONVERTED_UNSUPPORTED:
            raise ConfigException(f"{where}: unsupported logical_type: {lt}")
        else:
            raise ConfigException(f"{where}: Unsupported logical_type.name: {lt}.")
    name = _normalize_type_name(str(lt.get("name", "")))
    if name not in ("INT", "TIMESTAMP", "TIME", "DECIMAL", "DATE", "JSON", "STRING"):
        raise ConfigException(f"{where}: Unsupported logical_type.name: {name}.")
    return LogicalSpec(
        name=name,
        bit_width=int(lt.get("bit_width", 64)),
        is_signed=bool(lt.get("is_signed", True)),
        scale=int(lt.get("scale", 0)),
        precision=(int(lt["precision"]) if "precision" in lt else None),
        is_adjusted_to_utc=bool(lt.get("is_adjusted_to_utc", True)),
        time_unit=str(lt.get("time_unit", "MILLIS")).upper(),
        format=opt.get("format"),
        timezone=opt.get("timezone"),
    )


def _column_expr(name: str, dtype: T.DataType, spec: LogicalSpec | None, default_tz: str) -> Column:
    etype = _EMBULK_TYPE.get(type(dtype))
    if etype is None:
        raise ConfigException(f"column {name!r}: type {dtype.simpleString()} not supported")
    col = F.col(name)
    unit = {"MILLIS": "millis", "MICROS": "micros", "NANOS": "nanos"}

    if spec is None or spec.name in ("DEFAULT", "STRING"):
        # default encodings (reference DefaultColumnType.scala:62-76):
        # timestamp becomes formatted TEXT by default
        if etype == "timestamp":
            fmt = (spec.format if spec else None) or DEFAULT_TS_FORMAT
            tz = (spec.timezone if spec else None) or default_tz
            return C.format_timestamp(col, fmt, tz).alias(name)
        if spec is not None and spec.name == "STRING" and etype != "string":
            return col.cast("string").alias(name)
        return col.alias(name)

    w = f"column {name!r} ({etype}) -> {spec.name}"
    if spec.name == "INT":
        if etype == "boolean":
            return C.bool_to_int(col, spec.bit_width).alias(name)
        if etype == "long":
            return C.checked_int(col, spec.bit_width, spec.is_signed).alias(name)
        if etype == "double":
            return C.double_to_int_halfup(col, spec.bit_width, spec.is_signed).alias(name)
        if etype == "string":
            return C.string_to_int_halfup(col, spec.bit_width, spec.is_signed).alias(name)
        raise ConfigException(f"{w}: unsupported (IntLogicalType.scala consume set)")
    if spec.name == "TIMESTAMP":
        if etype == "long":
            return col.cast("bigint").alias(name)  # already in unit (C11)
        if etype == "timestamp":
            return C.timestamp_to_epoch(col, unit[spec.time_unit]).alias(name)
        raise ConfigException(f"{w}: unsupported")
    if spec.name == "TIME":
        if etype == "long":
            return (
                C.checked_int(col, 32) if spec.time_unit == "MILLIS" else col.cast("bigint")
            ).alias(name)
        if etype == "timestamp":
            tz = spec.timezone or ("UTC" if spec.is_adjusted_to_utc else default_tz)
            return C.timestamp_to_time_of_day(col, unit[spec.time_unit], tz).alias(name)
        raise ConfigException(f"{w}: unsupported")
    if spec.name == "DATE":
        if etype == "long":
            return C.long_to_date_days(col).alias(name)
        if etype == "timestamp":
            return C.timestamp_to_epoch_days(col).alias(name)
        raise ConfigException(f"{w}: unsupported")
    if spec.name == "DECIMAL":
        if spec.precision is None:
            raise ConfigException('"precision" must be set.')  # LogicalTypeProxy.scala:36-38
        if not (1 <= spec.precision <= 38) or spec.scale < 0 or spec.scale > spec.precision:
            raise ConfigException(f"{w}: bad scale/precision")
        if etype == "long":
            # C14: unscaled passthrough, p<=9 -> int32, p<=18 -> int64
            if spec.precision <= 9:
                return C.checked_int(col, 32).alias(name)
            if spec.precision <= 18:
                return col.cast("bigint").alias(name)
            raise ConfigException(f"{w}: precision {spec.precision} > 18 for long input")
        if etype in ("double", "string"):
            return C.decimal_to_string(col, spec.precision, spec.scale).alias(name)
        raise ConfigException(f"{w}: unsupported")
    if spec.name == "JSON":
        if etype == "string":
            return col.alias(name)  # already JSON text (C6)
        if etype in ("boolean", "long", "double"):
            return C.scalar_to_json(col).alias(name)
        raise ConfigException(f"{w}: unsupported")
    raise ConfigException(f"{w}: Unsupported logical_type.name: {spec.name}.")


@dataclass
class OutputPlan:
    exprs: list[Column]
    policy: CodecPolicy
    properties: dict = field(default_factory=dict)
    cluster_by: list = field(default_factory=list)
    zorder: bool = False
    bucket_by: tuple | None = None  # (col, N) -- Iceberg bucket transform

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(*self.exprs)


def load_output_config(cfg: dict, schema: T.StructType) -> OutputPlan:
    """Build an OutputPlan from an Embulk-style ``out:`` dict + input schema."""
    codec = cfg.get("compression_codec", "uncompressed")
    if codec not in COMPRESSION_CODECS:
        raise ConfigException(
            f"compression_codec must be one of {sorted(COMPRESSION_CODECS)}, got {codec!r}"
        )
    default_tz = cfg.get("default_timezone", "UTC")
    col_opts: dict = cfg.get("column_options", {}) or {}
    type_opts: dict = cfg.get("type_options", {}) or {}

    names = {f.name for f in schema.fields}
    for cname in col_opts:
        if cname not in names:
            raise ConfigException(f"column_options: unknown column {cname!r}")
    known_types = {"boolean", "long", "double", "string", "timestamp", "json"}
    for tname in type_opts:
        if tname not in known_types:
            raise ConfigException(f"type_options: unknown embulk type {tname!r}")
    # reference check: timestamp format/timezone options only make sense on
    # timestamp columns (ParquetFileWriteSupport.scala:69-91)
    for cname, opt in col_opts.items():
        dtype = next(f.dataType for f in schema.fields if f.name == cname)
        if (opt.get("format") or opt.get("timezone")) and _EMBULK_TYPE.get(
            type(dtype)
        ) != "timestamp" and not opt.get("logical_type") and not opt.get("converted_type"):
            raise ConfigException(
                f"column_options[{cname}]: format/timezone only apply to timestamp columns"
            )

    exprs = []
    for f_ in schema.fields:
        etype = _EMBULK_TYPE.get(type(f_.dataType))
        opt = col_opts.get(f_.name)
        if opt is None and etype is not None:
            opt = type_opts.get(etype)
        spec = _parse_logical(opt, f"column_options[{f_.name}]") if opt else None
        exprs.append(_column_expr(f_.name, f_.dataType, spec, default_tz))

    # engine extensions riding the reference surface: per-column `codec`
    # (forces an engine codec instead of auto-selection) and `bloom: true`
    # (per-chunk Bloom filter for point-lookup data skipping) inside
    # column_options -- unknown to the reference, validated eagerly here
    forced = {
        cname: opt["codec"] for cname, opt in col_opts.items() if opt.get("codec")
    }
    blooms = tuple(
        cname for cname, opt in col_opts.items() if opt.get("bloom") is True
    )
    # `ndv: true` opts a column into per-part HyperLogLog sketches for
    # approximate COUNT(DISTINCT) (jobs.distinct_job)
    ndvs = tuple(
        cname for cname, opt in col_opts.items() if opt.get("ndv") is True
    )
    policy = CodecPolicy(
        column_options=forced, bloom_columns=blooms, ndv_columns=ndvs
    )
    # table-level engine extensions: cluster_by (write ordering) and
    # zorder (Morton clustering over the cluster_by columns) -- validated
    # eagerly like every other config error, BEFORE any data moves
    cluster_by = list(cfg.get("cluster_by") or [])
    unknown_cluster = [c for c in cluster_by if c not in names]
    if unknown_cluster:
        raise ConfigException(f"cluster_by: unknown column(s) {unknown_cluster}")
    zorder = bool(cfg.get("zorder", False))
    if zorder and not cluster_by:
        raise ConfigException("zorder: true requires cluster_by")
    # bucket_by: {column: k, count: N} -- the bucket-major layout behind
    # operators.bucketjoin's shuffle-free equi-join
    bucket_by = None
    bspec = cfg.get("bucket_by")
    if bspec is not None:
        if not isinstance(bspec, dict) or set(bspec) != {"column", "count"}:
            raise ConfigException(
                "bucket_by must be a map {column: <name>, count: <N>}"
            )
        if bspec["column"] not in names:
            raise ConfigException(
                f"bucket_by: unknown column {bspec['column']!r}"
            )
        try:
            n = int(bspec["count"])
        except (TypeError, ValueError):
            raise ConfigException("bucket_by.count must be an integer")
        if n < 1:
            raise ConfigException("bucket_by.count must be >= 1")
        bucket_by = (bspec["column"], n)
    return OutputPlan(
        exprs=exprs,
        policy=policy,
        properties={"compression_codec": codec, "default_timezone": default_tz},
        cluster_by=cluster_by,
        zorder=zorder,
        bucket_by=bucket_by,
    )
