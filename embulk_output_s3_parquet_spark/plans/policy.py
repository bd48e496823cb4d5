"""Codec policy: per-column / per-type codec choice with fail-fast validation.

Mirrors the reference's config surface: ``column_options`` (by column name)
and ``type_options`` (by input type) resolved with precedence
column option > type option > default (reference
ParquetFileWriteSupport.scala:110-117), and its eager validation that
rejects unknown columns/types/codecs before any data moves (reference
PluginTask.scala:77-127, ParquetFileWriteSupport.scala:69-105; tested by
TestS3ParquetOutputPluginConfigException.scala:9-46).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from ..codecs import AUTO, CODECS


class ConfigException(ValueError):
    """Invalid codec policy -- raised at plan build, before job launch."""


_ENCODABLE = (
    T.BooleanType, T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.StringType, T.BinaryType,
    T.TimestampType, T.TimestampNTZType, T.DateType,
)


def _is_encodable(dt: T.DataType) -> bool:
    """Scalar types from _ENCODABLE, decimals (any Spark precision -- the
    codec layer stores narrow chunks as int64 halves, wide as 16-byte pairs),
    and nested types whose leaves are encodable: arrays (vector codec),
    structs (shredded per-field), maps (entry-list) -- all recursive."""
    if isinstance(dt, _ENCODABLE):
        return True
    if isinstance(dt, T.DecimalType):
        return True
    if isinstance(dt, T.ArrayType):
        return _is_encodable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_is_encodable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.MapType):
        return _is_encodable(dt.keyType) and _is_encodable(dt.valueType)
    return False


@dataclass
class CodecPolicy:
    """Engine knobs (the analogue of the reference's writer tuning,
    S3ParquetOutputPlugin.scala:106-133 block/page sizes).

    Memory math per executor core: the encode UDF holds one Arrow batch
    (bounded by spark.sql.execution.arrow.maxRecordsPerBatch, set equal to
    ``chunk_rows`` by session.get_spark) plus per-part pending buffers
    bounded by the scan partition size; ``target_partition_bytes`` caps the
    grouped-mode task input and the output part size. Working set per core:
    one Arrow batch (<= chunk_rows rows) sliced into ~chunk_bytes encode
    chunks -- a few hundred MB at the defaults regardless of row width."""

    default: str = AUTO
    column_options: dict[str, str] = field(default_factory=dict)
    type_options: dict[str, str] = field(default_factory=dict)
    # chunk_rows CAPS rows per chunk; chunk_bytes targets the chunk's byte
    # footprint, so effective rows = min(chunk_rows, chunk_bytes/avg_row).
    # Fat-row text corpora land near ~1.3k rows (cache-resident chunks:
    # measured 1.5x encode / 3x decode vs 32k-row chunks at equal size);
    # skinny numeric tables keep the 32k cap (per-chunk overhead dominates
    # below that). 0 disables the byte target.
    chunk_rows: int = 32768
    chunk_bytes: int = 4 * 1024 * 1024
    target_partition_bytes: int = 64 * 1024 * 1024
    # per-chunk Bloom filters for equality/IN data skipping on unsorted
    # high-cardinality columns (codecs/bloom.py); string/binary/int only
    bloom_columns: tuple[str, ...] = ()
    # per-part HyperLogLog sketches for approximate NDV (codecs/hll.py,
    # jobs.distinct_job): ~1.4 KB manifest bytes per column per part,
    # mergeable so a table-wide distinct count is one driver manifest
    # pass; same supported types as blooms
    ndv_columns: tuple[str, ...] = ()

    def validate(self, schema: T.StructType) -> None:
        known = set(CODECS) | {AUTO}
        names = {f.name for f in schema.fields}
        for col, codec in self.column_options.items():
            if col not in names:
                raise ConfigException(f"column_options: unknown column {col!r}")
            if codec not in known:
                raise ConfigException(f"column_options[{col}]: unknown codec {codec!r}")
        for tname, codec in self.type_options.items():
            if codec not in known:
                raise ConfigException(f"type_options[{tname}]: unknown codec {codec!r}")
        if self.default not in known:
            raise ConfigException(f"default: unknown codec {self.default!r}")
        if self.chunk_rows < 1:
            raise ConfigException("chunk_rows must be >= 1")
        if self.chunk_bytes < 0:
            raise ConfigException("chunk_bytes must be >= 0 (0 disables)")
        if self.target_partition_bytes < 1 << 16:
            raise ConfigException("target_partition_bytes must be >= 64KiB")
        for f in schema.fields:
            if not _is_encodable(f.dataType):
                raise ConfigException(
                    f"column {f.name!r}: type {f.dataType.simpleString()} not encodable"
                )
        bloomable = (
            T.StringType, T.BinaryType, T.ByteType, T.ShortType,
            T.IntegerType, T.LongType, T.BooleanType,
        )
        by_name = {f.name: f.dataType for f in schema.fields}
        for col in self.bloom_columns:
            if col not in by_name:
                raise ConfigException(f"bloom_columns: unknown column {col!r}")
            if not isinstance(by_name[col], bloomable):
                raise ConfigException(
                    f"bloom_columns[{col}]: type "
                    f"{by_name[col].simpleString()} has no bloom support "
                    "(string/binary/int/bool only)"
                )
        for col in self.ndv_columns:
            if col not in by_name:
                raise ConfigException(f"ndv_columns: unknown column {col!r}")
            if not isinstance(by_name[col], bloomable):
                raise ConfigException(
                    f"ndv_columns[{col}]: type "
                    f"{by_name[col].simpleString()} has no NDV-sketch "
                    "support (string/binary/int/bool only)"
                )

    def resolve(self, col: str, dtype: T.DataType) -> str:
        if col in self.column_options:
            return self.column_options[col]
        tname = dtype.simpleString()
        if tname in self.type_options:
            return self.type_options[tname]
        return self.default
