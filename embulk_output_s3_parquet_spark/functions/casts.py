"""Typed cast/encode layer: the reference's 6x7 column-type operator matrix
(SURVEY.md section 2.2) as Spark Column functions.

Parity notes vs the reference:

* Fail-fast bounds: the reference throws DataException when a long overflows
  the target int width (reference IntLogicalType.scala:115-116,141-174);
  Spark's cast silently wraps/nulls, so every narrowing cast here carries an
  explicit ``raise_error`` guard (C8/C18).
* HALF_UP rounding: double/string -> int and -> decimal use BigDecimal
  HALF_UP in the reference (IntLogicalType.scala:137-139,
  DecimalLogicalType.scala:95-103); Spark's ``round`` is HALF_UP and
  decimal casts round HALF_UP, matching for the value domains we accept.
* Default timestamp output is *formatted text*, not INT64 (reference
  DefaultColumnType.scala:70-74, README.md:22-26) -- ``format_timestamp``.
* NANOS: Spark TimestampType is microsecond-resolution, so the NANOS path
  (TimestampLogicalType.scala:66-82) is exact only to the microsecond;
  callers with true-nanos data should keep raw int64 columns (SURVEY.md
  hard-parts note (e)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BOUNDS = {
    (8, True): (-(2**7), 2**7 - 1),
    (16, True): (-(2**15), 2**15 - 1),
    (32, True): (-(2**31), 2**31 - 1),
    (64, True): (-(2**63), 2**63 - 1),
    (8, False): (0, 2**8 - 1),
    (16, False): (0, 2**16 - 1),
    (32, False): (0, 2**32 - 1),
    (64, False): (0, 2**64 - 1),
}
_SPARK_INT = {8: "tinyint", 16: "smallint", 32: "int", 64: "bigint"}


def _guarded(col: Column, lo: int, hi: int, what: str) -> Column:
    # reference: DataException on out-of-range (IntLogicalType.scala:141-174)
    return F.when(
        col.isNull() | col.between(F.lit(lo), F.lit(hi)), col
    ).otherwise(F.raise_error(F.concat(F.lit(f"{what} out of range [{lo},{hi}]: "), col.cast("string"))))


def checked_int(col: Column, bits: int = 64, signed: bool = True) -> Column:
    """C8/C18: long -> INT(bits, signed) with fail-fast range check."""
    lo, hi = _BOUNDS[(bits, signed)]
    guarded = _guarded(col.cast("bigint"), lo, min(hi, 2**63 - 1), f"int{bits}")
    target = _SPARK_INT[bits if signed or bits < 64 else 64]
    return guarded.cast(target) if signed else guarded.cast("bigint")


def bool_to_int(col: Column, bits: int = 64) -> Column:
    """C7: true->1, false->0 (reference IntLogicalType.scala:97-107)."""
    return checked_int(col.cast("int"), bits)


def double_to_int_halfup(col: Column, bits: int = 64, signed: bool = True) -> Column:
    """C9: HALF_UP round then range check (IntLogicalType.scala:117-118,137-139)."""
    # cast through decimal(38,0): Spark rounds HALF_UP, exact for |x| < 1e38
    return checked_int(col.cast("decimal(38,0)").cast("bigint"), bits, signed)


def string_to_int_halfup(col: Column, bits: int = 64, signed: bool = True) -> Column:
    """C10: exact decimal parse, HALF_UP, range check; parse failure raises
    (IntLogicalType.scala:109-114)."""
    dec = col.try_cast("decimal(38,0)")
    parsed = F.when(
        col.isNull() | dec.isNotNull(), dec
    ).otherwise(F.raise_error(F.concat(F.lit("cannot parse as number: "), col)))
    return checked_int(parsed.cast("bigint"), bits, signed)


def format_timestamp(col: Column, fmt: str = "yyyy-MM-dd HH:mm:ss", tz: str | None = None) -> Column:
    """C5: default timestamp output is formatted text
    (DefaultColumnType.scala:70-74; default format README.md:22-26).

    The ``xx`` offset token is rendered for the *target* zone (DST-aware per
    instant): ``date_format`` always prints the session zone's offset, so the
    zone shift from ``from_utc_timestamp`` is measured and formatted
    explicitly."""
    col = col.cast("timestamp")
    if not tz:
        return F.date_format(col, fmt)
    shifted = F.from_utc_timestamp(col, tz)
    if "xx" not in fmt:
        return F.date_format(shifted, fmt)
    base = F.date_format(shifted, fmt.replace("xx", "").rstrip())
    off = (F.unix_seconds(shifted.cast("timestamp")) - F.unix_seconds(col)).cast("long")
    sign = F.when(off < 0, "-").otherwise("+")
    hh = F.lpad((F.abs(off) / 3600).cast("int").cast("string"), 2, "0")
    mm = F.lpad(((F.abs(off) % 3600) / 60).cast("int").cast("string"), 2, "0")
    offset_str = F.concat(sign, hh, mm)
    sep = " " if fmt.rstrip("x").endswith(" ") else ""
    return F.concat(base, F.lit(sep), offset_str)


def timestamp_to_epoch(col: Column, unit: str = "millis") -> Column:
    """C11: TIMESTAMP(unit) int64 (TimestampLogicalType.scala:66-82).
    TIMESTAMP_NTZ inputs (parquet default) are interpreted in the session
    zone (UTC) via an explicit cast -- unix_* require TIMESTAMP.

    NANOS from a Spark TIMESTAMP is necessarily us*1000: Spark timestamps
    are microsecond-precision, so sub-us digits do not exist to recover.
    TRUE nanos are supported losslessly via the int64-passthrough column
    mode: a long column already holding epoch-nanos maps through
    logical_type TIMESTAMP(NANOS) unchanged (plans/embulk_config.py
    long->TIMESTAMP branch), mirroring the reference's
    (epochSecond * 10^9 + nano) emission for sources that carry nanos."""
    col = col.cast("timestamp")
    if unit == "millis":
        return F.unix_millis(col)
    if unit == "micros":
        return F.unix_micros(col)
    if unit == "nanos":
        return F.unix_micros(col) * F.lit(1000)
    raise ValueError(f"unit must be millis|micros|nanos, got {unit!r}")


def timestamp_to_time_of_day(col: Column, unit: str = "micros", tz: str = "UTC") -> Column:
    """C12: wall-clock time-of-day in zone as int (TimeLogicalType.scala:73-105).
    No Spark TIME type -> micros/millis/nanos since local midnight."""
    local = F.from_utc_timestamp(col.cast("timestamp"), tz)
    micros = F.unix_micros(local) - F.unix_micros(F.date_trunc("day", local))
    if unit == "millis":
        return (micros / 1000).cast("int")
    if unit == "micros":
        return micros
    if unit == "nanos":
        return micros * F.lit(1000)
    raise ValueError(f"unit must be millis|micros|nanos, got {unit!r}")


def timestamp_to_epoch_days(col: Column) -> Column:
    """C13: whole days since epoch, truncation toward zero for pre-1970
    (DateLogicalType.scala:48-62 uses Duration.toDays = trunc)."""
    secs = F.unix_micros(col.cast("timestamp")) / F.lit(1_000_000)
    return (secs / 86400).cast("bigint").cast("int")


def long_to_date_days(col: Column) -> Column:
    """C13 long path: int32 range-checked day number."""
    return checked_int(col, 32)


def to_decimal_halfup(col: Column, precision: int, scale: int) -> Column:
    """C14-C16: decimal with HALF_UP at (p, s); ConfigException analogue for
    bad p handled at call site (DecimalLogicalType.scala:37-58)."""
    if not (1 <= precision <= 38) or not (0 <= scale <= precision):
        raise ValueError(f"bad decimal({precision},{scale})")
    return col.cast(f"decimal({precision},{scale})")


def decimal_to_string(col: Column, precision: int, scale: int) -> Column:
    """C15/C16 quirk: the reference emits decimals as BINARY *string bytes*
    (DecimalLogicalType.scala:72-77); textual value preserved here."""
    return to_decimal_halfup(col, precision, scale).cast("string")


def scalar_to_json(col: Column) -> Column:
    """C17: wrap a scalar into JSON text (JsonLogicalType.scala:44-63)."""
    return F.to_json(F.struct(col.alias("v")))
