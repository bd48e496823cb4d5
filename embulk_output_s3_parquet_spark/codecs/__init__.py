"""Codec registry + the two public entry points: encode_array / decode_array.

The registry mirrors the reference's closed set of config-selected
``ParquetColumnType`` implementations (reference LogicalTypeProxy.scala:51-62)
-- the engine's extension point is a name -> (encode, decode) pair.

``encode_array`` strips nulls into a packed validity bitmap before the value
codec runs (null path parity: reference ParquetFileWriteSupport.scala:181-182)
and frames the payload as [validity][codec body]. ``decode_array`` is its
exact inverse: bit-identical round-trip including null masks is the engine's
core invariant (reference round-trip asserts:
TestS3ParquetOutputPlugin.scala:61-83).
"""

from __future__ import annotations

import json

import pyarrow as pa

from . import alp, bitpack, delta, dictionary, forr, fsst, raw, rle, selector
from .base import (
    CodecUnsuitable,
    drop_nulls_with_mask,
    pack_sections,
    reinsert_nulls,
    type_from_name,
    type_from_tree,
    type_name,
    type_needs_tree,
    type_to_tree,
    unpack_sections,
)

CODECS = selector.CODECS
AUTO = "auto"


def _normalize(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 1:
            return arr.chunk(0)  # zero-copy (combine_chunks would copy)
        arr = arr.combine_chunks()
    return arr


def encode_array(
    arr,
    codec: str = AUTO,
    exclude: frozenset[str] = frozenset(),
    bloom: bool = False,
    bloom_m: int | None = None,
) -> tuple[bytes, dict]:
    """Encode one column chunk -> (payload bytes, JSON-safe meta dict).
    ``exclude`` forwards the hopeless-loser memo to the auto-selector;
    ``bloom`` additionally records a per-chunk Bloom filter in the meta
    (codecs/bloom.py) for equality/IN data skipping."""
    arr = _normalize(arr)
    n = len(arr)
    values, validity, null_count = drop_nulls_with_mask(arr)
    stats: dict = {}
    if codec == AUTO:
        name, stats = selector.select(values, exclude)
    else:
        if codec not in CODECS:
            raise ValueError(f"unknown codec {codec!r}; known: {sorted(CODECS)}")
        name = codec
    try:
        body, cmeta = CODECS[name].encode(values)
    except CodecUnsuitable:
        # universal fallback: raw for scalars, the structural codec for
        # nested types (raw has no nested layout; vec/struct/map always
        # succeed on encodable children)
        t = values.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            name = "vec"
        elif pa.types.is_struct(t):
            name = "struct"
        elif pa.types.is_map(t):
            name = "map"
        else:
            name = "raw"
        body, cmeta = CODECS[name].encode(values)
    payload = pack_sections([validity, body])
    meta = {
        "c": name,
        "t": type_name(arr.type),
        "n": n,
        "z": null_count,
        "m": cmeta,
    }
    if type_needs_tree(arr.type):
        meta["tt"] = type_to_tree(arr.type)
    zone = _zone_of(values)
    if zone is not None:
        meta["mm"] = zone
    elif pa.types.is_string(values.type) or pa.types.is_large_string(values.type):
        pz = _prefix_zone_of(values)
        if pz is not None:
            meta["mp"] = pz
    sm = _sum_of(values, zone)
    if sm is not None:
        meta["sm"] = sm
    if bloom:
        from . import bloom as _bloom

        bf = _bloom.build(values, m_bits=bloom_m)
        if bf is not None:
            meta["bf"] = bf
    if stats.get("distinct") is not None:
        meta["s"] = {k: v for k, v in stats.items() if k != "n"}
    return payload, meta


# zone-map bounds are only recorded for types whose min/max is JSON-safe
# (ints, finite floats, short strings; decimals as exact strings;
# timestamps/dates as their raw int64/int32 storage values -- readers
# coerce predicate literals to the same representation via the chunk meta's
# type, see sources/chunkscan.py). Everything else has no zone and is
# never skipped.
_ZONE_MAX_STR = 64


def _zone_of(values: pa.Array):
    """Per-chunk [min, max] zone map for predicate-skipping scans."""
    import math

    if len(values) == 0:
        return None
    t = values.type
    temporal = (
        pa.types.is_timestamp(t) or pa.types.is_date32(t) or pa.types.is_date64(t)
    )
    if not (
        pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_string(t)
        or pa.types.is_large_string(t) or pa.types.is_decimal128(t) or temporal
    ):
        return None
    if (pa.types.is_string(t) or pa.types.is_large_string(t)) and (
        values.nbytes > _ZONE_MAX_STR * len(values)
    ):
        # document-sized text: the lexical min/max would be discarded by the
        # _ZONE_MAX_STR cap below anyway -- skip the full-chunk scan (zones
        # are optional pruning metadata, absence is always correct)
        return None
    import pyarrow.compute as pc

    if temporal:
        width = pa.int32() if pa.types.is_date32(t) else pa.int64()
        mm = pc.min_max(values.cast(width))
    else:
        mm = pc.min_max(values)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is None or hi is None:
        return None
    if pa.types.is_decimal128(t):
        return [str(lo), str(hi)]
    if pa.types.is_floating(t) and not (math.isfinite(lo) and math.isfinite(hi)):
        return None
    if isinstance(lo, str) and (len(lo) > _ZONE_MAX_STR or len(hi) > _ZONE_MAX_STR):
        return None
    return [lo, hi]


_ZONE_PREFIX_CP = 64


def _cp_increment(s: str) -> str | None:
    """Smallest convenient string strictly greater than EVERY string having
    prefix ``s``: increment the last code point (hopping the surrogate gap,
    dropping maxed-out U+10FFFF tails). None when no such string exists."""
    cs = list(s)
    while cs:
        o = ord(cs[-1])
        if o >= 0x10FFFF:
            cs.pop()
            continue
        o += 1
        if 0xD800 <= o <= 0xDFFF:
            o = 0xE000  # lone surrogates aren't storable utf-8
        cs[-1] = chr(o)
        return "".join(cs)
    return None


def _prefix_zone_of(values: pa.Array):
    """Widened [lo, hi] prefix zone for string chunks whose exact lexical
    bounds are too long to store (Parquet's truncate-and-increment column
    statistics): lo = min over 64-codepoint prefixes (a prefix of x is
    <= x, so the min of prefixes bounds the true min from below) and
    hi = code-point increment of the max prefix (every value is < it --
    any x's prefix is <= the max prefix, and incrementing the last code
    point exceeds every extension). The interval CONTAINS the exact zone
    but its endpoints are generally not achieved values, so it is sound
    for pruning (zone_excludes AND zone_includes stay conservative under
    widening) and must never feed exactness consumers -- minmax_job /
    quantile_job / stats folds key on "mm" only and ignore "mp"."""
    import pyarrow.compute as pc

    mm = pc.min_max(pc.utf8_slice_codeunits(values, 0, _ZONE_PREFIX_CP))
    lo, hi_prefix = mm["min"].as_py(), mm["max"].as_py()
    if lo is None or hi_prefix is None:
        return None
    hi = _cp_increment(hi_prefix)
    if hi is None:
        return None
    return [lo, hi]


def _sum_of(values: pa.Array, zone=None):
    """Per-chunk SUM of the non-null values, for metadata-first SUM/AVG
    (jobs.sum_job). Decimals sum exactly as strings; floats use one pc.sum
    (a single fixed summation order per chunk); integers only when the
    zone bound PROVES the int64 accumulator cannot overflow (|bound| * n <
    2^62) -- otherwise nothing is recorded and readers take the exact
    decode path. Types SUM doesn't apply to (strings, temporals, bools,
    nested) record nothing."""
    import math

    t = values.type
    if len(values) == 0:
        return None
    if pa.types.is_decimal128(t):
        import pyarrow.compute as pc

        s = pc.sum(values).as_py()
        return None if s is None else str(s)
    if pa.types.is_integer(t):
        if zone is None:
            return None
        bound = max(abs(int(zone[0])), abs(int(zone[1])))
        if bound * len(values) >= 2**62:
            return None
        import pyarrow.compute as pc

        s = pc.sum(values).as_py()
        return None if s is None else int(s)
    if pa.types.is_floating(t):
        import pyarrow.compute as pc

        s = pc.sum(values).as_py()
        if s is None or not math.isfinite(s):
            return None  # inf/nan sums are order-fragile: force exact decode
        return s
    return None


def zone_excludes(zone, op: str, value) -> bool:
    """True when [lo, hi] proves NO row in the chunk can satisfy
    ``col <op> value`` (op in ==, >=, <=, >, <, in, startswith). None zone
    never excludes."""
    if zone is None:
        return False
    lo, hi = zone
    try:
        if op == "==":
            return value < lo or value > hi
        if op == ">=":
            return hi < value
        if op == ">":
            return hi <= value
        if op == "<=":
            return lo > value
        if op == "<":
            return lo >= value
        if op == "in":
            return all(v < lo or v > hi for v in value)
        if op == "startswith":
            # any v with prefix p satisfies p <= v < next(p); exclude when
            # the zone lies entirely outside that interval
            if not isinstance(value, str) or not isinstance(hi, str):
                return False
            if hi < value:
                return True
            nxt = _prefix_upper_bound(value)
            return nxt is not None and lo >= nxt
    except TypeError:
        return False  # incomparable literal: never skip
    raise ValueError(f"unsupported zone op {op!r}")


def zone_includes(zone, op: str, value) -> bool:
    """True when [lo, hi] proves EVERY (non-null) row in the chunk satisfies
    ``col <op> value`` -- the dual of zone_excludes, used by metadata-only
    counting (jobs.count_job): a fully-included chunk contributes its row
    count without its payload ever being read. Conservative: False whenever
    inclusion can't be proven."""
    if zone is None:
        return False
    lo, hi = zone
    try:
        if op == "==":
            return lo == hi == value
        if op == ">=":
            return lo >= value
        if op == ">":
            return lo > value
        if op == "<=":
            return hi <= value
        if op == "<":
            return hi < value
        if op == "in":
            return lo == hi and lo in value
        if op == "startswith":
            if not isinstance(value, str) or not isinstance(lo, str):
                return False
            nxt = _prefix_upper_bound(value)
            # every string in [p, next(p)) starts with p
            return lo >= value and nxt is not None and hi < nxt
    except TypeError:
        return False  # incomparable literal: can't prove inclusion
    return False


def _prefix_upper_bound(p: str) -> str | None:
    """Smallest string > every string with prefix ``p`` (increment the last
    incrementable code point); None when no such bound exists."""
    for i in range(len(p) - 1, -1, -1):
        cp = ord(p[i])
        if cp < 0x10FFFF:
            return p[:i] + chr(cp + 1)
    return None


def decode_array(payload: bytes, meta: dict) -> pa.Array:
    n, null_count = meta["n"], meta["z"]
    # the structural tree ("tt") is authoritative when present: str(type) is
    # ambiguous for nested field names containing ', ' / ': ' (base.py)
    t = type_from_tree(meta["tt"]) if "tt" in meta else type_from_name(meta["t"])
    validity, body = unpack_sections(payload)
    values = CODECS[meta["c"]].decode(body, meta["m"], n - null_count, t)
    if null_count == 0:
        return values
    if null_count == n:
        return pa.nulls(n, type=t)
    return reinsert_nulls(values, validity, n)


def meta_to_json(meta: dict) -> str:
    return json.dumps(meta, separators=(",", ":"), sort_keys=True)


def meta_from_json(s: str) -> dict:
    return json.loads(s)
