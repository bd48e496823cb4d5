"""Per-chunk Bloom filters: data skipping for point lookups on
high-cardinality columns.

Zone maps prune RANGE predicates, but on an unsorted high-cardinality
column (a commit sha, a user id) every chunk's [min, max] spans the whole
domain and nothing skips. A small per-chunk Bloom filter makes equality /
IN predicates prunable: ``col == v`` skips every chunk whose filter proves
absence -- a point lookup on a 100 TB table then reads payload bytes for
only the handful of chunks that might contain the key.

Opt-in per column (``CodecPolicy.bloom_columns``; string/binary/int-like
only -- float equality is a smell, not a lookup). The filter rides the
chunk meta JSON as base64 (_BITS_PER_ROW=10, k=4 -> ~1% false positives,
~1.25 bytes/row, <0.1% of a 4 MiB chunk). False positives only cost a
wasted decode; false negatives are impossible, so pruning stays may-match
correct.

Hashes are blake2b-derived double hashes (stable across processes and
runs -- Python's hash() is salted and unusable for persisted filters).
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pyarrow as pa

_BITS_PER_ROW = 10
_K = 4
_MIN_BITS = 64


def _canonical_bytes(v) -> bytes | None:
    """Stable serialization shared by build (arrow values) and probe
    (predicate literals): utf-8 for strings, raw for binary, decimal string
    of the integer for int-likes. None for unsupported values."""
    if v is None:
        return None
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, bool):
        return b"1" if v else b"0"
    if isinstance(v, (int, np.integer)):
        return str(int(v)).encode()
    return None


def _hash_pair(data: bytes) -> tuple[int, int]:
    d = hashlib.blake2b(data, digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1


def _positions(data: bytes, m_bits: int) -> list[int]:
    h1, h2 = _hash_pair(data)
    return [(h1 + i * h2) % m_bits for i in range(_K)]


def supported_type(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
        or pa.types.is_integer(t)
        or pa.types.is_boolean(t)
    )


def build(values: pa.Array) -> dict | None:
    """Bloom filter over the (null-free) chunk values -> meta dict
    {"m": bits, "k": K, "b": base64} or None for empty/unsupported chunks."""
    if len(values) == 0 or not supported_type(values.type):
        return None
    m_bits = max(_MIN_BITS, len(values) * _BITS_PER_ROW)
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    for v in values.to_pylist():
        data = _canonical_bytes(v)
        if data is None:
            continue
        for p in _positions(data, m_bits):
            bits[p >> 3] |= 1 << (p & 7)
    return {
        "m": m_bits,
        "k": _K,
        "b": base64.b64encode(bits.tobytes()).decode("ascii"),
    }


def might_contain(bf: dict, literal) -> bool:
    """May-match probe; True (never skip) for any literal the canonical
    serialization doesn't cover."""
    data = _canonical_bytes(literal)
    if data is None:
        return True
    bits = np.frombuffer(base64.b64decode(bf["b"]), dtype=np.uint8)
    m_bits = bf["m"]
    return all(bits[p >> 3] & (1 << (p & 7)) for p in _positions(data, m_bits))
