"""RAW codec: type-faithful byte dump + zstd block compression.

The universal fallback -- the analogue of the reference's static whole-file
``compression_codec`` (reference PluginTask.scala:37-38,89-107) but applied
per column chunk and only when no lightweight codec wins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (
    CodecUnsuitable,
    block_compress,
    block_decompress,
    decimal_from_lo_hi,
    decimal_lo_hi,
    from_int_view,
    int_view,
    is_intlike,
    is_stringlike,
    pack_sections,
    string_buffers,
    strings_from_buffers,
    type_from_name,
    unpack_sections,
)

NAME = "raw"


def encode(values: pa.Array) -> tuple[bytes, dict]:
    t = values.type
    meta: dict = {}
    if pa.types.is_boolean(t):
        bits = np.packbits(values.to_numpy(zero_copy_only=False).astype(np.uint8))
        return pack_sections([block_compress(bits.tobytes())]), meta
    if pa.types.is_decimal128(t):
        # raw is the universal fallback, so unlike int_view it must accept
        # EVERY decimal chunk: narrow values store the int64 half only,
        # wide (unscaled > int64) chunks store the full 16-byte pairs
        lo, hi = decimal_lo_hi(values)
        if np.array_equal(hi, lo >> 63):
            return pack_sections([block_compress(lo.tobytes())]), {"d": 8}
        inter = np.empty((len(lo), 2), np.int64)
        inter[:, 0] = lo
        inter[:, 1] = hi
        return pack_sections([block_compress(inter.tobytes())]), {"d": 16}
    if is_intlike(t):
        return pack_sections([block_compress(int_view(values).tobytes())]), meta
    if pa.types.is_floating(t):
        body = values.to_numpy(zero_copy_only=False).tobytes()
        return pack_sections([block_compress(body)]), meta
    if is_stringlike(t):
        # copy=False: the body goes straight into block_compress (buffer
        # protocol), skipping a full memcpy of every payload byte
        lens, data = string_buffers(values, copy=False)
        return (
            pack_sections(
                [block_compress(lens.astype(np.int64).tobytes()), block_compress(data)]
            ),
            meta,
        )
    raise CodecUnsuitable(f"raw: unsupported type {t}")


def decode(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    t = type_from_name(tname)
    secs = unpack_sections(payload)
    if pa.types.is_boolean(t):
        bits = np.unpackbits(
            np.frombuffer(block_decompress(secs[0]), np.uint8), count=n
        ).astype(bool)
        return pa.array(bits, type=pa.bool_())
    if pa.types.is_decimal128(t):
        body = block_decompress(secs[0])
        if meta.get("d", 8) == 8:
            lo = np.frombuffer(body, np.int64, count=n)
            return decimal_from_lo_hi(lo, lo >> 63, t)
        pairs = np.frombuffer(body, np.int64, count=2 * n).reshape(-1, 2)
        return decimal_from_lo_hi(pairs[:, 0].copy(), pairs[:, 1].copy(), t)
    if is_intlike(t):
        vals = np.frombuffer(block_decompress(secs[0]), np.int64, count=n)
        return from_int_view(vals, t)
    if pa.types.is_floating(t):
        np_t = np.float32 if pa.types.is_float32(t) else np.float64
        return pa.array(np.frombuffer(block_decompress(secs[0]), np_t, count=n), type=t)
    lens = np.frombuffer(block_decompress(secs[0]), np.int64, count=n)
    data = block_decompress(secs[1])
    return strings_from_buffers(lens, data, t)
