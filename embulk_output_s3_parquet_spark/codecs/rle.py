"""RLE codec: run-length encode (run values + bit-packed run lengths).

First-class replacement for the RLE half of parquet-mr's RLE/bit-pack hybrid
(delegated by the reference, SURVEY.md 2.3). Numeric chunks run-detect on the
physical view; string chunks dictionary-encode first and RLE the indices, so
sorted/low-cardinality string columns (e.g. ``lang``) collapse to runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import raw
from .base import (
    CodecUnsuitable,
    bit_width,
    block_compress,
    block_decompress,
    from_int_view,
    int_view,
    is_intlike,
    is_stringlike,
    pack_sections,
    pack_uints,
    type_from_name,
    type_name,
    unpack_sections,
    unpack_uints,
)

NAME = "rle"


def _runs(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = len(vals)
    if n == 0:
        return vals[:0], np.zeros(0, np.int64)
    if vals.dtype == np.float64 or vals.dtype == np.float32:
        # compare bit patterns so NaN runs collapse too
        cmp = vals.view(np.uint64 if vals.dtype == np.float64 else np.uint32)
    else:
        cmp = vals
    change = np.flatnonzero(cmp[1:] != cmp[:-1])
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [n]))
    return vals[starts], (ends - starts).astype(np.int64)


def _pack_lengths(lengths: np.ndarray) -> tuple[bytes, int]:
    width = bit_width(int(lengths.max())) if len(lengths) else 0
    return block_compress(pack_uints(lengths.astype(np.uint64), width)), width


def encode(values: pa.Array) -> tuple[bytes, dict]:
    t = values.type
    if pa.types.is_boolean(t):
        vals = values.to_numpy(zero_copy_only=False).astype(np.uint8)
        run_vals, lengths = _runs(vals)
        lb, lw = _pack_lengths(lengths)
        body = block_compress(np.packbits(run_vals).tobytes())
        return pack_sections([lb, body]), {"v": "bool", "r": len(lengths), "lw": lw}
    if is_intlike(t) or pa.types.is_floating(t):
        vals = (
            int_view(values)
            if is_intlike(t)
            else values.to_numpy(zero_copy_only=False)
        )
        run_vals, lengths = _runs(vals)
        lb, lw = _pack_lengths(lengths)
        body = block_compress(run_vals.tobytes())
        return (
            pack_sections([lb, body]),
            {"v": "num", "r": len(lengths), "lw": lw, "dt": str(run_vals.dtype)},
        )
    if is_stringlike(t):
        denc = values.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        run_vals, lengths = _runs(idx)
        lb, lw = _pack_lengths(lengths)
        iw = bit_width(len(denc.dictionary) - 1) if len(denc.dictionary) > 1 else 0
        ib = block_compress(pack_uints(run_vals.astype(np.uint64), iw))
        db, dm = raw.encode(denc.dictionary)
        return (
            pack_sections([lb, ib, db]),
            {
                "v": "str",
                "r": len(lengths),
                "lw": lw,
                "iw": iw,
                "card": len(denc.dictionary),
                "dm": dm,
            },
        )
    raise CodecUnsuitable(f"rle: unsupported type {t}")


def decode(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    t = type_from_name(tname)
    secs = unpack_sections(payload)
    r = meta["r"]
    lengths = unpack_uints(block_decompress(secs[0]), r, meta["lw"]).astype(np.int64)
    if meta["v"] == "bool":
        bits = np.unpackbits(
            np.frombuffer(block_decompress(secs[1]), np.uint8), count=r
        ).astype(bool)
        return pa.array(np.repeat(bits, lengths), type=pa.bool_())
    if meta["v"] == "num":
        run_vals = np.frombuffer(block_decompress(secs[1]), np.dtype(meta["dt"]), count=r)
        vals = np.repeat(run_vals, lengths)
        if pa.types.is_floating(t):
            return pa.array(vals, type=t)
        return from_int_view(vals.astype(np.int64), t)
    # strings: expand index runs, then gather from dictionary
    run_idx = unpack_uints(block_decompress(secs[1]), r, meta["iw"]).astype(np.int64)
    idx = np.repeat(run_idx, lengths)
    dictionary = raw.decode(secs[2], meta.get("dm", {}), meta["card"], tname)
    return dictionary.take(pa.array(idx))
