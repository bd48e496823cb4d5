"""FSST-style symbol-table codec for string/binary chunks.

A vectorizable take on FSST ("Fast Static Symbol Table", Boncz/Neumann/
Leis, VLDB'20 -- see PAPERS.md): train a per-chunk table of frequent
substrings (1-8 bytes), substitute each with a single code byte, then block-
compress. Instead of FSST's escape byte, code bytes are drawn from byte
values *absent* in the chunk (source text rarely uses the full byte range),
which keeps both directions exact, single-byte-unambiguous and C-speed
(``bytes.replace``). Chunks that use all 256 byte values are rejected and
fall back to the selector's next choice.

The reference has no string compression beyond dict+snappy (SURVEY.md 2.3);
this codec is engine-new per the north rule.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from .base import (
    CodecUnsuitable,
    block_compress,
    block_decompress,
    is_stringlike,
    pack_sections,
    string_buffers,
    strings_from_buffers,
    type_from_name,
    unpack_sections,
)

NAME = "fsst"

_SYM_LENGTHS = (2, 3, 4, 6, 8)
_TRAIN_BYTES = 16384
_MAX_SYMBOLS = 32
_MIN_GAIN = 32


def _free_bytes(data: bytes, want: int) -> list[int]:
    """Byte values absent from ``data`` (highest first), via C-speed memchr
    probes -- a full histogram of a 100MB chunk costs seconds, ``find`` of a
    missing byte costs one linear scan and present bytes return early."""
    out: list[int] = []
    for b in range(255, -1, -1):
        if data.find(b) == -1:
            out.append(b)
            if len(out) >= want:
                break
    return out


def _train(sample: bytes, max_symbols: int) -> list[bytes]:
    counts: Counter[bytes] = Counter()
    m = len(sample)
    for ln in _SYM_LENGTHS:
        step = 1 if ln <= 4 else 2
        for i in range(0, m - ln + 1, step):
            counts[sample[i : i + ln]] += 1
    scored = sorted(
        ((cnt * (len(s) - 1), s) for s, cnt in counts.items() if cnt >= 4),
        key=lambda x: (-x[0], x[1]),
    )
    out: list[bytes] = []
    for gain, s in scored:
        if gain < _MIN_GAIN:
            break
        out.append(s)
        if len(out) >= max_symbols:
            break
    # longest-first substitution order maximizes per-match savings
    out.sort(key=lambda s: (-len(s), s))
    return out


def encode(values: pa.Array) -> tuple[bytes, dict]:
    if not is_stringlike(values.type):
        raise CodecUnsuitable(f"fsst: unsupported type {values.type}")
    lens, data = string_buffers(values)
    if len(data) == 0:
        return (
            pack_sections([block_compress(lens.tobytes()), block_compress(b""), b""]),
            {"k": 0},
        )
    free = _free_bytes(data, _MAX_SYMBOLS)
    if not free:
        raise CodecUnsuitable("fsst: no free code bytes in chunk")
    symbols = _train(data[:_TRAIN_BYTES], min(len(free), _MAX_SYMBOLS))
    buf = data
    table: list[tuple[int, bytes]] = []
    for sym in symbols:
        code = free[len(table)]
        new = buf.replace(sym, bytes([code]))
        if len(new) + len(sym) + 2 < len(buf):
            buf = new
            table.append((code, sym))
            if len(table) >= len(free):
                break
    tbl = b"".join(bytes([code, len(sym)]) + sym for code, sym in table)
    payload = pack_sections(
        [block_compress(lens.tobytes()), block_compress(buf), tbl]
    )
    return payload, {"k": len(table)}


def decode(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    t = type_from_name(tname)
    secs = unpack_sections(payload)
    lens = np.frombuffer(block_decompress(secs[0]), np.int64, count=n)
    buf = block_decompress(secs[1])
    tbl = secs[2]
    table: list[tuple[int, bytes]] = []
    off = 0
    for _ in range(meta["k"]):
        code, ln = tbl[off], tbl[off + 1]
        table.append((code, tbl[off + 2 : off + 2 + ln]))
        off += 2 + ln
    for code, sym in reversed(table):
        buf = buf.replace(bytes([code]), sym)
    return strings_from_buffers(lens, buf, t)
