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
    """Candidate symbols by total gain. Same scoring as the original
    Counter-over-slices loop (overlapping windows, identical steps) but the
    counting runs as numpy window-view + np.unique -- the Python Counter
    cost 32ms per 16KB trial and dominated cold-task codec selection
    (round-3 VERDICT #3)."""
    m = len(sample)
    if m == 0:
        return []
    a = np.frombuffer(sample, np.uint8)
    scored: list[tuple[int, bytes]] = []
    for ln in _SYM_LENGTHS:
        if m < ln:
            continue
        step = 1 if ln <= 4 else 2
        w = np.lib.stride_tricks.sliding_window_view(a, ln)[::step]
        # pack each window into one uint64 (symbols are <= 8 bytes): unique
        # on native ints sorts ~5x faster than memcmp on void views
        packed = np.zeros(len(w), np.uint64)
        for j in range(ln):
            packed = (packed << np.uint64(8)) | w[:, j].astype(np.uint64)
        uniq, counts = np.unique(packed, return_counts=True)
        keep = counts >= 4
        gains = counts[keep] * (ln - 1)
        ok = gains >= _MIN_GAIN
        for u, g in zip(uniq[keep][ok], gains[ok]):
            scored.append((int(g), int(u).to_bytes(ln, "big")))
    scored.sort(key=lambda x: (-x[0], x[1]))
    out = [s for _g, s in scored[:max_symbols]]
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
