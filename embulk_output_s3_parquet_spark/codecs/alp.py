"""ALP-style float codec: adaptive lossless decimal scaling for doubles.

After ALP ("Adaptive Lossless floating-Point compression", Afroozeh &
Boncz, SIGMOD'24 -- public paper): most real-world doubles are decimals
(prices, rates, measurements). Find the smallest power of ten such that
``round(x * 10^e) / 10^e`` reproduces every value bit-identically in double
arithmetic; store the integers (frame-of-reference + bit-pack) and ``e``.
Chunks that aren't decimal-like (true random mantissas, NaN/Inf) are
rejected and fall back to the selector's next choice.

Engine extra beyond the reference's brief (its parquet v1 writer has no
float compression beyond the block codec, SURVEY.md 2.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (
    CodecUnsuitable,
    bit_width,
    block_compress,
    block_decompress,
    pack_sections,
    pack_uints,
    type_from_name,
    unpack_sections,
    unpack_uints,
)

NAME = "alp"
_MAX_EXP = 14
_U64 = np.uint64
_MASK = (1 << 64) - 1


def _fit_exponent(x: np.ndarray) -> tuple[int, np.ndarray] | None:
    if not np.all(np.isfinite(x)):
        return None
    for e in range(_MAX_EXP + 1):
        scale = 10.0**e
        y = np.round(x * scale)
        if np.any(np.abs(y) >= 2**62):
            return None
        ints = y.astype(np.int64)
        # BITWISE equality: -0.0 == 0.0 numerically but decodes to +0.0,
        # which would break the engine's bit-identity invariant
        if np.array_equal((ints / scale).view(np.uint64), x.view(np.uint64)):
            return e, ints
    return None


def encode(values: pa.Array) -> tuple[bytes, dict]:
    if not pa.types.is_float64(values.type):
        raise CodecUnsuitable(f"alp: unsupported type {values.type}")
    x = values.to_numpy(zero_copy_only=False)
    if len(x) == 0:
        return pack_sections([block_compress(b"")]), {"e": 0, "min": 0, "w": 0}
    fit = _fit_exponent(x)
    if fit is None:
        raise CodecUnsuitable("alp: chunk is not decimal-like")
    e, ints = fit
    minv = int(ints.min())
    deltas = (ints.view(_U64) - _U64(minv & _MASK)).astype(_U64)
    width = bit_width(int(deltas.max()))
    body = block_compress(pack_uints(deltas, width))
    return pack_sections([body]), {"e": e, "min": minv, "w": width}


def decode(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    t = type_from_name(tname)
    buf = block_decompress(unpack_sections(payload)[0])
    deltas = unpack_uints(buf, n, meta["w"])
    ints = (deltas + _U64(meta["min"] & _MASK)).view(np.int64)
    x = ints / (10.0 ** meta["e"])
    return pa.array(x, type=t)
