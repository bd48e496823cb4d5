"""FOR codec: frame-of-reference (min-subtract) + width-minimal bit packing.

Absent in the reference's parquet v1 writer path (SURVEY.md 2.3); the engine
adds it for int-like chunks (ids, epochs, dates) where range << domain.
Two's-complement modular arithmetic keeps the delta exact for the full int64
domain.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import (
    CodecUnsuitable,
    bit_width,
    block_compress,
    block_decompress,
    from_int_view,
    int_view,
    is_intlike,
    pack_sections,
    pack_uints,
    type_from_name,
    unpack_sections,
    unpack_uints,
)

NAME = "for"
_U64 = np.uint64
_MASK = (1 << 64) - 1


def encode(values: pa.Array) -> tuple[bytes, dict]:
    if not is_intlike(values.type):
        raise CodecUnsuitable(f"for: unsupported type {values.type}")
    iv = int_view(values)
    if len(iv) == 0:
        return pack_sections([block_compress(b"")]), {"min": 0, "w": 0}
    minv = int(iv.min())
    # modular subtraction: exact unsigned delta even when (max-min) > int64
    deltas = (iv.view(_U64) - _U64(minv & _MASK)).astype(_U64)
    width = bit_width(int(deltas.max()))
    body = block_compress(pack_uints(deltas, width))
    return pack_sections([body]), {"min": minv, "w": width}


def decode(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    t = type_from_name(tname)
    buf = block_decompress(unpack_sections(payload)[0])
    deltas = unpack_uints(buf, n, meta["w"])
    vals = (deltas + _U64(meta["min"] & _MASK)).view(np.int64)
    return from_int_view(vals, t)
