"""DELTA codec: successive differences + zigzag + width-minimal bit packing.

Engine extra beyond the reference's five-codec brief: sorted or slowly-
drifting int sequences (ids, event timestamps) have tiny deltas even when
the FOR range is wide. Parquet v2 has DELTA_BINARY_PACKED; the reference's
v1 writer path never uses it (SURVEY.md 2.3).
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

NAME = "delta"
_U64 = np.uint64
_MASK = (1 << 64) - 1


def _zigzag(d: np.ndarray) -> np.ndarray:
    # two's-complement deltas (uint64 view) -> zigzag: small |delta| -> small code
    s = d.view(np.int64)
    return ((s << 1) ^ (s >> 63)).view(_U64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    return ((z >> _U64(1)).view(np.int64) ^ -(z & _U64(1)).view(np.int64)).view(_U64)


def encode(values: pa.Array) -> tuple[bytes, dict]:
    if not is_intlike(values.type):
        raise CodecUnsuitable(f"delta: unsupported type {values.type}")
    iv = int_view(values)
    if len(iv) == 0:
        return pack_sections([block_compress(b"")]), {"first": 0, "w": 0}
    first = int(iv[0])
    u = iv.view(_U64)
    deltas = np.empty(len(iv) - 1, dtype=_U64)
    np.subtract(u[1:], u[:-1], out=deltas)  # modular: exact two's-complement
    zz = _zigzag(deltas)
    width = bit_width(int(zz.max())) if len(zz) else 0
    body = block_compress(pack_uints(zz, width))
    return pack_sections([body]), {"first": first, "w": width}


def decode(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    t = type_from_name(tname)
    if n == 0:
        return from_int_view(np.zeros(0, np.int64), t)
    buf = block_decompress(unpack_sections(payload)[0])
    zz = unpack_uints(buf, n - 1, meta["w"])
    deltas = _unzigzag(zz)
    out = np.empty(n, dtype=_U64)
    out[0] = _U64(meta["first"] & _MASK)
    np.cumsum(deltas, out=out[1:], dtype=_U64)
    out[1:] += out[0]
    return from_int_view(out.view(np.int64), t)
