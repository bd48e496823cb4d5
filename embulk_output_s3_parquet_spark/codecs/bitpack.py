"""BITPACK codec: width-minimal bit packing for booleans / non-negative ints.

One of the encodings the reference delegates to parquet-mr's RLE/bit-pack
hybrid (toggled at reference S3ParquetOutputPlugin.scala:107-111); here it is
a first-class vectorized kernel.
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

NAME = "bitpack"


def encode(values: pa.Array) -> tuple[bytes, dict]:
    t = values.type
    if pa.types.is_boolean(t):
        vals = values.to_numpy(zero_copy_only=False).astype(np.uint64)
        width = 1
    elif is_intlike(t):
        iv = int_view(values)
        if len(iv) and iv.min() < 0:
            raise CodecUnsuitable("bitpack: negative values (use for)")
        vals = iv.astype(np.uint64)
        width = bit_width(int(vals.max())) if len(vals) else 0
    else:
        raise CodecUnsuitable(f"bitpack: unsupported type {t}")
    body = block_compress(pack_uints(vals, width))
    return pack_sections([body]), {"w": width}


def decode(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    t = type_from_name(tname)
    width = meta["w"]
    buf = block_decompress(unpack_sections(payload)[0])
    vals = unpack_uints(buf, n, width)
    if pa.types.is_boolean(t):
        return pa.array(vals.astype(bool), type=pa.bool_())
    return from_int_view(vals.astype(np.int64), t)
