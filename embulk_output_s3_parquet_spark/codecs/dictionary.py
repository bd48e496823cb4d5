"""DICT codec: per-chunk dictionary encode + bit-packed indices.

The vectorized, chunk-local analogue of parquet-mr's dictionary pages that
the reference merely toggles (reference S3ParquetOutputPlugin.scala:107-111);
dictionary values are themselves RAW(+zstd)-encoded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import raw
from .base import (
    bit_width,
    block_compress,
    block_decompress,
    pack_sections,
    pack_uints,
    type_name,
    unpack_sections,
    unpack_uints,
)

NAME = "dict"


def encode(values: pa.Array) -> tuple[bytes, dict]:
    try:
        denc = values.dictionary_encode()
    except pa.ArrowNotImplementedError as e:  # nested types: no dict kernel
        from .base import CodecUnsuitable

        raise CodecUnsuitable(f"dict: {e}") from e
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    dictionary = denc.dictionary
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    width = bit_width(len(dictionary) - 1) if len(dictionary) > 1 else 0
    dict_body, dict_meta = raw.encode(dictionary)
    payload = pack_sections([block_compress(pack_uints(idx, width)), dict_body])
    return payload, {"w": width, "card": len(dictionary), "dm": dict_meta}


def decode(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    secs = unpack_sections(payload)
    idx = unpack_uints(block_decompress(secs[0]), n, meta["w"]).astype(np.int32)
    dictionary = raw.decode(secs[1], meta.get("dm", {}), meta["card"], tname)
    return dictionary.take(pa.array(idx))
