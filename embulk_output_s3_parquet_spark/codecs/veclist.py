"""VEC codec: list/vector columns (e.g. ``array<float>`` embeddings).

The reference's Glue layer names ARRAY types (reference
GlueDataType.scala:42-56) but its sink delegates nested encoding wholesale
to parquet-mr; this engine owns it: a list chunk splits into

* the per-row lengths, bit-packed (a fixed-dim embedding column collapses
  to width 0 -- one varint of metadata for the whole chunk), and
* the flattened child values, recursively encoded through ``encode_array``
  with auto-selection -- so an int-list column gets FOR/delta/dict on its
  values, a float32 embedding gets the float path, nested lists recurse.

Child nulls ride the recursive payload's own validity bitmap; the outer
validity is handled by the shared null framing in ``encode_array``.
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

NAME = "vec"


def _is_listlike(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t)


def encode(values: pa.Array) -> tuple[bytes, dict]:
    from . import encode_array  # late import: registry <-> entry-point cycle

    t = values.type
    if not _is_listlike(t):
        raise CodecUnsuitable(f"vec: not a list type {t}")
    n = len(values)
    if n == 0:
        lens = np.zeros(0, np.int64)
        child = pa.array([], type=t.value_type)
    else:
        import pyarrow.compute as pc

        lens = pc.list_value_length(values).to_numpy(zero_copy_only=False).astype(np.int64)
        child = values.flatten()
    # frame-of-reference over the lengths: a fixed-dim vector column (the
    # embedding case) collapses to width 0 -- no per-row length bits at all
    base = int(lens.min()) if len(lens) else 0
    width = bit_width(int(lens.max()) - base) if len(lens) else 0
    child_payload, child_meta = encode_array(child)
    # child stats/zones are chunk-internal noise at the table level; keep
    # only what decode needs (codec, type, counts, codec meta)
    keep = ("c", "t", "n", "z", "m") + (("tt",) if "tt" in child_meta else ())
    child_meta = {k: child_meta[k] for k in keep}
    payload = pack_sections(
        [block_compress(pack_uints((lens - base).astype(np.uint64), width)), child_payload]
    )
    return payload, {"w": width, "b": base, "child": child_meta}


def decode(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    from . import decode_array

    t = type_from_name(tname)
    secs = unpack_sections(payload)
    lens = (
        unpack_uints(block_decompress(secs[0]), n, meta["w"]).astype(np.int64)
        + meta.get("b", 0)
    )
    child = decode_array(secs[1], meta["child"])
    if pa.types.is_large_list(t):
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        out = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), child)
    else:
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(lens, out=offsets[1:])
        out = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child)
    return out if out.type == t else out.cast(t)
