"""STRUCT / MAP codecs: shredded encoding for nested records.

The reference's Glue layer names STRUCT and MAP types (reference
GlueDataType.scala:42-56) but delegates their encoding wholesale to
parquet-mr's repetition/definition machinery; this engine owns both:

* ``struct`` shreds a struct chunk into its child columns (parent validity
  already stripped by the shared null framing in ``encode_array``) and
  recursively auto-encodes each child -- an int field gets FOR/delta/dict,
  a string field gets fsst/dict, a nested list recurses through ``vec``.
  Payload = packed child sections; meta = per-field (name, child meta).
* ``map`` is the list-of-pairs view: per-row entry counts stored like
  ``vec``'s lengths (frame-of-reference bit-packed -- a constant-fanout map
  column collapses to width 0), plus the flattened key and item child
  arrays, each recursively auto-encoded. Keys are non-null by Arrow's map
  contract, so they ride the child codec directly.

Both are registered as the only candidates for their type in the selector
(trialing scalar codecs on nested chunks is pure waste) and as the
``CodecUnsuitable`` fallback for their type in ``encode_array``.
"""

from __future__ import annotations

from types import SimpleNamespace

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

_CHILD_META_KEYS = ("c", "t", "n", "z", "m")


def _child_meta(meta: dict) -> dict:
    # child stats/zones are chunk-internal noise at the table level; keep
    # only what decode needs (same trimming as the vec codec). "tt" is the
    # structural type tree -- present only when str(type) is ambiguous.
    out = {k: meta[k] for k in _CHILD_META_KEYS}
    if "tt" in meta:
        out["tt"] = meta["tt"]
    return out


def encode_struct(values: pa.Array) -> tuple[bytes, dict]:
    from . import encode_array  # late import: registry <-> entry-point cycle

    if not pa.types.is_struct(values.type):
        raise CodecUnsuitable(f"struct: not a struct type {values.type}")
    # flatten() applies the (already-stripped) parent validity to children,
    # so each child is exactly the per-row field column
    children = values.flatten() if len(values) else [
        pa.array([], type=f.type) for f in values.type
    ]
    payloads, fields = [], []
    for f, child in zip(values.type, children):
        p, m = encode_array(child)
        payloads.append(p)
        fields.append([f.name, _child_meta(m)])
    return pack_sections(payloads), {"f": fields}


def decode_struct(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    from . import decode_array

    t = type_from_name(tname)
    if not meta["f"]:
        return pa.array([{}] * n, type=t)
    secs = unpack_sections(payload)
    names = [fm[0] for fm in meta["f"]]
    arrs = [decode_array(s, fm[1]) for s, fm in zip(secs, meta["f"])]
    out = pa.StructArray.from_arrays(arrs, names)
    return out if out.type == t else out.cast(t)


def encode_map(values: pa.Array) -> tuple[bytes, dict]:
    from . import encode_array

    if not pa.types.is_map(values.type):
        raise CodecUnsuitable(f"map: not a map type {values.type}")
    n = len(values)
    if n == 0:
        lens = np.zeros(0, np.int64)
        keys = pa.array([], type=values.type.key_type)
        items = pa.array([], type=values.type.item_type)
    else:
        off = values.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        start, span = int(off[0]), int(off[-1] - off[0])
        # .keys/.items are the unsliced child arrays; window them to the
        # chunk's offset range (offsets are absolute into the child)
        keys = values.keys.slice(start, span)
        items = values.items.slice(start, span)
    base = int(lens.min()) if len(lens) else 0
    width = bit_width(int(lens.max()) - base) if len(lens) else 0
    kp, km = encode_array(keys)
    ip, im = encode_array(items)
    payload = pack_sections(
        [block_compress(pack_uints((lens - base).astype(np.uint64), width)), kp, ip]
    )
    return payload, {"w": width, "b": base, "k": _child_meta(km), "v": _child_meta(im)}


def decode_map(payload: bytes, meta: dict, n: int, tname: str) -> pa.Array:
    from . import decode_array

    t = type_from_name(tname)
    secs = unpack_sections(payload)
    lens = (
        unpack_uints(block_decompress(secs[0]), n, meta["w"]).astype(np.int64)
        + meta.get("b", 0)
    )
    keys = decode_array(secs[1], meta["k"])
    items = decode_array(secs[2], meta["v"])
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(lens, out=offsets[1:])
    out = pa.MapArray.from_arrays(pa.array(offsets, pa.int32()), keys, items)
    return out if out.type == t else out.cast(t)


struct_codec = SimpleNamespace(NAME="struct", encode=encode_struct, decode=decode_struct)
map_codec = SimpleNamespace(NAME="map", encode=encode_map, decode=decode_map)
