"""Property-based codec fuzzing (hypothesis): any generated chunk must
round-trip bit-identically through every applicable codec and through auto
selection -- beyond the reference's table-driven grids."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from embulk_output_s3_parquet_spark.codecs import CODECS, decode_array, encode_array

_SETTINGS = dict(max_examples=60, deadline=None)


def _roundtrip(arr: pa.Array, codec: str) -> None:
    payload, meta = encode_array(arr, codec)
    out = decode_array(payload, meta)
    assert out.type == arr.type
    if pa.types.is_floating(arr.type):
        a = arr.to_numpy(zero_copy_only=False)
        b = out.to_numpy(zero_copy_only=False)
        assert np.array_equal(a, b, equal_nan=True) and np.array_equal(
            np.signbit(a[~np.isnan(a)]), np.signbit(b[~np.isnan(b)])
        )
    else:
        assert out.equals(arr)


ints = st.lists(
    st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    max_size=300,
)
strings = st.lists(st.one_of(st.none(), st.text(max_size=80)), max_size=200)
binaries = st.lists(st.one_of(st.none(), st.binary(max_size=60)), max_size=150)
floats = st.lists(
    st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True, width=64)),
    max_size=200,
)
bools = st.lists(st.one_of(st.none(), st.booleans()), max_size=300)


@settings(**_SETTINGS)
@given(ints)
def test_fuzz_int64(vals):
    arr = pa.array(vals, pa.int64())
    for codec in ("auto", "for", "delta", "rle", "dict", "raw"):
        _roundtrip(arr, codec)


@settings(**_SETTINGS)
@given(strings)
def test_fuzz_strings(vals):
    arr = pa.array(vals, pa.string())
    for codec in ("auto", "dict", "rle", "fsst", "raw"):
        _roundtrip(arr, codec)


@settings(**_SETTINGS)
@given(binaries)
def test_fuzz_binary(vals):
    arr = pa.array(vals, pa.binary())
    for codec in ("auto", "fsst", "raw"):
        _roundtrip(arr, codec)


@settings(**_SETTINGS)
@given(floats)
def test_fuzz_float64(vals):
    arr = pa.array(vals, pa.float64())
    for codec in ("auto", "alp", "rle", "dict", "raw"):
        _roundtrip(arr, codec)


@settings(**_SETTINGS)
@given(bools)
def test_fuzz_bool(vals):
    arr = pa.array(vals, pa.bool_())
    for codec in ("auto", "bitpack", "rle", "raw"):
        _roundtrip(arr, codec)


timestamps = st.lists(
    st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
    max_size=200,
)


@settings(**_SETTINGS)
@given(timestamps)
def test_fuzz_timestamps_us(vals):
    arr = pa.array(vals, pa.int64()).cast(pa.timestamp("us"))
    for codec in ("auto", "for", "delta", "raw"):
        _roundtrip(arr, codec)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), st.integers(min_value=-10**8, max_value=10**8)), max_size=200))
def test_fuzz_date32(vals):
    arr = pa.array(vals, pa.int32()).cast(pa.date32())
    for codec in ("auto", "for", "rle", "raw"):
        _roundtrip(arr, codec)


structs = st.lists(
    st.one_of(
        st.none(),
        st.fixed_dictionaries(
            {
                "x": st.one_of(st.none(), st.integers(-(2**40), 2**40)),
                "y": st.one_of(st.none(), st.text(max_size=24)),
            }
        ),
    ),
    max_size=120,
)
maps = st.lists(
    st.one_of(
        st.none(),
        st.dictionaries(
            st.text(min_size=1, max_size=8),
            st.one_of(st.none(), st.integers(-(2**40), 2**40)),
            max_size=6,
        ),
    ),
    max_size=100,
)


@settings(**_SETTINGS)
@given(structs)
def test_fuzz_struct(vals):
    arr = pa.array(vals, pa.struct([("x", pa.int64()), ("y", pa.string())]))
    _roundtrip(arr, "auto")
    _roundtrip(arr, "struct")


@settings(**_SETTINGS)
@given(maps)
def test_fuzz_map(vals):
    arr = pa.array(
        [None if v is None else sorted(v.items()) for v in vals],
        pa.map_(pa.string(), pa.int64()),
    )
    _roundtrip(arr, "auto")
    _roundtrip(arr, "map")
