"""Property-based round-trip tests (hypothesis) for every codec kernel.

Complements the fixed-vector oracles: hypothesis explores denormals,
signed zeros, extreme exponents, pathological run structures, and
arbitrary byte strings, shrinking any failure to a minimal case.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from chimp_spark.codecs import fsst
from chimp_spark.codecs import light as L
from chimp_spark.codecs import xor_ref as X

_MAX_EXAMPLES = 40

f64_lists = st.lists(
    st.floats(allow_nan=True, allow_infinity=True, width=64), min_size=1, max_size=300
)
i64_lists = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=300
)


def _bits(vals):
    return np.array(vals, dtype=np.float64).view(np.uint64)


@pytest.mark.parametrize(
    "enc,dec",
    [
        (X.chimp_encode, X.chimp_decode),
        (X.chimpn_encode, X.chimpn_decode),
        (X.gorilla_encode, X.gorilla_decode),
        (X.patas_encode, X.patas_decode),
    ],
    ids=["chimp", "chimpn", "gorilla", "patas"],
)
@settings(max_examples=_MAX_EXAMPLES, deadline=None)
@given(vals=f64_lists)
def test_xor_family_roundtrip_any_floats(enc, dec, vals):
    bits = _bits(vals)
    words, _ = enc(bits)
    np.testing.assert_array_equal(dec(words, n_values=bits.size), bits)


@settings(max_examples=_MAX_EXAMPLES, deadline=None)
@given(vals=f64_lists)
def test_xor_split_roundtrip_any_floats(vals):
    bits = _bits(vals)
    buf = L.xor_split_encode(bits)
    np.testing.assert_array_equal(L.xor_split_decode(memoryview(buf)), bits)


@settings(max_examples=_MAX_EXAMPLES, deadline=None)
@given(vals=i64_lists)
def test_int_codecs_roundtrip_any_ints(vals):
    iv = np.array(vals, dtype=np.int64)
    for enc, dec in [
        (L.for_bitpack_encode, L.for_bitpack_decode),
        (L.delta_bp_encode, L.delta_bp_decode),
        (L.gcd_for_encode, L.gcd_for_decode),
        (L.rle_encode, L.rle_decode),
    ]:
        buf = enc(iv)
        np.testing.assert_array_equal(dec(memoryview(buf), iv.size, np.int64), iv)


@settings(max_examples=_MAX_EXAMPLES, deadline=None)
@given(vals=i64_lists)
def test_ts_chimp_roundtrip_any_ints(vals):
    iv = np.array(vals, dtype=np.int64)
    buf = L.ts_chimp_encode(iv)
    np.testing.assert_array_equal(L.ts_chimp_decode(memoryview(buf), iv.size, np.int64), iv)


@settings(max_examples=_MAX_EXAMPLES, deadline=None)
@given(strings=st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=60))
def test_fsst_roundtrip_any_bytes(strings):
    data = b"".join(strings)
    offs = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strings], out=offs[1:])
    blob = fsst.encode(offs, np.frombuffer(data, dtype=np.uint8))
    out_offs, out_data = fsst.decode(memoryview(blob))
    assert out_data.tobytes() == data
    np.testing.assert_array_equal(out_offs, offs)


@settings(max_examples=_MAX_EXAMPLES, deadline=None)
@given(vals=f64_lists)
def test_dec_for_never_lossy(vals):
    """dec_for either encodes bit-exactly or refuses — never corrupts."""
    arr = np.array(vals, dtype=np.float64)
    try:
        buf = L.dec_for_encode(arr)
    except ValueError:
        return
    out = L.dec_for_decode(memoryview(buf), arr.size, np.float64)
    np.testing.assert_array_equal(out.view(np.uint64), arr.view(np.uint64))


# full-int64 domain: gcd_for/for_bitpack must be wrap-safe (regression:
# ranges exceeding int64 once silently decoded every value as min)
i64_full = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=200
)


@settings(max_examples=_MAX_EXAMPLES, deadline=None)
@given(vals=i64_full)
def test_int_codecs_roundtrip_full_int64_domain(vals):
    iv = np.array(vals, dtype=np.int64)
    for enc, dec in [
        (L.for_bitpack_encode, L.for_bitpack_decode),
        (L.gcd_for_encode, L.gcd_for_decode),
        (L.delta_bp_encode, L.delta_bp_decode),
    ]:
        buf = enc(iv)
        np.testing.assert_array_equal(dec(memoryview(buf), iv.size, np.int64), iv)


@settings(max_examples=_MAX_EXAMPLES, deadline=None)
@given(
    lists=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.one_of(st.none(), st.floats(allow_nan=True, width=32)),
                min_size=0, max_size=8,
            ),
        ),
        min_size=1, max_size=60,
    )
)
def test_list_frame_roundtrip_any_nullability(lists):
    """list<float> frames: outer nulls, inner nulls, empties, NaN — all
    bit-identical through encode/decode."""
    import pyarrow as pa

    from chimp_spark import framing

    arr = pa.array(lists, type=pa.list_(pa.float32()))
    blob, meta = framing.encode_chunk(arr, codec="auto")
    out = framing.decode_chunk(blob, arr.type)
    assert out.is_valid().equals(arr.is_valid())
    assert np.array_equal(
        np.asarray(out.values.is_valid()), np.asarray(arr.values.is_valid())
    ) or (len(arr.values) == 0)
    a = np.asarray(out.values.drop_null(), dtype=np.float32).view(np.uint32)
    b = np.asarray(arr.values.drop_null(), dtype=np.float32).view(np.uint32)
    np.testing.assert_array_equal(a, b)
    assert framing.checksum_of(out) == meta.checksum


@settings(max_examples=_MAX_EXAMPLES, deadline=None)
@given(strings=st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=50))
def test_string_zone_bounds_bracket_all_members(strings):
    """_string_bounds must bracket every member: lo <= s for all s,
    and hi >= s (or hi is None = unbounded)."""
    import pyarrow as pa

    from chimp_spark.framing import _string_bounds

    arr = pa.array(strings, type=pa.binary())
    lo, hi = _string_bounds(arr)
    assert lo is not None
    for s in strings:
        assert lo <= s
        if hi is not None:
            assert hi >= s
