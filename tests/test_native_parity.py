"""The C fast paths must be byte/bit-identical to the pure-Python
reference implementations (which remain the fallback)."""

import numpy as np
import pytest

import chimp_spark._native as native_mod
from chimp_spark.codecs import fsst
from chimp_spark.codecs import xor_ref as X

pytestmark = pytest.mark.skipif(native_mod.get() is None, reason="no C toolchain")


@pytest.fixture()
def no_native(monkeypatch):
    monkeypatch.setattr(native_mod, "_FUNCS", {})
    yield
    monkeypatch.setattr(native_mod, "_FUNCS", None)


def _data():
    rng = np.random.default_rng(3)
    walk = (48.0 + np.cumsum(rng.normal(0, 0.2, 50_000))).view(np.uint64)
    uni = rng.integers(0, 2**64, 50_000, dtype=np.uint64)
    runs = np.repeat(rng.integers(0, 2**64, 100, dtype=np.uint64), 500)
    return {"walk": walk, "uniform": uni, "runs": runs}


@pytest.mark.parametrize("codec", ["chimp", "chimpn", "gorilla", "patas"])
def test_decode_native_equals_python(codec, no_native, monkeypatch):
    enc = getattr(X, f"{codec}_encode")
    dec = getattr(X, f"{codec}_decode")
    for name, bits in _data().items():
        words, _ = enc(bits)
        py = dec(words, n_values=bits.size)  # native disabled by fixture
        monkeypatch.setattr(native_mod, "_FUNCS", None)  # re-enable
        nat = dec(words, n_values=bits.size)
        monkeypatch.setattr(native_mod, "_FUNCS", {})  # disable again
        np.testing.assert_array_equal(py, nat, err_msg=f"{codec}/{name}")
        np.testing.assert_array_equal(nat, bits)


def test_fsst_native_equals_python(no_native, monkeypatch):
    rng = np.random.default_rng(5)
    vocab = "the of and web page data crawl index search content \xff weird".split()
    strings = [(" ".join(rng.choice(vocab, rng.integers(0, 30)))).encode() for _ in range(2000)]
    strings += [b"", b"\xff" * 9, bytes(range(256))]
    data = b"".join(strings)
    offs = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strings], out=offs[1:])
    d = np.frombuffer(data, dtype=np.uint8)
    sample = strings[:300]
    symbols = fsst.train(sample)
    py_lens, py_codes = fsst.compress_strings(offs, d, symbols)  # python path
    monkeypatch.setattr(native_mod, "_FUNCS", None)
    nat_lens, nat_codes = fsst.compress_strings(offs, d, symbols)
    np.testing.assert_array_equal(py_lens, nat_lens)
    assert py_codes == nat_codes
    # and the full frame round-trips
    blob = fsst.encode(offs, d)
    o2, d2 = fsst.decode(memoryview(blob))
    assert d2.tobytes() == data
    np.testing.assert_array_equal(o2, offs)


def test_xor_split_native_equals_python(no_native, monkeypatch):
    from chimp_spark.codecs import light as L

    for bits in _data().values():
        py_buf = L.xor_split_encode(bits)
        py_out = L.xor_split_decode(memoryview(py_buf))
        monkeypatch.setattr(native_mod, "_FUNCS", None)
        nat_buf = L.xor_split_encode(bits)
        nat_out = L.xor_split_decode(memoryview(py_buf))
        monkeypatch.setattr(native_mod, "_FUNCS", {})
        assert nat_buf == py_buf
        np.testing.assert_array_equal(py_out, nat_out)
        np.testing.assert_array_equal(nat_out, bits)


def test_bitpack_bitunpack_native_equals_python(no_native, monkeypatch):
    """bp_fixed/bu_fixed (C) must be byte-identical to the numpy
    scatter/gather across widths incl. word-crossing and width 64."""
    from chimp_spark.codecs import light as L

    rng = np.random.default_rng(9)
    for width in (1, 3, 7, 8, 13, 23, 31, 33, 47, 56, 63, 64):
        vals = rng.integers(0, 2**64, 4097, dtype=np.uint64)
        if width < 64:
            vals &= np.uint64((1 << width) - 1)
        # python reference (native disabled by fixture)
        py_blob = L.bitpack(vals, width)
        py_back = L.bitunpack(memoryview(py_blob), vals.size, width)
        np.testing.assert_array_equal(py_back, vals)
        # native
        monkeypatch.setattr(native_mod, "_FUNCS", None)
        assert native_mod.get() is not None
        c_blob = L.bitpack(vals, width)
        assert c_blob == py_blob, f"width {width}: pack bytes differ"
        c_back = L.bitunpack(memoryview(c_blob), vals.size, width)
        np.testing.assert_array_equal(c_back, vals)
        monkeypatch.setattr(native_mod, "_FUNCS", {})


def test_fsst_decode_native_equals_python(no_native, monkeypatch):
    """The C decode (sizing walk + 8-byte-store copy walk) must produce
    byte-identical (offsets, data) to the numpy escape-parity path,
    including 0xFF-literal runs, empty strings, and full-byte-range
    payloads."""
    rng = np.random.default_rng(7)
    vocab = "the of and web page data crawl index \xff\xff odd".split()
    strings = [(" ".join(rng.choice(vocab, rng.integers(0, 40)))).encode() for _ in range(3000)]
    strings += [b"", b"\xff" * 9, bytes(range(256)), b"\xff"]
    data = b"".join(strings)
    offs = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strings], out=offs[1:])
    blob = fsst.encode(offs, np.frombuffer(data, dtype=np.uint8))
    be_py, data_py = fsst.decode(memoryview(blob))  # native disabled
    monkeypatch.setattr(native_mod, "_FUNCS", None)  # re-enable
    be_nat, data_nat = fsst.decode(memoryview(blob))
    monkeypatch.setattr(native_mod, "_FUNCS", {})
    np.testing.assert_array_equal(be_py, be_nat)
    np.testing.assert_array_equal(np.asarray(data_py), np.asarray(data_nat))
    assert bytes(data_nat) == data


def test_fsst_decode_truncated_escape_guard():
    """A corrupt payload whose LAST code byte is 0xFF (an escape with
    no literal) must be rejected (-1) by both C walks, not read one
    byte out of bounds."""
    import ctypes

    nat = native_mod.get()
    sym_len = np.ones(256, dtype=np.int32)
    codes = np.array([1, 2, 255], dtype=np.uint8)  # trailing escape
    assert nat["fsst_decoded_size"](codes, ctypes.c_long(3), sym_len) == -1

    code_off = np.array([0, 3], dtype=np.int64)
    table = np.zeros(256 * 8, dtype=np.uint8)
    out = np.empty(64, dtype=np.uint8)
    byte_ends = np.zeros(1, dtype=np.int64)
    got = nat["fsst_decode_block"](
        codes, code_off, ctypes.c_long(1), table, sym_len, out,
        ctypes.c_long(64), byte_ends,
    )
    assert got == -1
