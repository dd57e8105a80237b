"""bitio oracles ported from the reference bitstream tests
(/root/reference/src/bitstream.rs:212-283)."""

import numpy as np
import pytest

from chimp_spark.bitio import (
    BitReader,
    BitWriter,
    bytes_to_words,
    pack_bits,
    unpack_fields,
    words_to_bytes,
)


def test_write_bit_msb_first():
    # bitstream.rs:216-226: eight alternating bits -> 0b0101_0101 << 56
    w = BitWriter()
    for i in range(8):
        w.write_bit(i % 2)
    words, total = w.close()
    assert total == 8
    assert words[0] == np.uint64(0b0101_0101) << np.uint64(56)


def test_write_and_close_reference_vector():
    # bitstream.rs:235-270
    w = BitWriter()
    for i in range(8):
        w.write_bit(i % 3)  # 0100_1001
    w.write_bits(1, 4)
    w.write_bits(0, 16)
    w.write_bits(25, 5)
    w.write_bits(69, 7)
    w.write_bit(1)
    w.write_bits(0b1000_1110, 8)
    w.write_bits(0b0100_1001, 8)
    w.write_bits(0b0000_0110, 8)
    w.write_bit(1)
    w.write_bits(0b101, 3)
    words, _ = w.close()
    assert words.size == 2  # bitstream.rs:260

    r = BitReader(words)
    assert r.read_bits(4) == 0b0100
    assert r.read_bits(1) == 0b1
    assert r.read_bits(1) == 0b0
    assert r.read_bits(2) == 0b01
    assert r.read_bits(4) == 1
    assert r.read_bits(21) == 0b11001


def test_write_read_f64_roundtrip():
    # bitstream.rs:272-282
    w = BitWriter()
    fbits = np.float64(1.0).view(np.uint64)
    w.write_bits(int(fbits), 64)
    w.write_bits(0b1011, 4)
    words, _ = w.close()
    r = BitReader(words)
    assert r.read_bits(64) == int(fbits)
    assert r.read_bits(4) == 0b1011
    assert r.read_bits(60) == 0  # zero padding


def test_pack_unpack_random_fields():
    rng = np.random.default_rng(42)
    n = 5000
    nbits = rng.integers(0, 65, n).astype(np.uint64)
    vals = rng.integers(0, 2**63, n, dtype=np.uint64)
    words, total = pack_bits(vals, nbits)
    assert total == int(nbits.sum())

    keep = nbits > 0
    ends = np.cumsum(nbits)
    offsets = (ends - nbits)[keep]
    got = unpack_fields(words, offsets, nbits[keep])
    from chimp_spark.bitio import MASKS

    expect = vals[keep] & MASKS[np.minimum(nbits[keep], 64).astype(np.int64)]
    np.testing.assert_array_equal(got, expect)

    # sequential reader agrees
    r = BitReader(words)
    for v, nb in zip(expect.tolist(), nbits[keep].tolist()):
        assert r.read_bits(int(nb)) == int(v)


def test_bytes_roundtrip_bigendian():
    words = np.array([0x0123456789ABCDEF, 0xFEDCBA9876543210], dtype=np.uint64)
    buf = words_to_bytes(words)
    assert buf[:8] == bytes([0x01, 0x23, 0x45, 0x67, 0x89, 0xAB, 0xCD, 0xEF])
    np.testing.assert_array_equal(bytes_to_words(buf), words)


def test_reader_eof():
    words, _ = pack_bits(np.array([1], dtype=np.uint64), np.array([4], dtype=np.uint64))
    r = BitReader(words)
    r.read_bits(64)
    with pytest.raises(EOFError):
        r.read_bits(1)
