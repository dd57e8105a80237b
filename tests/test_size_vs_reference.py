"""North-rule size criterion: compressed size <= the reference's.

For each real float column, the reference's best achievable size is
the minimum over its four codecs with its own accounting (sentinel +
word padding, main.rs:91/121/206 — reproduced bit-exactly by our
reference_close mode). The engine's auto-selected frame must not
exceed it; in practice dec_for/xor_split beat it outright.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from chimp_spark import framing
from chimp_spark.codecs import xor_ref as X

SF = "/root/testdata/sf0.01"

COLUMNS = [
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_discount"),
    ("customer", "c_acctbal"),
    ("orders", "o_totalprice"),
    ("events", "value"),
    ("part", "p_retailprice"),
]


def _reference_best_bytes(bits: np.ndarray) -> tuple[int, str]:
    sizes = {}
    for name, enc in [
        ("chimp", X.chimp_encode),
        ("chimpn", X.chimpn_encode),
        ("gorilla", X.gorilla_encode),
        ("patas", lambda b, reference_close: X.patas_encode(b, reference_close, fixed=False)),
    ]:
        _w, nbits = enc(bits, reference_close=True)
        sizes[name] = nbits // 8
    best = min(sizes, key=sizes.get)
    return sizes[best], best


@pytest.mark.parametrize("table,column", COLUMNS)
def test_auto_frame_not_larger_than_reference(table, column):
    arr = pq.read_table(f"{SF}/{table}.parquet").column(column).combine_chunks()
    bits = np.asarray(arr, dtype=np.float64).view(np.uint64)
    ref_bytes, ref_codec = _reference_best_bytes(bits)
    blob, meta = framing.encode_chunk(arr, codec="auto")
    # frame includes our 16-byte header and no sentinel
    assert meta.enc_bytes <= ref_bytes, (
        f"{table}.{column}: ours={meta.enc_bytes} ({meta.codec}) "
        f"> reference best={ref_bytes} ({ref_codec})"
    )
    # decode stays bit-identical
    out = framing.decode_chunk(blob, arr.type)
    np.testing.assert_array_equal(
        np.asarray(out, dtype=np.float64).view(np.uint64), bits
    )
