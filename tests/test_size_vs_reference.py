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


def _city_temperature_like(n_cities: int = 40, days: int = 400, seed: int = 11) -> np.ndarray:
    """Synthesize the reference's stripped city_temperature.csv shape
    (main.rs:17-28: AvgTemperature, one decimal place, seasonal series
    per city) — widens parity evidence beyond SSD_HDD_benchmarks.csv."""
    rng = np.random.default_rng(seed)
    out = []
    for c in range(n_cities):
        base = rng.uniform(-5, 25)
        amp = rng.uniform(5, 20)
        t = np.arange(days)
        series = base + amp * np.sin(2 * np.pi * (t + rng.uniform(0, 365)) / 365.25)
        series += rng.normal(0, 2.0, days)
        out.append(np.round(series, 1))  # one decimal, like the CSV
    # CSV-parsed text never yields -0.0; rounding negatives near zero
    # does — normalize (+0.0 == -0.0 + 0.0) to match the CSV shape
    return np.concatenate(out) + 0.0


def test_auto_beats_reference_on_city_temperature_series():
    """Low-decimal seasonal temperatures: the reference's best codec
    vs our auto selection (dec_for should detect the 1-decimal grid
    and win outright), decode bit-identical."""
    import pyarrow as pa

    vals = _city_temperature_like()
    bits = vals.view(np.uint64)
    ref_bytes, ref_codec = _reference_best_bytes(bits)
    blob, meta = framing.encode_chunk(pa.array(vals), codec="auto")
    assert meta.enc_bytes <= ref_bytes, (
        f"ours={meta.enc_bytes} ({meta.codec}) > ref={ref_bytes} ({ref_codec})"
    )
    assert meta.codec == "dec_for", meta.reason  # 1-decimal grid detected
    assert meta.enc_bytes * 8 / meta.n < 14  # ~half the best XOR codec
    out = framing.decode_chunk(blob, pa.float64())
    np.testing.assert_array_equal(np.asarray(out).view(np.uint64), bits)
