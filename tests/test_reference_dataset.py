"""Round-trip + ratio accounting on the reference's own benchmark
dataset (the one of main.rs:17-28's three CSVs shipped in the sandbox:
SSD_HDD_benchmarks.csv, float column index 2 == 'val').

Mirrors the reference harness semantics: encode -> decode ->
assert_eq (main.rs:102,136,239), and bits/value computed over the
word-padded sentinel-terminated stream (main.rs:91,121,206) — the
number directly comparable to what the Rust binary prints.
"""

import csv
import json
import os

import numpy as np
import pytest

from chimp_spark.codecs import xor_ref as X

CSV_PATH = "/root/reference/datasets/SSD_HDD_benchmarks.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CSV_PATH), reason="reference dataset not present"
)


@pytest.fixture(scope="module")
def values():
    vals = []
    with open(CSV_PATH) as f:
        reader = csv.reader(f)
        next(reader)  # header
        for row in reader:
            vals.append(float(row[2]))  # float_idx 2, main.rs:23
    return np.array(vals, dtype=np.float64)


CODECS = {
    "chimp": (X.chimp_encode, X.chimp_decode),
    "chimpn": (X.chimpn_encode, X.chimpn_decode),
    "gorilla": (X.gorilla_encode, X.gorilla_decode),
    "patas": (X.patas_encode, X.patas_decode),
}


@pytest.mark.parametrize("codec", CODECS)
def test_reference_dataset_roundtrip(values, codec):
    enc, dec = CODECS[codec]
    bits = values.view(np.uint64)
    kwargs = {"fixed": False} if codec == "patas" else {}
    words, total_bits = enc(bits, reference_close=True, **kwargs)
    out = dec(words, sentinel=True)
    np.testing.assert_array_equal(out, bits)  # assert_eq!, main.rs:239
    bpv = total_bits / values.size
    assert bpv < 64  # every codec compresses this dataset
    # persist the comparable numbers for BENCH/BASELINE.md
    record = {"codec": codec, "rows": int(values.size), "bits_per_value": round(bpv, 3)}
    path = "/tmp/reference_dataset_bits.jsonl"
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def test_codec_ordering_matches_paper_claims(values):
    """Chimp128 <= Chimp on real data; Chimp < Gorilla (VLDB'22 claim,
    README.md:2 link)."""
    bits = values.view(np.uint64)
    sizes = {}
    for name, (enc, _dec) in CODECS.items():
        kwargs = {"fixed": False} if name == "patas" else {}
        _w, nbits = enc(bits, reference_close=True, **kwargs)
        sizes[name] = nbits
    assert sizes["chimpn"] <= sizes["chimp"]
    assert sizes["chimp"] < sizes["gorilla"]
