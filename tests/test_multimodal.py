"""Multimodal plumbing tests: schemas, batch shapes, determinism.
Decoders are stubs (no media libs in this container) — what's under
test is the Spark/Arrow machinery around them."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chimp_spark import engine
from chimp_spark.ops import multimodal as M


@pytest.fixture(scope="module")
def spark():
    s = engine.get_spark(cpus=4, app="mm_tests", chunk_rows=4096)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def media(spark):
    return M.synthetic_media_df(spark, n=100).cache()


def test_image_features_shape_and_determinism(spark, media):
    imgs = media.filter(F.col("kind") == "image")
    f1 = {r["media_id"]: tuple(r["feat"]) for r in M.image_features(imgs).collect()}
    f2 = {
        r["media_id"]: tuple(r["feat"])
        for r in M.image_features(imgs.repartition(5)).collect()
    }
    assert f1 == f2  # stable across partitionings
    dim = 8 * 8 * 3 + 6
    assert all(len(v) == dim for v in f1.values())
    assert len(f1) == imgs.count()


def test_audio_frames(spark, media):
    auds = media.filter(F.col("kind") == "audio")
    frames = M.audio_frames(auds, frame_ms=250)
    rows = frames.collect()
    assert len(rows) > 0
    per_doc = frames.groupBy("media_id").count().collect()
    meta = {r["media_id"]: r["duration_ms"] for r in auds.collect()}
    for r in per_doc:
        assert r["count"] == meta[r["media_id"]] // 250
    assert all(np.isfinite(r["rms"]) and r["rms"] >= 0 for r in rows)


def test_media_encodes_through_engine(spark, media):
    """Binary payload columns flow through the codec engine like any
    other column (opaque binary + typed metadata)."""
    enc = engine.encode_dataframe(
        media, ["media_id", "payload", "mime", "width"], chunk_rows=64,
        table_name="media",
    )
    dec = engine.decode_table(
        enc, ["media_id", "payload", "mime", "width"],
        "media_id long, payload binary, mime string, width int",
    )
    lhs = media.select("media_id", "payload", "mime", "width")
    assert lhs.exceptAll(dec.select("media_id", "payload", "mime", "width")).isEmpty()
