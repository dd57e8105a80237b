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


def _jpeg_bytes(w: int, h: int) -> bytes:
    """Minimal real JPEG container: SOI + SOF0 (ITU T.81 B.2.2) + EOI."""
    sof = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03" + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00"
    )
    return b"\xff\xd8" + sof + b"\xff\xd9"


def _png_bytes(w: int, h: int) -> bytes:
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR" + ihdr + b"\0\0\0\0"
    )


def test_image_header_parse_real_bytes(spark):
    """Header parsing runs on REAL container bytes (JPEG SOF0, PNG
    IHDR, GIF LSD) — no stub involved."""
    assert M.parse_image_header(_jpeg_bytes(320, 240)) == ("image/jpeg", 320, 240)
    assert M.parse_image_header(_png_bytes(64, 48)) == ("image/png", 64, 48)
    gif = b"GIF89a" + (12).to_bytes(2, "little") + (34).to_bytes(2, "little")
    assert M.parse_image_header(gif + b"\0" * 4) == ("image/gif", 12, 34)
    assert M.parse_image_header(b"not an image at all") is None

    rows = [
        (1, _jpeg_bytes(100, 50)), (2, _png_bytes(7, 9)), (3, b"garbage"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: (r["mime"], r["width"], r["height"])
           for r in M.image_metadata(df).collect()}
    assert out[1] == ("image/jpeg", 100, 50)
    assert out[2] == ("image/png", 7, 9)
    assert out[3] == (None, None, None)


def test_pillow_gate_falls_back_to_stub():
    """decode_image dispatches to Pillow when importable; in this
    container it must fall back to the deterministic stub."""
    img = M.decode_image(b"\x01\x02\x03", 4, 3)
    assert img.shape == (3, 4, 3) and img.dtype == np.uint8
    if M._pillow_or_none() is None:
        img2 = M.decode_image(b"\x01\x02\x03", 4, 3)
        np.testing.assert_array_equal(img, img2)


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


def test_jpeg_header_with_fill_bytes():
    """ITU T.81 B.1.1.2 allows 0xFF fill bytes before any marker; the
    scanner must still find SOF0 (review-found misparse)."""
    sof = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (240).to_bytes(2, "big") + (320).to_bytes(2, "big")
        + b"\x03" + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00"
    )
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\0" * 9
    jpg = b"\xff\xd8" + b"\xff" + app0 + b"\xff\xff" + sof + b"\xff\xd9"
    assert M.parse_image_header(jpg) == ("image/jpeg", 320, 240)


def test_video_frame_sample_plumbing(spark, media):
    """One input row explodes to duration_ms // every_ms frame rows
    with deterministic timestamps and per-frame luma features; the
    explosion is independent of partition layout."""
    vids = media.filter(F.col("kind") == "video")
    out = M.video_frame_sample(vids, every_ms=500)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r)
    src = {r["media_id"]: r["duration_ms"] for r in vids.collect()}
    assert set(per) == set(src)
    for mid, frames in per.items():
        assert len(frames) == max(src[mid] // 500, 1)
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(frames)))
        for f in frames:
            assert f["ts_ms"] == f["frame_idx"] * 500
            assert 0.0 <= f["luma_mean"] <= 255.0
    # layout independence
    again = {(r["media_id"], r["frame_idx"]): r["luma_mean"]
             for r in M.video_frame_sample(vids.repartition(7), every_ms=500).collect()}
    first = {(r["media_id"], r["frame_idx"]): r["luma_mean"] for r in rows}
    assert first == again
    with pytest.raises(ValueError, match="every_ms"):
        M.video_frame_sample(vids, every_ms=0)


def test_binary_offsets_native_width():
    """large_binary (int64 offsets — what useLargeVarTypes delivers)
    must be read at its NATIVE width, never down-cast: the cast raises
    ArrowInvalid on batches whose payload bytes exceed 2 GiB, the very
    case large offsets exist for. Sliced arrays must honor offset."""
    import pyarrow as pa

    vals = [b"abc", None, b"defgh", b"", b"xy"]
    for typ, dt in ((pa.binary(), np.int32), (pa.large_binary(), np.int64)):
        arr = pa.array(vals, typ)
        offs = M._binary_offsets(arr)
        assert offs.dtype == dt
        assert list(offs) == [0, 3, 3, 8, 8, 10]
        assert list(M._binary_offsets(arr.slice(2, 3))) == [3, 8, 8, 10]


def test_media_kernels_under_large_var_types(spark, media):
    """image_metadata and video_frame_sample must produce identical
    results when Spark hands the kernels large_binary batches."""
    imgs = media.filter(F.col("kind") == "image")
    vids = media.filter(F.col("kind") == "video")
    base_meta = {r["media_id"]: (r["mime"], r["width"], r["height"])
                 for r in M.image_metadata(imgs).collect()}
    base_frames = {(r["media_id"], r["frame_idx"]): r["luma_mean"]
                   for r in M.video_frame_sample(vids).collect()}
    spark.conf.set("spark.sql.execution.arrow.useLargeVarTypes", "true")
    try:
        lv_meta = {r["media_id"]: (r["mime"], r["width"], r["height"])
                   for r in M.image_metadata(imgs).collect()}
        lv_frames = {(r["media_id"], r["frame_idx"]): r["luma_mean"]
                     for r in M.video_frame_sample(vids).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.useLargeVarTypes", "false")
    assert lv_meta == base_meta
    assert lv_frames == base_frames
