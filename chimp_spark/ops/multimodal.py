"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, chunked UDF
signatures, partition-size control for large blobs — is real and
tested. The actual media decoding (JPEG/PNG decode, audio PCM decode,
video frame extraction) is STUBBED behind ``_decode_image_stub`` /
``_decode_audio_stub``: this container ships no image/audio libraries,
so the stubs produce deterministic fakes derived from the bytes
(stable across runs/partitionings). Swap the stub for Pillow/ffmpeg
in ``DECODERS`` and nothing else changes.

Why mapInArrow and not per-row UDFs: media blobs are large; Arrow
moves them JVM->Python zero-copy per batch, and the kernel controls
batch memory via the engine's maxRecordsPerBatch session config.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

MEDIA_DDL = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, sample_rate int, duration_ms int"
)


def _binary_offsets(arr: pa.Array) -> np.ndarray:
    """Value offsets of a binary array at its NATIVE width: int64 for
    large_binary (what Spark delivers with useLargeVarTypes — the very
    batches whose payload bytes can exceed 2 GiB), int32 otherwise.
    Casting large_binary down to binary would raise ArrowInvalid on
    exactly those >2 GiB batches, so we never cast — we read the
    offsets buffer as the type says."""
    bufs = arr.buffers()
    dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    return np.frombuffer(bufs[1], dtype=dt)[arr.offset : arr.offset + len(arr) + 1]


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB (no image libs in this container): deterministic fake
    decode -> (height, width, 3) uint8 derived from the payload bytes.
    Replace with PIL.Image.open for real data."""
    if width <= 0 or height <= 0:
        raise ValueError("image metadata missing")
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)


def _decode_audio_stub(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    """STUB: deterministic fake PCM float32 mono derived from payload."""
    n = max(int(sample_rate * duration_ms / 1000), 1)
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """REAL container-format header parse (no image libs needed):
    (mime, width, height) for JPEG/PNG/GIF bytes, None if unknown.

    Public formats: PNG IHDR (RFC 2083 §3.1), JPEG SOFn segments
    (ITU T.81 §B.2.2), GIF logical screen descriptor."""
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("image/png", w, h)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return ("image/gif", w, h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        pos = 2
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                pos += 1
                continue
            # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may
            # precede a marker — the marker is the first non-FF byte
            mpos = pos + 1
            while mpos < len(payload) and payload[mpos] == 0xFF:
                mpos += 1
            if mpos >= len(payload):
                break
            marker = payload[mpos]
            if marker == 0xD9:  # EOI: no SOF seen
                break
            if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
                pos = mpos + 1  # standalone markers have no length
                continue
            if mpos + 3 > len(payload):
                break
            seg_len = int.from_bytes(payload[mpos + 1 : mpos + 3], "big")
            if marker in sof and mpos + 8 <= len(payload):
                h = int.from_bytes(payload[mpos + 4 : mpos + 6], "big")
                w = int.from_bytes(payload[mpos + 6 : mpos + 8], "big")
                return ("image/jpeg", w, h)
            pos = mpos + 1 + seg_len
        return ("image/jpeg", 0, 0)
    return None


def _pillow_or_none():
    """Feature-flagged real decoder: Pillow when importable (not in
    this container), else None -> callers fall back to the stub."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real decode via Pillow when available; deterministic stub
    otherwise (documented — the sandbox ships no media libs)."""
    pil = _pillow_or_none()
    if pil is not None:
        import io

        return np.asarray(pil.open(io.BytesIO(payload)).convert("RGB"))
    return _decode_image_stub(payload, width, height)


DECODERS = {"image": decode_image, "audio": _decode_audio_stub}


def image_metadata(df: DataFrame) -> DataFrame:
    """Extract (mime, width, height) from REAL payload bytes via
    container-header parsing — no decode, no image libs; one Arrow
    batch at a time. Unknown formats yield nulls."""
    from .. import _ship

    _ship.ensure(df.sparkSession)

    _HEAD = 1 << 20  # headers live in the first segments; a JPEG
    # metadata segment caps at 64 KiB, so 1 MiB bounds any realistic
    # pre-SOF run — and bounds the per-row copy (a multi-GB video
    # blob would otherwise be materialized whole just to read 24 bytes)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("media_id")
            payloads = b.column("payload")
            bufs = payloads.buffers()
            offs = _binary_offsets(payloads)
            data = memoryview(bufs[2]).cast("B") if bufs[2] is not None else memoryview(b"")
            valid = np.asarray(payloads.is_valid())
            mimes, ws, hs = [], [], []
            for i in range(b.num_rows):
                if not valid[i]:
                    parsed = None
                else:
                    lo = int(offs[i])
                    hi = min(int(offs[i + 1]), lo + _HEAD)
                    parsed = parse_image_header(bytes(data[lo:hi]))
                if parsed is None:
                    mimes.append(None), ws.append(None), hs.append(None)
                else:
                    mimes.append(parsed[0]), ws.append(parsed[1]), hs.append(parsed[2])
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(mimes, pa.string()), pa.array(ws, pa.int32()),
                 pa.array(hs, pa.int32())],
                names=["media_id", "mime", "width", "height"],
            )

    return df.select("media_id", "payload").mapInArrow(
        kernel, "media_id long, mime string, width int, height int"
    )


def image_features(df: DataFrame, target: tuple[int, int] = (8, 8)) -> DataFrame:
    """Decode (stub) -> resize (real numpy striding) -> per-channel
    mean/std features. Output: media_id, feat array<float> of
    target_h*target_w*3 + 6 summary floats."""
    from .. import _ship

    _ship.ensure(df.sparkSession)
    th, tw = target

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("media_id")
            payloads = b.column("payload")
            ws = b.column("width")
            hs = b.column("height")
            feats: list[np.ndarray | None] = []
            dim = th * tw * 3 + 6
            for i in range(b.num_rows):
                p = payloads[i].as_py()
                w = ws[i].as_py()
                h = hs[i].as_py()
                if p is None or not w or not h:
                    # null payload/metadata -> null feature row; the
                    # old path crashed the whole batch on 'None <= 0'
                    feats.append(None)
                    continue
                img = decode_image(p, w, h)
                # nearest-neighbor resize via index striding (real)
                yy = (np.arange(th) * img.shape[0] // th).astype(np.int64)
                xx = (np.arange(tw) * img.shape[1] // tw).astype(np.int64)
                small = img[yy][:, xx].astype(np.float32) / 255.0
                summary = np.concatenate(
                    [img.mean(axis=(0, 1)) / 255.0, img.std(axis=(0, 1)) / 255.0]
                ).astype(np.float32)
                feats.append(np.concatenate([small.ravel(), summary]))
            if any(f is None for f in feats):
                arr = pa.array(
                    [None if f is None else f.tolist() for f in feats],
                    pa.list_(pa.float32()),
                )
            else:
                arr = pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(feats) if feats else np.zeros(0, np.float32)),
                    dim,
                ).cast(pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays([ids, arr], names=["media_id", "feat"])

    return df.select("media_id", "payload", "width", "height").mapInArrow(
        kernel, "media_id long, feat array<float>"
    )


def audio_frames(df: DataFrame, frame_ms: int = 250) -> DataFrame:
    """Decode (stub) -> fixed-window frame energy (real vectorized
    framing). Output one row per frame: media_id, frame_idx, rms."""
    from .. import _ship

    _ship.ensure(df.sparkSession)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            out_id, out_frame, out_rms = [], [], []
            for i in range(b.num_rows):
                payload = b.column("payload")[i].as_py()
                sr = b.column("sample_rate")[i].as_py()
                dur = b.column("duration_ms")[i].as_py()
                if payload is None or not sr or not dur:
                    continue  # null media row -> no frames, not a crash
                pcm = _decode_audio_stub(payload, sr, dur)
                spf = max(int(sr * frame_ms / 1000), 1)
                nfr = len(pcm) // spf
                if nfr:
                    mat = pcm[: nfr * spf].reshape(nfr, spf)
                    rms = np.sqrt((mat.astype(np.float64) ** 2).mean(axis=1))
                    mid = b.column("media_id")[i].as_py()
                    out_id.extend([mid] * nfr)
                    out_frame.extend(range(nfr))
                    out_rms.extend(rms.tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, pa.int64()),
                    pa.array(out_frame, pa.int32()),
                    pa.array(out_rms, pa.float64()),
                ],
                names=["media_id", "frame_idx", "rms"],
            )

    return df.select("media_id", "payload", "sample_rate", "duration_ms").mapInArrow(
        kernel, "media_id long, frame_idx int, rms double"
    )


def _av_or_none():
    """Feature-flagged real video decoder: PyAV when importable (not
    in this container), else None -> callers fall back to the stub."""
    try:
        import av  # noqa: F401

        return av
    except Exception:
        return None


def _decode_video_frame_stub(payload: bytes, width: int, height: int,
                             ts_ms: int) -> np.ndarray:
    """STUB (no video libs in this container): deterministic fake
    frame at timestamp ts_ms -> (height, width, 3) uint8 derived from
    (payload bytes, ts). Replace with PyAV/ffmpeg seek+decode."""
    if width <= 0 or height <= 0:
        raise ValueError("video metadata missing")
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed) ^ (ts_ms * 2654435761 % (1 << 63)))
    return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)


def video_frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Fixed-interval frame sampling over video payloads: ONE input
    row explodes to one output row per sampled frame (media_id,
    frame_idx, ts_ms, luma_mean, luma_std). The Spark-side plumbing —
    per-frame row explosion inside mapInArrow, bounded output batches,
    deterministic frame timestamps independent of partitioning — is
    real and tested; the pixel decode is the documented stub (PyAV
    gate in _av_or_none; this container ships no media libs)."""
    from .. import _ship

    _ship.ensure(df.sparkSession)
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            out_id, out_idx, out_ts, out_mean, out_std = [], [], [], [], []
            ids = b.column("media_id")
            payloads = b.column("payload")
            ws = b.column("width")
            hs = b.column("height")
            durs = b.column("duration_ms")
            # bounded head reads (the stub only seeds off the first 8
            # bytes): slice the flat arrow buffer instead of .as_py()ing
            # whole payloads — a multi-GB video blob must never be
            # materialized per row (same pattern as image_metadata);
            # when a real PyAV decoder that needs full bytes lands, it
            # should stream from the buffer, not copy it
            bufs = payloads.buffers()
            offs = _binary_offsets(payloads)
            data = memoryview(bufs[2]).cast("B") if bufs[2] is not None else memoryview(b"")
            valid = np.asarray(payloads.is_valid())
            for i in range(b.num_rows):
                dur = durs[i].as_py() or 0
                n_frames = max(dur // every_ms, 1)
                lo = int(offs[i])
                hi = min(int(offs[i + 1]), lo + 8)
                payload = bytes(data[lo:hi]) if valid[i] else b""
                w = ws[i].as_py() or 0
                h = hs[i].as_py() or 0
                for fi in range(n_frames):
                    ts = fi * every_ms
                    frame = _decode_video_frame_stub(payload, w, h, ts)
                    # ITU-R BT.601 luma — the real feature math the
                    # stubbed decode feeds into
                    luma = (0.299 * frame[:, :, 0] + 0.587 * frame[:, :, 1]
                            + 0.114 * frame[:, :, 2])
                    out_id.append(ids[i].as_py())
                    out_idx.append(fi)
                    out_ts.append(ts)
                    out_mean.append(float(luma.mean()))
                    out_std.append(float(luma.std()))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_id, pa.int64()), pa.array(out_idx, pa.int32()),
                 pa.array(out_ts, pa.int32()), pa.array(out_mean, pa.float64()),
                 pa.array(out_std, pa.float64())],
                names=["media_id", "frame_idx", "ts_ms", "luma_mean", "luma_std"],
            )

    return df.select("media_id", "payload", "width", "height", "duration_ms").mapInArrow(
        kernel, "media_id long, frame_idx int, ts_ms int, luma_mean double, luma_std double"
    )


def synthetic_media_df(spark, n: int = 200, seed: int = 5) -> DataFrame:
    """Deterministic media table for the plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = rng.bytes(64)
        if kind == "image":
            rows.append((i, kind, payload, "image/fake", 32 + int(rng.integers(0, 32)),
                         24 + int(rng.integers(0, 24)), 0, 0))
        elif kind == "audio":
            rows.append((i, kind, payload, "audio/fake", 0, 0, 16_000,
                         500 + int(rng.integers(0, 1500))))
        else:
            rows.append((i, kind, payload, "video/fake", 64, 48, 0,
                         1000 + int(rng.integers(0, 5000))))
    return spark.createDataFrame(rows, MEDIA_DDL)
