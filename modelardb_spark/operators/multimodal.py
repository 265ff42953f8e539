"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched `mapInPandas`.

The Spark-side contract — schema, partition-preserving UDF shape,
batch iteration, metadata propagation — is real and tested; the actual
codec step is stubbed (this container ships no image/audio libraries)
behind `decode_stub`, which either raises NotImplementedError
(`strict=True`) or produces a deterministic fake feature vector so the
distributed plumbing can be exercised end-to-end.

At 100 TB the design notes that matter:
- binary payloads never enter a shuffle: feature extraction is a
  map-only stage (mapInPandas) running where the bytes were read;
- only the small feature/metadata output is shuffled or joined;
- `spark.sql.files.maxPartitionBytes` bounds task memory because each
  Arrow batch holds at most a few hundred blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha_prefix", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synthetic_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: the text
    bytes stand in for an encoded payload."""
    from modelardb_spark.operators.scanpar import fan_out

    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    # the downstream feature extraction hashes every payload in Python:
    # fan the single-split documents scan out first
    docs = fan_out(docs, "doc_id")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("doc_id") % 640 + 16).cast("long").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("long").alias("height"),
        (F.col("doc_id") * 40 % 60_000).cast("long").alias("duration_ms"),
    )


def decode_stub(payload: bytes, kind: str, dim: int = 8, strict: bool = False) -> np.ndarray:
    """STUB for the real decoder (PIL/librosa/ffmpeg are not in this
    container). strict=True raises like a missing codec would; default
    returns a deterministic md5-derived feature vector so the Spark
    plumbing is testable."""
    if strict:
        raise NotImplementedError(
            f"real {kind} decoding requires codec libraries not present here"
        )
    digest = hashlib.md5(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 0xFFFFFFFF).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Map-only feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(bytes(p), k, dim)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "sha_prefix": [
                        hashlib.sha256(bytes(p)).hexdigest()[:16] for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video into the frame
    timestamps a decoder would extract — pure JVM sequence/explode; the
    decode itself is the stubbed step."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )


# ---------------------------------------------------------------------------
# Real container codecs (pure stdlib: zlib + struct): PNG grayscale and
# PCM-16 WAV are fully encodable/decodable without external libraries,
# so the engine's multimodal path is REAL end-to-end for these formats
# — binary in, distributed header parse + pixel/sample decode, features
# out. JPEG gets a real header parser (marker walk → SOF geometry —
# works on any real JPEG file); only full JPEG pixel decode and real
# video codecs (MP4 etc.) remain behind `decode_stub`.
# ---------------------------------------------------------------------------

import struct
import zlib


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """Minimal valid grayscale 8-bit PNG (signature, IHDR, one IDAT
    with filter-0 scanlines, IEND; correct CRCs). Any PNG reader can
    open the output."""
    h, w = pixels.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + pixels[r].astype(np.uint8).tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png_gray(data: bytes) -> np.ndarray:
    """Decode a filter-0 grayscale PNG back to its pixel matrix."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    rows = [
        np.frombuffer(raw[r * (w + 1) + 1 : (r + 1) * (w + 1)], dtype=np.uint8)
        for r in range(h)
    ]
    return np.stack(rows)


def parse_png_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR — the header-only fast path a
    metadata scan uses (no pixel decompression)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n" or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    return struct.unpack(">II", data[16:24])


# JFIF marker-stream geometry. Full JPEG pixel decode (DCT + Huffman)
# stays behind `decode_stub` — the external-codec boundary — but the
# header scan is pure marker arithmetic and works on ANY real JPEG:
# walk FF-prefixed segments, skip by each segment's big-endian length,
# stop at the first start-of-frame and read precision/height/width.
_JPEG_SOF = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)


def parse_jpeg_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the first SOFn segment of a JPEG/JFIF
    stream. Handles fill bytes, standalone markers (TEM/RSTn), and any
    APPn/DQT/DHT/COM segments before the frame header."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: frame header must precede
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            _prec, h, w = struct.unpack(">BHH", data[pos + 4 : pos + 9])
            return w, h
        pos += 2 + seg_len
    raise ValueError("no JPEG frame header (SOF) found")


def encode_jpeg_shell(pixels: np.ndarray) -> bytes:
    """Structurally valid baseline-JPEG stream (SOI, JFIF APP0, DQT,
    SOF0 with the REAL geometry, DHT, SOS, FF-stuffed entropy bytes,
    EOI) carrying the pixel bytes as its entropy segment. This is a
    container writer, not a pixel codec — the entropy data is not real
    Huffman/DCT output, so only header parsing (geometry, marker walk)
    is meaningful on it; pixel decode stays behind `decode_stub`."""
    h, w = pixels.shape

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    # one-symbol DC table (counts for code lengths 1..16, then symbols)
    dht = seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    entropy = pixels.astype(np.uint8).tobytes().replace(b"\xff", b"\xff\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + dht + sos + entropy + b"\xff\xd9"


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal valid mono PCM-16 WAV (RIFF/fmt/data)."""
    body = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav_pcm16(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, samples) from a mono PCM-16 WAV."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate, samples = None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            rate = struct.unpack("<I", body[4:8])[0]
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + ln
    return rate, samples


def synthetic_media_encoded(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Media table with REAL container payloads derived from the
    documents: images are valid grayscale PNGs (text bytes tiled into
    a (h, w) grid), audio is valid PCM-16 WAV (one sample per text
    byte), video stays an opaque fake (no stdlib container). Encoding
    is itself a map-only mapInPandas stage — at scale this is the
    write half of the same binary-column pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "mime", "payload",
                                    "width", "height", "duration_ms")}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                b = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8)
                kind = ("image", "audio", "video")[did % 3]
                if kind == "image":
                    w, h = did % 48 + 8, did % 32 + 8
                    px = np.resize(b if b.size else np.zeros(1, np.uint8), (h, w))
                    if did % 6 == 3:
                        # every other image row is a JPEG marker stream
                        # (same geometry formulas) so the decode side
                        # exercises the JFIF header walk, not just PNG
                        payload, mime = encode_jpeg_shell(px), "image/jpeg"
                    else:
                        payload, mime = encode_png_gray(px), "image/png"
                    dur = None
                elif kind == "audio":
                    samples = (b.astype(np.int16) - 128) * 256
                    payload, mime = encode_wav_pcm16(samples, 8000), "audio/wav"
                    w = h = None
                    dur = int(round(samples.size * 1000 / 8000))
                else:
                    # REAL multi-frame container (MDBV of PNG frames)
                    fh, fw = did % 6 + 4, did % 8 + 4
                    n_frames = did % 5 + 1
                    base = b if b.size else np.zeros(1, np.uint8)
                    frames = [
                        np.resize(base + np.uint8(i), (fh, fw))
                        for i in range(n_frames)
                    ]
                    payload = encode_video_png_frames(frames, fps=4)
                    mime = "video/x-mdbv-png"
                    w, h = fw, fh
                    dur = n_frames * 1000 // 4
                rows["media_id"].append(did)
                rows["kind"].append(kind)
                rows["mime"].append(mime)
                rows["payload"].append(payload)
                rows["width"].append(w if kind in ("image", "video") else None)
                rows["height"].append(h if kind in ("image", "video") else None)
                rows["duration_ms"].append(dur)
            yield pd.DataFrame(rows)

    from modelardb_spark.operators.scanpar import fan_out

    # per-row container encoding is pure Python CPU: fan the (single-
    # split) documents scan out so encode AND the downstream map-only
    # decode run at session parallelism instead of one task
    return fan_out(docs.select("doc_id", "text"), "doc_id").mapInPandas(
        run, MEDIA_SCHEMA
    )


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("content_mean", FloatType(), True),
    ]
)


def media_decode(media: DataFrame) -> DataFrame:
    """REAL distributed decode over the binary column: PNG headers +
    pixels, JPEG headers (marker walk), WAV headers + samples, and MDBV
    video frames parse in a map-only mapInPandas stage (payloads never
    shuffle; only the small decoded-metadata frame leaves the stage).
    JPEG pixel content stays NULL — the honest boundary where an
    external codec would plug in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "width", "height",
                                   "sample_rate", "n_samples", "n_frames",
                                   "duration_ms", "content_mean")}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                data = bytes(payload)
                w = h = rate = n = nf = dur = mean = None
                if kind == "image":
                    if data[:2] == b"\xff\xd8":
                        # real JFIF marker walk; pixel decode of JPEG is
                        # the documented external-codec boundary, so
                        # content_mean stays NULL for these rows
                        w, h = parse_jpeg_header(data)
                    else:
                        w, h = parse_png_header(data)
                        px = decode_png_gray(data)
                        mean = float(np.round(px.astype(np.float64).mean(), 4))
                elif kind == "audio":
                    rate, samples = decode_wav_pcm16(data)
                    n = int(samples.size)
                    dur = n * 1000 // rate if rate else None
                    mean = (
                        float(np.round(samples.astype(np.float64).mean(), 4))
                        if n
                        else None
                    )
                elif kind == "video" and data[:4] == _VIDEO_MAGIC:
                    nf, fps, _ = parse_video_header(data)
                    dur = nf * 1000 // fps if fps else None
                    px = decode_video_frame(data, 0)
                    h, w = px.shape
                    mean = float(np.round(px.astype(np.float64).mean(), 4))
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["n_frames"].append(nf)
                out["duration_ms"].append(dur)
                out["content_mean"].append(mean)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, DECODE_SCHEMA)


# -- video: a real multi-frame container over the PNG codec -----------
#
# No stdlib video codec exists, so "video" uses a transparent container
# of length-prefixed PNG frames (magic MDBV, frame count, fps). It is
# genuinely demuxable/decodable — the full pipeline shape (demux ->
# frame select -> decode) executes for real — while H.264/MP4 remain
# the documented external-codec boundary (`decode_stub`).

_VIDEO_MAGIC = b"MDBV"


def encode_video_png_frames(frames: list[np.ndarray], fps: int = 4) -> bytes:
    """Container: MDBV | u32 n_frames | u32 fps | (u32 len | PNG)*"""
    out = [_VIDEO_MAGIC, struct.pack("<II", len(frames), fps)]
    for f in frames:
        png = encode_png_gray(f)
        out.append(struct.pack("<I", len(png)))
        out.append(png)
    return b"".join(out)


def parse_video_header(data: bytes) -> tuple[int, int, int]:
    """(n_frames, fps, duration_ms) without touching frame bytes."""
    if data[:4] != _VIDEO_MAGIC:
        raise ValueError("not an MDBV container")
    n, fps = struct.unpack("<II", data[4:12])
    return n, fps, int(round(n * 1000 / fps)) if fps else 0


def decode_video_frame(data: bytes, index: int) -> np.ndarray:
    """Demux + decode ONE frame — the random-access path frame
    sampling uses (only the selected frame's bytes decompress)."""
    n, _fps = struct.unpack("<II", data[4:12])
    if not 0 <= index < n:
        raise IndexError(index)
    pos = 12
    for i in range(n):
        (ln,) = struct.unpack("<I", data[pos : pos + 4])
        if i == index:
            return decode_png_gray(data[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    raise ValueError("truncated container")


def frame_sample_decode(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling: for each video, pick the frame at each
    sample timestamp and decode it — map-only, only sampled frames
    decompress. Returns (media_id, frame_ms, frame_index, px_mean)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ms", LongType(), False),
            StructField("frame_index", LongType(), False),
            StructField("px_mean", FloatType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_ms", "frame_index", "px_mean")}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                data = bytes(payload)
                n, fps, dur = parse_video_header(data)
                if not n:
                    continue
                for t in range(0, dur + 1, every_ms):
                    idx = min(n - 1, int(t * fps / 1000))
                    px = decode_video_frame(data, idx)
                    rows["media_id"].append(int(mid))
                    rows["frame_ms"].append(t)
                    rows["frame_index"].append(idx)
                    rows["px_mean"].append(
                        float(np.round(px.astype(np.float64).mean(), 4))
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, out_schema)
