"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The reference carries attachment payloads as base64 strings and decodes
them in bolts (src/modules/attachments/attachments.py:346-371 withhashes,
:277-344 metadata). Here the Spark-side plumbing — schema, batch shape,
partition-preserving mapInPandas, hashing, size/type metadata — is real
and tested. The codec step is REAL for one format per modality, each
needing no external library: images — BMP (24bpp uncompressed) and
binary PPM (P6) via `decode_image`; audio — PCM WAV (RIFF chunk walk,
16-bit LPCM) via `decode_wav`; video — YUV4MPEG2 (text header + planar
C420 frame walk) via `decode_y4m` — all from-scratch header+payload
parsers. Compressed formats (JPEG/MP3/H.264 …) remain STUBBED (their
libs are not in this container) behind `decode_stub`, which raises
NotImplementedError unless `fake=True` produces a deterministic fake
feature vector (so the pipeline shape stays testable end-to-end for
every media type).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("byte_size", LongType(), True),
        StructField("payload_md5", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary payload column + typed metadata (the
    container has no real media files; payload bytes are the utf-8 text,
    which exercises identical plumbing). base64/unbase64 mirror the
    reference's transfer encoding handling (attachments.py:353-364)."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    return (
        df.withColumn("payload", payload)
        .withColumn("payload_b64", F.base64(payload))
        .withColumn("byte_size", F.length(payload).cast("long"))
        .withColumn(
            "media_type",
            F.element_at(
                F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"), F.lit("text/plain")),
                F.pmod(F.length(F.coalesce(F.col(text_col), F.lit(""))), F.lit(4)).cast("int") + 1,
            ),
        )
    )


def decode_stub(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Codec stub. Real deployments plug a decoder (PIL/librosa/ffmpeg)
    here; the container has none, so only the deterministic fake path
    is available."""
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic test path"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(digest[:32], dtype=np.uint8).astype(np.float32) / 255.0)[:8]


# ---------------------------------------------------------------------------
# Real codecs: BMP (24bpp BI_RGB) and binary PPM (P6). Pure Python +
# numpy — no media libraries. The encoders exist so fixtures/tests can
# build genuine format bytes; the decoder is the production-path parser.
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24bpp uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, rows padded to 4 bytes)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_size = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row_size), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", off + row_size * h, 0, 0, off)
    dib_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_size * h, 2835, 2835, 0, 0)
    return file_hdr + dib_hdr + body.tobytes()


def encode_ppm(pixels: np.ndarray, comment: str | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as binary PPM (P6)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    c = f"# {comment}\n" if comment else ""
    return f"P6\n{c}{w} {h}\n255\n".encode() + px.tobytes()


def _ppm_header(b: bytes) -> tuple[int, int, int, int]:
    """Parse the P6 header (width, height, maxval) tolerating comments
    and arbitrary whitespace; returns (w, h, maxval, pixel_offset)."""
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i or j > len(b):
            raise ValueError("truncated PPM header")
        vals.append(int(b[i:j]))
        i = j
    return vals[0], vals[1], vals[2], i + 1  # exactly one whitespace after maxval


def _decode_pixels(payload: bytes) -> tuple[str, np.ndarray]:
    """Parse a BMP (24bpp BI_RGB) or binary PPM (P6) payload to
    (fmt, (h, w, 3) uint8 RGB array, top-down row order). Raises
    ValueError on any other/malformed format."""
    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        (off,) = struct.unpack_from("<I", payload, 10)
        _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
        if bpp != 24 or comp != 0:
            raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
        top_down, h = h < 0, abs(h)
        row_size = (w * 3 + 3) // 4 * 4
        if len(payload) < off + row_size * h:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(payload, np.uint8, row_size * h, off).reshape(h, row_size)
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        if not top_down:
            px = px[::-1]
        fmt = "bmp"
    elif payload[:2] == b"P6":
        w, h, maxval, off = _ppm_header(payload)
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        if len(payload) < off + w * h * 3:
            raise ValueError("truncated PPM pixel data")
        px = np.frombuffer(payload, np.uint8, w * h * 3, off).reshape(h, w, 3)
        fmt = "ppm"
    else:
        raise ValueError("unrecognized image format")
    return fmt, px


def decode_image(payload: bytes) -> dict:
    """Parse a BMP (24bpp BI_RGB) or binary PPM (P6) payload; returns
    {fmt, width, height, mean_r, mean_g, mean_b}. Raises ValueError on
    any other/malformed format — callers that want the stub path for
    non-image media dispatch on media_type first."""
    fmt, px = _decode_pixels(payload)
    h, w = px.shape[0], px.shape[1]
    means = px.reshape(-1, 3).astype(np.float64).mean(axis=0)
    return {
        "fmt": fmt,
        "width": int(w),
        "height": int(h),
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }


IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("fmt", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
    ]
)


def decode_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real image decode over a binary column: mapInPandas, Arrow-batched,
    partition-preserving (no shuffle) — one pass over payload bytes, the
    same cost shape as `extract_media_features`. Unparseable payloads
    yield null feature columns rather than failing the batch (a 100 TB
    crawl always contains corrupt files)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_DECODE_SCHEMA.fields}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(i)
                try:
                    m = decode_image(bytes(p) if p is not None else b"")
                except ValueError:
                    m = {}
                for k in ("fmt", "width", "height", "mean_r", "mean_g", "mean_b"):
                    out[k].append(m.get(k))
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, schema=IMAGE_DECODE_SCHEMA)


def synthesize_image_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic image-fixture synthesis (the container ships no real
    media files): per doc, a solid-color BMP (even ids) or PPM (odd ids)
    whose dimensions and RGB derive arithmetically from the id — so an
    independent oracle can predict the decoded means exactly. Width 3
    cases force BMP row padding; the PPM header carries a comment so the
    tolerant header path is exercised at query time, not just in tests."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 3 + i % 3, 2 + i % 4
                rgb = (i % 256, (i * 7 + 13) % 256, (i * 31 + 101) % 256)
                px = np.tile(np.array(rgb, np.uint8), (h, w, 1))
                payloads.append(
                    encode_bmp(px) if i % 2 == 0 else encode_ppm(px, comment="synthetic")
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(
        fn,
        schema=StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("payload", BinaryType(), True),
            ]
        ),
    )


def extract_media_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; each batch is decoded and reduced to a fixed-size
    float feature vector. Partition-preserving (no shuffle) — at 100 TB
    the cost is exactly one pass over the payload bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p if p is not None else b"", m, fake=True).tolist()
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "byte_size": pdf["byte_size"],
                    "payload_md5": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(fn, schema=MEDIA_META_SCHEMA)


# ---------------------------------------------------------------------------
# Real audio codec: PCM WAV (RIFF). Pure Python + numpy — no media
# libraries. Encoder exists so fixtures/tests build genuine RIFF bytes;
# the decoder is the production-path parser (chunk walk, not fixed
# offsets, so files with LIST/fact chunks before `data` still parse).
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_frames, n_channels) int16 array as a PCM WAV file
    (RIFF + fmt + data chunks, little-endian interleaved frames)."""
    s = np.asarray(samples, dtype="<i2")
    n_frames, n_ch = s.shape
    data = s.tobytes()
    block = n_ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_ch, sample_rate, sample_rate * block, block, 16
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> dict:
    """Parse a PCM WAV payload; returns {fmt, n_channels, sample_rate,
    bits, n_frames, duration_ms, mean_ch0} where mean_ch0 is the exact
    integer-sum mean of channel 0 (so an arithmetic oracle can predict
    it). Raises ValueError on non-RIFF / non-PCM / truncated input."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt_chunk, data = 12, None, None
    while i + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, i)
        body = payload[i + 8 : i + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_ch, rate, _, block, bits = struct.unpack_from("<HHIIHH", fmt_chunk, 0)
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV variant (fmt={audio_fmt}, bits={bits})")
    n_frames = len(data) // block
    s = np.frombuffer(data, "<i2", n_frames * n_ch).reshape(n_frames, n_ch)
    return {
        "fmt": "wav",
        "n_channels": int(n_ch),
        "sample_rate": int(rate),
        "bits": int(bits),
        "n_frames": int(n_frames),
        "duration_ms": float(n_frames * 1000.0 / rate),
        "mean_ch0": float(s[:, 0].astype(np.float64).mean()) if n_frames else None,
    }


# Fixture arithmetic shared with the SQL oracle: doc d has
# n_frames = 40 + d % 16, n_channels = 1 + d % 2,
# sample_rate = 8000 + (d % 3) * 4000, and channel-c sample at frame t
# = ((7*d + 13*t + 101*c) % 65536) - 32768 — pure integer arithmetic,
# so the decoded stats are predictable without seeing the bytes.
WAV_FRAMES = "40 + {d} % 16"
WAV_CHANNELS = "1 + {d} % 2"
WAV_RATE = "8000 + ({d} % 3) * 4000"
WAV_SAMPLE = "(7 * {d} + 13 * {t} + 101 * {c}) % 65536 - 32768"


def synthesize_wav_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM WAV fixtures (the container ships no real media
    files): frame counts, channel counts, rates, and every sample derive
    arithmetically from the id (WAV_* formulas above)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                d = int(i)
                n, ch = 40 + d % 16, 1 + d % 2
                rate = 8000 + (d % 3) * 4000
                t, c = np.indices((n, ch))
                s = ((7 * d + 13 * t + 101 * c) % 65536 - 32768).astype("<i2")
                payloads.append(encode_wav(s, rate))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(
        fn,
        schema=StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("payload", BinaryType(), True),
            ]
        ),
    )


WAV_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("fmt", StringType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("duration_ms", DoubleType(), True),
        StructField("mean_ch0", DoubleType(), True),
    ]
)


def decode_audio(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real WAV decode over a binary column: mapInPandas, Arrow-batched,
    partition-preserving (no shuffle). Unparseable payloads yield null
    columns rather than failing the batch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in WAV_DECODE_SCHEMA.fields}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(i)
                try:
                    m = decode_wav(bytes(p) if p is not None else b"")
                except ValueError:
                    m = {}
                for k in ("fmt", "n_channels", "sample_rate", "n_frames",
                          "duration_ms", "mean_ch0"):
                    out[k].append(m.get(k))
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, schema=WAV_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize / frame-sample: nearest-neighbor downsample over decoded pixels
# ---------------------------------------------------------------------------

GRADIENT_DIMS = ("4 + {d} % 5", "3 + {d} % 4")  # (w, h) formulas, shared w/ oracle
# Channel value at (x=col, y=row) for doc d — pure integer arithmetic so
# an oracle can predict any sampled pixel without seeing the bytes.
GRADIENT_CHANNELS = (
    "({d} + 3 * {x} + 5 * {y}) % 256",
    "(7 * {d} + 11 * {x} + 2 * {y} + 13) % 256",
    "(31 * {d} + {x} + 7 * {y} + 101) % 256",
)


def synthesize_gradient_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gradient image fixtures (vs synthesize_image_payloads' solid
    colors): every pixel differs, so a resize that samples the wrong
    grid cell — or a BMP decode that forgets the bottom-up row flip —
    produces detectably wrong channel means. Even ids → BMP (padded
    rows at w=5,7), odd → PPM."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                d = int(i)
                w, h = 4 + d % 5, 3 + d % 4
                y, x = np.indices((h, w))
                px = np.stack(
                    [
                        (d + 3 * x + 5 * y) % 256,
                        (7 * d + 11 * x + 2 * y + 13) % 256,
                        (31 * d + x + 7 * y + 101) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(
                    encode_bmp(px) if d % 2 == 0 else encode_ppm(px, comment="grad")
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(
        fn,
        schema=StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("payload", BinaryType(), True),
            ]
        ),
    )


IMAGE_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("fmt", StringType(), True),
        StructField("src_w", IntegerType(), True),
        StructField("src_h", IntegerType(), True),
        StructField("out_w", IntegerType(), True),
        StructField("out_h", IntegerType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_w: int = 2,
    out_h: int = 2,
) -> DataFrame:
    """Decode → nearest-neighbor resize (src index = floor(out_index *
    src_dim / out_dim), the standard frame-sample grid — for video this
    is exactly frame sampling along t instead of y) → per-channel means
    of the RESIZED image. mapInPandas, Arrow-batched, partition-
    preserving: at 100 TB the cost is one pass over payload bytes, no
    shuffle. Corrupt payloads yield null columns, never a failed batch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_RESIZE_SCHEMA.fields}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(i)
                try:
                    fmt, px = _decode_pixels(bytes(p) if p is not None else b"")
                    h, w = px.shape[0], px.shape[1]
                    ys = (np.arange(out_h) * h) // out_h
                    xs = (np.arange(out_w) * w) // out_w
                    small = px[ys][:, xs]
                    means = small.reshape(-1, 3).astype(np.float64).mean(axis=0)
                    row = dict(
                        fmt=fmt, src_w=w, src_h=h, out_w=out_w, out_h=out_h,
                        mean_r=float(means[0]), mean_g=float(means[1]),
                        mean_b=float(means[2]),
                    )
                except ValueError:
                    row = {}
                for k in ("fmt", "src_w", "src_h", "out_w", "out_h",
                          "mean_r", "mean_g", "mean_b"):
                    out[k].append(row.get(k))
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, schema=IMAGE_RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Real video codec: YUV4MPEG2 (.y4m) — uncompressed planar YUV with a
# plain-text header; parseable from scratch like the BMP/PPM/WAV paths,
# which un-stubs the last media modality. Encoder exists so fixtures
# are genuine Y4M bytes; the decoder is the production-path parser.
# ---------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Encode an (n_frames, h, w) uint8 luma array as a YUV4MPEG2 C420
    stream (U/V planes filled with 128 = neutral chroma)."""
    n, h, w = frames.shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    out = [hdr]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].astype(np.uint8).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes) -> dict:
    """Parse a YUV4MPEG2 (C420) payload; returns {fmt, width, height,
    fps, n_frames, mean_luma_f0} where mean_luma_f0 is the exact
    integer-sum mean of the first frame's Y plane. Raises ValueError on
    non-Y4M / unsupported-chroma / truncated input."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fn, fd = 25, 1
    chroma = "420"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            fn, fd = (int(x) for x in t[1:].split(":"))
        elif t[0] == "C":
            chroma = t[1:]
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    if not chroma.startswith("420"):
        raise ValueError(f"unsupported chroma {chroma}")
    frame_bytes = h * w + 2 * (h // 2) * (w // 2)
    i, n_frames, mean0 = nl + 1, 0, None
    while i < len(payload):
        j = payload.index(b"\n", i)
        if payload[i:j].split()[0:1] != [b"FRAME"]:
            raise ValueError("bad FRAME marker")
        body = payload[j + 1 : j + 1 + frame_bytes]
        if len(body) < frame_bytes:
            raise ValueError("truncated Y4M frame")
        if n_frames == 0:
            y = np.frombuffer(body, np.uint8, h * w)
            mean0 = float(y.astype(np.float64).mean())
        n_frames += 1
        i = j + 1 + frame_bytes
    return {
        "fmt": "y4m",
        "width": int(w),
        "height": int(h),
        "fps": float(fn) / fd,
        "n_frames": n_frames,
        "mean_luma_f0": mean0,
    }


# Fixture arithmetic shared with the SQL oracle: doc d has
# n_frames = 3 + d % 4, w = 8 + (d % 3) * 4, h = 6 + (d % 2) * 2, and
# frame-f luma at (r, c) = (11*d + 7*f + 5*r + 3*c) % 256.
Y4M_FRAMES = "3 + {d} % 4"
Y4M_W = "8 + ({d} % 3) * 4"
Y4M_H = "6 + ({d} % 2) * 2"
Y4M_LUMA = "(11 * {d} + 7 * {f} + 5 * {r} + 3 * {c}) % 256"


def synthesize_y4m_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic Y4M fixtures: dims, frame counts, and every luma
    sample derive arithmetically from the id (Y4M_* formulas)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                d = int(i)
                n, w, h = 3 + d % 4, 8 + (d % 3) * 4, 6 + (d % 2) * 2
                f, r, c = np.indices((n, h, w))
                frames = ((11 * d + 7 * f + 5 * r + 3 * c) % 256).astype(np.uint8)
                payloads.append(encode_y4m(frames))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(
        fn,
        schema=StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("payload", BinaryType(), True),
            ]
        ),
    )


Y4M_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("fmt", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("fps", DoubleType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("mean_luma_f0", DoubleType(), True),
    ]
)


def decode_video(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real Y4M decode over a binary column: mapInPandas, Arrow-batched,
    partition-preserving (no shuffle). Unparseable payloads yield null
    columns rather than failing the batch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in Y4M_DECODE_SCHEMA.fields}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(i)
                try:
                    m = decode_y4m(bytes(p) if p is not None else b"")
                except ValueError:
                    m = {}
                for k in ("fmt", "width", "height", "fps", "n_frames",
                          "mean_luma_f0"):
                    out[k].append(m.get(k))
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, schema=Y4M_DECODE_SCHEMA)
