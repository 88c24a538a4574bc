"""Multimodal columns (SURVEY.md §2.2): image/audio/video as opaque
``binary`` payloads + typed metadata structs, processed with
Arrow-batched ``mapInPandas`` — with REAL stdlib codecs.

No media libraries exist in this container, so the codecs here are
written against the byte-level specs of three genuinely standard
formats that need nothing beyond ``struct``:

- image: 24-bit uncompressed **BMP** (BITMAPFILEHEADER +
  BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes)
- audio: **WAV** PCM signed 16-bit little-endian mono (RIFF/WAVE with
  ``fmt `` + ``data`` chunks)
- video: uncompressed-DIB **AVI** (RIFF/'AVI ' with ``hdrl``
  (avih/strh/strf) and ``movi`` lists, one ``00db`` chunk per frame) —
  the frames are the same bottom-up BGR DIB layout as BMP

Every decoder parses the actual container (magic, chunk sizes, header
fields, row padding, bottom-up order); a one-byte layout mistake
changes the extracted pixels/samples and fails the value-exact oracle
comparison in ``multimodal_features``. Swap in PIL/torchaudio/ffmpeg
for JPEG/FLAC/H.264 in production — the Spark dataflow (binary
column in, Arrow batches through ``mapInPandas``, typed features out)
does not change.

Scale notes:

- Payloads stay in the ``binary`` column end-to-end; nothing is
  collected to the driver. ``mapInPandas`` streams Arrow batches, so
  executor memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size —
  set it low (e.g. 64) for multi-MB media rows.
- ``repartition`` before heavy decode equalizes work when payload
  sizes are skewed (one 4K video vs thousands of thumbnails).
- Real corpora store media in object storage; the table then carries
  (uri, byte_range, metadata) and the decode UDF fetches — same
  function shape, swap the source of ``payload``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image|audio|video
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("sum_abs_sample", T.LongType()),
    ]
)

# ----- deterministic synthetic content ------------------------------
#
# Pixel / sample values are small-integer arithmetic in (media_id,
# frame, x, y) so the DuckDB oracle can recompute the decoded
# features WITHOUT parsing containers — the Spark side must round-trip
# encode→decode to reproduce them, which is what makes the oracle an
# end-to-end test of the codec layer.

VIDEO_FPS = 4  # 250 ms per frame
AUDIO_RATE = 8000


def pixel_rgb(media_id: int, frame: int, x, y):
    """Deterministic RGB of one pixel; x/y may be numpy arrays."""
    r = (7 * media_id + 3 * x + 5 * y + 11 * frame) % 256
    g = (11 * media_id + 5 * x + 7 * y + 13 * frame) % 256
    b = (13 * media_id + 7 * x + 11 * y + 17 * frame) % 256
    return r, g, b


def audio_sample(media_id: int, t):
    """Deterministic signed sample in [-2000, 2000]; t may be an array."""
    return (media_id * 37 + t * 73) % 4001 - 2000


def image_dims(media_id: int) -> tuple[int, int]:
    return 8 + media_id % 24, 8 + media_id % 16


def video_dims(media_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames)."""
    return 8 + media_id % 8, 8 + media_id % 8, 2 + media_id % 4


def audio_n_samples(media_id: int) -> int:
    return 400 + (media_id % 5) * 100


def _frame_pixels(media_id: int, frame: int, w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8 RGB for one frame, row 0 = TOP row."""
    y, x = np.mgrid[0:h, 0:w]
    r, g, b = pixel_rgb(media_id, frame, x, y)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


# ----- codecs: BMP ---------------------------------------------------


def _row_stride(width: int) -> int:
    return (3 * width + 3) // 4 * 4


def _dib_bits(px: np.ndarray) -> bytes:
    """Bottom-up, BGR, rows padded to 4 bytes — the DIB layout shared
    by BMP files and uncompressed-AVI ``00db`` frames."""
    h, w, _ = px.shape
    stride = _row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # flip rows, RGB→BGR
    return rows.tobytes()


def _dib_pixels(bits: bytes, w: int, h: int) -> np.ndarray:
    stride = _row_stride(w)
    rows = np.frombuffer(bits, dtype=np.uint8, count=h * stride).reshape(h, stride)
    px = rows[:, : 3 * w].reshape(h, w, 3)
    return px[::-1, :, ::-1]  # bottom-up→top-down, BGR→RGB


def encode_bmp(px: np.ndarray) -> bytes:
    """24-bit uncompressed BMP of an (h, w, 3) uint8 RGB array."""
    h, w, _ = px.shape
    bits = _dib_bits(px)
    # BITMAPINFOHEADER: size=40, planes=1, bpp=24, BI_RGB
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(bits), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(bits), 0, 0, 14 + 40)
    return header + info + bits


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse a 24-bit BI_RGB BMP → (h, w, 3) uint8 RGB (top-down)."""
    magic, _size, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0 or h <= 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp}, h={h})")
    return _dib_pixels(payload[off:], w, h)


def bmp_n_bytes(w: int, h: int) -> int:
    return 54 + h * _row_stride(w)


# ----- codecs: WAV ---------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = AUDIO_RATE) -> bytes:
    """PCM s16le mono WAV."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse RIFF/WAVE chunks → (sample_rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            # a truncated chunk must surface, not silently yield a
            # shorter sample array (half-uploaded object in a corpus)
            raise ValueError(f"truncated WAV chunk {cid!r}: {len(body)} < {csize}")
        if cid == b"fmt ":
            audio_fmt, channels, rate, _bps, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need PCM s16le mono)")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + csize + (csize & 1)  # RIFF chunks pad to even
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, samples


def wav_n_bytes(n_samples: int) -> int:
    return 44 + 2 * n_samples


# ----- codecs: AVI (uncompressed DIB frames) -------------------------

_AVIH = 56  # MainAVIHeader size
_STRH = 56  # AVIStreamHeader size
_STRF = 40  # BITMAPINFOHEADER size
# 12 RIFF + (8 + 4 + (8+_AVIH) + (8 + 4 + (8+_STRH) + (8+_STRF))) hdrl
# + 8 movi-LIST header + 4 'movi'
AVI_HEADER_BYTES = 12 + 8 + 4 + 8 + _AVIH + 8 + 4 + 8 + _STRH + 8 + _STRF + 8 + 4


def encode_avi(frames: list[np.ndarray], fps: int = VIDEO_FPS) -> bytes:
    """RIFF/'AVI ' container with one uncompressed ``00db`` DIB chunk
    per frame — openable by stock media players; no index chunk
    (players tolerate its absence for linear reads)."""
    h, w, _ = frames[0].shape
    stride = _row_stride(w)
    fb = h * stride  # stride is a multiple of 4 → fb is even, no pad
    nf = len(frames)
    usec = 1_000_000 // fps
    avih = struct.pack("<IIIIIIIIII4I", usec, fb * fps, 0, 0, nf, 0, 1, fb, w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, nf, fb, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fb, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + 8 + _STRH + 8 + _STRF) + b"strl"
    strl += b"strh" + struct.pack("<I", _STRH) + strh
    strl += b"strf" + struct.pack("<I", _STRF) + strf
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", _AVIH) + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for fr in frames:
        bits = _dib_bits(fr)
        movi_body += b"00db" + struct.pack("<I", len(bits)) + bits
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """Parse RIFF/'AVI ' → (fps, frames as (h, w, 3) uint8 RGB)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = fps = None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, fps
        while pos + 8 <= end:
            cid, csize = struct.unpack_from("<4sI", payload, pos)
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + csize)  # skip list type tag
            elif cid == b"strh":
                s = struct.unpack_from("<4s4sIHHIIIIIIIi4H", payload, body_start)
                if s[0] == b"vids" and s[7]:
                    fps = s[7] // max(s[6], 1)  # rate / scale
            elif cid == b"strf":
                _sz, w, h = struct.unpack_from("<Iii", payload, body_start)
            elif cid == b"00db":
                if w is None:
                    raise ValueError("AVI frame before strf header")
                frames.append(_dib_pixels(payload[body_start : body_start + csize], w, h))
            pos = body_start + csize + (csize & 1)

    walk(12, len(payload))
    if fps is None or not frames:
        raise ValueError("AVI missing stream header or frames")
    return fps, frames


def avi_n_bytes(w: int, h: int, n_frames: int) -> int:
    return AVI_HEADER_BYTES + n_frames * (8 + h * _row_stride(w))


# ----- Spark surface --------------------------------------------------


def _build_payload(media_id: int, kind: str) -> bytes:
    if kind == "image":
        w, h = image_dims(media_id)
        return encode_bmp(_frame_pixels(media_id, 0, w, h))
    if kind == "audio":
        t = np.arange(audio_n_samples(media_id))
        return encode_wav(audio_sample(media_id, t).astype(np.int16))
    w, h, nf = video_dims(media_id)
    return encode_avi([_frame_pixels(media_id, f, w, h) for f in range(nf)])


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL payloads: BMP images, WAV
    audio, DIB-AVI video, content derived from ``media_id`` alone.
    Generated distributed — ``range`` → ``mapInPandas`` encodes on the
    executors; the driver never sees a payload."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in it:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                kind = kinds[mid % 3]
                if kind == "image":
                    w, h = image_dims(mid)
                    dur = 0
                elif kind == "audio":
                    w = h = 0
                    dur = audio_n_samples(mid) * 1000 // AUDIO_RATE
                else:
                    w, h, nf = video_dims(mid)
                    dur = nf * 1000 // VIDEO_FPS
                out.append(
                    {
                        "media_id": mid,
                        "payload": _build_payload(mid, kind),
                        "meta": {"kind": kind, "width": w, "height": h, "duration_ms": dur},
                    }
                )
            yield pd.DataFrame(out)

    return (
        spark.range(n)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


def sniff_kind(payload: bytes) -> str:
    """Dispatch on container magic — the decode path trusts the BYTES,
    not the metadata column (corpus metadata lies at scale)."""
    if payload[:2] == b"BM":
        return "image"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "video"
    raise ValueError(f"unknown payload magic {payload[:4]!r}")


def media_features(df: DataFrame) -> DataFrame:
    """Decode every payload with the real codec for its sniffed kind
    and emit exact-integer content features (dimension, frame/sample
    counts, per-channel pixel sums, total absolute sample amplitude).

    One Arrow-batched ``mapInPandas`` pass; all-integer outputs so the
    oracle comparison is exact. Decode failures raise — a corrupt
    payload at 100 TB should surface, not silently zero (wrap with a
    try/except + error column in pipelines that expect dirt)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                kind = sniff_kind(payload)
                w = h = nf = ns = sr = sg = sb = sabs = 0
                if kind == "image":
                    px = decode_bmp(payload)
                    h, w = px.shape[:2]
                    nf = 1
                    s = px.astype(np.int64).sum(axis=(0, 1))
                    sr, sg, sb = int(s[0]), int(s[1]), int(s[2])
                elif kind == "audio":
                    _rate, samples = decode_wav(payload)
                    ns = len(samples)
                    sabs = int(np.abs(samples.astype(np.int64)).sum())
                else:
                    _fps, frames = decode_avi(payload)
                    nf = len(frames)
                    h, w = frames[0].shape[:2]
                    s = sum(fr.astype(np.int64).sum(axis=(0, 1)) for fr in frames)
                    sr, sg, sb = int(s[0]), int(s[1]), int(s[2])
                out.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "n_samples": ns,
                        "n_bytes": len(payload),
                        "sum_r": sr,
                        "sum_g": sg,
                        "sum_b": sb,
                        "sum_abs_sample": sabs,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(batches, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_offset_ms", T.IntegerType()),
        T.StructField("frame_bmp", T.BinaryType()),
    ]
)


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_offset_ms", T.IntegerType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def frame_features(frames_df: DataFrame) -> DataFrame:
    """Per-frame pixel features over ``extract_frames`` output — the
    sampled-frame BMPs go through the SAME real decoder as standalone
    images, proving the re-encode round-trips."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, idx, off, bmp in zip(
                pdf["media_id"], pdf["frame_index"], pdf["frame_offset_ms"], pdf["frame_bmp"]
            ):
                bmp = bytes(bmp)
                px = decode_bmp(bmp)
                s = px.astype(np.int64).sum(axis=(0, 1))
                out.append(
                    {
                        "media_id": int(mid),
                        "frame_index": int(idx),
                        "frame_offset_ms": int(off),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "n_bytes": len(bmp),
                        "sum_r": int(s[0]),
                        "sum_g": int(s[1]),
                        "sum_b": int(s[2]),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_FEATURES_SCHEMA.fields])

    return frames_df.mapInPandas(batches, schema=FRAME_FEATURES_SCHEMA)


def extract_frames(df: DataFrame, every_ms: int = 250) -> DataFrame:
    """Sample video frames at a fixed period and re-encode each as a
    standalone BMP — the downstream image pipeline (``media_features``,
    a future real encoder) consumes them unchanged. Non-video rows are
    filtered JVM-side on the metadata kind BEFORE any payload reaches
    Python, so the decode pass streams only video bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                fps, frames = decode_avi(bytes(payload))
                period_frames = max(every_ms * fps // 1000, 1)
                for idx in range(0, len(frames), period_frames):
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_index": idx,
                            "frame_offset_ms": idx * 1000 // fps,
                            "frame_bmp": encode_bmp(frames[idx]),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return (
        df.filter(F.col("meta.kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=FRAMES_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("peak_abs", T.IntegerType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """DSP-grade content features from decoded WAV samples: total
    energy (Σ s², exact int64 — s16 squares cap at 2³⁰, so overflow
    needs >2³³ samples per file, i.e. >2 h at 48 kHz; chunk longer
    media upstream), zero-crossing rate numerator (count of sign
    flips with the ``s >= 0`` convention, stated so the oracle can
    replay it exactly), and peak amplitude. All integers — the oracle
    comparison is exact, and the values are partitioning-independent.

    Non-audio rows are filtered JVM-side on the metadata kind before
    any payload reaches Python (same contract as ``extract_frames``)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, s = decode_wav(bytes(payload))
                s64 = s.astype(np.int64)
                nn = (s64 >= 0).astype(np.int8)
                out.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": rate,
                        "n_samples": len(s64),
                        "energy": int((s64 * s64).sum()),
                        "zero_crossings": int(np.count_nonzero(nn[1:] != nn[:-1])),
                        "peak_abs": int(np.abs(s64).max()) if len(s64) else 0,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return (
        df.filter(F.col("meta.kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)
    )


HISTOGRAM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("channel", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
    ]
)


def image_histograms(df: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Per-channel intensity histograms of decoded images, long form
    (media_id, channel r|g|b, bucket = value*n_buckets/256, n_pixels) —
    empty buckets omitted. Exact integer counts from real decoded
    pixels; one Arrow pass, image-kind filtered JVM-side. The
    aggregate a vision-data curation pass uses for exposure/clipping
    screens (all-dark, all-white, low-dynamic-range detection)."""
    if not 1 <= n_buckets <= 256 or 256 % n_buckets:
        raise ValueError(f"n_buckets={n_buckets} must divide 256")
    width = 256 // n_buckets

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp(bytes(payload))
                for ci, cname in enumerate("rgb"):
                    counts = np.bincount(
                        (px[:, :, ci].reshape(-1) // width), minlength=n_buckets
                    )
                    for b in np.nonzero(counts)[0]:
                        out.append(
                            {
                                "media_id": int(mid),
                                "channel": cname,
                                "bucket": int(b),
                                "n_pixels": int(counts[b]),
                            }
                        )
            yield pd.DataFrame(
                out, columns=[f.name for f in HISTOGRAM_SCHEMA.fields]
            )

    return (
        df.filter(F.col("meta.kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=HISTOGRAM_SCHEMA)
    )


# ----- perceptual image hashing / near-dup --------------------------

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash_hi", T.LongType()),
        T.StructField("ahash_lo", T.LongType()),
    ]
)


def synthetic_image_variants(spark, n_groups: int = 48, variants: int = 4) -> DataFrame:
    """Deterministic image corpus WITH planted near-duplicates:
    ``n_groups`` base images, each emitted ``variants`` times with the
    red channel uniformly brightened by the variant index (mod 256).

    ``media_id = group * variants + v``; pixels are
    ``pixel_rgb(group, 0, x, y)`` with ``r -> (r + v) % 256``. A
    uniform brightness shift barely moves 8x8 block means relative to
    the global mean (only the few wrapped pixels change the
    comparison), so same-group variants are perceptual near-dups —
    exactly the re-encode/brightness-jitter duplicates a multimodal
    corpus contains — while different groups stay far apart. Encoded
    distributed as real BMP payloads (``mapInPandas``; the driver
    never sees a payload), and the arithmetic pixel formula lets the
    DuckDB oracle recompute every hash without parsing containers."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                grp, v = divmod(mid, variants)
                w, h = image_dims(grp)
                px = _frame_pixels(grp, 0, w, h).astype(np.int64)
                px[:, :, 0] = (px[:, :, 0] + v) % 256
                out.append(
                    {
                        "media_id": mid,
                        "payload": encode_bmp(px.astype(np.uint8)),
                        "meta": {
                            "kind": "image",
                            "width": w,
                            "height": h,
                            "duration_ms": 0,
                        },
                    }
                )
            yield pd.DataFrame(out)

    return (
        spark.range(n_groups * variants)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


def image_ahash(df: DataFrame) -> DataFrame:
    """64-bit average hash (aHash) per decoded image, as two uint32
    halves — the standard perceptual fingerprint for image dedup
    (cf. pHash family): downsample to an 8x8 grid, bit k = 1 iff the
    mean of grid cell k exceeds the global mean.

    Every comparison is EXACT integer arithmetic so the oracle can
    replay it: gray = r+g+b (no luma weights/division), grid cell of
    pixel (x, y) is (x*8//w, y*8//h) — cells are unequal when w,h
    aren't multiples of 8, so the bit test cross-multiplies:
    ``cell_sum * n_pixels > total_sum * cell_n``. Bounds: gray <= 765,
    so for images up to ~50k x 50k the products stay far under 2^63.

    One Arrow pass over (media_id, payload), image-kind filtered
    JVM-side before any Python; no shuffle. Images smaller than 8x8
    (a cell would be empty) are rejected — silently emitting 0-bits
    would make all tiny images mutual near-dups."""
    shifts = np.arange(64, dtype=np.uint64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp(bytes(payload)).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                if w < 8 or h < 8:
                    raise ValueError(
                        f"image_ahash needs >=8x8 images, got {w}x{h} "
                        f"(media_id={int(mid)})"
                    )
                gray = px.sum(axis=2)
                cell = (
                    (np.arange(h, dtype=np.int64) * 8 // h)[:, None] * 8
                    + (np.arange(w, dtype=np.int64) * 8 // w)[None, :]
                )
                csum = np.zeros(64, dtype=np.int64)
                np.add.at(csum, cell.reshape(-1), gray.reshape(-1))
                cn = np.bincount(cell.reshape(-1), minlength=64).astype(np.int64)
                bits = (csum * (w * h)) > (int(gray.sum()) * cn)
                v = int((bits.astype(np.uint64) << shifts).sum())
                out.append(
                    {
                        "media_id": int(mid),
                        "ahash_hi": (v >> 32) & 0xFFFFFFFF,
                        "ahash_lo": v & 0xFFFFFFFF,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AHASH_SCHEMA.fields]
            )

    from dask_datapipeline_spark.parallel import fan_out

    return fan_out(
        df.filter(F.col("meta.kind") == "image").select("media_id", "payload")
    ).mapInPandas(batches, schema=AHASH_SCHEMA)


def image_near_dup_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual image near-duplicate pairs: ``image_ahash`` feature
    extraction composed with the SAME 4x16-bit pigeonhole Hamming
    banding join SimHash text dedup uses
    (``operators/dedup.py::hamming_band_pairs`` — perfect recall for
    Hamming < 4, exact bit_count(xor) verify, one chunk-keyed
    shuffle). Output: (id_a, id_b, hamming) with id_a < id_b.

    100 TB shape: the corpus-sized decode stays in ONE Arrow pass with
    no upstream shuffle; only 3-long hash rows (24 bytes/image) enter
    the banding join, so the join input is ~5 orders of magnitude
    smaller than the payload bytes."""
    from pyspark.storagelevel import StorageLevel

    from dask_datapipeline_spark.operators.dedup import hamming_band_pairs

    sig = image_ahash(df).persist(StorageLevel.MEMORY_AND_DISK)
    return hamming_band_pairs(
        sig, "media_id", "ahash_hi", "ahash_lo", max_hamming=max_hamming
    )


AHASH128_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("w0", T.LongType()),  # aHash bits 32..63
        T.StructField("w1", T.LongType()),  # aHash bits 0..31
        T.StructField("w2", T.LongType()),  # dHash bits 32..63
        T.StructField("w3", T.LongType()),  # dHash bits 0..31
    ]
)


def image_ahash128(df: DataFrame) -> DataFrame:
    """128-bit perceptual hash per decoded image, as four 32-bit words
    — the WIDE variant docs/SCALE.md prescribes once a corpus passes
    ~10^7 images: 16-bit banding chunks of a 64-bit hash carry a
    structural n²/2^15 candidate term; four 32-bit chunks push it to
    n²/2^31 for the same Hamming ≤ 3 recall guarantee.

    Composition (same 8x8 cell sums the 64-bit ``image_ahash``
    computes — ONE decode, two complementary views):
    - bits 64..127 (w0,w1): the aHash — cell mean vs GLOBAL mean;
    - bits 0..63 (w2,w3): a dHash-style gradient — cell k mean vs its
      ring successor (k+1) mod 64. Gradients are invariant to uniform
      brightness shifts (both sides move together), catching the
      re-encode/levels duplicate class, and are near-independent of
      the aHash bits, which is what makes the extra 64 bits real
      entropy instead of redundancy.

    All comparisons cross-multiply exact integers
    (``csum_k · cn_j > csum_j · cn_k``) — no division, no floats — so
    the DuckDB oracle replays every bit from the pixel formula."""
    shifts = np.arange(64, dtype=np.uint64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp(bytes(payload)).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                if w < 8 or h < 8:
                    raise ValueError(
                        f"image_ahash128 needs >=8x8 images, got {w}x{h} "
                        f"(media_id={int(mid)})"
                    )
                gray = px.sum(axis=2)
                cell = (
                    (np.arange(h, dtype=np.int64) * 8 // h)[:, None] * 8
                    + (np.arange(w, dtype=np.int64) * 8 // w)[None, :]
                )
                csum = np.zeros(64, dtype=np.int64)
                np.add.at(csum, cell.reshape(-1), gray.reshape(-1))
                cn = np.bincount(cell.reshape(-1), minlength=64).astype(np.int64)
                abits = (csum * (w * h)) > (int(gray.sum()) * cn)
                nxt = np.roll(np.arange(64), -1)  # ring successor
                dbits = (csum * cn[nxt]) > (csum[nxt] * cn)
                a = int((abits.astype(np.uint64) << shifts).sum())
                d = int((dbits.astype(np.uint64) << shifts).sum())
                out.append(
                    {
                        "media_id": int(mid),
                        "w0": (a >> 32) & 0xFFFFFFFF,
                        "w1": a & 0xFFFFFFFF,
                        "w2": (d >> 32) & 0xFFFFFFFF,
                        "w3": d & 0xFFFFFFFF,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AHASH128_SCHEMA.fields]
            )

    from dask_datapipeline_spark.parallel import fan_out

    return fan_out(
        df.filter(F.col("meta.kind") == "image").select("media_id", "payload")
    ).mapInPandas(batches, schema=AHASH128_SCHEMA)


def image_near_dup_pairs_128(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """``image_near_dup_pairs`` on the 128-bit hash: one Arrow
    decode+hash pass, then the generalized 4x32-bit pigeonhole banding
    (``dedup.hamming_band_pairs_wide``) — identical recall guarantee
    (Hamming < 4), ~2^16x smaller structural candidate term, same
    single chunk-keyed shuffle of fixed-width (id, 4 words) rows."""
    from pyspark.storagelevel import StorageLevel

    from dask_datapipeline_spark.operators.dedup import hamming_band_pairs_wide

    sig = image_ahash128(df).persist(StorageLevel.MEMORY_AND_DISK)
    return hamming_band_pairs_wide(
        sig, "media_id", ["w0", "w1", "w2", "w3"], max_hamming=max_hamming
    )


# ----- audio fingerprint / near-dup ---------------------------------

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("afp_hi", T.LongType()),
        T.StructField("afp_lo", T.LongType()),
    ]
)


def synthetic_audio_variants(spark, n_groups: int = 48, variants: int = 4) -> DataFrame:
    """Deterministic audio corpus WITH planted near-duplicates:
    ``n_groups`` base clips, each emitted ``variants`` times with a
    constant DC offset of the variant index added to every sample —
    the re-encode/level-shift duplicate class an audio corpus
    contains. ``media_id = group * variants + v``; samples are
    ``audio_sample(group, t) + v`` (|s| <= 2003, safely inside int16).
    Real PCM WAV payloads encoded executor-side; the arithmetic sample
    formula lets the oracle recompute every fingerprint without
    parsing a container."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                grp, v = divmod(mid, variants)
                t = np.arange(audio_n_samples(grp))
                samples = (audio_sample(grp, t) + v).astype(np.int16)
                out.append(
                    {
                        "media_id": mid,
                        "payload": encode_wav(samples),
                        "meta": {
                            "kind": "audio",
                            "width": 0,
                            "height": 0,
                            "duration_ms": len(t) * 1000 // AUDIO_RATE,
                        },
                    }
                )
            yield pd.DataFrame(out)

    return (
        spark.range(n_groups * variants)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """64-bit energy-profile fingerprint per decoded audio clip, as
    two uint32 halves — the 1-D analogue of ``image_ahash`` (and the
    spirit of Shazam-style spectral fingerprints, on the integer
    feature this container's PCM makes exactly replayable): the clip
    splits into 64 time frames, bit k = 1 iff frame k's mean |sample|
    exceeds the clip's mean |sample|.

    Exact integer arithmetic throughout: frame of sample t is
    t*64//n, and the bit test cross-multiplies
    ``frame_sum * n > total_sum * frame_n`` (|sample| <= 32768 keeps
    the products far under 2^63 for clips up to ~10^7 samples). One
    Arrow pass, audio-kind filtered JVM-side, no shuffle. Clips with
    fewer than 64 samples (an empty frame) are rejected."""
    shifts = np.arange(64, dtype=np.uint64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, samples = decode_wav(bytes(payload))
                n = len(samples)
                if n < 64:
                    raise ValueError(
                        f"audio_fingerprint needs >=64 samples, got {n} "
                        f"(media_id={int(mid)})"
                    )
                a = np.abs(samples.astype(np.int64))
                frame = (np.arange(n, dtype=np.int64) * 64) // n
                fs = np.zeros(64, dtype=np.int64)
                np.add.at(fs, frame, a)
                fn = np.bincount(frame, minlength=64).astype(np.int64)
                bits = (fs * n) > (int(a.sum()) * fn)
                v = int((bits.astype(np.uint64) << shifts).sum())
                out.append(
                    {
                        "media_id": int(mid),
                        "afp_hi": (v >> 32) & 0xFFFFFFFF,
                        "afp_lo": v & 0xFFFFFFFF,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FP_SCHEMA.fields]
            )

    from dask_datapipeline_spark.parallel import fan_out

    return fan_out(
        df.filter(F.col("meta.kind") == "audio").select("media_id", "payload")
    ).mapInPandas(batches, schema=AUDIO_FP_SCHEMA)


def audio_near_dup_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Audio near-duplicate pairs: ``audio_fingerprint`` composed with
    the SAME 4x16-bit pigeonhole Hamming banding join as SimHash text
    dedup and aHash image dedup (``dedup.hamming_band_pairs`` —
    perfect recall for Hamming < 4). Output: (id_a, id_b, hamming)
    with id_a < id_b. Decode stays in one shuffle-free Arrow pass;
    only 24-byte fingerprint rows enter the join."""
    from pyspark.storagelevel import StorageLevel

    from dask_datapipeline_spark.operators.dedup import hamming_band_pairs

    sig = audio_fingerprint(df).persist(StorageLevel.MEMORY_AND_DISK)
    return hamming_band_pairs(
        sig, "media_id", "afp_hi", "afp_lo", max_hamming=max_hamming
    )


# ----- corrupted-media quarantine -----------------------------------

QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sniffed_kind", T.StringType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def synthetic_corrupt_media(spark, n: int = 64) -> DataFrame:
    """``synthetic_media`` with deterministic corruption planted:
    every 7th payload truncated to half (container magic intact,
    decode fails mid-parse) and every 11th with its magic bytes
    zeroed (sniffing itself fails) — the two corruption classes a
    crawled media corpus actually contains (interrupted transfers,
    mislabeled/garbage bytes)."""

    def corrupt(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mid, b = int(mid), bytes(payload)
                if mid % 11 == 0:
                    b = b"\x00\x00\x00\x00" + b[4:]
                elif mid % 7 == 0:
                    b = b[: len(b) // 2]
                payloads.append(b)
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    return synthetic_media(spark, n).mapInPandas(corrupt, schema=MEDIA_SCHEMA)


def media_quarantine(df: DataFrame) -> DataFrame:
    """Classify every payload as decodable or corrupt WITHOUT failing
    the job: sniff the container magic, run the full real decode for
    the sniffed kind, and emit ``(media_id, sniffed_kind, ok)`` —
    ``sniffed_kind`` NULL when even the magic is garbage. Downstream:
    ``ok`` rows proceed to featurization, the rest land in a
    quarantine table for re-fetch/triage.

    This is the production posture for a 100 TB crawled corpus: a
    per-row decode failure must cost one quarantine row, not an
    executor retry storm — a single garbage byte range killing a
    40-wide stage is how media jobs die. One Arrow pass, no shuffle;
    the try/except is per PAYLOAD, so one bad row never poisons its
    Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                kind = None
                ok = False
                try:
                    kind = sniff_kind(b)
                    if kind == "image":
                        decode_bmp(b)
                    elif kind == "audio":
                        decode_wav(b)
                    else:
                        decode_avi(b)
                    ok = True
                except Exception:
                    pass  # quarantine row — never re-raise
                out.append({"media_id": int(mid), "sniffed_kind": kind, "ok": ok})
            yield pd.DataFrame(
                out, columns=[f.name for f in QUARANTINE_SCHEMA.fields]
            )

    from dask_datapipeline_spark.parallel import fan_out

    return fan_out(df.select("media_id", "payload")).mapInPandas(
        batches, schema=QUARANTINE_SCHEMA
    )


# ----- video fingerprint / near-dup ---------------------------------

VIDEO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("vfp_hi", T.LongType()),
        T.StructField("vfp_lo", T.LongType()),
    ]
)


def synthetic_video_variants(spark, n_groups: int = 48, variants: int = 4) -> DataFrame:
    """Deterministic video corpus WITH planted near-duplicates:
    ``n_groups`` base clips, each emitted ``variants`` times with the
    red channel of EVERY frame brightened by the variant index (mod
    256) — the re-encode/color-shift duplicate class.
    ``media_id = group * variants + v``; frames are
    ``_frame_pixels(group, f)`` with ``r -> (r + v) % 256``, encoded
    as real uncompressed-DIB AVI payloads executor-side."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                grp, v = divmod(mid, variants)
                w, h, nf = video_dims(grp)
                frames = []
                for f in range(nf):
                    px = _frame_pixels(grp, f, w, h).astype(np.int64)
                    px[:, :, 0] = (px[:, :, 0] + v) % 256
                    frames.append(px.astype(np.uint8))
                out.append(
                    {
                        "media_id": mid,
                        "payload": encode_avi(frames),
                        "meta": {
                            "kind": "video",
                            "width": w,
                            "height": h,
                            "duration_ms": nf * 1000 // VIDEO_FPS,
                        },
                    }
                )
            yield pd.DataFrame(out)

    return (
        spark.range(n_groups * variants)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


def video_fingerprint(df: DataFrame) -> DataFrame:
    """64-bit spatio-temporal hash per decoded video clip, as two
    uint32 halves: the ``image_ahash`` 8x8 grid test applied to the
    PER-POSITION gray totals summed over ALL frames — a clip-level
    average-frame aHash (frame count cancels out of the mean
    comparison, so clips of different lengths hash comparably).

    Exact integers throughout: cell of sample (x, y, f) depends only
    on (x*8//w, y*8//h); bit k tests
    ``cell_sum * (w*h*nf) > total_sum * cell_n`` with
    ``cell_n = positions_in_cell * nf``. One Arrow pass over
    video-kind rows, full real AVI decode, no shuffle. Clips smaller
    than 8x8 are rejected (degenerate grid)."""
    shifts = np.arange(64, dtype=np.uint64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _fps, frames = decode_avi(bytes(payload))
                if not frames:
                    raise ValueError(f"empty video (media_id={int(mid)})")
                h, w = frames[0].shape[0], frames[0].shape[1]
                if w < 8 or h < 8:
                    raise ValueError(
                        f"video_fingerprint needs >=8x8 frames, got {w}x{h} "
                        f"(media_id={int(mid)})"
                    )
                nf = len(frames)
                gray = np.zeros((h, w), dtype=np.int64)
                for fr in frames:
                    gray += fr.astype(np.int64).sum(axis=2)
                cell = (
                    (np.arange(h, dtype=np.int64) * 8 // h)[:, None] * 8
                    + (np.arange(w, dtype=np.int64) * 8 // w)[None, :]
                )
                csum = np.zeros(64, dtype=np.int64)
                np.add.at(csum, cell.reshape(-1), gray.reshape(-1))
                cn = np.bincount(cell.reshape(-1), minlength=64).astype(np.int64) * nf
                bits = (csum * (w * h * nf)) > (int(gray.sum()) * cn)
                v = int((bits.astype(np.uint64) << shifts).sum())
                out.append(
                    {
                        "media_id": int(mid),
                        "vfp_hi": (v >> 32) & 0xFFFFFFFF,
                        "vfp_lo": v & 0xFFFFFFFF,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_FP_SCHEMA.fields]
            )

    from dask_datapipeline_spark.parallel import fan_out

    return fan_out(
        df.filter(F.col("meta.kind") == "video").select("media_id", "payload")
    ).mapInPandas(batches, schema=VIDEO_FP_SCHEMA)


def video_near_dup_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Video near-duplicate pairs: ``video_fingerprint`` composed with
    the shared 4x16-bit pigeonhole Hamming banding join — the fourth
    modality (text SimHash, image aHash, audio energy profile, video
    average-frame hash) on ONE banding operator. Output:
    (id_a, id_b, hamming) with id_a < id_b."""
    from pyspark.storagelevel import StorageLevel

    from dask_datapipeline_spark.operators.dedup import hamming_band_pairs

    sig = video_fingerprint(df).persist(StorageLevel.MEMORY_AND_DISK)
    return hamming_band_pairs(
        sig, "media_id", "vfp_hi", "vfp_lo", max_hamming=max_hamming
    )
