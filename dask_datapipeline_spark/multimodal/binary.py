"""Multimodal columns (SURVEY.md §2.2): image/audio/video as opaque
``binary`` payloads + typed metadata structs, processed with
Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is real and tested — schema, batch
iteration, partition sizing, UDF signatures. The codec layer (actual
JPEG/audio decode) is STUBBED behind ``decode_image_stub`` /
``extract_frames_stub`` with deterministic fake outputs, because no
image/audio libraries exist in this container; swap the stub body for
PIL/torchaudio/ffmpeg in production — the dataflow does not change.

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

import hashlib
from typing import Iterator

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
        T.StructField("payload_sha", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from
    (seed, media_id) so tests are reproducible without real assets.
    Generated distributed (range → expressions), not driver-side."""
    df = spark.range(n).select(F.col("id").alias("media_id"))
    payload = F.encode(
        F.concat(F.lit(f"media-{seed}-"), F.col("media_id").cast("string")), "utf-8"
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        kind.alias("kind"),
        (F.col("media_id") % 640 + 1).cast("int").alias("width"),
        (F.col("media_id") % 480 + 1).cast("int").alias("height"),
        (F.col("media_id") * 33 % 10000).cast("int").alias("duration_ms"),
    )
    return df.select("media_id", payload.alias("payload"), meta.alias("meta"))


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real encoder: bytes of
    sha256(payload) scaled to [0,1), cycled to ``dim``."""
    h = hashlib.sha256(payload).digest()
    return [h[i % len(h)] / 256.0 for i in range(dim)]


def decode_image_stub(df: DataFrame, dim: int = 16) -> DataFrame:
    """'Decode + featurize' pass over binary payloads via mapInPandas.

    STUB: emits sha/byte-count/deterministic feature vector instead of
    pixel decoding (no image libs in this container). The Arrow batch
    shape, schema, and memory bounds are the production-real parts.

    Batch sizing: executor memory per task is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size —
    the DEPLOYMENT sets that conf (e.g. 64 for multi-MB media rows).
    This function deliberately does not set it: a session-wide conf
    mutation from inside a lazy plan builder would silently resize
    Arrow batches for every other pandas-UDF operator in the session.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_sha": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "n_bytes": [len(p) for p in payloads],
                    "feature": [_fake_feature(p, dim) for p in payloads],
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, schema=FEATURES_SCHEMA)


def extract_frames_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    frame offset (real impl: ffmpeg seek+decode per offset).

    The explode is JVM-side (sequence over duration from metadata);
    only per-frame decode would be Python. Non-video rows pass
    through with a single offset-0 frame."""
    frames = F.when(
        F.col("meta.kind") == "video",
        F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)),
    ).otherwise(F.array(F.lit(0)))
    out = df.select("media_id", "meta", F.explode(frames).alias("frame_offset_ms"))
    raise_col = F.lit(None).cast("binary")  # decode stub: no pixel data in-container
    return out.withColumn("frame_payload", raise_col)
