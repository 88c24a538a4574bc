"""Multimodal plumbing tests: schemas, Arrow batch shapes, frame
explosion — with the codec layer stubbed (no media libs here)."""

from __future__ import annotations

from dask_datapipeline_spark.multimodal.binary import (
    FEATURES_SCHEMA,
    decode_image_stub,
    extract_frames_stub,
    synthetic_media,
)


def test_media_featurize_schema_and_determinism(spark):
    media = synthetic_media(spark, n=32)
    feats = decode_image_stub(media, dim=8)
    assert feats.schema == FEATURES_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 32
    assert all(len(r.feature) == 8 for r in rows.values())
    assert all(0.0 <= x < 1.0 for r in rows.values() for x in r.feature)
    # deterministic: re-running yields identical features
    rows2 = {r.media_id: r for r in decode_image_stub(media, dim=8).collect()}
    assert all(rows[m].payload_sha == rows2[m].payload_sha for m in rows)
    assert all(rows[m].feature == rows2[m].feature for m in rows)


def test_frame_sampling_explodes_video_only(spark):
    media = synthetic_media(spark, n=30)
    frames = extract_frames_stub(media, every_ms=1000)
    per_kind = {
        (r.media_id, r.meta.kind): r
        for r in media.collect()
    }
    counts = {}
    for r in frames.collect():
        counts[r.media_id] = counts.get(r.media_id, 0) + 1
    for (mid, kind), row in per_kind.items():
        if kind == "video":
            expect = max(row.meta.duration_ms - 1, 0) // 1000 + 1
            assert counts[mid] == expect
        else:
            assert counts[mid] == 1
