"""Multimodal tests: REAL stdlib codecs (BMP/WAV/DIB-AVI) round-trip
byte-exactly, the Arrow decode pass reproduces content computed
independently from the generators, and frame sampling re-encodes
playable standalone images."""

from __future__ import annotations

import numpy as np
import pytest

from dask_datapipeline_spark.multimodal import binary as M


def test_bmp_roundtrip_and_size():
    for mid in (0, 3, 9, 251):
        w, h = M.image_dims(mid)
        px = M._frame_pixels(mid, 0, w, h)
        bmp = M.encode_bmp(px)
        assert len(bmp) == M.bmp_n_bytes(w, h)
        assert bmp[:2] == b"BM"
        assert np.array_equal(M.decode_bmp(bmp), px)


def test_wav_roundtrip_and_size():
    for mid in (1, 4, 13):
        ns = M.audio_n_samples(mid)
        s = M.audio_sample(mid, np.arange(ns)).astype(np.int16)
        wav = M.encode_wav(s)
        assert len(wav) == M.wav_n_bytes(ns)
        rate, back = M.decode_wav(wav)
        assert rate == M.AUDIO_RATE
        assert np.array_equal(back, s)


def test_avi_roundtrip_and_size():
    for mid in (2, 5, 254):
        w, h, nf = M.video_dims(mid)
        frames = [M._frame_pixels(mid, f, w, h) for f in range(nf)]
        avi = M.encode_avi(frames)
        assert len(avi) == M.avi_n_bytes(w, h, nf)
        assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
        fps, back = M.decode_avi(avi)
        assert fps == M.VIDEO_FPS and len(back) == nf
        for a, b in zip(frames, back):
            assert np.array_equal(a, b)


def test_sniff_rejects_garbage():
    with pytest.raises(ValueError, match="unknown payload magic"):
        M.sniff_kind(b"\x00\x01\x02\x03garbage")
    with pytest.raises(ValueError, match="not a BMP"):
        M.decode_bmp(b"XXnot-a-bmp-at-all-padding-padding-padding")


def test_decoder_rejects_unsupported_variants():
    # 8-bit BMP (palette) must be refused, not mis-decoded
    px = M._frame_pixels(1, 0, 8, 8)
    bmp = bytearray(M.encode_bmp(px))
    bmp[28] = 8  # biBitCount
    with pytest.raises(ValueError, match="unsupported BMP"):
        M.decode_bmp(bytes(bmp))
    # stereo WAV must be refused
    wav = bytearray(M.encode_wav(np.zeros(10, dtype=np.int16)))
    wav[22] = 2  # nChannels
    with pytest.raises(ValueError, match="unsupported WAV"):
        M.decode_wav(bytes(wav))


def test_media_features_match_content_functions(spark):
    """The Spark decode pass must reproduce sums computed directly
    from the generator functions — agreement proves the encoder and
    decoder invert each other THROUGH the Arrow batch boundary."""
    feats = {r.media_id: r for r in M.media_features(M.synthetic_media(spark, n=48)).collect()}
    assert len(feats) == 48
    for mid in range(48):
        r = feats[mid]
        kind = ["image", "audio", "video"][mid % 3]
        assert r.kind == kind
        if kind == "image":
            w, h = M.image_dims(mid)
            px = M._frame_pixels(mid, 0, w, h).astype(np.int64)
            assert (r.width, r.height, r.n_frames, r.n_samples) == (w, h, 1, 0)
            assert r.n_bytes == M.bmp_n_bytes(w, h)
            assert (r.sum_r, r.sum_g, r.sum_b) == tuple(px.sum((0, 1)))
            assert r.sum_abs_sample == 0
        elif kind == "audio":
            ns = M.audio_n_samples(mid)
            s = M.audio_sample(mid, np.arange(ns))
            assert (r.width, r.height, r.n_frames, r.n_samples) == (0, 0, 0, ns)
            assert r.n_bytes == M.wav_n_bytes(ns)
            assert r.sum_abs_sample == int(np.abs(s).sum())
        else:
            w, h, nf = M.video_dims(mid)
            tot = sum(
                M._frame_pixels(mid, f, w, h).astype(np.int64).sum((0, 1))
                for f in range(nf)
            )
            assert (r.width, r.height, r.n_frames) == (w, h, nf)
            assert r.n_bytes == M.avi_n_bytes(w, h, nf)
            assert (r.sum_r, r.sum_g, r.sum_b) == tuple(tot)


def test_extract_frames_samples_and_reencodes(spark):
    """every_ms=500 at 4 fps → every 2nd frame; each emitted BMP must
    decode to exactly that frame's pixels. Non-video rows never reach
    the decoder (filtered JVM-side)."""
    media = M.synthetic_media(spark, n=30)
    out = M.frame_features(M.extract_frames(media, every_ms=500)).collect()
    got = {(r.media_id, r.frame_index): r for r in out}
    expected = 0
    for mid in range(30):
        if mid % 3 != 2:
            continue
        w, h, nf = M.video_dims(mid)
        for fi in range(0, nf, 2):
            expected += 1
            r = got[(mid, fi)]
            assert r.frame_offset_ms == fi * 250
            px = M._frame_pixels(mid, fi, w, h).astype(np.int64)
            assert (r.sum_r, r.sum_g, r.sum_b) == tuple(px.sum((0, 1)))
            assert r.n_bytes == M.bmp_n_bytes(w, h)
    assert len(got) == expected


def test_decoders_fail_cleanly_on_truncation():
    """Truncated containers must raise (ValueError/struct.error), not
    return garbage pixels/samples — a 100 TB corpus WILL contain
    half-uploaded objects and the decode pass must surface them."""
    import struct as _struct

    w, h = M.image_dims(5)
    bmp = M.encode_bmp(M._frame_pixels(5, 0, w, h))
    wav = M.encode_wav(M.audio_sample(7, np.arange(100)).astype(np.int16))
    vw, vh, nf = M.video_dims(8)
    avi = M.encode_avi([M._frame_pixels(8, f, vw, vh) for f in range(nf)])
    for payload, dec in [
        (bmp, M.decode_bmp),
        (wav, M.decode_wav),
        (avi, M.decode_avi),
    ]:
        for cut in (4, 13, len(payload) // 2, len(payload) - 3):
            with pytest.raises((ValueError, _struct.error)):
                dec(payload[:cut])


def test_audio_features_match_content(spark):
    """Energy / zero-crossings / peak from the REAL decode must equal
    the values computed directly from the sample function."""
    out = {r.media_id: r for r in M.audio_features(M.synthetic_media(spark, n=30)).collect()}
    expected_ids = {m for m in range(30) if m % 3 == 1}
    assert set(out) == expected_ids
    for mid in expected_ids:
        s = M.audio_sample(mid, np.arange(M.audio_n_samples(mid))).astype(np.int64)
        r = out[mid]
        assert r.sample_rate == M.AUDIO_RATE
        assert r.energy == int((s * s).sum())
        nn = s >= 0
        assert r.zero_crossings == int(np.count_nonzero(nn[1:] != nn[:-1]))
        assert r.peak_abs == int(np.abs(s).max())


def test_image_histograms_counts(spark):
    """Bucket counts must sum to w*h per channel and match a direct
    numpy histogram of the generator pixels."""
    out = M.image_histograms(M.synthetic_media(spark, n=12)).collect()
    got = {}
    for r in out:
        got.setdefault((r.media_id, r.channel), {})[r.bucket] = r.n_pixels
    for mid in range(12):
        if mid % 3 != 0:
            continue
        w, h = M.image_dims(mid)
        px = M._frame_pixels(mid, 0, w, h)
        for ci, cname in enumerate("rgb"):
            want = np.bincount(px[:, :, ci].reshape(-1) // 16, minlength=16)
            buckets = got[(mid, cname)]
            assert sum(buckets.values()) == w * h
            for b, n in buckets.items():
                assert n == want[b]
    with pytest.raises(ValueError, match="n_buckets"):
        M.image_histograms(M.synthetic_media(spark, n=3), n_buckets=7)


def test_new_operators_handle_empty_inputs(spark):
    """Empty media/embedding frames must yield empty results with the
    declared schemas — not crash in the pandas batch path (a filtered
    partition at scale IS an empty Arrow batch)."""
    import pandas as pd

    from dask_datapipeline_spark.operators.classifier import compression_quality
    from dask_datapipeline_spark.operators.similarity import embedding_moments

    empty_media = M.synthetic_media(spark, n=3).filter("media_id > 100")
    assert M.media_features(empty_media).count() == 0
    assert M.audio_features(empty_media).count() == 0
    assert M.image_histograms(empty_media).count() == 0
    assert M.frame_features(M.extract_frames(empty_media)).count() == 0

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert compression_quality(docs).count() == 0

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    ).filter("vec_id > 5")
    assert embedding_moments(emb).count() == 0
