"""Multimodal audio/video containers + operators (media_av.py)."""

from __future__ import annotations

import numpy as np

from indonesian_id_ocr_service_spark.operators import media_av as AV


def test_vid1_roundtrip():
    frames = [np.full((8, 12), v, np.uint8) for v in (0, 99, 255)]
    dec = AV.decode_vid1(AV.encode_vid1(frames))
    assert len(dec) == 3
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    assert AV.decode_vid1(b"nope") is None
    assert AV.decode_vid1(AV.encode_vid1(frames)[:10]) is None


def test_aud1_roundtrip():
    pcm = np.array([-32768, -1, 0, 1, 32767], np.int16)
    rate, out = AV.decode_aud1(AV.encode_aud1(pcm, 16000))
    assert rate == 16000
    assert np.array_equal(out, pcm)
    assert AV.decode_aud1(b"nope") is None
    assert AV.decode_aud1(AV.encode_aud1(pcm, 16000)[:8]) is None


def test_synth_video_closed_form():
    for i in (0, 3, 11):
        frames = AV.decode_vid1(AV.synth_video(i))
        assert len(frames) == 4 + i % 5
        for j, frm in enumerate(frames):
            assert frm.shape == (32, 48)
            assert int(frm[0, 0]) == 40 + (i * 7 + j * 13) % 180
            assert float(frm.mean()) == float(frm[0, 0])


def test_frame_sample_operator(spark):
    df = spark.createDataFrame(
        [(i, AV.synth_video(i)) for i in range(6)],
        "doc_id long, payload binary")
    rows = AV.frame_sample(df, every_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i in range(6):
        n_frames = 4 + i % 5
        want = [j for j in range(n_frames) if j % 2 == 0]
        got = sorted(r.frame_idx for r in by_doc[i])
        assert got == want
        for r in by_doc[i]:
            assert (r.h, r.w) == (32, 48)
            assert r.mean_q == 4 * (40 + (i * 7 + r.frame_idx * 13) % 180)
    # corrupt payloads drop, not crash
    bad = spark.createDataFrame(
        [(99, b"garbage"), (100, None)], "doc_id long, payload binary")
    assert AV.frame_sample(bad).count() == 0


def test_audio_features_operator(spark):
    df = spark.createDataFrame(
        [(i, AV.synth_audio(i)) for i in range(5)],
        "doc_id long, payload binary")
    rows = {r.doc_id: r for r in AV.audio_features(df).collect()}
    for i in range(5):
        r = rows[i]
        n = 800 + (i % 4) * 400
        assert r.rate == 8000 and r.n_samples == n
        assert r.duration_ms == round(1000.0 * n / 8000.0)
        # a sine of f Hz over n samples crosses zero ~2·f·n/rate times
        f = 220 + (i % 5) * 110
        approx = 2.0 * f * n / 8000.0
        assert abs(r.zero_crossings - approx) <= 2, (i, r.zero_crossings)
        assert 16000 < r.peak <= 16384
        # RMS of a full-scale/2 sine ≈ 16383.5/sqrt(2)
        assert abs(r.rms - 16383.5 / np.sqrt(2)) < 60
