"""Pure-numpy BMP/WAV/container codecs: round-trips + Spark decode surface."""

import numpy as np
import pytest

from iresearch_spark import multimodal as mm


def test_bmp_roundtrip_solid():
    img = np.full((5, 7, 3), (10, 200, 30), dtype=np.uint8)
    w, h, r, g, b = mm.decode_bmp(mm.encode_bmp(img))
    assert (w, h) == (7, 5) and (r, g, b) == (10.0, 200.0, 30.0)


def test_bmp_roundtrip_gradient():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(9, 4, 3), dtype=np.uint8)
    w, h, r, g, b = mm.decode_bmp(mm.encode_bmp(img))
    means = img.reshape(-1, 3).mean(axis=0)
    assert (w, h) == (4, 9)
    np.testing.assert_allclose([r, g, b], means)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"JUNKJUNKJUNKJUNK")


def test_wav_roundtrip():
    sr = 16000
    samples = (np.sin(np.linspace(0, 20, 1234)) * 12000).astype(np.int16)
    got_sr, n, rms = mm.decode_wav(mm.encode_wav(samples, sr))
    assert got_sr == sr and n == 1234
    np.testing.assert_allclose(rms, np.sqrt(np.mean(samples.astype(np.float64) ** 2)))


def test_square_wave_rms_exact():
    sr, n, amp = mm.synth_audio_params(123)
    got_sr, got_n, rms = mm.decode_wav(mm.synth_audio(123))
    assert (got_sr, got_n) == (sr, n) and rms == float(amp)


def test_video_container():
    payload = mm.synth_video(42)
    n_frames, fps, w, h = mm.decode_video_header(payload)
    en, efps = mm.synth_video_params(42)
    assert (n_frames, fps) == (en, efps)
    ew, eh, *_ = mm.synth_image_params(42)
    assert (w, h) == (ew, eh)


def test_spark_image_meta(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = mm.synth_media(df, "image")
    rows = {r["doc_id"]: r for r in mm.image_meta(media).collect()}
    for i in (0, 7, 39):
        w, h, r, g, b = mm.synth_image_params(i)
        row = rows[i]
        assert (row["width"], row["height"]) == (w, h)
        assert (row["mean_r"], row["mean_g"], row["mean_b"]) == (float(r), float(g), float(b))


def test_spark_frame_plan(spark):
    df = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    media = mm.synth_media(df, "video")
    rows = mm.frame_sample_plan(media, every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for i in (0, 5, 19):
        n, _ = mm.synth_video_params(i)
        assert sorted(by_doc[i]) == list(range(0, n, 2))
