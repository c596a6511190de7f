"""Real WAV codec round-trip (stdlib `wave`) — the audio leg of the
multimodal family, decoded for real rather than stubbed."""

from __future__ import annotations

import wave
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators.multimodal import (
    audio_features,
    audio_n_samples,
    decode_media,
    decode_wav,
    extract_features,
    pcm_samples,
    synthesize_audio,
    synthesize_wav,
)


def test_synthesized_container_is_real_wav():
    payload = synthesize_wav(10)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 8000)
        assert w.getnframes() == audio_n_samples(10)


def test_decode_round_trips_every_sample():
    for mid in (1, 4, 7, 22, 9001):
        sr, s = decode_wav(synthesize_wav(mid))
        assert sr == 8000
        assert np.array_equal(s, pcm_samples(mid, audio_n_samples(mid)))


def test_decode_media_dispatch():
    d = decode_media(synthesize_wav(7), "audio")
    assert d.dtype == np.float64 and float(np.abs(d).max()) <= 1.0
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\n", "image")
    with pytest.raises(NotImplementedError):
        # audio kind without a WAV container still refuses (no codec guess)
        decode_media(b"not a riff file", "audio")


def test_decode_wav_rejects_non_mono_pcm():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 8)
    with pytest.raises(ValueError):
        decode_wav(buf.getvalue())


def test_pcm_samples_int64_safe_at_any_doc_id():
    # only the residue mod 65536 drives the waveform, so the pre-reduced
    # formula is value-identical AND overflow-free at 10^12-doc ids
    huge = 10**12 + 7
    assert np.array_equal(pcm_samples(huge, 64), pcm_samples(huge % 65536, 64))
    assert pcm_samples(huge, 64).dtype == np.int16


def test_audio_features_zero_frame_wav(spark):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"")
    media = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                                  "media_id long, payload binary")
    [r] = audio_features(media).collect()
    assert (r["n_samples"], r["rms"], r["peak"], r["zcr"], r["duration_sec"]) == (
        0, 0.0, 0, 0.0, 0.0)


def test_audio_features_match_numpy(spark, corpus):
    docs = corpus.select("doc_id").filter("doc_id < 30")
    media = synthesize_audio(docs.withColumnRenamed("doc_id", "doc_id"))
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert set(rows) == {d for d in range(30) if d % 3 == 1}
    for mid, r in rows.items():
        n = audio_n_samples(mid)
        w = pcm_samples(mid, n).astype(np.int64)
        assert r["n_samples"] == n and r["sample_rate"] == 8000
        assert r["peak"] == int(np.max(np.abs(w)))
        assert r["rms"] == pytest.approx(
            float(np.sqrt(np.mean(w.astype(np.float64) ** 2))), abs=1e-9
        )
        cross = int(np.count_nonzero((w[1:] < 0) != (w[:-1] < 0)))
        assert r["zcr"] == pytest.approx(cross / (n - 1), abs=1e-12)
        assert r["duration_sec"] == pytest.approx(n / 8000, abs=1e-12)


def test_extract_features_real_codec_on_wav(spark, corpus):
    docs = corpus.select("doc_id").filter("doc_id < 10")
    media = synthesize_audio(docs).withColumn("kind", F.lit("audio"))
    feats = {r["media_id"]: r["features"]
             for r in extract_features(media, n_features=4, use_real_codec=True).collect()}
    for mid, vec in feats.items():
        want = pcm_samples(mid, 4).astype(np.float64) / 32768.0
        assert vec == pytest.approx(list(want), abs=1e-12)
