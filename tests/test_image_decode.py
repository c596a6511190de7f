"""Real BMP codec round-trip (from-scratch struct/numpy writer + parser) —
the image leg of the multimodal family, decoded for real rather than
stubbed. Format facts exercised: bottom-up row order, BGR channel order,
4-byte row-stride padding (the width residues hit every pad 0..3)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators.multimodal import (
    _bmp_stride,
    decode_bmp,
    decode_media,
    extract_features,
    image_dims,
    image_features,
    pixel_bytes,
    synthesize_bmp,
    synthesize_image,
)


def test_synthesized_container_is_real_bmp():
    payload = synthesize_bmp(6)
    w, h = image_dims(6)
    assert payload[:2] == b"BM"
    file_size, _, _, offset = struct.unpack_from("<IHHI", payload, 2)
    hdr, bw, bh, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    assert (file_size, offset, hdr) == (len(payload), 54, 40)
    assert (bw, bh, planes, bpp, comp) == (w, h, 1, 24, 0)
    assert len(payload) == 54 + _bmp_stride(w) * h


def test_every_row_padding_amount_is_exercised():
    # widths 15/22/29/36 → 3w mod 4 = 1/2/3/0 → pad 3/2/1/0
    pads = {_bmp_stride(image_dims(mid)[0]) - image_dims(mid)[0] * 3
            for mid in (0, 3, 6, 9)}
    assert pads == {0, 1, 2, 3}


def test_decode_round_trips_every_pixel():
    # ids cover all four widths and all five heights, plus a huge id
    for mid in (0, 3, 6, 9, 12, 10**12 + 3):
        w, h, px = decode_bmp(synthesize_bmp(mid))
        assert (w, h) == image_dims(mid)
        assert px.shape == (h, w, 3) and px.dtype == np.uint8
        assert np.array_equal(px, pixel_bytes(mid, w, h))


def test_decode_media_dispatch():
    d = decode_media(synthesize_bmp(3), "image")
    w, h = image_dims(3)
    assert d.dtype == np.float64 and d.size == w * h * 3
    assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\n", "image")  # no codec guessing
    with pytest.raises(NotImplementedError):
        decode_media(synthesize_bmp(3), "video")  # video still stubbed


def test_decode_bmp_rejects_foreign_formats():
    good = synthesize_bmp(0)

    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 8)  # 8-bpp palette image
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))

    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8 compression
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))

    bad = bytearray(good)
    struct.pack_into("<i", bad, 22, -image_dims(0)[1])  # top-down rows
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))

    with pytest.raises(ValueError):
        decode_bmp(good[:-1])  # truncated pixel array
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp")


def test_pixel_bytes_int64_safe_at_any_doc_id():
    # only the residue mod 65536 drives the picture, so the pre-reduced
    # formula is value-identical AND overflow-free at 10^12-doc ids
    huge = 10**12 + 9
    assert np.array_equal(pixel_bytes(huge, 22, 15),
                          pixel_bytes(huge % 65536, 22, 15))
    assert pixel_bytes(huge, 22, 15).dtype == np.uint8


def test_image_features_match_numpy(spark, corpus):
    docs = corpus.select("doc_id").filter("doc_id < 30")
    media = synthesize_image(docs)
    rows = {r["media_id"]: r for r in image_features(media).collect()}
    assert set(rows) == {d for d in range(30) if d % 3 == 0}
    for mid, r in rows.items():
        w, h = image_dims(mid)
        px = pixel_bytes(mid, w, h).astype(np.int64)
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["px_sum"] == int(px.sum())
        assert r["px_min"] == int(px.min()) and r["px_max"] == int(px.max())
        for ch, name in enumerate(("mean_r", "mean_g", "mean_b")):
            assert r[name] == pytest.approx(
                int(px[:, :, ch].sum()) / (w * h), abs=1e-12)


def test_extract_features_real_codec_on_bmp(spark, corpus):
    docs = corpus.select("doc_id").filter("doc_id < 10")
    media = synthesize_image(docs).withColumn("kind", F.lit("image"))
    feats = {r["media_id"]: r["features"]
             for r in extract_features(media, n_features=4, use_real_codec=True).collect()}
    for mid, vec in feats.items():
        w, h = image_dims(mid)
        want = pixel_bytes(mid, w, h).reshape(-1)[:4].astype(np.float64) / 255.0
        assert vec == pytest.approx(list(want), abs=1e-12)
