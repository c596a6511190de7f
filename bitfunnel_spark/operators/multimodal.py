"""Multimodal column plumbing — image/audio/video as opaque binary columns.

AUDIO decode is REAL: WAV (RIFF/WAVE, 16-bit PCM) payloads are parsed with
the stdlib `wave` module — container header, frame count, and PCM samples —
so the audio leg exercises an actual codec round-trip with zero external
dependencies. IMAGE decode is REAL too: 24-bit uncompressed BI_RGB BMP
containers are written and parsed from scratch (struct + numpy — the format
is fully public and needs no codec library), including the format's
bottom-up row order, BGR channel order, and 4-byte row-stride padding.
Only VIDEO decode remains STUBBED (no pyav in this container): real
Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing) with a deterministic fake feature extractor, and a
clearly-marked NotImplementedError where the codec would plug in.

Design for 100 TB of media: binary payloads are large and skew row sizes —
`spark.sql.files.maxPartitionBytes` (not row counts) governs scan
partitioning, and feature extraction is a mapInPandas pass whose output is
small (drop the payload as early as possible; never shuffle binaries).
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, n_bytes long, payload_md5 string"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Manufacture an opaque-binary media table from the documents table
    (payload = utf-8 bytes of text) — exercises the binary-column plumbing
    end-to-end with typed metadata derivable in both engines."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        payload.alias("payload"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


AUDIO_SAMPLE_RATE = 8000


def audio_n_samples(media_id: int) -> int:
    """Deterministic per-id clip length (1024..2560 samples) — variable
    durations exercise the variable-row-size paths."""
    return 1024 + (int(media_id) % 4) * 512


def pcm_samples(media_id: int, n: int) -> np.ndarray:
    """The synthetic waveform: an integer-PRNG (LCG-style) int16 sample
    stream, pure int64 arithmetic so ANY engine (numpy here, DuckDB in the
    driver oracle) reproduces it bit-exactly — no libm trig whose last-ULP
    differences could flip a sample across a sign or floor boundary.

    media_id is pre-reduced mod 65536 before the multiply: only the
    residue mod 65536 survives the outer %, so this changes no sample
    value while keeping the product < 2^48 — int64-safe (and BIGINT-safe
    in the SQL mirror) at any doc-id scale."""
    t = np.arange(n, dtype=np.int64)
    seed = int(media_id) % 65536
    v = (seed * 2654435761 + t * 40503 + 12345) % 65536 - 32768
    return v.astype(np.int16)


def synthesize_wav(media_id: int, sample_rate: int = AUDIO_SAMPLE_RATE) -> bytes:
    """A REAL RIFF/WAVE container (mono, 16-bit PCM) around the
    deterministic waveform — stdlib `wave` writes the actual header +
    frames, so decoding exercises a genuine codec path."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm_samples(media_id, audio_n_samples(media_id)).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a WAV payload with the stdlib codec: (sample_rate, int16
    samples). Mono 16-bit PCM only — the synthesizer's format; anything
    else raises (wave validates the container itself)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"expected mono 16-bit PCM, got {w.getnchannels()}ch "
                f"{8 * w.getsampwidth()}-bit"
            )
        frames = w.readframes(w.getnframes())
        return w.getframerate(), np.frombuffer(frames, dtype=np.int16)


def image_dims(media_id: int) -> tuple[int, int]:
    """Deterministic per-id (width, height). The width residues (15, 22,
    29, 36) are chosen so 3·width mod 4 hits every value — each BMP
    row-padding amount (3, 2, 1, 0 bytes) is exercised; heights vary
    11..27 so the variable-row-size paths see both axes."""
    mid = int(media_id)
    return 15 + (mid % 4) * 7, 11 + (mid % 5) * 4


def pixel_bytes(media_id: int, width: int, height: int) -> np.ndarray:
    """The synthetic picture: an integer-PRNG (LCG-style) uint8 RGB array
    of shape (height, width, 3), row-major top-down, channel index fastest.
    Same pure-int64 recipe as pcm_samples (media_id pre-reduced mod 65536
    keeps the product < 2^48 — int64/BIGINT-safe at any doc-id scale), so
    ANY engine regenerates every byte bit-exactly."""
    t = np.arange(int(height) * int(width) * 3, dtype=np.int64)
    seed = int(media_id) % 65536
    v = (seed * 2654435761 + t * 40503 + 12345) % 256
    return v.astype(np.uint8).reshape(int(height), int(width), 3)


def _bmp_stride(width: int) -> int:
    """BMP rows pad to a 4-byte boundary."""
    return (width * 3 + 3) // 4 * 4


def synthesize_bmp(media_id: int) -> bytes:
    """A REAL 24-bit uncompressed (BI_RGB) BMP container around the
    deterministic picture — BITMAPFILEHEADER + BITMAPINFOHEADER written
    from scratch with struct (the format is public; no library needed),
    pixel rows stored bottom-up in BGR order with zero-padded stride."""
    w, h = image_dims(media_id)
    stride = _bmp_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # flip rows (bottom-up) and channels (RGB → BGR) into the padded grid
    rows[:, : w * 3] = pixel_bytes(media_id, w, h)[::-1, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a BMP payload from scratch: (width, height, uint8 RGB array
    of shape (height, width, 3), top-down). Strict to the synthesizer's
    format — 24-bit uncompressed BI_RGB, bottom-up rows, BITMAPINFOHEADER
    — anything else raises rather than guessing."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP container")
    file_size, _, _, offset = struct.unpack_from("<IHHI", payload, 2)
    hdr_size, w, h, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if file_size != len(payload) or offset != 54 or hdr_size != 40:
        raise ValueError("malformed BMP header")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"expected 24-bit uncompressed BI_RGB, got planes={planes} "
            f"bpp={bpp} compression={compression}"
        )
    if h <= 0 or w <= 0:
        raise ValueError("expected positive bottom-up dimensions")
    stride = _bmp_stride(w)
    if len(payload) != offset + stride * h:
        raise ValueError("pixel array size does not match dimensions")
    rows = np.frombuffer(payload, dtype=np.uint8, offset=offset).reshape(h, stride)
    # undo bottom-up row order and BGR channel order
    return w, h, rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """Decode media to samples/pixels. AUDIO (WAV) decodes for real via
    the stdlib `wave` codec → float64 samples in [-1, 1); IMAGE (BMP)
    decodes for real via the from-scratch BMP parser → flat float64
    pixels in [0, 1]. Video requires pyav — not in this container by
    design — and raises until a codec is wired in."""
    if kind == "audio" and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _, samples = decode_wav(payload)
        return samples.astype(np.float64) / 32768.0
    if kind == "image" and payload[:2] == b"BM":
        _, _, px = decode_bmp(payload)
        return px.reshape(-1).astype(np.float64) / 255.0
    raise NotImplementedError(
        "video decoding (and non-WAV/non-BMP payloads) requires codec "
        "libraries not present in this environment; wire pyav here in "
        "production (audio WAV and image BMP decode for real)"
    )


def fake_features(payload: bytes, n: int = 8) -> np.ndarray:
    """Deterministic stand-in feature vector: first n bytes, zero-padded,
    scaled to [0,1] — lets the pipeline (schema, batching, downstream joins)
    be tested byte-for-byte deterministically."""
    arr = np.frombuffer(payload[:n], dtype=np.uint8)
    out = np.zeros(n, dtype=np.float64)
    out[: arr.size] = arr / 255.0
    return out


def extract_features(
    media: DataFrame, n_features: int = 8, use_real_codec: bool = False
) -> DataFrame:
    """(media_id, kind, features array<double>) via mapInPandas.

    Arrow-batched; the payload column is projected away in the same pass so
    binaries never reach a shuffle. Set use_real_codec=True once decode_media
    is wired to a real library.
    """
    schema = "media_id long, kind string, features array<double>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                if use_real_codec:
                    decoded = decode_media(raw, kind)  # real for WAV audio
                    vec = np.zeros(n_features, dtype=np.float64)
                    head = decoded[:n_features].astype(np.float64)
                    vec[: head.size] = head
                    feats.append(vec)
                else:
                    feats.append(fake_features(raw, n_features))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(fn, schema)


def synthesize_audio(docs: DataFrame) -> DataFrame:
    """(media_id, payload) — a REAL WAV container per audio document
    (doc_id % 3 == 1, media_from_documents' kind rule), synthesized in a
    mapInPandas pass from doc_id alone. Deterministic end-to-end: the PCM
    stream is pure integer arithmetic (pcm_samples), so an oracle can
    regenerate it without touching the bytes."""
    schema = "media_id long, payload binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(
                {"media_id": ids, "payload": [synthesize_wav(int(i)) for i in ids]}
            )

    return docs.filter(F.col("doc_id") % 3 == 1).select("doc_id").mapInPandas(fn, schema)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV payloads (stdlib codec) and emit per-clip signal
    features: (media_id, sample_rate, n_samples, duration_sec, rms, peak,
    zcr). One mapInPandas pass; the payload is consumed and dropped in the
    same stage it was synthesized/scanned in — binaries never shuffle.
    Doubles are emitted unrounded; callers round for presentation.

    zcr counts strict sign alternations ((s<0) flips between neighbors)
    over n-1 adjacent pairs; peak is max |sample| (int32 math — |−32768|
    overflows int16)."""
    schema = (
        "media_id long, sample_rate int, n_samples long, duration_sec double, "
        "rms double, peak long, zcr double"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, s = decode_wav(bytes(payload))
                w = s.astype(np.int32)
                n = int(w.size)
                cross = int(np.count_nonzero((w[1:] < 0) != (w[:-1] < 0)))
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": sr,
                        "n_samples": n,
                        "duration_sec": n / sr,
                        # a zero-frame WAV is a valid container: all-zero
                        # features, never a reduction over an empty array
                        "rms": float(np.sqrt(np.mean(w.astype(np.float64) ** 2))) if n else 0.0,
                        "peak": int(np.max(np.abs(w))) if n else 0,
                        "zcr": cross / (n - 1) if n > 1 else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(fn, schema)


def synthesize_image(docs: DataFrame) -> DataFrame:
    """(media_id, payload) — a REAL BMP container per image document
    (doc_id % 3 == 0, media_from_documents' kind rule), synthesized in a
    mapInPandas pass from doc_id alone. Deterministic end-to-end: the
    pixel array is pure integer arithmetic (pixel_bytes), so an oracle can
    regenerate every byte without touching the container."""
    schema = "media_id long, payload binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(
                {"media_id": ids, "payload": [synthesize_bmp(int(i)) for i in ids]}
            )

    return docs.filter(F.col("doc_id") % 3 == 0).select("doc_id").mapInPandas(fn, schema)


def image_features(media: DataFrame) -> DataFrame:
    """Decode BMP payloads (from-scratch parser) and emit per-image pixel
    statistics: (media_id, width, height, n_pixels, px_sum, px_min,
    px_max, mean_r, mean_g, mean_b). One mapInPandas pass; the payload is
    consumed and dropped in the stage that made/scanned it — binaries
    never shuffle. px_sum is an exact int64 over every RGB byte, so a
    match certifies the container round-trip returned each byte intact;
    means are emitted unrounded (callers round for presentation)."""
    schema = (
        "media_id long, width int, height int, n_pixels long, px_sum long, "
        "px_min long, px_max long, mean_r double, mean_g double, mean_b double"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_bmp(bytes(payload))
                flat = px.reshape(-1).astype(np.int64)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "n_pixels": w * h,
                        "px_sum": int(flat.sum()),
                        "px_min": int(flat.min()),
                        "px_max": int(flat.max()),
                        # single float64 divide over exact int sums — the
                        # derivation order any engine reproduces bit-exactly
                        "mean_r": int(px[:, :, 0].astype(np.int64).sum()) / (w * h),
                        "mean_g": int(px[:, :, 1].astype(np.int64).sum()) / (w * h),
                        "mean_b": int(px[:, :, 2].astype(np.int64).sum()) / (w * h),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(fn, schema)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Plumbing for video frame sampling: emits (media_id, frame_idx) rows
    for a uniform sampling plan based on metadata only (no decode) — the
    shape a real sampler would fan out over. Deterministic: n_frames is
    faked as n_bytes // 64."""
    n_frames = (F.col("n_bytes") / 64).cast("long")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )
