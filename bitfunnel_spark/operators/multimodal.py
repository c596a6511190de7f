"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The decode step is STUBBED (no image/audio libs in this container): real
Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing) with a deterministic fake feature extractor, and a
clearly-marked NotImplementedError where a real codec would plug in.

Design for 100 TB of media: binary payloads are large and skew row sizes —
`spark.sql.files.maxPartitionBytes` (not row counts) governs scan
partitioning, and feature extraction is a mapInPandas pass whose output is
small (drop the payload as early as possible; never shuffle binaries).
"""

from __future__ import annotations

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


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """REAL-CODEC STUB: would decode image/audio/video to pixels/samples.

    Requires pillow/libav etc. — not in this container by design.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; wire pillow/torchaudio/pyav here in production"
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
                    decoded = decode_media(raw, kind)  # pragma: no cover (stub)
                    feats.append(decoded[:n_features].astype(np.float64))
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
