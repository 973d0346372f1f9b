"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake behind `decode_stub` (clearly marked; swap in
PIL/torchaudio as a rule-pack at deploy time). Everything Spark-side
— schema, conv-keyed partitioning, mapInPandas batch shape, UDF
signatures — is real and tested. The deterministic fake makes even
this path oracle-checkable (sql/data_templates.py reproduces the
arithmetic).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, payload BINARY, "
    "meta_codec STRING, meta_bytes BIGINT"
)
FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, width INT, height INT, "
    "n_frames INT, feat ARRAY<DOUBLE>"
)


def attach_media(documents: DataFrame) -> DataFrame:
    """Simulated ingest: derive an opaque binary payload column from
    the document text (deterministic; stands in for an
    image/audio/video blob column in the real table) plus typed
    metadata."""
    return documents.selectExpr(
        "doc_id",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type",
        "CAST(text AS BINARY) AS payload",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS meta_codec",
        # octet_length, not length: payload size is BYTES (diverges
        # from character count on any non-ASCII corpus)
        "CAST(octet_length(text) AS BIGINT) AS meta_bytes",
    )


def decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decode — deterministic fake. Production replaces this with
    PIL.Image.open / soundfile.read / pyav frame sampling; the UDF
    signature and batch shape stay identical.

    Raises NotImplementedError for unknown media types (the
    clearly-marked boundary)."""
    n = len(payload)
    if media_type == "image":
        return {"width": n % 64 + 1, "height": n % 48 + 1, "n_frames": 1}
    if media_type == "audio":
        return {"width": 0, "height": 0, "n_frames": n % 1000 + 1}
    if media_type == "video":
        return {"width": n % 64 + 1, "height": n % 48 + 1, "n_frames": n % 120 + 1}
    raise NotImplementedError(f"no decoder for media_type={media_type!r}")


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched mapInPandas over the binary column: decode
    (stub), emit shape metadata + a small deterministic feature
    vector (mean byte value per 4-way stripe — stands in for a CNN /
    mel-spectrogram embedding)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                d = decode_stub(bytes(payload), mt)
                b = bytes(payload)
                stripes = []
                for s in range(4):
                    seg = b[s::4]
                    stripes.append(round(sum(seg) / len(seg), 4) if seg else 0.0)
                rows.append((doc_id, mt, d["width"], d["height"], d["n_frames"], stripes))
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "width", "height", "n_frames", "feat"]
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame
    index (explode of the stub's frame count). Real decoders plug in
    at decode_stub without touching this plan."""
    feats = extract_features(media)
    return feats.selectExpr(
        "doc_id",
        "media_type",
        f"explode(sequence(0, greatest(n_frames - 1, 0), {every_n})) AS frame_idx",
    )
