"""Multimodal column handling: opaque binary payloads with typed
metadata, plus decode/feature-extraction plumbing over mapInPandas.

Design: media bytes ride as a `binary` column next to a metadata
struct (modality, mime, byte_len, content hash). The *decode* step
(image resize, audio features, video frame-sample) is a Pandas-UDF
stage over Arrow batches — the real scale-relevant machinery is the
schema, partitioning, and batch shape; the codec call itself is
stubbed here because image/audio libraries are not available in this
environment (clearly marked below).

At 100 TB: binary payloads dominate bytes, so the pipeline (a) never
shuffles the binary column unless the operator needs it co-located,
(b) prunes to metadata-only for any query that doesn't touch bytes
(columnar parquet makes this free), and (c) sizes Arrow batches by
bytes, not rows (spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("feature", StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a multimodal-shaped frame from a text corpus: the UTF-8
    bytes stand in for an opaque media payload, with typed metadata
    columns the way a real ingest would carry them."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit("text").alias("modality"),
        F.length(payload).cast("bigint").alias("byte_len"),
        F.md5(payload).alias("content_md5"),
    )


def _decode_stub(payload: bytes, modality: str) -> str:
    """STUB: stands in for the real codec (PIL/librosa/ffmpeg are not
    installed in this container). Deterministic fake 'feature': a
    fingerprint of the payload head/tail. Replace the body with the
    real decode + featurize when media libs are present."""
    if modality not in ("text", "image", "audio", "video"):
        raise NotImplementedError(f"unknown modality: {modality}")
    head = payload[:8].hex()
    tail = payload[-8:].hex()
    return f"{modality}:{len(payload)}:{head}:{tail}"


def extract_features(mm: DataFrame) -> DataFrame:
    """Decode/featurize stage over mapInPandas: Arrow-batched, no
    per-row Python calls into Spark, executor-parallel. The stub keeps
    the plumbing (schema in/out, batch iteration, binary handling)
    fully real and testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["byte_len"],
                    "content_md5": pdf["content_md5"],
                    "feature": feats,
                }
            )

    return mm.mapInPandas(run, FEATURE_SCHEMA)


def metadata_only(mm: DataFrame) -> DataFrame:
    """Metadata projection — the common fast path. Columnar pruning
    means the binary column is never read from parquet for this plan
    (verify via ReadSchema in .explain)."""
    return mm.select("doc_id", "modality", "mime", "byte_len", "content_md5")
