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


def attach_mixed_modalities(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Multimodal-shaped frame with a deterministic modality mix
    (doc_id mod 4 -> text/image/audio/video): models an ingest where
    one table carries heterogeneous media as opaque bytes + typed
    metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    modality = (
        F.when(F.col(id_col) % 4 == 0, "text")
        .when(F.col(id_col) % 4 == 1, "image")
        .when(F.col(id_col) % 4 == 2, "audio")
        .otherwise("video")
    )
    mime = (
        F.when(F.col(id_col) % 4 == 0, "text/plain")
        .when(F.col(id_col) % 4 == 1, "image/png")
        .when(F.col(id_col) % 4 == 2, "audio/wav")
        .otherwise("video/mp4")
    )
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        mime.alias("mime"),
        modality.alias("modality"),
        F.length(payload).cast("bigint").alias("byte_len"),
        F.md5(payload).alias("content_md5"),
    )


# --- per-modality codec stubs -------------------------------------------
# STUBS: the real bodies need PIL / librosa / ffmpeg, which are not in
# this container. Each takes exactly what the real decode would take
# and returns a deterministic feature string derived from the payload,
# so the Spark-side plumbing (schema, dispatch, Arrow batch shape) is
# fully real and oracle-checkable. Swap the body, keep the signature.


def _image_resize_stub(payload: bytes, target: tuple[int, int] = (224, 224)) -> str:
    """Real impl: decode PNG/JPEG, resize to `target`, return pixels.
    Stub: deterministic pseudo-dimensions from the byte length."""
    w, h = (len(payload) % 640) + 1, (len(payload) % 480) + 1
    return f"img:{w}x{h}->{target[0]}x{target[1]}"


def _audio_features_stub(payload: bytes, frame_ms: int = 25) -> str:
    """Real impl: decode WAV/FLAC, frame at `frame_ms`, MFCCs.
    Stub: frame count from byte length at a fake 16 kHz/16-bit rate."""
    n_frames = max(len(payload) // (16000 * 2 * frame_ms // 1000), 1)
    return f"aud:{n_frames}f@{frame_ms}ms"


def _video_frame_sample_stub(payload: bytes, every_n: int = 30) -> str:
    """Real impl: demux, decode every `every_n`-th frame.
    Stub: sampled-frame count from a fake 24 fps byte-rate model."""
    n_sampled = max(len(payload) // 1024, 1) // every_n + 1
    return f"vid:{n_sampled}s/{every_n}"


def extract_features_dispatched(mm: DataFrame) -> DataFrame:
    """Modality-dispatched decode/featurize over mapInPandas: one
    Arrow-batched stage routing each row to its codec. Unknown
    modalities raise (fail fast, same contract as _decode_stub)."""

    dispatch = {
        "text": lambda p: _decode_stub(p, "text"),
        "image": _image_resize_stub,
        "audio": _audio_features_stub,
        "video": _video_frame_sample_stub,
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p, m in zip(pdf["payload"], pdf["modality"]):
                fn = dispatch.get(m)
                if fn is None:
                    raise NotImplementedError(f"unknown modality: {m}")
                feats.append(fn(bytes(p)))
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
