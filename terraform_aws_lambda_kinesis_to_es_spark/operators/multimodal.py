"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: media lives as an opaque
``binary`` column (or a reference to object storage) beside a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so each executor processes whole record batches in one
Python hop, and everything before/after stays relational.

The actual codec calls are STUBBED here (no image/audio libraries in this
container — clearly marked below); the Spark-side plumbing — schema,
binary handling, Arrow batch shape, partition behavior — is real and
tested. Swapping in PIL/torchaudio/ffmpeg is a pure function replacement
inside ``_extract_batch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media_type string, n_bytes long, head_md5 string"


def attach_payload(df: DataFrame, text_col: str = "text", media_type: str = "text/plain") -> DataFrame:
    """Attach an opaque binary payload + metadata struct. In a real corpus
    the payload column comes straight from parquet ``binary``; here the
    documents' text doubles as payload bytes."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("format"),
            F.length(F.col(text_col)).cast("long").alias("n_chars"),
        ),
    )


def decode_image(payload: bytes) -> object:
    """STUB: image decode (PIL/opencv not available in this container).
    The mapInPandas plumbing around it is real; replace this body with
    ``PIL.Image.open(io.BytesIO(payload))`` when the codec is present."""
    raise NotImplementedError("image codecs not available in this environment")


def decode_audio(payload: bytes) -> object:
    """STUB: audio decode (soundfile/torchaudio not available)."""
    raise NotImplementedError("audio codecs not available in this environment")


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """STUB: video frame sampling (ffmpeg not available)."""
    raise NotImplementedError("video codecs not available in this environment")


def _extract_batch(pdf: pd.DataFrame, media_type: str) -> pd.DataFrame:
    """Deterministic feature extraction over one Arrow batch. This is the
    seam where real decoders plug in; the fallback features (byte length,
    head digest) are computable for any payload and keep the pipeline
    testable without codecs."""
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": media_type,
            "n_bytes": payloads.map(len).astype("int64"),
            "head_md5": payloads.map(lambda b: hashlib.md5(bytes(b)[:16]).hexdigest()),
        }
    )


def extract_features(df: DataFrame, media_type: str = "text/plain") -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas: executors stream
    record batches through Python once; output schema is fixed/typed.
    Map-only — partitioning of the input is preserved, no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf, media_type)

    return df.select("doc_id", "payload").mapInPandas(gen, MEDIA_SCHEMA)
