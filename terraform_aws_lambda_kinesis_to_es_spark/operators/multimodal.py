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


FRAME_SCHEMA = "doc_id long, frame_idx long, n_bytes long"
FRAME_SIZE = 64
FRAME_EVERY_N = 4


def fake_decode_frames(
    payload: bytes, frame_size: int = FRAME_SIZE, every_n: int = FRAME_EVERY_N
) -> list[bytes]:
    """Deterministic FAKE video decode (ffmpeg not in this container):
    fixed-size byte chunks stand in for frames, and every ``every_n``-th
    chunk is the sampled frame. Replacing this body with real ffmpeg
    frame extraction changes nothing about the Spark plumbing around it."""
    step = frame_size * every_n
    return [payload[s : s + frame_size] for s in range(0, len(payload), step)]


def sample_frame_features(
    df: DataFrame, frame_size: int = FRAME_SIZE, every_n: int = FRAME_EVERY_N
) -> DataFrame:
    """Frame sampling as mapInPandas row EXPLOSION: each input record
    yields one output row per sampled frame — the 1->N batch shape real
    video pipelines need (batch sizes change across the Python hop; the
    fixed output schema is what keeps that sound). Map-only: input
    partitioning is preserved, no shuffle; at 100 TB the frame rows feed
    straight into a downstream embed/dedup stage without repartitioning."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for j, frame in enumerate(
                    fake_decode_frames(bytes(payload), frame_size, every_n)
                ):
                    ids.append(doc_id)
                    idxs.append(j)
                    sizes.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(gen, FRAME_SCHEMA)


def extract_features(df: DataFrame, media_type: str = "text/plain") -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas: executors stream
    record batches through Python once; output schema is fixed/typed.
    Map-only — partitioning of the input is preserved, no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf, media_type)

    return df.select("doc_id", "payload").mapInPandas(gen, MEDIA_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB: real image resize (PIL ``Image.resize`` + re-encode); the
    mapInPandas plumbing in :func:`resize_features` is real."""
    raise NotImplementedError("image codecs not available in this environment")


RESIZE_FACTOR = 4
RESIZE_SCHEMA = "doc_id long, orig_bytes long, resized_bytes long, resized_head_hex string"


def fake_resize(payload: bytes, factor: int = RESIZE_FACTOR) -> bytes:
    """Deterministic resize stand-in: keep every ``factor``-th byte (a
    1-D 'downsample'). Replacing this body with :func:`resize_image`
    changes nothing about the Spark plumbing around it."""
    return payload[::factor]


def resize_features(df: DataFrame, factor: int = RESIZE_FACTOR) -> DataFrame:
    """Resize as an Arrow-batched 1->1 transform: binary in, binary-derived
    features out, fixed typed schema. Map-only (partitioning preserved);
    at 100 TB this is the thumbnailing stage that runs next to decode,
    and its output feeds storage or an embed stage without a shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            orig: list[int] = []
            resized: list[int] = []
            heads: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                r = fake_resize(b, factor)
                ids.append(doc_id)
                orig.append(len(b))
                resized.append(len(r))
                heads.append(r[:8].hex())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "orig_bytes": pd.Series(orig, dtype="int64"),
                    "resized_bytes": pd.Series(resized, dtype="int64"),
                    "resized_head_hex": pd.Series(heads, dtype="object"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(gen, RESIZE_SCHEMA)
