"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: media lives as an opaque
``binary`` column (or a reference to object storage) beside a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so each executor processes whole record batches in one
Python hop, and everything before/after stays relational.

Codecs: the dependency-free formats are decoded FOR REAL here —
PPM (P6) and uncompressed 24-bit BMP images to numpy pixel arrays,
RIFF/WAVE PCM audio to sample arrays, and concatenated-P6 streams as
the frame container — plus real nearest-neighbor resize with P6
re-encode. Compressed formats (JPEG/PNG/H.264/MP3) need external
libraries that are not in this container; those paths raise a clearly
marked ``ValueError`` on their magic bytes, and plugging PIL/torchaudio/
ffmpeg in is a pure function replacement — the Spark-side plumbing
(schema, binary handling, Arrow batch shape, partition behavior) is
identical and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
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


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary-PPM (P6) header, tolerating comments/whitespace per
    the Netpbm spec. Returns (width, height, maxval, data_offset)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raw data
    w, h, maxval = fields
    if maxval >= 256:
        raise ValueError("16-bit PPM not supported")
    return w, h, maxval, i


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode for the dependency-free formats: binary PPM (P6)
    and uncompressed 24-bit BMP, to an (H, W, 3) uint8 RGB array.
    Compressed formats (JPEG/PNG magic) raise ValueError — decoding them
    needs PIL/opencv, not present in this container; swapping
    ``PIL.Image.open`` into this body changes nothing upstream."""
    if payload[:2] == b"P6":
        w, h, _maxval, off = _parse_ppm_header(payload)
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
        return px.reshape(h, w, 3).copy()
    if payload[:2] == b"BM":
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w = struct.unpack_from("<i", payload, 18)[0]
        h = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0:
            raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        return (rgb[::-1] if bottom_up else rgb).copy()
    raise ValueError("unsupported image format (compressed codecs need PIL/opencv)")


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode for RIFF/WAVE PCM (8- or 16-bit): walks the
    chunk list, returns ((frames, channels) sample array, sample_rate).
    Compressed audio (MP3/OGG magic) raises ValueError — that path needs
    soundfile/torchaudio."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("unsupported audio format (compressed codecs need soundfile)")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _brate, _align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported (fmt={audio_format}, bits={bits})")
    dt = np.uint8 if bits == 8 else np.dtype("<i2")
    samples = np.frombuffer(data, dtype=dt)
    n_frames = len(samples) // channels
    return samples[: n_frames * channels].reshape(n_frames, channels).copy(), sample_rate


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Re-encode an (H, W, 3) uint8 array as binary PPM (P6)."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """REAL frame sampling over a concatenated-P6 stream (the
    dependency-free frame container: raw video as back-to-back PPM
    frames): parse each frame's header to find its extent, keep every
    ``every_n``-th frame's bytes. Containerized codecs (H.264/MP4) need
    ffmpeg — same seam, same output contract."""
    frames: list[bytes] = []
    i = 0
    idx = 0
    while i < len(payload) and payload[i : i + 2] == b"P6":
        w, h, _maxval, off = _parse_ppm_header(payload[i:])
        end = i + off + w * h * 3
        if idx % every_n == 0:
            frames.append(payload[i:end])
        idx += 1
        i = end
    if i == 0:
        raise ValueError("unsupported video container (H.264/MP4 needs ffmpeg)")
    return frames


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
    """REAL image resize for the decodable formats: decode (PPM/BMP),
    nearest-neighbor resample with numpy index arithmetic, re-encode as
    P6. PIL's ``Image.resize`` with fancier filters slots into the same
    seam for compressed inputs."""
    px = decode_image(payload)
    h, w = px.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_ppm(px[rows][:, cols])


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
