"""Multimodal query surface: the binary-payload / mapInPandas plumbing
verified against a relational oracle.

The oracle computes the same features directly in SQL (octet_length, md5
of the head) — valid because the fake payloads are UTF-8 text, so DuckDB's
VARCHAR md5/substring agree byte-for-byte with Spark's binary path for
this ASCII corpus. The Spark side still exercises the REAL multimodal
machinery (encode -> binary column -> Arrow batches -> pandas -> typed
schema); the oracle checks its output exactly."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M
from terraform_aws_lambda_kinesis_to_es_spark.sources.tables import load, load_split


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_split(spark, sf_dir, "documents")
    with_payload = M.attach_payload(docs)
    return M.extract_features(with_payload)


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 1->N row explosion through mapInPandas
    (every 4th 64-byte chunk of the payload stands in for a video frame —
    deterministic fake decode, real Arrow/schema/partitioning). The
    oracle derives each sampled frame's index and byte count
    arithmetically from the payload length."""
    docs = load_split(spark, sf_dir, "documents")
    with_payload = M.attach_payload(docs)
    return M.sample_frame_features(with_payload)


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: binary payload through an Arrow-batched 1->1
    mapInPandas transform (every 4th byte stands in for the downsample —
    deterministic fake, real schema/batching). The oracle reconstructs
    the downsampled bytes character-wise (ASCII corpus ⇒ char == byte)."""
    docs = load_split(spark, sf_dir, "documents")
    with_payload = M.attach_payload(docs)
    return M.resize_features(with_payload)


IMG_W, IMG_H = 8, 4  # 96 RGB bytes per synthesized image


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the declared surface: each document's
    text bytes are framed as a valid binary-PPM (P6) payload in the plan
    (header + rpad-to-96-byte ASCII body — a legitimate 8x4 RGB image),
    then ``operators.multimodal.decode_image`` — the actual pure-python
    PPM/BMP decoder, not a fake — parses it inside the same Arrow
    mapInPandas plumbing the other media queries use, emitting decoded
    dimensions and the pixel-sum. The payload is framed BYTE-wise (encode
    first, then slice/rpad the binary with X'78') so a non-ASCII char in
    the head cannot desync payload length vs pixel count; the oracle
    mirrors the same byte framing through hex(encode(text)) and sums the
    hex-parsed byte values, so the decoder's output is hash-verified by
    the driver on arbitrary (not just ASCII) text."""
    docs = load_split(spark, sf_dir, "documents")
    n = IMG_W * IMG_H * 3
    body = F.expr(f"rpad(substring(encode(text, 'UTF-8'), 1, {n}), {n}, X'78')")
    header = F.lit(f"P6\n{IMG_W} {IMG_H}\n255\n".encode())
    framed = docs.select("doc_id", F.concat(header, body).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = M.decode_image(bytes(payload))
                ids.append(doc_id)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                sums.append(int(px.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "px_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return framed.mapInPandas(gen, "doc_id long, width long, height long, px_sum long")


PATCH = 2  # ViT-style patch edge; 8x4 image -> 2x4 = 8 patches


def q_media_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-ingest patchify through the REAL decoder: the q_media_decode
    P6 framing is decoded by ``operators.multimodal.decode_image``, the
    pixel grid is split into PATCH x PATCH patches (the standard vision-
    transformer tokenization), and each patch leaves as its own row with
    its channel-sum — a 1->N mapInPandas explosion whose per-row payload
    is the patch embedding stand-in. The oracle recomputes every patch
    sum arithmetically from the hex-parsed framed bytes, so the
    numpy reshape/transpose patch walk is hash-verified by the driver.
    Scale shape: map-only Arrow batches, 1->8 Generate-like fan-out, no
    shuffle."""
    docs = load_split(spark, sf_dir, "documents")
    n = IMG_W * IMG_H * 3
    body = F.expr(f"rpad(substring(encode(text, 'UTF-8'), 1, {n}), {n}, X'78')")
    header = F.lit(f"P6\n{IMG_W} {IMG_H}\n255\n".encode())
    framed = docs.select("doc_id", F.concat(header, body).alias("payload"))
    pw = IMG_W // PATCH

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = M.decode_image(bytes(payload))
                patches = (
                    px.reshape(IMG_H // PATCH, PATCH, IMG_W // PATCH, PATCH, 3)
                    .sum(axis=(1, 3, 4))
                )
                for pr in range(IMG_H // PATCH):
                    for pc in range(IMG_W // PATCH):
                        ids.append(doc_id)
                        idxs.append(pr * pw + pc)
                        sums.append(int(patches[pr, pc]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "patch_idx": pd.Series(idxs, dtype="int64"),
                    "patch_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return framed.mapInPandas(gen, "doc_id long, patch_idx long, patch_sum long")


AUDIO_BYTES = 64  # 32 mono int16 samples per synthesized clip
AUDIO_RATE = 8000


def _wav_header(data_bytes: int, rate: int = AUDIO_RATE) -> bytes:
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_bytes)
        + b"WAVEfmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", data_bytes)
    )


def q_media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the declared surface: each document's
    text bytes are framed as a valid RIFF/WAVE mono 16-bit PCM clip
    (constant header + byte-wise rpad-to-64 body, X'20' pad), then
    ``operators.multimodal.decode_audio`` — the actual chunk-walking WAV
    parser — decodes it inside the Arrow mapInPandas plumbing, emitting
    frame count, sample rate, and integer signal stats (sum |s|, peak).
    The oracle re-derives every little-endian int16 sample arithmetically
    from hex(encode(text)), so the decoder's sample values are
    hash-verified by the driver on arbitrary text."""
    docs = load_split(spark, sf_dir, "documents")
    body = F.expr(
        f"rpad(substring(encode(text, 'UTF-8'), 1, {AUDIO_BYTES}),"
        f" {AUDIO_BYTES}, X'20')"
    )
    framed = docs.select(
        "doc_id", F.concat(F.lit(_wav_header(AUDIO_BYTES)), body).alias("payload")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, nf, sr, sa, pk = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = M.decode_audio(bytes(payload))
                s = np.abs(samples.astype(np.int64))
                ids.append(doc_id)
                nf.append(samples.shape[0])
                sr.append(rate)
                sa.append(int(s.sum()))
                pk.append(int(s.max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nf, dtype="int64"),
                    "sample_rate": pd.Series(sr, dtype="int64"),
                    "sum_abs": pd.Series(sa, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int64"),
                }
            )

    return framed.mapInPandas(
        gen, "doc_id long, n_frames long, sample_rate long, sum_abs long, peak long"
    )


QUERIES = {
    "q_media_features": q_media_features,
    "q_media_frames": q_media_frames,
    "q_media_resize": q_media_resize,
    "q_media_decode": q_media_decode,
    "q_media_patchify": q_media_patchify,
    "q_media_audio_stats": q_media_audio_stats,
}

_STEP = M.FRAME_SIZE * M.FRAME_EVERY_N

ORACLES = {
    "q_media_audio_stats": f"""
        -- hex(encode(text)) is 2 chars/byte; pad with '20' (space) to the
        -- fixed clip length, then parse each little-endian int16: sample i
        -- is bytes (2i, 2i+1) -> lo + 256*hi, wrapped to signed.
        WITH body AS (
          SELECT doc_id,
                 rpad(substring(hex(encode(text)), 1, {AUDIO_BYTES * 2}),
                      {AUDIO_BYTES * 2}, '20') AS hx
          FROM documents
        ), s AS (
          SELECT doc_id,
                 list_transform(generate_series(1, {AUDIO_BYTES // 2}), i ->
                   CASE WHEN CAST(('0x' || substring(hx, 4*i - 3, 2)) AS INT)
                           + 256 * CAST(('0x' || substring(hx, 4*i - 1, 2)) AS INT)
                          >= 32768
                        THEN CAST(('0x' || substring(hx, 4*i - 3, 2)) AS INT)
                           + 256 * CAST(('0x' || substring(hx, 4*i - 1, 2)) AS INT)
                           - 65536
                        ELSE CAST(('0x' || substring(hx, 4*i - 3, 2)) AS INT)
                           + 256 * CAST(('0x' || substring(hx, 4*i - 1, 2)) AS INT)
                   END) AS samples
          FROM body
        )
        SELECT doc_id,
               CAST({AUDIO_BYTES // 2} AS BIGINT) AS n_frames,
               CAST({AUDIO_RATE} AS BIGINT) AS sample_rate,
               CAST(list_sum(list_transform(samples, x -> abs(x))) AS BIGINT)
                 AS sum_abs,
               CAST(list_max(list_transform(samples, x -> abs(x))) AS BIGINT)
                 AS peak
        FROM s
    """,
    "q_media_decode": f"""
        -- byte-wise mirror of the Spark framing: hex(encode(text)) is 2
        -- chars per BYTE (not per codepoint), so slicing/rpadding the hex
        -- string with '78' ('x') reproduces the binary rpad exactly even
        -- for non-ASCII text; each pixel is the hex-parsed byte value.
        WITH body AS (
          SELECT doc_id,
                 rpad(substring(hex(encode(text)), 1, {IMG_W * IMG_H * 6}),
                      {IMG_W * IMG_H * 6}, '78') AS hx
          FROM documents
        )
        SELECT doc_id,
               CAST({IMG_W} AS BIGINT) AS width,
               CAST({IMG_H} AS BIGINT) AS height,
               CAST(list_sum(list_transform(generate_series(1, {IMG_W * IMG_H * 3}),
                                            i -> CAST(('0x' || substring(hx, 2*i-1, 2)) AS INT)))
                 AS BIGINT) AS px_sum
        FROM body
    """,
    "q_media_patchify": f"""
        -- same byte-wise hex framing as q_media_decode; patch (p) covers
        -- pixel rows 2*(p//{IMG_W // PATCH})+ and cols 2*(p%{IMG_W // PATCH})+,
        -- byte j of the patch maps to global byte index
        -- (r*{IMG_W} + c)*3 + ch with r,c,ch derived from j.
        WITH body AS (
          SELECT doc_id,
                 rpad(substring(hex(encode(text)), 1, {IMG_W * IMG_H * 6}),
                      {IMG_W * IMG_H * 6}, '78') AS hx
          FROM documents
        ), p AS (
          SELECT doc_id, hx, unnest(generate_series(0,
                 {(IMG_H // PATCH) * (IMG_W // PATCH) - 1})) AS patch_idx
          FROM body
        )
        SELECT doc_id, CAST(patch_idx AS BIGINT) AS patch_idx,
               CAST(list_sum(list_transform(
                 generate_series(0, {PATCH * PATCH * 3 - 1}), j ->
                   CAST(('0x' || substring(hx,
                     2 * (((({PATCH} * (patch_idx // {IMG_W // PATCH}) + j // {PATCH * 3})
                            * {IMG_W})
                           + ({PATCH} * (patch_idx % {IMG_W // PATCH}) + (j % {PATCH * 3}) // 3))
                          * 3 + j % 3) + 1, 2)) AS INT)))
                 AS BIGINT) AS patch_sum
        FROM p
    """,
    "q_media_resize": f"""
        WITH ds AS (
          SELECT doc_id, octet_length(text::BLOB) AS orig,
                 array_to_string(list_transform(
                   generate_series(1, length(text), {M.RESIZE_FACTOR}),
                   i -> text[i]), '') AS r
          FROM documents
        )
        SELECT doc_id,
               CAST(orig AS BIGINT) AS orig_bytes,
               CAST(length(r) AS BIGINT) AS resized_bytes,
               lower(hex(substring(r, 1, 8)::BLOB)) AS resized_head_hex
        FROM ds
    """,
    "q_media_features": """
        SELECT doc_id,
               'text/plain' AS media_type,
               CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
               md5(substring(text, 1, 16)) AS head_md5
        FROM documents
    """,
    "q_media_frames": f"""
        WITH t AS (
          SELECT doc_id, octet_length(text::BLOB) AS total FROM documents
        ), k AS (
          SELECT doc_id, total,
                 unnest(generate_series(0, (total - 1) // {_STEP})) AS frame_idx
          FROM t
        )
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(least({M.FRAME_SIZE}, total - frame_idx * {_STEP}) AS BIGINT) AS n_bytes
        FROM k
    """,
}
