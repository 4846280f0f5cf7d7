from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.operators import multimodal as M


def test_payload_roundtrip_and_features(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 100)], "doc_id long, text string"
    )
    feats = {r.doc_id: r for r in M.extract_features(M.attach_payload(df)).collect()}
    assert feats[1].n_bytes == 11
    assert feats[1].head_md5 == hashlib.md5(b"hello world").hexdigest()
    assert feats[2].n_bytes == 100
    assert feats[2].head_md5 == hashlib.md5(b"x" * 16).hexdigest()
    assert feats[1].media_type == "text/plain"


def test_metadata_struct(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    row = M.attach_payload(df, media_type="image/png").select("media_meta").collect()[0]
    assert row.media_meta.format == "image/png" and row.media_meta.n_chars == 3


def test_compressed_formats_are_gated():
    # compressed codecs (PIL/ffmpeg territory) fail loudly, not silently
    with pytest.raises(ValueError):
        M.decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        M.decode_audio(b"ID3\x04mp3data")
    with pytest.raises(ValueError):
        M.sample_frames(b"\x00\x00\x00 ftypmp42")


def _ppm(w, h, seed=0):
    import numpy as np

    px = (np.arange(w * h * 3, dtype=np.uint64) * 31 + seed) % 251
    return M.encode_ppm(px.astype("uint8").reshape(h, w, 3)), px.astype("uint8").reshape(h, w, 3)


def test_ppm_decode_roundtrip():
    import numpy as np

    payload, px = _ppm(5, 3)
    got = M.decode_image(payload)
    assert got.shape == (3, 5, 3)
    assert np.array_equal(got, px)
    # comment + extra whitespace in header per Netpbm spec
    commented = b"P6\n# a comment\n 5  3\n255\n" + px.tobytes()
    assert np.array_equal(M.decode_image(commented), px)


def test_bmp_decode_matches_ppm():
    import numpy as np

    _, px = _ppm(3, 2)  # w=3 -> 9-byte rows, padded to 12: exercises stride
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y, :, ::-1].tobytes()  # BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pixel_data = b"".join(rows)
    # BITMAPFILEHEADER (14 bytes, data offset 54) + BITMAPINFOHEADER (40):
    # size, width, height, planes=1, bpp=24, compression=0, image size, ...
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    got = M.decode_image(header + pixel_data)
    assert np.array_equal(got, px)


def test_wav_pcm_decode():
    import numpy as np

    rate, channels = 8000, 2
    samples = (np.arange(64, dtype=np.int16) * 257 - 8000).reshape(32, 2)
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    got, got_rate = M.decode_audio(payload)
    assert got_rate == rate
    assert got.shape == (32, 2)
    assert np.array_equal(got, samples)


def test_real_resize_nearest_neighbor():
    import numpy as np

    payload, px = _ppm(4, 4)
    out = M.resize_image(payload, 2, 2)
    got = M.decode_image(out)
    # nearest-neighbor with (i*4)//2 index math picks rows/cols 0 and 2
    assert np.array_equal(got, px[[0, 2]][:, [0, 2]])


def test_real_frame_sampling_concat_ppm():
    frames = [_ppm(2, 2, seed=s)[0] for s in range(5)]
    stream = b"".join(frames)
    got = M.sample_frames(stream, every_n=2)
    assert got == [frames[0], frames[2], frames[4]]


def test_real_codec_through_mapinpandas(spark):
    """The real PPM decoder driven through the SAME Arrow mapInPandas
    plumbing the declared queries use — binary in, typed features out."""
    import pandas as pd
    from collections.abc import Iterator

    payload, px = _ppm(6, 4)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "mean_px": []}
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                arr = M.decode_image(bytes(pl))
                out["doc_id"].append(doc_id)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["mean_px"].append(int(arr.sum()) // arr.size)
            yield pd.DataFrame(out)

    row = df.mapInPandas(gen, "doc_id long, width long, height long, mean_px long").collect()[0]
    assert (row.width, row.height) == (6, 4)
    assert row.mean_px == int(px.sum()) // px.size


def test_binary_column_type(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    schema = M.attach_payload(df).schema
    assert schema["payload"].dataType.typeName() == "binary"


def test_frame_sampling_explosion(spark):
    # 600 bytes -> chunks of 64 at 0,64,...,576; sampled every 4th:
    # starts 0, 256, 512 -> sizes 64, 64, 64; plus a short doc (1 frame)
    df = spark.createDataFrame(
        [(1, "a" * 600), (2, "b" * 10)], "doc_id long, text string"
    )
    rows = M.sample_frame_features(M.attach_payload(df)).collect()
    got = {(r.doc_id, r.frame_idx): r.n_bytes for r in rows}
    assert got == {(1, 0): 64, (1, 1): 64, (1, 2): 64, (2, 0): 10}


def test_patchify_covers_image_exactly(spark, sf_dir):
    """ViT patchify: every doc yields the full patch grid exactly once,
    the patch sums add back to the whole-image pixel sum (the reshape
    walk drops/duplicates nothing), and patches differ within a doc
    (real pixel data flows, not a constant fake)."""
    from terraform_aws_lambda_kinesis_to_es_spark.plans.multimodal_queries import (
        IMG_H,
        IMG_W,
        PATCH,
        q_media_decode,
        q_media_patchify,
    )

    n_patches = (IMG_H // PATCH) * (IMG_W // PATCH)
    rows = q_media_patchify(spark, sf_dir).collect()
    per_doc: dict[int, dict[int, int]] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, {})[r.patch_idx] = r.patch_sum
    assert all(set(p) == set(range(n_patches)) for p in per_doc.values())
    totals = {r.doc_id: r.px_sum for r in q_media_decode(spark, sf_dir).collect()}
    assert set(per_doc) == set(totals)
    for doc_id, patches in per_doc.items():
        assert sum(patches.values()) == totals[doc_id], doc_id
    assert any(len(set(p.values())) > 1 for p in per_doc.values())


def test_fake_decode_frame_content():
    payload = bytes(range(256)) * 3  # 768 bytes
    frames = M.fake_decode_frames(payload)
    # every 4th 64-byte chunk: offsets 0, 256, 512
    assert frames == [payload[0:64], payload[256:320], payload[512:576]]
