"""Unit coverage for operators/multimodal.py beyond the oracle queries."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from supabase_etl_spark.operators import multimodal as M


def test_decode_image_is_a_clear_stub():
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_fake_features_deterministic_and_bounded():
    w, h, f = M.fake_features(b"x" * 3000)
    assert (w, h, f) == M.fake_features(b"x" * 3000)
    assert 64 <= w < 64 + M.FAKE_DIM_MOD
    assert 64 <= h < 64 + M.FAKE_DIM_MOD
    assert f == 1 + 3000 // M.FRAME_BYTES


def test_fake_features_empty_payload():
    assert M.fake_features(b"") == (64, 64, 1)


def test_sniff_mime_magic_bytes(spark):
    rows = [
        (bytearray(b"\xff\xd8\xff\xe0rest"), "image/jpeg"),
        (bytearray(b"\x89PNG\r\n"), "image/png"),
        (bytearray(b"GIF89a"), "image/gif"),
        (bytearray(b"OggS\x00"), "audio/ogg"),
        (bytearray(b"plain text"), "application/octet-stream"),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "content binary")
    got = [r["mime"] for r in df.select(M.sniff_mime(F.col("content")).alias("mime")).collect()]
    assert got == [r[1] for r in rows]


def test_sample_frames_chunking(spark):
    payload = bytes(range(256)) * 17  # 4352 bytes -> 5 frames, keep 0 and 3
    df = spark.createDataFrame([("u1", bytearray(payload))], "uri string, content binary")
    out = {
        (r["frame_idx"], r["frame_md5"])
        for r in M.sample_frames(df, every_k=3).collect()
    }
    want = {
        (0, hashlib.md5(payload[:1024]).hexdigest()),
        (3, hashlib.md5(payload[3072:4096]).hexdigest()),
    }
    assert out == want
