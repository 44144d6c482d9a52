"""Unit coverage for operators/multimodal.py beyond the oracle queries."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from supabase_etl_spark.operators import multimodal as M


def test_decode_image_is_real():
    """The former stub is gone: decode_image parses real container
    bytes via the engine's own codecs (operators/imagecodec.py)."""
    from supabase_etl_spark.operators import imagecodec as IC

    seed, w, h, _ = M.synth_params(42)
    rgb = M.synth_rgb(seed, w, h)
    for enc in (IC.encode_png, IC.encode_bmp, IC.encode_ppm):
        assert M.decode_image(enc(w, h, rgb)) == (w, h, 3, rgb)
    with pytest.raises(ValueError, match="unrecognized"):
        M.decode_image(b"not an image")


def test_synth_params_deterministic_and_bounded():
    for doc_id in (0, 1, 7, 250, 255):
        seed, w, h, fmt = M.synth_params(doc_id)
        assert seed == doc_id % M.SEED_MOD
        assert M.DIM_BASE <= w < M.DIM_BASE + M.DIM_SPAN
        assert M.DIM_BASE <= h < M.DIM_BASE + M.DIM_SPAN
        assert fmt in (0, 1, 2)
        assert len(M.synth_rgb(seed, w, h)) == w * h * 3


def test_generate_extract_resize_end_to_end(spark):
    """generate_images → extract_features → resize_plan on a tiny frame,
    verified against a driver-side replay of the same codec calls."""
    from supabase_etl_spark.operators import imagecodec as IC

    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    feats = {
        r["uri"]: r["feat"]
        for r in M.extract_features(M.generate_images(df)).collect()
    }
    assert len(feats) == 6
    for i in range(6):
        seed, w, h, _ = M.synth_params(i)
        rgb = M.synth_rgb(seed, w, h)
        f = feats[f"doc://{i}"]
        assert (f["width"], f["height"], f["channels"]) == (w, h, 3)
        assert f["pixel_sum"] == sum(rgb)
    resized = {r["uri"]: r for r in M.resize_plan(M.generate_images(df)).collect()}
    for i in range(6):
        seed, w, h, _ = M.synth_params(i)
        r = resized[f"doc://{i}"]
        m = max(w, h)
        if m <= M.IMG_RESIZE_TARGET:
            nw, nh = w, h
        else:
            nw = max(1, w * M.IMG_RESIZE_TARGET // m)
            nh = max(1, h * M.IMG_RESIZE_TARGET // m)
        assert (r["new_width"], r["new_height"]) == (nw, nh)
        expect = IC.resize_nearest(w, h, 3, M.synth_rgb(seed, w, h), nw, nh)
        assert r["resized_sum"] == sum(expect)
        assert r["new_bytes"] == len(expect)


def test_sniff_mime_magic_bytes(spark):
    rows = [
        (bytearray(b"\xff\xd8\xff\xe0rest"), "image/jpeg"),
        (bytearray(b"\x89PNG\r\n"), "image/png"),
        (bytearray(b"BM\x36\x00"), "image/bmp"),
        (bytearray(b"P6\n4 4\n255\n"), "image/x-portable-pixmap"),
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
