"""Multimodal column operators (SURVEY.md §2.2 "multimodal columns").

Convention: media travel as opaque ``binary`` payload columns beside
typed metadata — ``(uri string, content binary, mime string,
meta struct<...>)`` — exactly how a 100 TB image/audio/video corpus
lives in parquet (the bytes stay columnar, codecs run in Arrow-batched
Python, Spark never interprets them).

The container has no media libraries, so the *decode* step is a
clearly-marked stub (NotImplementedError) while everything Spark-side —
schema, binaryFile source, Arrow batch shape, mapInPandas signatures,
deterministic feature plumbing — is real and oracle-tested against
byte-derived fake features.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FAKE_DIM_MOD = 993  # fake feature ranges stay in [64, 64+993)
FRAME_BYTES = 1024  # fake "video": 1 KiB per frame


def sniff_mime(content: Column) -> Column:
    """Magic-byte MIME sniffing on the payload prefix (hex-compare —
    pure JVM expression, no Python)."""
    prefix = F.upper(F.hex(F.substring(content, 1, 4)))
    return (
        F.when(prefix.startswith("FFD8FF"), F.lit("image/jpeg"))
        .when(prefix.startswith("89504E47"), F.lit("image/png"))
        .when(prefix.startswith("47494638"), F.lit("image/gif"))
        .when(prefix.startswith("50415231"), F.lit("application/vnd.apache.parquet"))
        .when(prefix.startswith("4F676753"), F.lit("audio/ogg"))
        .otherwise(F.lit("application/octet-stream"))
    )


def decode_image(content: bytes) -> "tuple[int, int]":
    """Real image decode — STUB: the runtime has no imaging library.

    The Spark-side contract (bytes in, (width, height) out, called from
    an Arrow-batched UDF) is what matters; swap the body for
    ``PIL.Image.open(io.BytesIO(content)).size`` where Pillow exists.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires Pillow, which this environment does not "
            "ship; deterministic fake features come from fake_features()"
        ) from exc
    raise NotImplementedError("wire PIL decode here when the dependency lands")


def fake_features(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: (width, height, n_frames)
    derived from payload length and boundary bytes — reproducible in
    plain SQL for the oracle."""
    n = len(content)
    first = content[0] if n else 0
    last = content[-1] if n else 0
    width = 64 + (n % FAKE_DIM_MOD)
    height = 64 + ((first * 256 + last) % FAKE_DIM_MOD)
    n_frames = 1 + n // FRAME_BYTES
    return width, height, n_frames


def extract_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas feature extraction: Arrow batches stream through
    Python, one output row per input row, schema widened with the
    feature struct. This is the real multimodal plumbing — replace
    fake_features with a codec call and nothing else changes."""
    schema = (
        "uri string, mime string, n_bytes long, "
        "feat struct<width: int, height: int, n_frames: int>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[content_col].map(fake_features)
            yield pd.DataFrame(
                {
                    "uri": pdf["uri"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf[content_col].map(len),
                    "feat": feats.map(
                        lambda t: {"width": t[0], "height": t[1], "n_frames": t[2]}
                    ),
                }
            )

    return df.mapInPandas(run, schema=schema)


def sample_frames(df: DataFrame, every_k: int, content_col: str = "content") -> DataFrame:
    """Frame sampling for fake "video" payloads: split bytes into
    FRAME_BYTES chunks, keep every k-th, emit (uri, frame_idx,
    frame_md5). One-to-many mapInPandas — the decode-free skeleton of
    ffmpeg-style frame extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uris, idxs, hashes = [], [], []
            for uri, content in zip(pdf["uri"], pdf[content_col]):
                n_frames = max(1, -(-len(content) // FRAME_BYTES))
                for i in range(0, n_frames, every_k):
                    chunk = content[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    uris.append(uri)
                    idxs.append(i)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({"uri": uris, "frame_idx": idxs, "frame_md5": hashes})

    return df.mapInPandas(run, schema="uri string, frame_idx int, frame_md5 string")


RESIZE_TARGET = 128  # aspect-preserving max dimension


def resize_plan(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas "resize": decode dims (fake_features stand-in),
    compute aspect-preserving integer target dims bounded by
    RESIZE_TARGET, and emit the resized-payload descriptor (byte size =
    w·h·3 RGB; md5 over a deterministic header names the output object).
    The batch shape is the real thing — swap the dim arithmetic for a
    PIL/ffmpeg call and the plumbing (Arrow batches in, one row out per
    image, binary-addressable output) is unchanged. Integer-only math
    so the oracle replays it exactly."""
    import hashlib

    schema = (
        "uri string, width int, height int, new_width int, new_height int, "
        "new_bytes long, resized_md5 string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "uri": [], "width": [], "height": [],
                "new_width": [], "new_height": [],
                "new_bytes": [], "resized_md5": [],
            }
            for uri, content in zip(pdf["uri"], pdf[content_col]):
                w, h, _ = fake_features(content)
                m = max(w, h)
                if m <= RESIZE_TARGET:
                    nw, nh = w, h
                else:
                    nw = max(1, w * RESIZE_TARGET // m)
                    nh = max(1, h * RESIZE_TARGET // m)
                header = f"{uri}|{nw}|{nh}"
                out["uri"].append(uri)
                out["width"].append(w)
                out["height"].append(h)
                out["new_width"].append(nw)
                out["new_height"].append(nh)
                out["new_bytes"].append(nw * nh * 3)
                out["resized_md5"].append(hashlib.md5(header.encode()).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)
