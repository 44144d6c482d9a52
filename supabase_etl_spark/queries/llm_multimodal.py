"""Multimodal-column queries (SURVEY.md §2.2 "multimodal columns").

Payloads are synthesized deterministically (UTF-8 bytes of document
text — the testdata ships no media files), so every byte-level result
is reproducible in the DuckDB oracle; the documents are pure ASCII,
making char-indexed text functions equal byte-indexed blob functions.
The plumbing under test — binaryFile source, binary payload columns,
Arrow-batched mapInPandas decode/feature/frame-sample — is the real
100 TB shape; only the codec bodies are stubs (operators/multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table, read_binary
from supabase_etl_spark.operators import multimodal as M
from supabase_etl_spark.queries import query

FRAME_STEP = 3


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (uri, content binary, mime) payload convention."""
    d = load_table(spark, sf_dir, "documents")
    content = F.encode("text", "UTF-8")
    return d.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("uri"),
        content.alias("content"),
        M.sniff_mime(content).alias("mime"),
    )


@query(
    "multimodal_payload_stats",
    oracle="""
    SELECT concat('doc://', doc_id) AS uri,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           'application/octet-stream' AS mime
    FROM documents
    ORDER BY uri
    """,
    tags=("llm", "multimodal"),
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte length, content hash, and magic-byte MIME sniff per payload
    — pure JVM expressions over the binary column (md5 of UTF-8 bytes
    equals DuckDB's md5 of the text)."""
    p = _payloads(spark, sf_dir)
    return p.select(
        "uri",
        F.octet_length("content").alias("n_bytes"),
        F.md5("content").alias("payload_md5"),
        "mime",
    ).orderBy("uri")


@query(
    "multimodal_feature_extract",
    oracle=f"""
    SELECT concat('doc://', doc_id) AS uri,
           octet_length(encode(text)) AS n_bytes,
           64 + (octet_length(encode(text)) % {M.FAKE_DIM_MOD}) AS width,
           64 + ((ascii(substr(text, 1, 1)) * 256
                  + ascii(substr(text, length(text), 1))) % {M.FAKE_DIM_MOD}) AS height,
           1 + octet_length(encode(text)) // {M.FRAME_BYTES} AS n_frames
    FROM documents
    ORDER BY uri
    """,
    tags=("llm", "multimodal"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas "decode" producing typed features
    (width/height/n_frames) from the payload bytes — the deterministic
    stand-in for an image/video codec (operators/multimodal.decode_image
    is the clearly-marked stub for the real thing)."""
    feats = M.extract_features(_payloads(spark, sf_dir))
    return feats.select(
        "uri",
        "n_bytes",
        F.col("feat.width").alias("width"),
        F.col("feat.height").alias("height"),
        F.col("feat.n_frames").alias("n_frames"),
    ).orderBy("uri")


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH docs AS (
        SELECT concat('doc://', doc_id) AS uri, text,
               greatest(1, CAST(ceil(octet_length(encode(text)) / {M.FRAME_BYTES}.0)
                                AS INT)) AS nf
        FROM documents WHERE doc_id < 50
    )
    SELECT uri, unnest(range(0, nf, {FRAME_STEP})) AS frame_idx,
           md5(substr(text, unnest(range(0, nf, {FRAME_STEP})) * {M.FRAME_BYTES} + 1,
               {M.FRAME_BYTES})) AS frame_md5
    FROM docs
    ORDER BY uri, frame_idx
    """,
    tags=("llm", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-3rd-frame sampling over fake video payloads (1 KiB byte
    chunks as frames): one-to-many mapInPandas, the shape of ffmpeg
    keyframe extraction with the decode swapped for md5."""
    p = _payloads(spark, sf_dir).filter(
        F.col("uri").isin([f"doc://{i}" for i in range(50)])
    )
    return M.sample_frames(p, FRAME_STEP).orderBy("uri", "frame_idx")


# Pinned directory: the oracle SQL is a fixed string the driver runs
# verbatim (no sf_dir substitution hook), so this source-scan demo scans
# the same directory on both sides regardless of the sf_dir argument.
BINARY_SCAN_DIR = "/root/testdata/sf0.01"


@query(
    "multimodal_binary_scan",
    oracle=f"""
    SELECT regexp_extract(filename, '[^/]+$') AS file_name,
           size AS n_bytes,
           substr(hex(content), 1, 16) AS head_hex,
           md5(hex(content)) AS content_hex_md5
    FROM read_blob('{BINARY_SCAN_DIR}/*.parquet')
    ORDER BY file_name
    """,
    tags=("llm", "multimodal"),
)
def multimodal_binary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.format('binaryFile') over the testdata directory
    itself: (path, length, content bytes) per file, fingerprinted via
    the hex encoding (both engines hex identically; DuckDB's hash
    functions don't take blobs). The source streams file splits in
    parallel at scale — this is the ingest edge for media corpora."""
    b = read_binary(spark, BINARY_SCAN_DIR, glob="*.parquet")
    return b.select(
        F.regexp_extract(F.col("path"), "[^/]+$", 0).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.substring(F.hex("content"), 1, 16).alias("head_hex"),
        F.md5(F.hex("content")).alias("content_hex_md5"),
    ).orderBy("file_name")


@query(
    "multimodal_resize",
    oracle=f"""
    WITH dims AS (
        SELECT concat('doc://', doc_id) AS uri,
               64 + (octet_length(encode(text)) % {M.FAKE_DIM_MOD}) AS width,
               64 + ((ascii(substr(text, 1, 1)) * 256
                      + ascii(substr(text, length(text), 1)))
                     % {M.FAKE_DIM_MOD}) AS height
        FROM documents
    ),
    resized AS (
        SELECT uri, width, height,
               CASE WHEN greatest(width, height) <= {M.RESIZE_TARGET} THEN width
                    ELSE greatest(1, width * {M.RESIZE_TARGET} // greatest(width, height))
               END AS new_width,
               CASE WHEN greatest(width, height) <= {M.RESIZE_TARGET} THEN height
                    ELSE greatest(1, height * {M.RESIZE_TARGET} // greatest(width, height))
               END AS new_height
        FROM dims
    )
    SELECT uri, width, height, new_width, new_height,
           CAST(new_width AS BIGINT) * new_height * 3 AS new_bytes,
           md5(concat(uri, '|', new_width, '|', new_height)) AS resized_md5
    FROM resized
    ORDER BY uri
    """,
    tags=("llm", "multimodal"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize over binary payload columns
    (operators/multimodal.resize_plan): Arrow-batched mapInPandas,
    integer-only target-dim arithmetic (max dim {128}) and a
    deterministic output-object descriptor — the codec body is the one
    documented stub; the batch plumbing, schema, and addressing are
    real and oracle-replayed."""
    return M.resize_plan(_payloads(spark, sf_dir)).orderBy("uri")
