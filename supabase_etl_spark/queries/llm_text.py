"""Text-analysis queries over ``documents`` (SURVEY.md §2.2 "LLM ops").

Language-ID, quality scoring, token counting, and fingerprinting as
oracle-checked queries. All per-row logic is pure column expressions
(operators/text.py) — scan-speed at 100 TB; only the final rollups
shuffle, and those reduce to a handful of groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.operators import text as T
from supabase_etl_spark.queries import query


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS n_tokens,
           len(regexp_extract_all(text, '{T.BPE_PATTERN}')) AS n_bpe_tokens,
           length(text) AS n_chars_measured,
           len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))) AS n_distinct_tokens
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "text"),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts, char length, vocabulary size
    per document. Pure narrow expressions — no shuffle at any scale."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, lang,
           {T.sql_quality_score()} AS quality,
           ({T.sql_quality_score()}) >= 0.5 AS keep
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface-statistics quality score + keep/drop gate — the standard
    pre-training corpus filter (length/punct/stopword signals)."""
    d = load_table(spark, sf_dir, "documents")
    q = T.quality_score(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        q.alias("quality"),
        (q >= 0.5).alias("keep"),
    ).orderBy("doc_id")


@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           {T.sql_lang_id()} AS predicted_lang,
           ({T.sql_lang_id()}) = lang AS match
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language identification vs the labeled column."""
    d = load_table(spark, sf_dir, "documents")
    pred = T.lang_id(F.col("text"))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("match"),
    ).orderBy("doc_id")


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {T.sql_fingerprint()} AS fp,
           md5(text) AS full_hash
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style min-hash-of-shingles fingerprint + full-text md5.
    Near-identical documents share fp with high probability; identical
    documents share full_hash exactly."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fp"),
        F.md5("text").alias("full_hash"),
    ).orderBy("doc_id")


@query(
    "text_corpus_stats",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(SUM(CAST(length(text) AS DECIMAL(28,6))) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))
                AS DECIMAL(28,6))) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST({T.sql_quality_score()} AS DECIMAL(28,6))) AS DOUBLE)
               / count(*) AS avg_quality
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("llm", "text"),
)
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus rollup (doc/char/token totals, mean quality).
    Partial aggregation map-side; ~5 groups reach the shuffle."""
    d = load_table(spark, sf_dir, "documents")
    dec = "decimal(28,6)"
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text").cast(dec)).cast("bigint").alias("total_chars"),
            F.sum(T.token_count(F.col("text")).cast(dec)).cast("bigint").alias("total_tokens"),
            (
                F.sum(T.quality_score(F.col("text")).cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )


@query(
    "text_tfidf_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(list_filter(
            regexp_split_to_array(text, '\\s+'), t -> t <> ''))) AS term
        FROM documents
    ),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
    stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term)
    SELECT term, df,
           round(ln((n + 1.0) / (df + 1.0)) + 1.0, 12) AS idf
    FROM stats CROSS JOIN n_docs
    ORDER BY idf DESC, term ASC
    LIMIT 25
    """,
    tags=("llm", "text"),
)
def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed IDF per term (the CountVectorizer→IDF pipeline in plain
    SQL: idf = ln((N+1)/(df+1)) + 1), rarest 25 terms. ln differs by
    1 ulp between JVM Math.log and DuckDB's libm on some inputs
    (observed at sf0.1), so idf is rounded to 12 decimals on both
    sides."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(T.tokens(F.col("text")))).alias("term")
    )
    n_docs = toks.select("doc_id").distinct().count()
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "term",
            "df",
            F.round(F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0, 12).alias("idf"),
        )
        .orderBy(F.col("idf").desc(), F.col("term").asc())
        .limit(25)
    )


@query(
    "text_term_frequencies",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS term
        FROM documents
    ),
    stats AS (
        SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM toks GROUP BY term
    )
    SELECT term, tf, df FROM stats
    ORDER BY df DESC, tf DESC, term ASC
    LIMIT 20
    """,
    tags=("llm", "text"),
)
def text_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequencies, top-20 by df (CountVectorizer-
    style stats in pure SQL). explode → partial-agg; vocabulary-sized
    shuffle, then a global top-k (TakeOrdered) — no full sort."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("df").desc(), F.col("tf").desc(), F.col("term").asc())
        .limit(20)
    )
