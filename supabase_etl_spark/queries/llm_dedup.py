"""Deduplication queries over ``documents``/``embeddings``
(SURVEY.md §2.2 "LLM ops": exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine).

The testdata plants near-duplicate texts (word-3-gram Jaccard ≈ 0.99
pairs) but no exact duplicates, so exact-dedup queries plant their own
via a shifted-id self-union — which also makes survivor selection
observable. Every query replays the identical algorithm in DuckDB SQL
(shared constants from operators/dedup.py) and hash-matches.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.operators import dedup as D
from supabase_etl_spark.operators.text import tokens
from supabase_etl_spark.queries import query

JACCARD_THRESHOLD = 0.8
COPY_OFFSET = 100_000
SIMHASH_MAX_HAMMING = 3
COSINE_DUP_THRESHOLD = 0.95

_SQL_TOKENS = "list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')"

# Shared oracle CTEs: exploded distinct shingles + per-doc set sizes.
_SQL_SHINGLE_CTES = f"""
    sh AS (
        SELECT doc_id, unnest({D.sql_shingles()}) AS s FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""

_SQL_JACCARD_TAIL = f"""
    SELECT i.ida, i.idb, i.inter, sa.n AS na, sb.n AS nb,
           i.inter / (sa.n + sb.n - i.inter) AS jacc
    FROM inter i
    JOIN sizes sa ON i.ida = sa.doc_id
    JOIN sizes sb ON i.idb = sb.doc_id
    WHERE i.inter / (sa.n + sb.n - i.inter) >= {JACCARD_THRESHOLD}
    ORDER BY ida, idb
"""


@query(
    "dedup_exact",
    oracle=f"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {COPY_OFFSET}, text FROM documents
    )
    SELECT sha256(text) AS content_hash,
           min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM all_docs
    GROUP BY sha256(text)
    ORDER BY keeper_id
    """,
    tags=("llm", "dedup"),
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup with deterministic survivor (min id).

    sha2-256 group-by: map-side partial agg, one shuffle on the hash —
    the canonical 100 TB exact-dedup plan (no sort, no window)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.select((F.col("doc_id") + COPY_OFFSET).alias("doc_id"), "text")
    return (
        d.unionByName(planted)
        .groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keeper_id")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_SHINGLE_CTES},
    inter AS (
        SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    {_SQL_JACCARD_TAIL}
    """,
    tags=("llm", "dedup"),
    bench=True,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs via inverted-index join
    (operators/dedup.jaccard_pairs; the result-identical prefix-filtered
    variant jaccard_pairs_prefix is the df-skew scale path). Finds the
    planted ≈0.99 pairs."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return D.jaccard_pairs(d, JACCARD_THRESHOLD).orderBy("ida", "idb")


def _sql_minhash_cte() -> str:
    """sig/band/candidate CTEs replaying operators/dedup minhash."""
    hashes = ",\n               ".join(
        f"min(({a} * CAST(sid AS BIGINT) + {b}) % {D.MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(D.MINHASH_COEFFS)
    )
    band_rows = "\n        UNION ALL\n".join(
        "        SELECT doc_id, {b} AS band, {ks} FROM sig".format(
            b=b,
            ks=", ".join(
                f"h{b * D.ROWS_PER_BAND + r} AS k{r}" for r in range(D.ROWS_PER_BAND)
            ),
        )
        for b in range(D.BANDS)
    )
    key_eq = " AND ".join(f"a.k{r} = b.k{r}" for r in range(D.ROWS_PER_BAND))
    return f"""
    ds AS (SELECT doc_id, {D.sql_strhash("s")} AS sid FROM sh),
    sig AS (
        SELECT doc_id,
               {hashes}
        FROM ds GROUP BY doc_id
    ),
    bands AS (
{band_rows}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        FROM bands a
        JOIN bands b ON a.band = b.band AND {key_eq} AND a.doc_id < b.doc_id
    )
    """


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SQL_SHINGLE_CTES},
    {_sql_minhash_cte()},
    inter AS (
        SELECT c.ida, c.idb, count(*) AS inter
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.ida
        JOIN sh sb ON sb.doc_id = c.idb AND sb.s = sa.s
        GROUP BY 1, 2
    )
    {_SQL_JACCARD_TAIL}
    """,
    tags=("llm", "dedup"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (12 hashes) + LSH (4 bands × 3 rows) candidate
    generation, exact-Jaccard re-rank. Shingle ids come from the
    cross-engine polynomial hash (operators/dedup.strhash) — row-local,
    no dictionary, no global sort — so the plan is the standard minhash
    pipeline at any scale: one agg for signatures, one band-key
    self-join (shuffle on band key), re-rank only on candidates."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sids = D.shingle_ids(d)
    bands = D.band_keys(D.minhash_signature(sids)).cache()
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            [F.col(f"a.k{r}") == F.col(f"b.k{r}") for r in range(D.ROWS_PER_BAND)]
            + [F.col("a.band") == F.col("b.band"), F.col("a.doc_id") < F.col("b.doc_id")],
        )
        .select(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .distinct()
    )
    sh = D.exploded_shingles(d).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("ida"), F.col("s").alias("s"))
    sb = sh.select(F.col("doc_id").alias("idb"), F.col("s").alias("s"))
    inter = (
        cand.join(sa, "ida")
        .join(sb, ["idb", "s"])
        .groupBy("ida", "idb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("ida"), F.col("n").alias("na")), "ida")
        .join(sizes.select(F.col("doc_id").alias("idb"), F.col("n").alias("nb")), "idb")
        .withColumn("jacc", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jacc") >= JACCARD_THRESHOLD)
        .select("ida", "idb", "inter", "na", "nb", "jacc")
        .orderBy("ida", "idb")
    )


def _sql_simhash_cte() -> str:
    h = f"(({D.SIMHASH_A} * CAST(tid AS BIGINT) + {D.SIMHASH_B}) % {D.SIMHASH_M})"
    bit_sums = ",\n               ".join(
        f"SUM(CASE WHEN ({h} >> {b}) & 1 = 1 THEN c ELSE -c END) AS s{b}"
        for b in range(D.SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(D.SIMHASH_BITS)
    )
    return f"""
    tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS t FROM documents),
    tc AS (
        SELECT doc_id, {D.sql_strhash("t")} AS tid, count(*) AS c
        FROM tok GROUP BY 1, 2
    ),
    bits AS (
        SELECT doc_id,
               {bit_sums}
        FROM tc GROUP BY doc_id
    ),
    sig AS (SELECT doc_id, {sig} AS simhash FROM bits)
    """


@query(
    "dedup_simhash",
    oracle=f"""
    WITH {_sql_simhash_cte()}
    SELECT a.doc_id AS ida, b.doc_id AS idb,
           a.simhash AS simhash_a, b.simhash AS simhash_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    ORDER BY ida, idb
    """,
    tags=("llm", "dedup"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash (count-weighted token hashes, sign per bit),
    near-dup pairs at small Hamming distance. Token ids from the
    row-local cross-engine hash (operators/dedup.strhash). The pair
    join here is brute-force n²; at 100 TB block on simhash bit-bands
    (split the signature into 4 byte-keys, join per band) — same trick
    as MinHash LSH."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    tc = (
        tok.select("doc_id", D.strhash(F.col("t")).alias("tid"))
        .groupBy("doc_id", "tid")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    h = (
        F.lit(D.SIMHASH_A).cast("bigint") * F.col("tid").cast("bigint")
        + F.lit(D.SIMHASH_B)
    ) % F.lit(D.SIMHASH_M)
    bits = tc.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.col("c")).otherwise(
                    -F.col("c")
                )
            ).alias(f"s{b}")
            for b in range(D.SIMHASH_BITS)
        ]
    )
    sig_expr = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0)),
        range(1, D.SIMHASH_BITS),
        F.when(F.col("s0") > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0)),
    )
    sig = bits.select("doc_id", sig_expr.alias("simhash"))
    a, b = sig.alias("a"), sig.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            F.col("a.simhash").alias("simhash_a"),
            F.col("b.simhash").alias("simhash_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("ida", "idb")
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH all_vecs AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + {COPY_OFFSET}, embedding FROM embeddings
    ),
    normed AS (
        SELECT vec_id, embedding, sqrt({D.sql_dot("embedding", "embedding")}) AS nrm
        FROM all_vecs
    )
    SELECT a.vec_id AS ida, b.vec_id AS idb,
           {D.sql_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos_sim
    FROM normed a JOIN normed b ON a.vec_id < b.vec_id
    WHERE {D.sql_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
          >= {COSINE_DUP_THRESHOLD}
    ORDER BY ida, idb
    """,
    tags=("llm", "dedup"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (planted duplicates via shifted-id
    self-union; organic max cosine in the testdata is ≈0.51, so the
    planted 1.0-pairs are exactly the expected output).

    Brute-force O(n²) pair join — the exact baseline. The norm is
    precomputed per vector (one scan) so each pair costs a single
    sequential fold; the scale path is sign-LSH bucketing
    (sim_topk_lsh in llm_similarity) which replaces the cross join with
    a bucket-key equi-join."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.select((F.col("vec_id") + COPY_OFFSET).alias("vec_id"), "embedding")
    normed = (
        e.unionByName(planted)
        .withColumn("nrm", F.sqrt(D.dot_double(F.col("embedding"), F.col("embedding"))))
        .alias("a")
    )
    b = normed.alias("b")
    cos = D.dot_double(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        normed.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ida"),
            F.col("b.vec_id").alias("idb"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= COSINE_DUP_THRESHOLD)
        .orderBy("ida", "idb")
    )
