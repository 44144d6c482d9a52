"""Deduplication operators (SURVEY.md §2.2 "LLM ops": exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine).

The reference deduplicates nothing (its upsert sink is the only
idempotency mechanism, etl_supabase.py:71-85); this module is the
training-data-pipeline mandate.

Cross-engine determinism strategy: every hashing step is expressed over
**dense shingle/token ids** (dense_rank over the sorted distinct
vocabulary) with explicit LCG-style hash coefficients, so the DuckDB
oracle can replay the identical algorithm bit-for-bit. At 100 TB the
dictionary stage is replaced by `xxhash64(shingle)` — same plan shape,
no global dictionary — the swap is a one-line change noted on each
operator. Everything else (inverted-index joins, band-bucket joins,
per-pair re-rank) is shuffle-on-key and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from supabase_etl_spark.operators.text import tokens

SHINGLE_K = 3  # word n-gram width

# MinHash: h_i(x) = (A_i * x + B_i) mod P over dense shingle ids.
# Coefficients from a fixed LCG so Spark exprs and oracle SQL share them.
MINHASH_P = 2_147_483_647
NUM_HASHES = 12
BANDS = 4  # 4 bands x 3 rows
ROWS_PER_BAND = NUM_HASHES // BANDS


def _lcg(seed: int):
    while True:
        seed = (1103515245 * seed + 12345) % 2_147_483_648
        yield seed


_gen = _lcg(20260813)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (next(_gen) % (MINHASH_P - 1) + 1, next(_gen) % MINHASH_P) for _ in range(NUM_HASHES)
]

# SimHash: 32-bit signature from token-id hashes weighted by term counts.
SIMHASH_BITS = 32
SIMHASH_A, SIMHASH_B = 1_103_515_245, 12_345
SIMHASH_M = 2_147_483_648


def shingles(col: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingles (space-joined). Documents shorter
    than k tokens contribute their full token run as one shingle."""
    toks = tokens(col)
    n = F.greatest(F.lit(1), F.size(toks) - F.lit(k - 1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(k))),
        )
    )


def sql_shingles(text: str = "text", k: int = SHINGLE_K) -> str:
    """DuckDB mirror of :func:`shingles` (1-based list slicing)."""
    toks = f"list_filter(regexp_split_to_array({text}, '\\s+'), t -> t <> '')"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(1, len({toks}) - {k - 1}) + 1), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], ' ')))"
    )


def exploded_shingles(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — the inverted-index input. Narrow explode;
    partial-aggregates and shuffles on the shingle key downstream."""
    return docs.select(id_col, F.explode(shingles(F.col("text"))).alias("s"))


def jaccard_pairs(
    docs: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via inverted-index
    self-join: pairs sharing >=1 shingle -> intersection counts -> filter
    |A∩B| / |A∪B| >= threshold. Returns (ida, idb, inter, na, nb, jacc).

    Scale: the shingle join shuffles on the shingle key; frequent
    shingles (stop-n-grams) blow up candidate pairs — at 100 TB cap
    document frequency per shingle (drop shingles with df > ~1000)
    before the join; omitted here so the oracle stays exact.
    """
    sh = exploded_shingles(docs, id_col).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("ida"), F.col(f"b.{id_col}").alias("idb"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("ida"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("idb"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "ida")
        .join(sb, "idb")
        .withColumn("jacc", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jacc") >= threshold)
        .select("ida", "idb", "inter", "na", "nb", "jacc")
    )


def shingle_ids(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sid) with dense ids over the sorted distinct shingle
    vocabulary. The single-partition ranking window is the oracle-
    determinism tax; the 100 TB variant is
    ``F.xxhash64('s').alias('sid')`` — no dictionary, no global sort."""
    sh = exploded_shingles(docs, id_col)
    vocab = sh.select("s").distinct().withColumn(
        "sid", F.dense_rank().over(Window.orderBy("s"))
    )
    return sh.join(vocab, "s").select(id_col, "sid")


def minhash_signature(doc_sids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, h0..h{N-1}) — min over shingle ids of each LCG hash."""
    sid = F.col("sid").cast("bigint")
    aggs = [
        F.min((F.lit(a).cast("bigint") * sid + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return doc_sids.groupBy(id_col).agg(*aggs)


def band_keys(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band, k1..k{r}) — one row per LSH band."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                *[
                    F.col(f"h{b * ROWS_PER_BAND + r}").alias(f"k{r}")
                    for r in range(ROWS_PER_BAND)
                ],
            )
            for b in range(BANDS)
        ]
    )
    return sig.select(id_col, F.explode(bands).alias("bk")).select(
        id_col, "bk.band", *[f"bk.k{r}" for r in range(ROWS_PER_BAND)]
    )


def dot_double(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product — identical fold order to the
    DuckDB oracle (list_reduce), so doubles match bitwise. `+ 0.0`
    normalizes a potential -0.0. Array-local: no shuffle, no UDF."""
    return (
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + F.lit(0.0)
    )


def sql_dot(a: str, b: str) -> str:
    return (
        f"(list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        f"(acc, x) -> acc + x) + 0.0)"
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_double(a, b) / (F.sqrt(dot_double(a, a)) * F.sqrt(dot_double(b, b)))


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
