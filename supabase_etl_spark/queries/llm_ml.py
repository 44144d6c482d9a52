"""spark.ml-backed LLM-pipeline variants (SURVEY.md §2.2 / §4.2 "LSH
dedup / similarity — spark.ml provides MinHashLSH / BRP-LSH").

These are the library counterparts of the hand-rolled LSH operators in
llm_dedup/llm_similarity. They are seeded and deterministic inside
Spark, but their hash families (HashingTF buckets, ml-internal LCGs)
can't be replayed in DuckDB SQL — so the driver records the weaker
rows-only check for them (oracle=None), while their exact re-rank
stages remain covered by the oracle-checked manual variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.queries import query

SEED = 42


@query("dedup_minhash_spark_ml", oracle=None, tags=("llm", "dedup", "ml"))
def dedup_minhash_spark_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH from spark.ml: RegexTokenizer → NGram(3) → binary
    HashingTF → approxSimilarityJoin at Jaccard distance ≤ 0.2.
    approxSimilarityJoin computes the true distance on the feature
    vectors after LSH candidate generation, so precision is exact and
    only recall is approximate. Rows-only check (HashingTF bucket ids
    aren't SQL-replayable); the equivalent exact pipeline is
    dedup_ngram_jaccard."""
    from pyspark.ml.feature import NGram, HashingTF, MinHashLSH, RegexTokenizer

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = RegexTokenizer(inputCol="text", outputCol="toks", pattern=r"\s+")
    ng = NGram(n=3, inputCol="toks", outputCol="grams")
    tf = HashingTF(inputCol="grams", outputCol="features", binary=True, numFeatures=1 << 18)
    staged = tf.transform(ng.transform(tok.transform(d)))
    # MinHashLSH requires at least one non-zero entry
    staged = staged.filter(F.col("grams").getItem(0).isNotNull())
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED)
    model = lsh.fit(staged)
    pairs = model.approxSimilarityJoin(staged, staged, 0.2, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("ida"),
            F.col("datasetB.doc_id").alias("idb"),
            F.col("jaccard_dist"),
        )
        .orderBy("ida", "idb")
    )


BRP_N_QUERIES = 5
BRP_TOP_K = 5
# Euclidean join radius: the testdata's near-unit embeddings sit at
# pairwise distances ~1.1-1.67 (5th pct ≈ 1.26), so 1.35 keeps a
# comfortable candidate pool per query while pruning most of the corpus
# before the exact re-rank.
BRP_DIST_THRESHOLD = 1.35


@query("sim_brp_lsh_ml", oracle=None, tags=("llm", "similarity", "ml"))
def sim_brp_lsh_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH (euclidean) from spark.ml, **batch
    shape**: one `approxSimilarityJoin` of the query batch against the
    corpus (LSH-bucket candidate join + exact distance filter, all
    executor-side — no driver loop, no collect), then a per-query top-k
    window. A 10 000-query batch runs exactly this plan; the old
    per-query `approxNearestNeighbors` loop serialized on the driver.
    Rows-only check (ml-internal hash family isn't SQL-replayable);
    recall vs the exact ranking is asserted in tests."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=SEED
    )
    model = lsh.fit(e)
    q = e.filter(F.col("vec_id") < BRP_N_QUERIES)
    pairs = model.approxSimilarityJoin(q, e, BRP_DIST_THRESHOLD, distCol="dist")
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("cid").asc())
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("qid"),
            F.col("datasetB.vec_id").alias("cid"),
            F.col("dist"),
        )
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BRP_TOP_K)
        .orderBy("qid", "rn")
    )


PREFIXSPAN_MIN_SUPPORT = 0.3  # pattern must hold in ≥30% of user sequences


@query(
    "ml_prefixspan_sequences",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
    ),
    n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_seq FROM seq),
    p1 AS (
        SELECT event_type AS pattern, CAST(count(DISTINCT user_id) AS BIGINT) AS freq
        FROM seq GROUP BY event_type
    ),
    p2 AS (
        SELECT concat(a.event_type, '->', b.event_type) AS pattern,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS freq
        FROM seq a JOIN seq b
          ON a.user_id = b.user_id AND a.rn < b.rn
        GROUP BY 1
    ),
    all_p AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
    SELECT pattern, freq
    FROM all_p CROSS JOIN n
    WHERE freq >= CAST(ceil({PREFIXSPAN_MIN_SUPPORT} * n.n_seq) AS BIGINT)
    ORDER BY pattern
    """,
    tags=("ml", "events", "sequence"),
)
def ml_prefixspan_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining with spark.ml's PrefixSpan (Pei et
    al. 2001): each user's time-ordered event types form a sequence of
    singleton itemsets; patterns up to length 2 with ≥30% sequence
    support are mined by the distributed projected-database algorithm.
    Unlike the LSH ml variants, PrefixSpan is EXACTLY replayable: a
    length-2 pattern [A,B] holds for a user iff positions i<j exist
    with those types in the engine's own (ts, event_id) total order —
    one self-join on the sequence table — so this spark.ml op gets a
    full value-hash oracle, not a rows-only check. Sequence
    construction (sort_array of (ts-rank, type) structs per user) is
    one shuffle; PrefixSpan's projected-database growth is bounded by
    maxPatternLength=2, which also bounds the oracle to the pair join.
    """
    from pyspark.ml.fpm import PrefixSpan

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqs = (
        ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: F.array(s["event_type"]),
            ).alias("sequence")
        )
    )
    ps = PrefixSpan(
        minSupport=PREFIXSPAN_MIN_SUPPORT,
        maxPatternLength=2,
        sequenceCol="sequence",
    )
    pats = ps.findFrequentSequentialPatterns(seqs)
    pattern = F.concat_ws(
        "->", F.transform(F.col("sequence"), lambda its: its[0])
    )
    return pats.select(pattern.alias("pattern"), F.col("freq")).orderBy("pattern")


KNN_QUERIES = 40  # held-out query set: vec_id < KNN_QUERIES
KNN_K = 5

_KNN_COS = (
    "(list_reduce(list_transform(range(1, len(q.embedding) + 1), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), "
    "(acc, x) -> acc + x) + 0.0) / (q.nrm * c.nrm)"
)


@query(
    "ml_knn_classifier_eval",
    oracle=f"""
    WITH normed AS (
        SELECT vec_id, label, embedding,
               sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
                        i -> CAST(embedding[i] AS DOUBLE)
                             * CAST(embedding[i] AS DOUBLE)),
                    (acc, x) -> acc + x) + 0.0) AS nrm
        FROM embeddings
    ),
    q AS (SELECT * FROM normed WHERE vec_id < {KNN_QUERIES}),
    c AS (SELECT * FROM normed WHERE vec_id >= {KNN_QUERIES}),
    sims AS (
        SELECT q.vec_id AS qid, q.label AS true_label,
               c.label AS clabel, c.vec_id AS cid,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_KNN_COS} DESC, c.vec_id
               ) AS rn
        FROM q, c
    ),
    votes AS (
        SELECT qid, true_label, clabel, count(*) AS n_votes
        FROM sims WHERE rn <= {KNN_K}
        GROUP BY qid, true_label, clabel
    ),
    pred AS (
        SELECT qid, true_label, clabel AS pred_label, n_votes,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY n_votes DESC, clabel
               ) AS vr
        FROM votes
    )
    SELECT qid, true_label, pred_label, CAST(n_votes AS BIGINT) AS n_votes,
           true_label = pred_label AS correct
    FROM pred WHERE vr = 1
    ORDER BY qid
    """,
    tags=("ml", "classification"),
)
def ml_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification eval over the embedding corpus: the first
    40 vectors are a held-out query set, each classified by the
    majority label of its 5 nearest corpus neighbors by cosine
    (vote ties break to the smallest label, distance ties to the
    smallest id). The lazy-learner baseline every embedding-quality
    report starts from. Plan: broadcast the bounded query batch
    against one corpus scan (never corpus×corpus), per-query top-k
    window partitioned by qid, then a vote count on k·|Q| rows —
    identical shape to sim_topk_bruteforce, so the 100 TB story is
    one pass over the corpus per query batch."""
    e = load_table(spark, sf_dir, "embeddings")
    from supabase_etl_spark.operators.dedup import dot_double

    nrm = F.sqrt(dot_double(F.col("embedding"), F.col("embedding")))
    q = e.filter(F.col("vec_id") < KNN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qe"),
        nrm.alias("qn"),
    )
    c = e.filter(F.col("vec_id") >= KNN_QUERIES).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        F.col("embedding").alias("ce"),
        nrm.alias("cn"),
    )
    cos = dot_double(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    knn = (
        c.crossJoin(F.broadcast(q))
        .select("qid", "true_label", "clabel", "cid", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
    )
    votes = knn.groupBy("qid", "true_label", "clabel").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    vw = Window.partitionBy("qid").orderBy(F.col("n_votes").desc(), F.col("clabel"))
    return (
        votes.withColumn("vr", F.row_number().over(vw))
        .filter(F.col("vr") == 1)
        .select(
            "qid",
            "true_label",
            F.col("clabel").alias("pred_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
            (F.col("true_label") == F.col("clabel")).alias("correct"),
        )
        .orderBy("qid")
    )
