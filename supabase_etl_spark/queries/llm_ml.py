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

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
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


@query("sim_brp_lsh_ml", oracle=None, tags=("llm", "similarity", "ml"))
def sim_brp_lsh_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH (euclidean) from spark.ml:
    approxNearestNeighbors for the first 5 corpus vectors, k=5 each.
    The per-query ANN API is driver-orchestrated by design (each call
    prunes by hash bucket, then exact-ranks candidates); batch-shaped
    ANN lives in sim_topk_lsh / sim_ivf_probe. Rows-only check."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=SEED
    )
    model = lsh.fit(e)
    hashed = model.transform(e).cache()
    queries = e.filter(F.col("vec_id") < 5).collect()
    results = []
    for row in queries:
        nn = model.approxNearestNeighbors(hashed, row["features"], 6, distCol="dist")
        results.append(
            nn.filter(F.col("vec_id") != row["vec_id"]).select(
                F.lit(row["vec_id"]).alias("qid"),
                F.col("vec_id").alias("cid"),
                F.col("dist"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), results).orderBy("qid", "dist", "cid")
