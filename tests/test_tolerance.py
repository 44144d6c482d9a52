"""Tolerance/semantic checks for approximate operators (SURVEY §5.2):
bounded error for sketches, recall floors for LSH candidate generation,
exactness of re-rank stages."""

from __future__ import annotations

from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"
REGISTRY = load_all()


def test_approx_count_distinct_within_5pct(spark):
    ev = load_table(spark, SF, "events")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact <= 0.05


def test_lsh_topk_is_exact_on_its_candidates(spark):
    """sim_topk_lsh may miss neighbors (bucket recall < 1) but every
    cosine it reports must equal the brute-force value for that pair —
    the re-rank stage is exact."""
    lsh = {(r["qid"], r["cid"]): r["cos_sim"]
           for r in REGISTRY["sim_topk_lsh"].fn(spark, SF).collect()}
    assert lsh, "LSH produced no candidates at all"
    brute_all = {
        (r["qid"], r["cid"]): r["cos_sim"]
        for r in REGISTRY["sim_topk_bruteforce"].fn(spark, SF).collect()
    }
    # pairs present in both rankings must agree bitwise
    shared = set(lsh) & set(brute_all)
    assert all(lsh[p] == brute_all[p] for p in shared)


def test_minhash_lsh_recall_on_planted_pairs(spark):
    """MinHash banding must recover nearly all exact-Jaccard pairs (the
    planted near-dups sit at jacc≈0.99, far above the 0.8 threshold)."""
    exact = {(r["ida"], r["idb"])
             for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF).collect()}
    lsh = {(r["ida"], r["idb"])
           for r in REGISTRY["dedup_minhash_lsh"].fn(spark, SF).collect()}
    assert exact, "no planted near-dup pairs at sf0.001?"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.2f} < 0.9"
    # precision is exact by construction (re-rank filters at the same threshold)
    assert lsh <= exact


def test_spark_ml_minhash_recall(spark):
    exact = {(r["ida"], r["idb"])
             for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF).collect()}
    ml = {(r["ida"], r["idb"])
          for r in REGISTRY["dedup_minhash_spark_ml"].fn(spark, SF).collect()}
    recall = len(exact & ml) / len(exact)
    assert recall >= 0.8, f"spark.ml minhash recall {recall:.2f} < 0.8"


def test_approx_quantiles_within_2pct(spark):
    o = load_table(spark, SF, "orders")
    exact = o.select(
        F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.99))")
    ).collect()[0][0]
    approx = REGISTRY["agg_approx_quantiles"].fn(spark, SF).collect()[0]
    for got, want in zip([approx["q25"], approx["q50"], approx["q75"], approx["q99"]], exact):
        assert abs(got - want) / want <= 0.02, f"approx {got} vs exact {want}"
