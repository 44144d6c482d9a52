"""Scaling-curve evidence for the heavy dedup/text operators.

Times the scale-critical pipelines on 1x / 3x / 10x blowups of the
sf0.1 documents corpus (runtime self-union with shifted ids and
PER-COPY token tags — tagging every token makes each copy's shingles
disjoint from the others', so the blowup multiplies corpus *size*
while keeping duplicate *density* constant, which is what a real 10x
corpus looks like; untagged copies would multiply the pair OUTPUT
quadratically by construction and measure the workload, not the
plan). A plan whose wall time grows ~linearly in corpus size here is
shuffle/scan-bound, not pair-bound — the property that decides whether
it survives 100 TB. Quadratic plans (the ones round 1 flagged and
rounds 2-3 replaced) blow up visibly at 10x.

Usage:
    python scripts/scale_curve.py            # prints a markdown table
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BLOWUPS = (1, 3, 10)
ID_STRIDE = 10_000_000  # distinct doc_id space per copy


def blowup_docs(spark, mult: int):
    from supabase_etl_spark.io.readers import load_table

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    copies = [
        d.select(
            (F.col("doc_id") + i * ID_STRIDE).alias("doc_id"),
            # tag every token so copy i shares no shingles with copy j
            F.regexp_replace("text", r"(\S+)", rf"$1_c{i}").alias("text"),
        )
        for i in range(mult)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    from supabase_etl_spark.operators import dedup as D
    from supabase_etl_spark.session import get_spark

    spark = get_spark("scale-curve")

    def t_exact(docs):
        docs.groupBy(F.sha2("text", 256).alias("h")).agg(
            F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n")
        ).write.format("noop").mode("overwrite").save()

    def t_minhash(docs):
        sids = D.shingle_ids(docs)
        bands = D.band_keys(D.minhash_signature(sids))
        (
            bands.alias("a")
            .join(
                bands.alias("b"),
                [F.col("a.band") == F.col("b.band")]
                + [
                    F.col(f"a.k{i}") == F.col(f"b.k{i}")
                    for i in range(D.ROWS_PER_BAND)
                ]
                + [F.col("a.doc_id") < F.col("b.doc_id")],
            )
            .select(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
            .distinct()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def t_prefix(docs):
        D.jaccard_pairs_prefix(docs, 0.8).write.format("noop").mode(
            "overwrite"
        ).save()

    def t_tokens(docs):
        from supabase_etl_spark.operators.text import tokens

        docs.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
        ).groupBy().agg(F.sum("n_tokens")).write.format("noop").mode(
            "overwrite"
        ).save()

    ops = {
        "dedup_exact (sha2 groupBy)": t_exact,
        "minhash band candidates": t_minhash,
        "jaccard prefix pairs": t_prefix,
        "token stats (scan-bound)": t_tokens,
    }

    rows = []
    for name, fn in ops.items():
        walls = []
        for mult in BLOWUPS:
            docs = blowup_docs(spark, mult)
            fn(docs)  # warm codegen at this plan shape
            t0 = time.time()
            fn(docs)
            walls.append(time.time() - t0)
            spark.catalog.clearCache()
        ratio = walls[-1] / walls[0] if walls[0] > 0 else float("inf")
        rows.append((name, walls, ratio))
        print(
            f"# {name}: "
            + " ".join(f"{m}x={w:.2f}s" for m, w in zip(BLOWUPS, walls))
            + f"  (10x/1x = {ratio:.1f})",
            flush=True,
        )

    print("\n| operator | 1x | 3x | 10x | 10x/1x |")
    print("|---|---|---|---|---|")
    for name, walls, ratio in rows:
        cells = " | ".join(f"{w:.2f}s" for w in walls)
        print(f"| {name} | {cells} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
