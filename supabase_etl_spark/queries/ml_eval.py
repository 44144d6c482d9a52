"""Model-evaluation metrics over scored datasets (SURVEY.md §2.2 "LLM
ops" — the QA half of a training-data pipeline: every data-curation
classifier, quality filter, and retrieval index ships with an eval job
that computes AUC / PR / calibration / ranking metrics over a scored
holdout, and those jobs run at the same corpus scale as the filters).

The fixture is deterministic: binary label y = label % 2 on the
``embeddings`` table, and two "model" scores derived from embedding
dims 1 and 2 with a +0.25·y class shift, quantized to integer buckets
``floor(40·s)``. Quantization is the scale lever — every threshold
metric (AUC, AP, KS, gain/lift, calibration) is computed from the
GROUPED (model, score) table, whose size is bounded by the score
grid (~40 rows), not the corpus. At 100 TB the per-row pass is one
map + one groupBy; the cumulative windows run on the tiny threshold
table. The same trick is how production eval jobs (e.g. Spark mllib's
BinaryClassificationMetrics with numBins) stay linear.

Exactness discipline: AUC is a pure integer sum (concordant-pair
counting with 0.5-tie credit, scaled by 2 to stay integral); AP, Brier,
DCG are decimal(38,12) sums of per-row doubles computed by identical
IEEE expressions in both engines; probabilities use a rational squash
p = 0.5 + 0.5·z/(1+|z|) (no transcendentals); NDCG log-discounts are
embedded as shared literal constants so both engines parse the exact
same doubles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.operators.dedup import dot_double, sql_dot
from supabase_etl_spark.queries import query

# exact accumulator for probability-scale terms. Scale 12, not 18: Spark
# casts double->decimal through the SHORTEST-REPR string while DuckDB
# rounds the exact binary expansion, and the two agree only within ~15
# significant digits -- rounding at 1e-12 for <=3-integer-digit terms
# stays inside that agreement window, so both engines produce the same
# decimals and the sums stay order-independent
DEC18 = "decimal(38,12)"

SCORE_GRID = 40  # score quantization: s_q = floor(40 * raw)

RANK_QUERIES = 8  # ranking eval: queries are vec_id < RANK_QUERIES
RANK_K = 10

# NDCG rank discounts 1/log2(rank+1) as shared literals — repr() is the
# shortest round-trip form, so both engines parse bit-identical doubles.
# Each branch is CAST(... AS DOUBLE) because bare numeric literals parse
# as DECIMAL in both SQL dialects, and decimal arithmetic would diverge.
_DISC = [repr(1.0 / math.log2(i + 1)) for i in range(1, RANK_K + 1)]
_IDCG = [repr(sum(1.0 / math.log2(i + 1) for i in range(1, m + 1))) for m in range(1, RANK_K + 1)]

_DISC_CASE = (
    "CASE rn "
    + " ".join(f"WHEN {i + 1} THEN CAST({d} AS DOUBLE)" for i, d in enumerate(_DISC))
    + " ELSE CAST(0.0 AS DOUBLE) END"
)
_IDCG_CASE = (
    "CASE m "
    + " ".join(f"WHEN {i + 1} THEN CAST({d} AS DOUBLE)" for i, d in enumerate(_IDCG))
    + " ELSE CAST(1.0 AS DOUBLE) END"
)


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(model, s, y): two deterministic model scores per row, quantized
    to the integer grid. One narrow projection of the corpus — the only
    full-data pass every metric below shares."""
    e = load_table(spark, sf_dir, "embeddings")
    y = (F.col("label") % 2).alias("y")

    def model(dim: int, name: str) -> DataFrame:
        raw = F.element_at("embedding", dim).cast("double") + 0.25 * (F.col("label") % 2)
        return e.select(
            F.lit(name).alias("model"),
            F.floor(raw * SCORE_GRID).cast("bigint").alias("s"),
            y,
        )

    return model(1, "m1").unionByName(model(2, "m2"))


# DuckDB twin of _scored(): embedding[] is 1-indexed in both engines
_SQL_SCORED = f"""
    scored AS (
        SELECT m.model,
               CAST(FLOOR((CAST(CASE WHEN m.model = 'm1' THEN embedding[1]
                                     ELSE embedding[2] END AS DOUBLE)
                           + 0.25 * (label % 2)) * {SCORE_GRID}) AS BIGINT) AS s,
               (label % 2) AS y
        FROM embeddings
        CROSS JOIN (SELECT 'm1' AS model UNION ALL SELECT 'm2') m
    )
"""

# grouped threshold table + cumulatives: every (model, s) is unique per
# window partition, so the default RANGE frame has no peer ambiguity
_SQL_CUM = f"""
    {_SQL_SCORED},
    g AS (
        SELECT model, s,
               CAST(SUM(y) AS BIGINT) AS pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
        FROM scored GROUP BY model, s
    ),
    c AS (
        SELECT model, s, pos, neg,
               CAST(SUM(pos) OVER (PARTITION BY model ORDER BY s) AS BIGINT) AS cumpos_le,
               CAST(SUM(neg) OVER (PARTITION BY model ORDER BY s) AS BIGINT) AS cumneg_le,
               CAST(SUM(pos) OVER (PARTITION BY model ORDER BY s DESC) AS BIGINT) AS cumpos_ge,
               CAST(SUM(neg) OVER (PARTITION BY model ORDER BY s DESC) AS BIGINT) AS cumneg_ge,
               CAST(SUM(pos) OVER (PARTITION BY model) AS BIGINT) AS p_tot,
               CAST(SUM(neg) OVER (PARTITION BY model) AS BIGINT) AS n_tot
        FROM g
    )
"""


def _cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the ``c`` CTE: grouped threshold table with
    cumulative pos/neg from both ends plus per-model totals."""
    g = (
        _scored(spark, sf_dir)
        .groupBy("model", "s")
        .agg(
            F.sum("y").alias("pos"),
            (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
        )
    )
    asc = Window.partitionBy("model").orderBy("s")
    desc = Window.partitionBy("model").orderBy(F.col("s").desc())
    whole = Window.partitionBy("model")
    return g.select(
        "model",
        "s",
        "pos",
        "neg",
        F.sum("pos").over(asc).alias("cumpos_le"),
        F.sum("neg").over(asc).alias("cumneg_le"),
        F.sum("pos").over(desc).alias("cumpos_ge"),
        F.sum("neg").over(desc).alias("cumneg_ge"),
        F.sum("pos").over(whole).alias("p_tot"),
        F.sum("neg").over(whole).alias("n_tot"),
    )


# rational probability squash of the de-quantized score — +, *, /, abs
# only, so both engines produce bit-identical doubles
def _p_col() -> F.Column:
    z = F.col("s").cast("double") / float(SCORE_GRID)
    return F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))


_SQL_P = f"(0.5 + 0.5 * (CAST(s AS DOUBLE) / {float(SCORE_GRID)}) / (1.0 + ABS(CAST(s AS DOUBLE) / {float(SCORE_GRID)})))"


@query(
    "ml_eval_auc_pr",
    oracle=f"""
    WITH {_SQL_CUM}
    SELECT model,
           CAST(MAX(p_tot) AS BIGINT) AS pos_n,
           CAST(MAX(n_tot) AS BIGINT) AS neg_n,
           CAST(SUM(pos * (2 * (cumneg_le - neg) + neg)) AS DOUBLE)
               / (2.0 * MAX(p_tot) * MAX(n_tot)) AS auc,
           CAST(SUM(CAST((CAST(pos AS DOUBLE) / p_tot)
                         * (CAST(cumpos_ge AS DOUBLE) / (cumpos_ge + cumneg_ge))
                         AS DECIMAL(38,12))) AS DOUBLE) AS avg_precision,
           CAST(SUM(CAST(pos * ({_SQL_P} - 1.0) * ({_SQL_P} - 1.0)
                         + neg * {_SQL_P} * {_SQL_P}
                         AS DECIMAL(38,12))) AS DOUBLE)
               / (MAX(p_tot) + MAX(n_tot)) AS brier
    FROM c
    GROUP BY model
    ORDER BY model
    """,
    tags=("llm", "ml-eval"),
)
def ml_eval_auc_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC, average precision, and Brier score per model.

    AUC is Mann-Whitney concordant-pair counting on the grouped
    threshold table: each score bucket contributes
    pos·(2·neg_below + neg_tied) — an exact integer — and the single
    final division yields the tie-corrected AUC. AP is the step-wise
    PR-curve area Σ (pos_s/P)·precision(≥s) with ties grouped at the
    bucket level. Brier uses the rational squash probability. All three
    run on the ~40-row threshold table; the corpus is touched once by
    the groupBy."""
    p = _p_col()
    return (
        _cum(spark, sf_dir)
        .groupBy("model")
        .agg(
            F.max("p_tot").alias("pos_n"),
            F.max("n_tot").alias("neg_n"),
            (
                F.sum(F.col("pos") * (2 * (F.col("cumneg_le") - F.col("neg")) + F.col("neg"))).cast("double")
                / (F.lit(2.0) * F.max("p_tot") * F.max("n_tot"))
            ).alias("auc"),
            F.sum(
                (
                    (F.col("pos").cast("double") / F.col("p_tot"))
                    * (F.col("cumpos_ge").cast("double") / (F.col("cumpos_ge") + F.col("cumneg_ge")))
                ).cast(DEC18)
            )
            .cast("double")
            .alias("avg_precision"),
            (
                F.sum(
                    (F.col("pos") * (p - 1.0) * (p - 1.0) + F.col("neg") * p * p).cast(DEC18)
                ).cast("double")
                / (F.max("p_tot") + F.max("n_tot"))
            ).alias("brier"),
        )
        .orderBy("model")
    )


@query(
    "ml_eval_ks",
    oracle=f"""
    WITH {_SQL_CUM},
    d AS (
        SELECT model, s,
               ABS(CAST(cumpos_le AS DOUBLE) / p_tot
                   - CAST(cumneg_le AS DOUBLE) / n_tot) AS absdiff
        FROM c
    ),
    mx AS (
        SELECT model, s, absdiff,
               MAX(absdiff) OVER (PARTITION BY model) AS ks
        FROM d
    )
    SELECT model, MAX(ks) AS ks_stat, CAST(MIN(s) AS BIGINT) AS ks_threshold
    FROM mx WHERE absdiff = ks
    GROUP BY model
    ORDER BY model
    """,
    tags=("llm", "ml-eval"),
)
def ml_eval_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov separation per model: max over thresholds of
    |CDF_pos − CDF_neg|, plus the lowest score bucket attaining it (the
    classic credit-scoring cutoff). The argmax comparison is on doubles
    both engines computed by the same expression, so equality is
    exact."""
    c = _cum(spark, sf_dir)
    absdiff = F.abs(
        F.col("cumpos_le").cast("double") / F.col("p_tot")
        - F.col("cumneg_le").cast("double") / F.col("n_tot")
    ).alias("absdiff")
    w = Window.partitionBy("model")
    mx = c.select("model", "s", absdiff).withColumn("ks", F.max("absdiff").over(w))
    return (
        mx.filter(F.col("absdiff") == F.col("ks"))
        .groupBy("model")
        .agg(F.max("ks").alias("ks_stat"), F.min("s").alias("ks_threshold"))
        .orderBy("model")
    )


@query(
    "ml_eval_gain_lift",
    oracle=f"""
    WITH {_SQL_CUM}
    SELECT model, s,
           CAST(cumpos_ge + cumneg_ge AS DOUBLE) / (p_tot + n_tot) AS frac_population,
           CAST(cumpos_ge AS DOUBLE) / p_tot AS gain,
           (CAST(cumpos_ge AS DOUBLE) / p_tot)
               / (CAST(cumpos_ge + cumneg_ge AS DOUBLE) / (p_tot + n_tot)) AS lift
    FROM c
    ORDER BY model, s DESC
    """,
    tags=("llm", "ml-eval"),
)
def ml_eval_gain_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift per score threshold, descending: at
    each cutoff, what fraction of the population is selected and what
    fraction of all positives it captures (gain), with lift = gain /
    population-fraction. This is the targeting-table shape (CAP curve);
    one row per threshold bucket, so output size is the score grid."""
    c = _cum(spark, sf_dir)
    frac_pop = (F.col("cumpos_ge") + F.col("cumneg_ge")).cast("double") / (
        F.col("p_tot") + F.col("n_tot")
    )
    gain = F.col("cumpos_ge").cast("double") / F.col("p_tot")
    return c.select(
        "model",
        "s",
        frac_pop.alias("frac_population"),
        gain.alias("gain"),
        (gain / frac_pop).alias("lift"),
    ).orderBy("model", F.col("s").desc())


@query(
    "ml_eval_calibration",
    oracle=f"""
    WITH {_SQL_CUM}
    SELECT model,
           LEAST(CAST(FLOOR({_SQL_P} * 10) AS BIGINT), 9) AS bin,
           CAST(SUM(pos + neg) AS BIGINT) AS n_rows,
           CAST(SUM(CAST((pos + neg) * {_SQL_P} AS DECIMAL(38,12))) AS DOUBLE)
               / SUM(pos + neg) AS mean_predicted,
           CAST(SUM(pos) AS DOUBLE) / SUM(pos + neg) AS frac_positive
    FROM c
    GROUP BY model, bin
    ORDER BY model, bin
    """,
    tags=("llm", "ml-eval"),
)
def ml_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: squash scores to probabilities, bucket into
    ten equal-width bins, and compare mean predicted probability with
    the observed positive rate per bin. A calibrated model sits on the
    diagonal. Computed entirely on the threshold table — the bin
    assignment is a map over ~40 rows."""
    p = _p_col()
    bin_ = F.least(F.floor(p * 10).cast("bigint"), F.lit(9).cast("bigint"))
    return (
        _cum(spark, sf_dir)
        .select(
            "model",
            bin_.alias("bin"),
            "pos",
            "neg",
            ((F.col("pos") + F.col("neg")) * p).cast(DEC18).alias("wp"),
        )
        .groupBy("model", "bin")
        .agg(
            F.sum(F.col("pos") + F.col("neg")).alias("n_rows"),
            (F.sum("wp").cast("double") / F.sum(F.col("pos") + F.col("neg"))).alias(
                "mean_predicted"
            ),
            (F.sum("pos").cast("double") / F.sum(F.col("pos") + F.col("neg"))).alias(
                "frac_positive"
            ),
        )
        .orderBy("model", "bin")
    )


@query(
    "ml_eval_confusion_f1",
    oracle="""
    WITH pred AS (
        SELECT label AS truth,
               CASE WHEN CAST(FLOOR(ABS(CAST(embedding[4] AS DOUBLE)) * 100) AS BIGINT) % 3 = 0
                    THEN (label + 1) % 10 ELSE label END AS pred
        FROM embeddings
    ),
    by_truth AS (
        SELECT truth AS cls, CAST(COUNT(*) AS BIGINT) AS support FROM pred GROUP BY truth
    ),
    by_pred AS (
        SELECT pred AS cls, CAST(COUNT(*) AS BIGINT) AS predicted_n FROM pred GROUP BY pred
    ),
    diag AS (
        SELECT truth AS cls, CAST(COUNT(*) AS BIGINT) AS tp
        FROM pred WHERE truth = pred GROUP BY truth
    ),
    m AS (
        SELECT t.cls, t.support,
               COALESCE(p.predicted_n, 0) AS predicted_n,
               COALESCE(d.tp, 0) AS tp
        FROM by_truth t
        LEFT JOIN by_pred p ON t.cls = p.cls
        LEFT JOIN diag d ON t.cls = d.cls
    )
    SELECT cls, support, predicted_n, tp,
           CASE WHEN predicted_n = 0 THEN 0.0
                ELSE CAST(tp AS DOUBLE) / predicted_n END AS precision_,
           CAST(tp AS DOUBLE) / support AS recall_,
           CASE WHEN tp = 0 THEN 0.0
                ELSE 2.0 * (CAST(tp AS DOUBLE) / predicted_n) * (CAST(tp AS DOUBLE) / support)
                     / (CAST(tp AS DOUBLE) / predicted_n + CAST(tp AS DOUBLE) / support)
           END AS f1
    FROM m
    ORDER BY cls
    """,
    tags=("llm", "ml-eval"),
)
def ml_eval_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class confusion metrics: a deterministic "classifier"
    (flips the class to its neighbor when a hash-free digit test on
    embedding dim 4 fires) scored per class with support, predicted
    count, true positives, precision, recall, and F1. Three grouped
    counts + a class-sized join — the confusion matrix itself never
    materializes row-wise, so the plan is corpus-pass + tiny joins at
    any scale."""
    e = load_table(spark, sf_dir, "embeddings")
    flip = (
        F.floor(F.abs(F.element_at("embedding", 4).cast("double")) * 100).cast("bigint") % 3 == 0
    )
    pred = e.select(
        F.col("label").alias("truth"),
        F.when(flip, (F.col("label") + 1) % 10).otherwise(F.col("label")).alias("pred"),
    )
    by_truth = pred.groupBy(F.col("truth").alias("cls")).agg(F.count(F.lit(1)).alias("support"))
    by_pred = pred.groupBy(F.col("pred").alias("cls")).agg(
        F.count(F.lit(1)).alias("predicted_n")
    )
    diag = (
        pred.filter(F.col("truth") == F.col("pred"))
        .groupBy(F.col("truth").alias("cls"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    m = (
        by_truth.join(by_pred, "cls", "left")
        .join(diag, "cls", "left")
        .select(
            "cls",
            "support",
            F.coalesce("predicted_n", F.lit(0)).alias("predicted_n"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(F.col("predicted_n") == 0, F.lit(0.0)).otherwise(
        F.col("tp").cast("double") / F.col("predicted_n")
    )
    rec = F.col("tp").cast("double") / F.col("support")
    f1 = F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(
        2.0
        * (F.col("tp").cast("double") / F.col("predicted_n"))
        * (F.col("tp").cast("double") / F.col("support"))
        / (
            F.col("tp").cast("double") / F.col("predicted_n")
            + F.col("tp").cast("double") / F.col("support")
        )
    )
    return m.select(
        "cls",
        "support",
        "predicted_n",
        "tp",
        prec.alias("precision_"),
        rec.alias("recall_"),
        f1.alias("f1"),
    ).orderBy("cls")


@query(
    "ml_eval_ranking_ndcg",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qe, label AS qlabel,
               sqrt({sql_dot("embedding", "embedding")}) AS qn
        FROM embeddings WHERE vec_id < {RANK_QUERIES}
    ),
    corpus AS (
        SELECT vec_id AS cid, embedding AS ce, label AS clabel,
               sqrt({sql_dot("embedding", "embedding")}) AS cn
        FROM embeddings WHERE vec_id >= {RANK_QUERIES}
    ),
    rel_tot AS (
        SELECT q.qid, CAST(COUNT(*) AS BIGINT) AS r_total
        FROM q JOIN corpus c ON q.qlabel = c.clabel
        GROUP BY q.qid
    ),
    scored AS (
        SELECT qid, cid,
               {sql_dot("qe", "ce")} / (qn * cn) AS cos_sim,
               CASE WHEN qlabel = clabel THEN 1 ELSE 0 END AS rel
        FROM q CROSS JOIN corpus
    ),
    ranked AS (
        SELECT qid, cid, rel,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rn
        FROM scored
    ),
    topk AS (
        SELECT qid, rel, rn,
               CAST(SUM(rel) OVER (PARTITION BY qid ORDER BY rn) AS BIGINT) AS cumrel
        FROM ranked WHERE rn <= {RANK_K}
    ),
    per_q AS (
        SELECT qid,
               CAST(SUM(rel) AS BIGINT) AS rel_in_topk,
               CASE WHEN MIN(CASE WHEN rel = 1 THEN rn END) IS NULL THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(1.0 AS DOUBLE) / MIN(CASE WHEN rel = 1 THEN rn END) END AS mrr,
               CAST(SUM(CAST(CASE WHEN rel = 1
                                  THEN CAST(cumrel AS DOUBLE) / rn ELSE 0.0 END
                             AS DECIMAL(38,12))) AS DOUBLE) AS ap_num,
               CAST(SUM(CAST(rel * ({_DISC_CASE}) AS DECIMAL(38,12))) AS DOUBLE) AS dcg
        FROM topk
        GROUP BY qid
    ),
    fin AS (
        SELECT p.qid, p.rel_in_topk, r.r_total, p.mrr, p.ap_num, p.dcg,
               LEAST(r.r_total, {RANK_K}) AS m
        FROM per_q p JOIN rel_tot r ON p.qid = r.qid
    )
    SELECT qid, rel_in_topk, r_total, mrr,
           ap_num / m AS ap_at_k,
           dcg / ({_IDCG_CASE}) AS ndcg_at_k
    FROM fin
    ORDER BY qid
    """,
    tags=("llm", "ml-eval", "similarity"),
)
def ml_eval_ranking_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metrics over the exact cosine top-k: MRR,
    AP@k, and NDCG@k per query, with relevance = label match against
    the query vector. The retrieval stage is the broadcast-query
    brute-force scan (same shape as sim_topk_bruteforce — no corpus
    shuffle); the metric stage runs on Q·k rows. Rank discounts and
    ideal-DCG prefix sums are shared literal constants, and the ≤k-term
    DCG/AP sums run through decimal(38,12) so addition order cannot
    split the engines."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(dot_double(F.col("embedding"), F.col("embedding")))
    q = e.filter(F.col("vec_id") < RANK_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
        nrm.alias("qn"),
    )
    corpus = e.filter(F.col("vec_id") >= RANK_QUERIES).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("clabel"),
        nrm.alias("cn"),
    )
    rel_tot = (
        corpus.join(F.broadcast(q.select("qid", "qlabel")), F.col("qlabel") == F.col("clabel"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("r_total"))
    )
    cos = dot_double(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid").asc())
    ranked = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "cid",
            cos.alias("cos_sim"),
            F.when(F.col("qlabel") == F.col("clabel"), 1).otherwise(0).alias("rel"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RANK_K)
    )
    cum = Window.partitionBy("qid").orderBy("rn")
    topk = ranked.withColumn("cumrel", F.sum("rel").over(cum))
    per_q = topk.groupBy("qid").agg(
        F.sum("rel").alias("rel_in_topk"),
        F.coalesce(
            1.0 / F.min(F.when(F.col("rel") == 1, F.col("rn"))), F.lit(0.0)
        ).alias("mrr"),
        F.sum(
            F.when(F.col("rel") == 1, F.col("cumrel").cast("double") / F.col("rn"))
            .otherwise(F.lit(0.0))
            .cast(DEC18)
        )
        .cast("double")
        .alias("ap_num"),
        F.sum((F.col("rel") * F.expr(_DISC_CASE)).cast(DEC18)).cast("double").alias("dcg"),
    )
    joined = per_q.join(F.broadcast(rel_tot), "qid").withColumn(
        "m", F.least(F.col("r_total"), F.lit(RANK_K))
    )
    return joined.select(
        "qid",
        "rel_in_topk",
        "r_total",
        "mrr",
        (F.col("ap_num") / F.col("m")).alias("ap_at_k"),
        (F.col("dcg") / F.expr(_IDCG_CASE)).alias("ndcg_at_k"),
    ).orderBy("qid")
