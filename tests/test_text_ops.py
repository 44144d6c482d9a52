"""Edge cases for operators/text.py on synthetic rows.

Covers what the documents table can't: CJK short-circuit, sub-shingle
documents, whitespace-only text, profile tie-breaking order.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from supabase_etl_spark.operators import text as T


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_token_count_whitespace_only(spark):
    assert _one(spark, "   \t  ", T.token_count(F.col("text"))) == 0


def test_bpe_splits_punct_and_digits(spark):
    # "ab12,cd" -> [ab][12][,][cd]
    assert _one(spark, "ab12,cd", T.bpe_token_count(F.col("text"))) == 4


def test_lang_id_cjk_short_circuit(spark):
    assert _one(spark, "the the the 中文", T.lang_id(F.col("text"))) == "zh"


@pytest.mark.parametrize(
    ("text", "want"),
    [
        ("der und ist das", "de"),
        ("el que los se", "es"),
        ("les des et pour", "fr"),
        ("the of and to", "en"),
        ("nothing matches here", "en"),  # default
        ("la la la", "es"),  # 'la' in both es and fr: es wins (CASE order)
    ],
)
def test_lang_id_profiles(spark, text, want):
    assert _one(spark, text, T.lang_id(F.col("text"))) == want


def test_fingerprint_short_doc_hashes_full_text(spark):
    # len < k: single shingle = the whole text
    fp = _one(spark, "abc", T.fingerprint(F.col("text")))
    assert fp == hashlib.md5(b"abc").hexdigest()


def test_fingerprint_shift_invariance(spark):
    # shared interior shingles: identical min over shared region unless
    # a boundary shingle wins — here the min shingle hash is shared
    base = "the quick brown fox jumps over the lazy dog" * 3
    fp1 = _one(spark, base, T.fingerprint(F.col("text")))
    fp2 = _one(spark, "XX " + base, T.fingerprint(F.col("text")))
    shingles = {base[i : i + T.FINGERPRINT_K] for i in range(len(base) - T.FINGERPRINT_K + 1)}
    expected = min(hashlib.md5(s.encode()).hexdigest() for s in shingles)
    assert fp1 == expected
    # prefix only adds shingles; min can only stay or decrease
    assert fp2 <= fp1


def test_quality_score_bounds(spark):
    q_empty = _one(spark, " ", T.quality_score(F.col("text")))
    assert q_empty == pytest.approx(0.3)  # only the no-punct term
    q_good = _one(spark, "the cat sat on the mat " * 12, T.quality_score(F.col("text")))
    assert 0.9 <= q_good <= 1.0


def test_bpe_train_merges_matches_python_golden(spark):
    """The distributed BPE trainer must reproduce a pure-Python greedy
    BPE reference (word-frequency table, lexical tie-break, greedy
    left-to-right non-overlapping merge) on the sf0.001 corpus."""
    import collections

    import duckdb

    from supabase_etl_spark.queries.llm_text import (
        BPE_TRAIN_ROUNDS,
        text_bpe_train_merges,
    )

    rows = duckdb.sql(
        "SELECT text FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    freq = collections.Counter()
    for (text,) in rows:
        for w in text.split():
            if w:
                freq[w] += 1
    words = {w: (list(w), c) for w, (c) in ((w, c) for w, c in freq.items())}

    expected = []
    for rank in range(1, BPE_TRAIN_ROUNDS + 1):
        pair_counts = collections.Counter()
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        (l, r), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, l, r, l + r, cnt))
        merged = l + r
        for w, (syms, c) in words.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = merged
                else:
                    out.append(s)
            words[w] = (out, c)

    got = [
        (x["rank"], x["lhs"], x["rhs"], x["merged"], x["pair_count"])
        for x in text_bpe_train_merges(spark, "/root/testdata/sf0.001").collect()
    ]
    assert got == expected


def test_bpe_encode_applies_merges_greedily(spark, tmp_path):
    """Encode parity on a crafted corpus: with 'ab' then 'abc' learned,
    the full rank-order cascade collapses 'ababc' to a single symbol."""
    import os

    import pandas as pd

    from supabase_etl_spark.queries.llm_text import text_bpe_encode

    sf = str(tmp_path)
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            # 'ab' dominates pair counts, then 'ab'+'c'
            "text": ["ababc ababc", "abc ab", "ab ab ab"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [11, 6, 8],
        }
    )
    docs.to_parquet(os.path.join(sf, "documents.parquet"))
    out = {r["doc_id"]: r for r in text_bpe_encode(spark, sf).collect()}
    # doc 2: three 'ab' words -> one symbol each
    assert out[2]["n_bpe_tokens"] == 3 and out[2]["n_chars"] == 6
    # doc 0: rounds 1-3 learn ab, ab+c, ab+abc -> each 'ababc' is ONE
    # symbol (greedy rank-order application fully collapses the word)
    assert out[0]["n_bpe_tokens"] == 2 and out[0]["n_chars"] == 10


def test_jaro_winkler_matches_duckdb_reference():
    """operators/text.jaro_winkler vs DuckDB's native implementation:
    two independent codings of the published definition must agree at
    round-6 on classic probe pairs (transpositions, prefix bonus,
    disjoint strings, empty edge)."""
    import duckdb

    from supabase_etl_spark.operators.text import jaro_winkler

    pairs = [
        ("martha", "marhta"),
        ("dwayne", "duane"),
        ("dixon", "dicksonx"),
        ("abc", "abc"),
        ("", "x"),
        ("a", "b"),
        ("window batch", "batch window"),
        ("table scan merge", "table scan merg"),
        ("aaaa", "aaaa aaaa"),
        ("key agg row scan", "key agg row scans"),
        # discriminating region for the Winkler boost threshold: common
        # raw prefix but Jaro <= 0.7 — the bonus must NOT apply (ADVICE
        # r9: these fail if the 0.7 gate is missing).
        ("abc", "abzzzzzzzzzzzzz"),
        ("prefix", "prxyzzzzzzzzzzzzzz"),
        ("abcd", "abzz"),
        ("spark", "spxxxxxxxxxx"),
    ]
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute(
            "SELECT round(jaro_winkler_similarity(?, ?), 6)", [a, b]
        ).fetchone()[0]
        assert round(jaro_winkler(a, b), 6) == want, (a, b)
