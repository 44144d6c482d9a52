"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.2 "LLM ops").

The reference has no text processing at all (its only string handling is
JSON packing, etl_supabase.py:53-57); this module is the mandate
extension: language-ID, quality scoring, token counting, and document
fingerprinting over the ``documents`` table.

Scale posture: every function here returns a **column expression** —
pure per-row, JVM-side (whole-stage codegen), zero shuffle, zero Python.
On a 1000-executor cluster these run at scan speed; the only shuffles in
the consuming queries are their final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
# Kept to the regex intersection of Java (Spark) and RE2 (DuckDB) dialects
# so oracle SQL can reproduce it verbatim.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

CJK_PATTERN = "[一-鿿]"

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Order matters: the argmax CASE chain evaluates de, es, fr, else en.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "it"),
    "de": ("der", "die", "und", "ist", "das", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "los", "se", "un", "por"),
    "fr": ("le", "la", "les", "des", "et", "un", "est", "pour"),
}

STOPWORDS_EN = LANG_PROFILES["en"]


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed (leading/trailing blanks).

    ``array_remove(..., '')`` is exactly equivalent to the
    higher-order ``filter(..., t -> t != '')`` here (both drop every
    empty string) but is a plain codegen-friendly builtin — a
    HOF filter forces interpreted per-element lambda eval on every
    corpus scan that tokenizes."""
    return F.array_remove(F.split(col, r"\s+"), "")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish subword count: letter runs + digit runs + punct marks."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_PATTERN), F.lit(0)))


def ngrams_all(toks: Column, k: int) -> Column:
    """ALL word k-grams of a materialized token-array column, duplicates
    kept (repetition measurement needs multiplicity; contrast
    dedup.shingles_of_tokens, which distinct-ifies for set similarity).
    Documents shorter than k tokens contribute their full run once."""
    n = F.greatest(F.lit(1), F.size(toks) - F.lit(k - 1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(k))),
    )


def sql_ngrams_all(toks: str, k: int) -> str:
    """DuckDB mirror of :func:`ngrams_all` (1-based list slicing)."""
    return (
        f"list_transform(range(1, greatest(1, len({toks}) - {k - 1}) + 1), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], ' '))"
    )


def stopword_count(col: Column, words: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Occurrences (not distinct) of profile words among tokens."""
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words)))


def cjk_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(CJK_PATTERN), F.lit(0)))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score from cheap surface statistics.

    score = 0.4*length_score + 0.3*(1-punct_ratio) + 0.3*stopword_signal
    with length_score = least(1, n_tokens/64). The exact arithmetic
    order is mirrored in the oracle SQL for bit-identical doubles.
    """
    n_tok = token_count(col).cast("double")
    n_chars = F.length(col).cast("double")
    punct_ratio = F.when(n_chars > 0, punct_count(col) / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stopword_count(col) / n_tok).otherwise(F.lit(0.0))
    length_score = F.least(F.lit(1.0), n_tok / F.lit(64.0))
    stop_signal = F.least(F.lit(1.0), stop_ratio * F.lit(5.0))
    return (
        F.lit(0.4) * length_score + F.lit(0.3) * (F.lit(1.0) - punct_ratio) + F.lit(0.3) * stop_signal
    )


def sql_quality_score(text: str = "text") -> str:
    """DuckDB SQL mirroring :func:`quality_score` operation-for-operation."""
    n_tok = f"CAST(len(list_filter(regexp_split_to_array({text}, '\\s+'), t -> t <> '')) AS DOUBLE)"
    n_chars = f"CAST(length({text}) AS DOUBLE)"
    punct = f"CAST(len(regexp_extract_all({text}, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
    stop = (
        "CAST(len(list_filter(list_filter(regexp_split_to_array("
        f"{text}, '\\s+'), t -> t <> ''), t -> t IN "
        f"{_sql_tuple(STOPWORDS_EN)})) AS DOUBLE)"
    )
    punct_ratio = f"(CASE WHEN {n_chars} > 0 THEN {punct} / {n_chars} ELSE 0.0 END)"
    stop_ratio = f"(CASE WHEN {n_tok} > 0 THEN {stop} / {n_tok} ELSE 0.0 END)"
    length_score = f"least(1.0, {n_tok} / 64.0)"
    stop_signal = f"least(1.0, {stop_ratio} * 5.0)"
    return f"0.4 * {length_score} + 0.3 * (1.0 - {punct_ratio}) + 0.3 * {stop_signal}"


def lang_id(col: Column) -> Column:
    """Stopword-profile language guesser (n-gram heuristic).

    CJK characters short-circuit to 'zh'; otherwise the profile with the
    most stopword hits wins, evaluated in the fixed order de, es, fr,
    else 'en' — the identical CASE chain appears in the oracle SQL.
    """
    return lang_id_from_tokens(tokens(col), col)


def lang_id_from_tokens(toks: Column, col: Column) -> Column:
    """:func:`lang_id` over an ALREADY-TOKENIZED array (r13, guide §4):
    higher-order filters are interpreted, not codegen'd, so their
    `tokens(col)` argument is re-split per profile instead of shared by
    subexpression elimination — a caller that already carries the token
    array (corpus_prepare_end_to_end's pinned frame) passes it here and
    pays one tokenization, not two. ``col`` is still needed for the CJK
    short-circuit (a character-level test). Identical CASE chain."""

    def _score(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = {lang: _score(words) for lang, words in LANG_PROFILES.items()}
    s_en, s_de, s_es, s_fr = scores["en"], scores["de"], scores["es"], scores["fr"]
    return (
        F.when(cjk_count(col) > 0, F.lit("zh"))
        .when((s_de > s_en) & (s_de >= s_es) & (s_de >= s_fr), F.lit("de"))
        .when((s_es > s_en) & (s_es >= s_fr), F.lit("es"))
        .when(s_fr > s_en, F.lit("fr"))
        .otherwise(F.lit("en"))
    )


def sql_lang_id(text: str = "text") -> str:
    """DuckDB SQL mirroring :func:`lang_id`."""
    toks = f"list_filter(regexp_split_to_array({text}, '\\s+'), t -> t <> '')"
    score = {
        lang: f"len(list_filter({toks}, t -> t IN {_sql_tuple(words)}))"
        for lang, words in LANG_PROFILES.items()
    }
    cjk = f"len(regexp_extract_all({text}, '{CJK_PATTERN}'))"
    return (
        f"CASE WHEN {cjk} > 0 THEN 'zh' "
        f"WHEN {score['de']} > {score['en']} AND {score['de']} >= {score['es']} "
        f"AND {score['de']} >= {score['fr']} THEN 'de' "
        f"WHEN {score['es']} > {score['en']} AND {score['es']} >= {score['fr']} THEN 'es' "
        f"WHEN {score['fr']} > {score['en']} THEN 'fr' "
        f"ELSE 'en' END"
    )


FINGERPRINT_K = 8  # character-shingle width


def fingerprint(col: Column) -> Column:
    """Winnowing-style document fingerprint: min(md5) over character
    k-shingles. Rolling-window shingling expressed with higher-order
    array functions — sequential per row, no explode, no shuffle.
    Documents shorter than k hash their full text (greatest(1, ...)).
    """
    n = F.greatest(F.lit(1), F.length(col) - F.lit(FINGERPRINT_K - 1))
    shingles = F.transform(
        F.sequence(F.lit(1), n), lambda i: col.substr(i, F.lit(FINGERPRINT_K))
    )
    return F.array_min(F.transform(shingles, F.md5))


def sql_fingerprint(text: str = "text") -> str:
    k = FINGERPRINT_K
    return (
        f"list_min(list_transform(range(1, greatest(1, length({text}) - {k - 1}) + 1), "
        f"i -> md5(substr({text}, i, {k}))))"
    )


def _sql_tuple(words: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1) -> float:
    """Standard Jaro-Winkler similarity (Winkler 1990): Jaro matching
    within the max(|s1|,|s2|)/2 − 1 window, transposition count over
    matched sequences, plus the ≤4-char common-prefix bonus applied
    only when the Jaro score exceeds 0.7 (the rapidfuzz/DuckDB boost
    threshold). Agrees bit-for-bit with DuckDB's
    ``jaro_winkler_similarity`` — verified on planted probe pairs
    including low-similarity prefixed ones in tests/test_text_ops.py."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if j <= 0.7:  # rapidfuzz/DuckDB apply the Winkler boost only past 0.7
        return j
    p = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            p += 1
        else:
            break
    return j + p * prefix_scale * (1.0 - j)
