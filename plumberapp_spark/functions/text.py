"""Text-analysis column functions (training-data pipeline surface).

Language-ID, quality scoring, token counting and fingerprinting as pure
Catalyst expressions over the ``documents`` table — the scale path for a
100 TB corpus is "one narrow projection pass, no Python, no shuffle",
which is exactly what these compile to.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic marker lists (public stopword-style heuristic).
# Real deployments swap in fastText/CLD3 via the pandas-UDF hook in
# plumberapp_spark.llm.textqa; the heuristic keeps the oracle exact.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

_WS = r"\s+"

# The Python-side splitter every Arrow mapInPandas path must use.
# Java's \s (what the F.split expression forms above and DuckDB's RE2
# oracles match) is the ASCII set [ \t\n\x0B\f\r]; Python's default \s
# is Unicode-aware and ADDITIONALLY splits on NBSP/U+2028/ideographic
# space — common in web corpora — so an un-flagged re.compile(r"\s+")
# silently diverges from its own pinned oracle (ADVICE r4). re.ASCII
# makes Python's \s exactly Java's set; parity on non-ASCII whitespace
# is pinned in tests/test_textops_vectorized.py.
import re as _re_mod  # noqa: E402  (kept local to avoid polluting the API)

WS_SPLIT = _re_mod.compile(r"\s+", _re_mod.ASCII)


def tokenize(col: Column) -> Column:
    """Whitespace tokenization, empty tokens removed.

    DuckDB: ``list_filter(string_split_regex(x, '\\s+'), t -> t != '')``.
    """
    return F.filter(F.split(col, _WS), lambda t: t != "")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(col))


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-grams joined with ' ' (shingles for Jaccard/MinHash).

    ``transform(sequence(1, size-n+1), i -> concat_ws(' ', slice(tokens, i, n)))``;
    empty array when fewer than n tokens.
    """
    count = F.size(tokens) - (n - 1)
    # sequence(1, 0) yields a DESCENDING [1,0] in Spark — guard short docs.
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))


def char_shingles(col: Column, k: int) -> Column:
    """Character k-shingles of a string (substring sliding window)."""
    count = F.length(col) - (k - 1)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))), lambda i: F.substring(col, i, k)
    )
    return F.when(count >= 1, shingles).otherwise(F.array().cast("array<string>"))


def quality_features(col: Column) -> dict[str, Column]:
    """Quality-scoring features: length, token count, mean token length,
    punctuation ratio, stopword ratio. Each is a named column expression.
    """
    toks = tokenize(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    punct = n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tok.cast("bigint"),
        "mean_token_len": F.when(
            n_tok > 0, (n_chars - (n_tok - 1)) / n_tok
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0)),
    }


def langid_score(col: Column, lang: str) -> Column:
    """Marker-hit count for one language (n-gram/stopword heuristic)."""
    toks = tokenize(F.lower(col))
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def langid_best(col: Column) -> Column:
    """argmax language by marker hits; 'und' when all zero. Deterministic
    tie-break = language name order.
    """
    scored = None
    for lang in sorted(LANG_MARKERS):
        s = langid_score(col, lang)
        entry = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        scored = entry if scored is None else F.when(s > scored["score"], entry).otherwise(scored)
    return F.when(scored["score"] > 0, scored["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct
    lowercase token set (the standard 'fingerprint' key used for clustering
    near-identical docs that differ in order/casing/whitespace).
    """
    canon = F.array_join(F.array_sort(F.array_distinct(tokenize(F.lower(col)))), " ")
    return F.md5(canon)
