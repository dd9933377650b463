"""Vectorized (Arrow mapInPandas) simhash and language-ID must match the
interpreted expression forms they replaced on the hot path — same md5
prefix hashing, same majority vote, same argmax tie-break."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from plumberapp_spark.llm.dedup import simhash_table  # noqa: E402
from plumberapp_spark.llm.textqa import language_id  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_simhash_vectorized_matches_expression(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fast = {r[0]: r[1] for r in simhash_table(docs, "text", "doc_id", vectorized=True).collect()}
    slow = {r[0]: r[1] for r in simhash_table(docs, "text", "doc_id", vectorized=False).collect()}
    assert fast == slow


def test_simhash_edge_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one"), (5, "a b a b a")],
        "doc_id bigint, text string",
    )
    fast = {r[0]: r[1] for r in simhash_table(df, "text", "doc_id", vectorized=True).collect()}
    slow = {r[0]: r[1] for r in simhash_table(df, "text", "doc_id", vectorized=False).collect()}
    assert fast == slow


def test_language_id_vectorized_matches_expression(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fast = {r[0]: r[1] for r in language_id(docs, vectorized=True).collect()}
    slow = {r[0]: r[1] for r in language_id(docs, vectorized=False).collect()}
    assert fast == slow


def test_language_id_tie_break(spark):
    # 'la' is a marker for both es and fr; one hit each -> strictly-greater
    # argmax over name-sorted languages keeps the earliest (es). 'der die
    # und' -> de. no markers -> und.
    df = spark.createDataFrame(
        [(1, "la"), (2, "der die und"), (3, "zzz qqq"), (4, None)],
        "doc_id bigint, text string",
    )
    fast = {r[0]: r[1] for r in language_id(df, vectorized=True).collect()}
    slow = {r[0]: r[1] for r in language_id(df, vectorized=False).collect()}
    assert fast == slow
    assert fast[1] == "es" and fast[2] == "de" and fast[3] == "und" and fast[4] == "und"


def test_ngram_jaccard_vectorized_matches_expression(spark):
    from plumberapp_spark.llm.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fast = sorted(
        map(tuple, ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.0, vectorized=True).collect())
    )
    slow = sorted(
        map(tuple, ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.0, vectorized=False).collect())
    )
    assert fast == slow


def test_token_stats_vectorized_matches_expression_form(spark):
    from plumberapp_spark.llm.textqa import token_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    fast = sorted(map(tuple, token_stats(docs, vectorized=True).collect()))
    slow = sorted(map(tuple, token_stats(docs, vectorized=False).collect()))
    assert fast == slow and len(fast) > 0


def test_unicode_whitespace_parity(spark):
    # ADVICE r4: the Arrow paths tokenized with Python's Unicode-aware
    # \s+ while the pinned expression forms use Java's ASCII-only \s —
    # on NBSP / U+2028 / ideographic-space text (common in web corpora)
    # the two silently diverged and the ASCII-only test corpus hid it.
    # All splitters now share functions.text.WS_SPLIT (re.ASCII). Pin
    # parity on exactly the texts that used to diverge.
    from plumberapp_spark.llm.dedup import ngram_jaccard_pairs
    from plumberapp_spark.llm.textqa import (
        chunk_documents,
        language_id,
        quality_filter,
        repetition_stats,
        token_stats,
        top_ngrams,
    )

    rows = [
        (1, "the cat and the dog"),          # NBSP joins, ASCII splits
        (2, "one two three and the of to"),  # line separator
        (3, "ideographic　space　tokens in the"),
        (4, "plain ascii text the and of"),
        (5, "mixed   joined and split the"),
        (6, ""),
        (7, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for fn, kw in [
        (token_stats, {}),
        (language_id, {}),
        (repetition_stats, {}),
        (quality_filter, {}),
        (top_ngrams, {"n": 2, "k": 50}),
        (chunk_documents, {"max_tokens": 3}),
    ]:
        fast = sorted(map(tuple, fn(docs, vectorized=True, **kw).collect()))
        slow = sorted(map(tuple, fn(docs, vectorized=False, **kw).collect()))
        assert fast == slow, f"{fn.__name__} diverges on non-ASCII whitespace"

    fast = sorted(
        map(tuple, ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.0, vectorized=True).collect())
    )
    slow = sorted(
        map(tuple, ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.0, vectorized=False).collect())
    )
    assert fast == slow


def test_redact_pii_behavior(spark):
    # Real-redaction contract on injected PII (the synthetic corpus is
    # clean, so q75's oracle alone would never exercise a replacement).
    from plumberapp_spark.llm.textqa import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail john.doe+x@example.com or a.b@c.io now"),
            (2, "host 192.168.0.1 plus 10.0.0.255"),
            (3, "call +1 555 123 4567 or 089-1234-5678"),
            (4, "clean text, no identifiers at all"),
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].clean_text == "mail <EMAIL> or <EMAIL> now" and rows[1].n_emails == 2
    assert rows[2].clean_text == "host <IP> plus <IP>" and rows[2].n_ips == 2
    assert rows[3].n_phones == 2 and "<PHONE>" in rows[3].clean_text
    assert rows[4].clean_text == "clean text, no identifiers at all"
    assert (rows[4].n_emails, rows[4].n_ips, rows[4].n_phones) == (0, 0, 0)
    assert rows[6].clean_text == ""  # NULL = empty doc convention


def test_unigram_logprob_contract(spark):
    # q77: frequent-token docs score higher than OOV-dense docs; empty
    # and NULL docs yield NULL scores with n_tokens=0; scores bounded by
    # the smoothed model's own range.
    import math

    from plumberapp_spark.llm.textqa import unigram_logprob_score

    df = spark.createDataFrame(
        [
            (1, "the the the the"),
            (2, "zzzqx wvvkj pqrst"),  # all OOV-ish singletons
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unigram_logprob_score(df, vocab_size=2).collect()}
    assert rows[1].mean_logprob > rows[2].mean_logprob
    assert rows[3].n_tokens == 0 and rows[3].mean_logprob is None
    assert rows[4].n_tokens == 0 and rows[4].mean_logprob is None
    total, v = 7, 2  # 7 tokens corpus-wide, vocab_size=2
    assert rows[1].mean_logprob == round(math.log((4 + 1) / (total + v)), 4)
