"""Text-analysis operators over the ``documents`` table: quality scoring,
language ID, token statistics, fingerprinting. All pure projections
(zero-shuffle at any scale); the heuristic scorers are exact-oracle, with a
pandas-UDF hook where a real model (fastText, a BPE tokenizer) would slot
in on a cluster with the dependency installed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plumberapp_spark.functions.text import (
    tokenize,
    token_count,
    quality_features,
    langid_best,
    doc_fingerprint,
    word_ngrams,
)


def widen(df: DataFrame, min_partition_bytes: int = 32 << 20) -> DataFrame:
    """Round-robin repartition a NARROW-but-LARGE input up to the
    cluster's parallelism before a scan-heavy per-row pass (round-6: a
    single-row-group parquet table scans as ONE task, so an Arrow or
    explode pass runs single-core no matter how many cores exist).

    Size-aware on purpose, measured both ways at sf0.1/10×: when the
    lone partition is small (<32 MB — the q36 router's threshold), the
    repartition exchange + task scheduling costs MORE than the
    single-core pass it parallelizes (q24 0.32 s → 0.55 s), so tiny
    inputs pass through untouched. When partitions are fat, fan-out wins
    (q24 beats DuckDB at 10× with the wide plan). Inputs already at
    ``defaultParallelism`` never repartition — at 100 TB (thousands of
    splits) this is always a no-op. Unknown-size plans (RDD-backed:
    sizeInBytes = Long.MaxValue) deliberately widen: "we don't know how
    big" must never pick the one-task plan (same posture as
    operators/windows.estimated_rows)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    n = df.rdd.getNumPartitions()
    if n >= par:
        return df
    size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    if size // max(n, 1) < min_partition_bytes:
        return df
    return df.repartition(par)


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality features + a composite score in [0,1]: long-enough, low
    punctuation, some (but not all) stopwords — the standard cheap filters
    applied before expensive pipeline stages.
    """
    feats = quality_features(F.col(text_col))
    score = (
        F.when(feats["n_tokens"] >= 10, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(feats["punct_ratio"] <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(
            (feats["stopword_ratio"] >= 0.05) & (feats["stopword_ratio"] <= 0.6), F.lit(0.3)
        ).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["mean_token_len"], 4).alias("mean_token_len"),
        F.round(feats["punct_ratio"], 4).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", vectorized: bool = True
) -> DataFrame:
    """Marker-token language ID ('und' when no marker hits).

    ``vectorized=True`` (default) tokenizes each doc ONCE in an Arrow
    ``mapInPandas`` pass and scores every language against that token
    list; the expression form (:func:`langid_best`, the oracle
    definition) re-runs lower+split+filter per language through
    interpreted lambdas. Identical output by construction — same
    tokenization, same strictly-greater argmax with name-order
    tie-break; parity pinned in tests. sf0.1: 3.1s -> ~0.4s warm.
    """
    if not vectorized:
        return df.select(F.col(id_col), langid_best(F.col(text_col)).alias("pred_lang"))

    import re

    import pandas as pd

    from plumberapp_spark.functions.text import LANG_MARKERS

    id_ddl = df.schema[id_col].dataType.simpleString()
    from plumberapp_spark.functions.text import WS_SPLIT as ws  # ASCII \\s == Java/RE2
    markers = {lang: frozenset(LANG_MARKERS[lang]) for lang in sorted(LANG_MARKERS)}

    def lang_batches(batches):
        for pdf in batches:
            ids, preds = [], []
            for row_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split(text.lower()) if t] if text is not None else []
                best_lang, best_score = None, -1
                for lang, marks in markers.items():
                    score = sum(1 for t in toks if t in marks)
                    if score > best_score:
                        best_lang, best_score = lang, score
                ids.append(row_id)
                preds.append(best_lang if best_score > 0 else "und")
            yield pd.DataFrame({id_col: ids, "pred_lang": preds})

    return widen(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        lang_batches, f"{id_col} {id_ddl}, pred_lang string"
    )


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", vectorized: bool = True
) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (ceil(chars/4) per token, the common ~4-chars-per-token heuristic) +
    distinct token count.

    ``vectorized=True`` (default): one Arrow ``mapInPandas`` pass
    computing all three stats per batch — the expression form evaluates
    three interpreted higher-order chains per row (tokenize runs once
    per derived column; HOFs get no codegen and no cross-column CSE,
    the same cost the MinHash notes in SCALE.md §5 document). Expression
    form kept as the oracle definition; parity pinned in
    tests/test_textops_vectorized.py.
    """
    if vectorized:
        import re as _re

        import pandas as pd

        from plumberapp_spark.functions.text import WS_SPLIT as ws  # ASCII \\s == Java/RE2
        id_ddl = df.schema[id_col].dataType.simpleString()

        def stats(batches):
            for pdf in batches:
                n_tok, n_dist, n_sub = [], [], []
                for text in pdf[text_col]:
                    toks = [t for t in ws.split(text) if t] if text is not None else []
                    n_tok.append(len(toks))
                    n_dist.append(len(set(toks)))
                    n_sub.append(sum((len(t) + 3) // 4 for t in toks))
                out = pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "n_tokens": pd.array(n_tok, dtype="int64"),
                        "n_distinct_tokens": pd.array(n_dist, dtype="int64"),
                        "n_subword_est": pd.array(n_sub, dtype="int64"),
                    }
                )
                yield out

        return widen(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
            stats,
            f"{id_col} {id_ddl}, n_tokens bigint, n_distinct_tokens bigint, n_subword_est bigint",
        )
    # NULL text = empty doc (0 tokens), matching the Arrow path and the
    # repo-wide convention — an uncoalesced split(NULL) would yield NULL
    # stats and diverge from the vectorized default (pinned in
    # tests/test_textops_vectorized.py::test_unicode_whitespace_parity).
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokenize(text)
    subword = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("bigint")
    )
    return df.select(
        F.col(id_col),
        token_count(text).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        subword.alias("n_subword_est"),
    )


def document_fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical fingerprint (md5 over sorted distinct lowercase tokens) +
    cluster sizes — groups docs identical up to order/case/whitespace."""
    fp = df.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint"))
    sizes = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("cluster_rep"), F.count("*").alias("cluster_size")
    )
    return fp.join(sizes, on="fingerprint")

def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    vectorized: bool = True,
) -> DataFrame:
    """Gopher-style repetition ratios per document — the standard
    pre-training quality signals for boilerplate / spam / degenerate
    text (Rae et al. 2021 §A1.1 "repetition" filters):

    * ``dup_word_frac``   = 1 − distinct_tokens / tokens
    * ``dup_ngram_frac``  = 1 − distinct_ngrams / ngrams  (word n-grams)
    * ``top_word_frac``   = most-frequent-token count / tokens

    All row-local (zero shuffle at any scale). ``vectorized=True``
    (default) computes the three ratios in one Arrow ``mapInPandas``
    pass with a single Counter per doc; the expression form tokenizes
    once but pays an O(distinct × tokens) interpreted lambda for the
    top-word count, and remains the oracle-parity definition
    (tests pin equality).
    """
    if not vectorized:
        # NULL text counts as the empty document (parity with the Arrow
        # path) — size(tokenize(NULL)) would be NULL, not 0
        toks = tokenize(F.coalesce(F.col(text_col), F.lit("")))
        n = F.size(toks)
        grams = word_ngrams(toks, ngram)
        n_g = F.size(grams)
        top = F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda d: F.size(F.filter(toks, lambda t: t == d)),
            )
        )
        return df.select(
            F.col(id_col),
            n.cast("bigint").alias("n_tokens"),
            F.round(
                F.when(n > 0, 1 - F.size(F.array_distinct(toks)) / n).otherwise(0.0), 6
            ).alias("dup_word_frac"),
            F.round(
                F.when(n_g > 0, 1 - F.size(F.array_distinct(grams)) / n_g).otherwise(0.0), 6
            ).alias("dup_ngram_frac"),
            F.round(F.when(n > 0, top / n).otherwise(0.0), 6).alias("top_word_frac"),
        )

    import re as _re
    from collections import Counter

    import pandas as pd

    from plumberapp_spark.functions.text import WS_SPLIT as ws  # ASCII \\s == Java/RE2
    id_ddl = df.schema[id_col].dataType.simpleString()

    def rep_batches(batches):
        for pdf in batches:
            n_tok, dup_w, dup_g, top_w = [], [], [], []
            for text in pdf[text_col]:
                toks = [t for t in ws.split(text) if t] if text is not None else []
                n = len(toks)
                n_tok.append(n)
                if n == 0:
                    dup_w.append(0.0)
                    dup_g.append(0.0)
                    top_w.append(0.0)
                    continue
                counts = Counter(toks)
                dup_w.append(round(1 - len(counts) / n, 6))
                grams = [" ".join(toks[i : i + ngram]) for i in range(n - ngram + 1)]
                dup_g.append(round(1 - len(set(grams)) / len(grams), 6) if grams else 0.0)
                top_w.append(round(max(counts.values()) / n, 6))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": pd.array(n_tok, dtype="int64"),
                    "dup_word_frac": pd.array(dup_w, dtype="float64"),
                    "dup_ngram_frac": pd.array(dup_g, dtype="float64"),
                    "top_word_frac": pd.array(top_w, dtype="float64"),
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        rep_batches,
        f"{id_col} {id_ddl}, n_tokens bigint, dup_word_frac double,"
        " dup_ngram_frac double, top_word_frac double",
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_punct: float = 0.2,
    stop_lo: float = 0.02,
    stop_hi: float = 0.6,
    max_dup_word: float = 0.65,
    vectorized: bool = True,
) -> DataFrame:
    """The composed C4/Gopher-style cleanup gate: every rule the cheap
    text-quality family provides, applied in a fixed order, returning a
    ``keep`` flag and the FIRST failing rule as ``reason`` ('keep' when
    all pass). Rules, in order: token count >= min_tokens; punctuation
    ratio <= max_punct; stopword ratio inside [stop_lo, stop_hi];
    duplicate-word fraction <= max_dup_word; language identifiable
    (marker-based langid != 'und').

    One pure projection — the whole composite evaluates row-local with
    zero shuffle at any corpus size, which is exactly why production
    pipelines run these gates BEFORE any dedup/embedding stage.

    ``vectorized=True`` (default) evaluates every rule in ONE Arrow
    ``mapInPandas`` pass with a single tokenization per doc — the
    expression form pays interpreted higher-order lambdas per rule AND
    per language (the q23 cost, ~5x here: measured 4.7 s vs 0.5 s at
    sf0.1) and remains the oracle-parity definition (tests pin equality).
    """
    if not vectorized:
        text = F.coalesce(F.col(text_col), F.lit(""))  # NULL = empty doc
        feats = quality_features(text)
        toks = tokenize(text)
        n = F.size(toks)
        dup_word = F.when(n > 0, 1 - F.size(F.array_distinct(toks)) / n).otherwise(0.0)
        reason = (
            F.when(feats["n_tokens"] < min_tokens, F.lit("too_short"))
            .when(feats["punct_ratio"] > max_punct, F.lit("punctuation"))
            .when(
                (feats["stopword_ratio"] < stop_lo) | (feats["stopword_ratio"] > stop_hi),
                F.lit("stopwords"),
            )
            .when(dup_word > max_dup_word, F.lit("repetition"))
            .when(langid_best(text) == "und", F.lit("language"))
            .otherwise(F.lit("keep"))
        )
        return df.select(
            F.col(id_col),
            reason.alias("reason"),
            (reason == "keep").alias("keep"),
        )

    import re as _re

    import pandas as pd

    from plumberapp_spark.functions.text import LANG_MARKERS, STOPWORDS

    id_ddl = df.schema[id_col].dataType.simpleString()
    from plumberapp_spark.functions.text import WS_SPLIT as ws  # ASCII \\s == Java/RE2
    non_punct = _re.compile(r"[^\w\s]", _re.ASCII)  # Java \w is ASCII
    stops = frozenset(STOPWORDS)
    markers = {lang: frozenset(LANG_MARKERS[lang]) for lang in sorted(LANG_MARKERS)}

    def gate_batches(batches):
        for pdf in batches:
            reasons = []
            for text in pdf[text_col]:
                if text is None:
                    text = ""
                toks = [t for t in ws.split(text) if t]
                n = len(toks)
                n_chars = len(text)
                if n < min_tokens:
                    reasons.append("too_short")
                    continue
                punct = len(non_punct.findall(text))
                punct_ratio = punct / n_chars if n_chars > 0 else 0.0
                if punct_ratio > max_punct:
                    reasons.append("punctuation")
                    continue
                stop_ratio = sum(1 for t in toks if t.lower() in stops) / n
                if stop_ratio < stop_lo or stop_ratio > stop_hi:
                    reasons.append("stopwords")
                    continue
                if 1 - len(set(toks)) / n > max_dup_word:
                    reasons.append("repetition")
                    continue
                ltoks = [t for t in ws.split(text.lower()) if t]
                best = -1
                for marks in markers.values():  # sorted-lang order, strict >
                    score = sum(1 for t in ltoks if t in marks)
                    if score > best:
                        best = score
                reasons.append("language" if best == 0 else "keep")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "reason": reasons,
                    "keep": pd.array([r == "keep" for r in reasons], dtype="bool"),
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gate_batches, f"{id_col} {id_ddl}, reason string, keep boolean"
    )


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    k: int = 20,
    vectorized: bool = True,
) -> DataFrame:
    """Corpus-wide top-k word n-grams with counts — the vocabulary /
    BPE-merge-candidate statistic every tokenizer build starts from.
    Deterministic ties: count desc, then gram asc.

    ``vectorized=True`` (default): one Arrow pass emits PER-BATCH
    (gram, count) partials from a single Counter — the exchange then
    carries each batch's distinct grams, not every occurrence, and the
    final groupBy sums partials (a reduce over vocabulary-sized input).
    The expression form explodes one row per occurrence through an
    interpreted n-gram lambda (measured 3.3 s vs 0.3 s at sf0.1, 70 s at
    100×) and remains the oracle-parity definition.
    """
    if not vectorized:
        grams = df.select(
            F.explode(word_ngrams(tokenize(F.col(text_col)), n)).alias("ngram")
        )
        counts = grams.groupBy("ngram").agg(F.count("*").alias("n_occurrences"))
        return counts.orderBy(F.col("n_occurrences").desc(), F.col("ngram")).limit(k)

    import re as _re
    from collections import Counter

    import pandas as pd

    from plumberapp_spark.functions.text import WS_SPLIT as ws  # ASCII \\s == Java/RE2

    def gram_partials(batches):
        for pdf in batches:
            counts: Counter = Counter()
            for text in pdf[text_col]:
                toks = [t for t in ws.split(text) if t] if text is not None else []
                for i in range(len(toks) - n + 1):
                    counts[" ".join(toks[i : i + n])] += 1
            if counts:
                yield pd.DataFrame(
                    {"ngram": list(counts.keys()), "_cnt": list(counts.values())}
                )

    partials = df.select(F.col(text_col)).mapInPandas(
        gram_partials, "ngram string, _cnt bigint"
    )
    counts = partials.groupBy("ngram").agg(F.sum("_cnt").alias("n_occurrences"))
    return counts.orderBy(F.col("n_occurrences").desc(), F.col("ngram")).limit(k)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    overlap: int = 0,
    vectorized: bool = True,
) -> DataFrame:
    """Split each document into token-window chunks — the
    context-length preprocessing step between cleaning and tokenization
    (one training example per chunk). Chunks start every
    ``max_tokens - overlap`` tokens while the start is inside the doc;
    the final chunk is short rather than padded. Empty docs produce no
    chunks.

    Pure row-local explode (zero shuffle): output rows =
    ceil(tokens / stride) per doc, each carrying
    ``(id, chunk_id, chunk_text, n_chunk_tokens)``.

    ``vectorized=True`` (default) emits the chunk rows from one Arrow
    pass (tokenize + slice per doc in Python) — the expression form
    pays an interpreted transform + array_join per chunk and stays as
    the oracle-parity definition.
    """
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    stride = max_tokens - overlap
    if vectorized:
        import re as _re

        import pandas as pd

        from plumberapp_spark.functions.text import WS_SPLIT as ws  # ASCII \\s == Java/RE2
        id_ddl = df.schema[id_col].dataType.simpleString()

        def gen(batches):
            for pdf in batches:
                ids, cids, texts, ns = [], [], [], []
                for row_id, text in zip(pdf[id_col], pdf[text_col]):
                    toks = [t for t in ws.split(text) if t] if text is not None else []
                    n = len(toks)
                    for cid, start in enumerate(range(0, n, stride)):
                        window = toks[start : start + max_tokens]
                        ids.append(row_id)
                        cids.append(cid)
                        texts.append(" ".join(window))
                        ns.append(len(window))
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "chunk_id": pd.array(cids, dtype="int64"),
                        "chunk_text": texts,
                        "n_chunk_tokens": pd.array(ns, dtype="int64"),
                    }
                )

        return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
            gen, f"{id_col} {id_ddl}, chunk_id bigint, chunk_text string, n_chunk_tokens bigint"
        )
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    n_starts = F.floor((n - 1) / stride) + 1  # starts: 0, stride, ... < n
    chunks = F.transform(
        F.sequence(F.lit(0), n_starts.cast("int") - 1),
        lambda i: F.struct(
            i.cast("bigint").alias("chunk_id"),
            F.array_join(F.slice(toks, i * stride + 1, max_tokens), " ").alias("chunk_text"),
            F.least(F.lit(max_tokens), n - i * stride).cast("bigint").alias("n_chunk_tokens"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(F.when(n > 0, chunks)).alias("_c"))
        .select(id_col, "_c.chunk_id", "_c.chunk_text", "_c.n_chunk_tokens")
    )


# Conservative ASCII patterns, valid and IDENTICAL under Java regex
# (Spark) and RE2 (DuckDB) — no lookarounds, no Unicode classes, so both
# engines match the same spans. Kept module-level so oracle SQL and unit
# tests share the exact strings.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d -]{7,}\d"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style PII scrub: replace emails / IPv4 literals / phone-shaped
    digit runs with fixed tokens and report per-kind counts — the
    pre-training redaction pass every public-web corpus needs.

    Pure Catalyst expressions end to end (regexp_count + chained
    regexp_replace): this IS the scale path — whole-stage codegen, zero
    Python, zero shuffle, a narrow projection over the corpus. Counts
    are per-pattern on the ORIGINAL text, so they are independent of the
    replacement order — and may double-count a span matching two kinds
    (an all-digit email local part like ``12345678901@x.com`` matches
    both the email and phone patterns, so n_phones can exceed the
    ``<PHONE>`` tokens actually inserted after the email replacement
    runs first). Replacement applies email -> ip -> phone.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    out = df.select(
        F.col(id_col),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"),
                PII_IP_RE,
                "<IP>",
            ),
            PII_PHONE_RE,
            "<PHONE>",
        ).alias("clean_text"),
        F.regexp_count(text, F.lit(PII_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(text, F.lit(PII_IP_RE)).cast("bigint").alias("n_ips"),
        F.regexp_count(text, F.lit(PII_PHONE_RE)).cast("bigint").alias("n_phones"),
    )
    return out


# the one driver-side/broadcast structure in the unigram family: the
# top-k vocabulary dict shipped to the Arrow scorer. 2**22 entries is
# comfortably broadcast-class on production executors; anything wider
# must switch to the join-based count-relation route (the bigram tier's
# design). Enforced in _score_with_unigram_lm (VERDICT r10 #3).
_VOCAB_BROADCAST_CEILING = 1 << 22


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Perplexity-proxy quality score: mean unigram log-probability of a
    document under the CORPUS's own add-one-smoothed top-``vocab_size``
    unigram model — the cheap stand-in for the KenLM-style LM filters
    production curation pipelines run (CCNet, Gopher §A1.2). Low scores
    flag gibberish / OOV-dense / boilerplate documents.

    p(token) = (count_in_vocab + 1) / (total_tokens + vocab_size); OOV
    tokens take count 0. Returns (id, n_tokens, mean_logprob) with the
    mean rounded to 4 decimals (sum-order-independent at that precision).
    Empty/NULL docs score NULL (no tokens to average).

    Two passes over the corpus, one exchange total (round-6 — the
    original lazy formulation re-tokenized the corpus three times, once
    per use of the exploded token stream, and shuffled one (doc, lp)
    row per token occurrence into the per-doc mean):

    1. JVM explode → partial-aggregated token counts (the only
       corpus-derived exchange; wire width = distinct tokens per
       partition, not occurrences), then ONE action computes both the
       top-k vocabulary and the corpus total: per-partition top-k +
       partial sum (bounding the final gather at partitions × k rows),
       merged by a single final aggregate.
    2. The k-row vocabulary (vocab_size rows — plan-sized by contract,
       like the IVF centroid collect) ships to executors in the Arrow
       scorer's closure; per-doc means come from one mapInPandas pass
       with O(1) dict lookups — no join, no shuffle: each doc's tokens
       never leave its partition.

    The LM FIT (pass 1) is the dominant cost and is corpus-derived —
    :func:`ensure_unigram_lm` persists it so serving runs pay only the
    scoring pass (VERDICT r7 item 5).
    """
    vocab, total = _fit_unigram_lm(df, text_col, vocab_size)
    return _score_with_unigram_lm(df, vocab, total, text_col, id_col, vocab_size)


def _fit_unigram_lm(
    df: DataFrame, text_col: str, vocab_size: int
) -> tuple[dict[str, int], int]:
    """Pass 1 of :func:`unigram_logprob_score`: the top-``vocab_size``
    token counts and corpus token total, via per-partition partial
    top-k merged in one final aggregate."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    wide = widen(df.select(F.col(text_col)))
    counts = (
        wide.select(F.explode(tokenize(text)).alias("_tok"))
        .groupBy("_tok")
        .agg(F.count("*").alias("_cnt"))
    )
    # top-k entries sort by (count desc, token asc) — deterministic, ties
    # never flap. Encoded as a sortable struct: (-count, token).
    entry = F.struct((-F.col("_cnt")).alias("_neg"), F.col("_tok").alias("_t"))
    per_part = counts.groupBy(F.spark_partition_id().alias("_p")).agg(
        F.slice(F.array_sort(F.collect_list(entry)), 1, vocab_size).alias("_top"),
        F.sum("_cnt").alias("_sum"),
    )
    merged = per_part.groupBy().agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_top"))), 1, vocab_size).alias("_top"),
        F.sum("_sum").alias("_total"),
    ).first()
    total = int(merged["_total"] or 0)
    vocab = {e["_t"]: -int(e["_neg"]) for e in (merged["_top"] or [])}
    return vocab, total


def _score_with_unigram_lm(
    df: DataFrame,
    vocab: dict[str, int],
    total: int,
    text_col: str,
    id_col: str,
    vocab_size: int,
) -> DataFrame:
    """Pass 2 of :func:`unigram_logprob_score`: the join-free Arrow
    scoring pass with the plan-sized vocabulary SHIPPED ONCE PER
    EXECUTOR as a Spark broadcast (round 11 — the closure route
    re-serialized the dict into every task; at the default
    vocab_size=1000 that was noise, at 10⁶ it is megabytes × tasks).

    CLOSURE CONTRACT: the vocabulary must stay broadcast-class —
    :data:`_VOCAB_BROADCAST_CEILING` entries (~hundreds of MB of dict at
    the limit) is the enforced ceiling, failed loudly here rather than
    OOM-ing executors one task at a time. Corpora that genuinely need a
    wider LM vocabulary should use the bigram tier's relation-join
    route (count relations + joins, no driver-side dict) — the same
    scores expressed as data, not closure."""
    import pandas as pd

    from plumberapp_spark.functions.text import WS_SPLIT as ws  # ASCII \\s == Java/RE2

    if len(vocab) > _VOCAB_BROADCAST_CEILING:
        raise ValueError(
            f"unigram LM vocabulary has {len(vocab)} entries — above the "
            f"broadcast-class ceiling ({_VOCAB_BROADCAST_CEILING}). Use a "
            "smaller vocab_size, or the join-based count-relation route "
            "(the bigram LM pattern) for very wide vocabularies."
        )
    wide = widen(df.select(F.col(id_col), F.col(text_col)))
    denom = float(total + vocab_size)
    id_ddl = df.schema[id_col].dataType.simpleString()

    import math

    # hoist the log out of the per-token loop: lp[t] = log(count+1), OOV
    # contributes log(0+1) = 0, so score = Σ lp[t] − n·log(denom)
    log_probs = {t: math.log(c + 1) for t, c in vocab.items()}
    log_denom = math.log(denom)
    bc = df.sparkSession.sparkContext.broadcast(log_probs)

    def score(batches):
        from itertools import repeat

        get, zeros = bc.value.get, repeat(0.0)
        for pdf in batches:
            n_tok, mean_lp = [], []
            for doc_text in pdf[text_col]:
                toks = [t for t in ws.split(doc_text) if t] if doc_text is not None else []
                n_tok.append(len(toks))
                if toks:
                    s = sum(map(get, toks, zeros)) - len(toks) * log_denom
                    mean_lp.append(round(s / len(toks), 4))
                else:
                    mean_lp.append(None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": pd.array(n_tok, dtype="int64"),
                    "mean_logprob": pd.array(mean_lp, dtype="float64"),
                }
            )

    return wide.mapInPandas(
        score, f"{id_col} {id_ddl}, n_tokens bigint, mean_logprob double"
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    n_buckets: int | None = None,
) -> DataFrame:
    """CCNet-style head/middle/tail corpus partitioning by LM quality
    (the tercile split CCNet applies to its KenLM perplexities before
    sampling predominantly from the 'head'): score every document with
    :func:`unigram_logprob_score`, rank the scored corpus best-first
    (``mean_logprob`` DESC — higher mean log-probability = lower
    perplexity — with ``id_col`` as the deterministic tie-break), and
    label the top third ``head``, the middle third ``middle``, the rest
    ``tail``. Unscorable documents (no tokens) get rank NULL and land in
    ``tail`` — gibberish-by-vacuity.

    Scale shape: the global best-first rank is a window over a CONSTANT
    key — the single-task wall — so it runs on the distributed bucketed
    prefix machinery (``operators/windows.ranked_running_total`` in
    rank-only mode, same route as token packing / stratified sampling);
    the corpus-size scalar joins in as a broadcast one-row aggregate.
    Bucket thresholds use exact integer arithmetic (``3*rank <= n``), so
    the labels are a pure function of the rank, not of float quantiles.

    Output: ``(id, n_tokens, mean_logprob, ppl_rank, bucket)``.
    """
    scores = unigram_logprob_score(df, text_col, id_col, vocab_size)
    return bucket_lm_scores(scores, id_col, n_buckets)


def bucket_lm_scores(
    scores: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """The ranking/labeling tail of :func:`perplexity_buckets`, split
    out so the persisted-LM serving path (:func:`perplexity_buckets_indexed`)
    reuses it verbatim over scores from :func:`unigram_logprob_score_indexed`."""
    from plumberapp_spark.operators.windows import ranked_running_total

    scored = scores.filter(F.col("mean_logprob").isNotNull()).withColumn(
        "_all", F.lit(0)
    )
    ranked = ranked_running_total(
        scored,
        part_col="_all",
        order_col="mean_logprob",
        id_col=id_col,
        total_name=None,
        rank_name="ppl_rank",
        n_buckets=n_buckets,
        # stats-based route: plain window below ~2M rows (the prefix
        # machinery's fixed overhead dominates), distributed above; an
        # explicit n_buckets pins the route (tests force both paths)
        auto_threshold=None if n_buckets is not None else 2_000_000,
    )
    n_scored = scored.groupBy().agg(F.count("*").alias("_n"))
    labeled = ranked.join(F.broadcast(n_scored)).select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("mean_logprob"),
        F.col("ppl_rank").cast("bigint").alias("ppl_rank"),
        F.when(3 * F.col("ppl_rank") <= F.col("_n"), F.lit("head"))
        .when(3 * F.col("ppl_rank") <= 2 * F.col("_n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    unscored = scores.filter(F.col("mean_logprob").isNull()).select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("mean_logprob"),
        F.lit(None).cast("bigint").alias("ppl_rank"),
        F.lit("tail").alias("bucket"),
    )
    return labeled.unionByName(unscored)


# -- persisted unigram LM (the q89 serving pattern for q77/q79) ----------


def build_unigram_lm(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    vocab_size: int = 1000,
) -> None:
    """Materialize the corpus unigram LM under ``path``: ``{path}/vocab``
    (the top-``vocab_size`` token counts — plan-sized by contract, like
    the IVF centroid relation) and ``{path}/scalars`` (one row: corpus
    token total + vocab_size). Fit is :func:`unigram_logprob_score`'s
    pass 1 verbatim, so scores served from the persisted LM are
    bit-identical to the direct operator's."""
    spark = df.sparkSession
    vocab, total = _fit_unigram_lm(df, text_col, vocab_size)
    spark.createDataFrame(
        sorted(vocab.items()), "tk string, cnt bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/vocab")
    spark.createDataFrame(
        [(total, vocab_size)], "total_tokens bigint, vocab_size bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/scalars")


def ensure_unigram_lm(
    spark,
    sf_dir: str,
    table: str = "documents",
    text_col: str = "text",
    vocab_size: int = 1000,
) -> str:
    """Build-once path contract for :func:`build_unigram_lm`, keyed and
    staleness-checked like ``similarity.ensure_ivf_index``: rebuilt when
    the marker is missing or the source mtime recorded at build time
    differs from the current one (sidecar comparison — immune to
    same-granule in-place rewrites)."""
    import os
    import re
    from urllib.parse import urlparse

    from plumberapp_spark.session import _path_mtime, load_table

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "spark-warehouse"
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"unigram_{table}_{tag}_{vocab_size}")
    marker = os.path.join(path, "scalars", "_SUCCESS")
    sidecar = os.path.join(path, "source_mtime.txt")
    source_mtime = _path_mtime(f"{sf_dir}/{table}.parquet")
    recorded = None
    try:
        with open(sidecar) as fh:
            recorded = float(fh.read().strip())
    except (OSError, ValueError):
        recorded = None
    if not os.path.exists(marker) or recorded is None or recorded != source_mtime:
        build_unigram_lm(
            load_table(spark, sf_dir, table), path, text_col, vocab_size
        )
        with open(sidecar, "w") as fh:
            fh.write(repr(source_mtime))
    return path


def _load_unigram_lm(spark, path: str) -> tuple[dict[str, int], int, int]:
    """Read a persisted LM back: (vocab counts, token total, vocab_size).
    The vocab relation is vocab_size rows — the same plan-sized collect
    contract as the fit's own top-k gather."""
    from plumberapp_spark.session import local_parquet_rows, read_parquet_cached

    # the vocab relation lands on the driver either way (it IS the
    # broadcast scoring map); the pyarrow fast path skips two Spark
    # jobs per serve (round 11, guide §7.3 driver-side floor)
    sc_rows = local_parquet_rows(f"{path}/scalars")
    v_rows = local_parquet_rows(f"{path}/vocab", max_rows=1 << 20)
    if sc_rows and v_rows is not None:
        vocab = {r["tk"]: int(r["cnt"]) for r in v_rows}
        return vocab, int(sc_rows[0]["total_tokens"]), int(sc_rows[0]["vocab_size"])
    vocab = {
        r["tk"]: int(r["cnt"])
        for r in read_parquet_cached(spark, f"{path}/vocab").collect()
    }
    sc = read_parquet_cached(spark, f"{path}/scalars").first()
    return vocab, int(sc["total_tokens"]), int(sc["vocab_size"])


def unigram_logprob_score_indexed(
    spark,
    path: str,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """q77's serving path over a persisted :func:`build_unigram_lm`:
    only the join-free Arrow scoring pass runs — the corpus-derived fit
    (explode → token-count exchange → top-k merge) is paid once at build
    time, not per query run. Output is bit-identical to
    :func:`unigram_logprob_score` on the same corpus."""
    vocab, total, vocab_size = _load_unigram_lm(spark, path)
    return _score_with_unigram_lm(df, vocab, total, text_col, id_col, vocab_size)


def perplexity_buckets_indexed(
    spark,
    path: str,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """q79's serving path over a persisted LM: indexed scoring +
    the shared ranking/labeling tail (:func:`bucket_lm_scores`)."""
    scores = unigram_logprob_score_indexed(spark, path, df, text_col, id_col)
    return bucket_lm_scores(scores, id_col, n_buckets)


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated BIGRAM LM quality score (round 9) — the fluency
    depth the unigram filter (:func:`unigram_logprob_score`) cannot
    see: a bag of high-frequency tokens in scrambled order scores
    identically under a unigram model but collapses under
    p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/T (Jelinek-Mercer
    interpolation with the unigram as back-off mass). Scoring the
    corpus under its own fit means every scored bigram has c12 ≥ 1 —
    no smoothing floor needed (q77's self-scoring contract).

    Returns (id, n_bigrams, mean_logprob) for EVERY document —
    sub-2-token docs carry n_bigrams=0 and a NULL score (q79's
    tokenless pattern). Mean rounded to 4 decimals
    (sum-order-independent at that precision).

    Plan: bigrams assemble JVM-side with zero per-doc shuffles —
    ``arrays_zip(slice(toks,1,n−1), slice(toks,2,n−1))`` pairs
    consecutive tokens inside the row, so no posexplode+window
    self-join; the exchanges are the two count rollups (distinct-
    bigram- and distinct-token-wide, Zipf-bounded — never occurrence-
    wide), the count joins, and the per-doc mean. The FIT (both count
    relations + T) is the dominant corpus-derived cost; a deployment
    persists it exactly like ensure_unigram_lm persists the unigram
    fit — this is the build-lineage definition."""
    bg = _bigram_pairs(df, text_col, id_col)
    tok = df.select(F.explode(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias("tk"))
    uni = tok.groupBy("tk").agg(F.count("*").alias("_c"))
    tot = tok.groupBy().agg(F.count("*").alias("_n"))
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("_c12"))
    return _score_with_bigram_counts(df, bg, bgc, uni, tot, id_col, lam)


def _bigram_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — consecutive-token pairs assembled INSIDE the row
    (arrays_zip of shifted slices; no posexplode/window self-join).
    Shared by the direct fit and the segment builds, which is what
    makes the segmented LM provably the same counts."""
    toks = tokenize(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    pair = F.explode(
        F.arrays_zip(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
        )
    )
    return df.select(F.col(id_col), pair.alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def _score_with_bigram_counts(
    df: DataFrame,
    bg: DataFrame,
    bgc: DataFrame,
    uni: DataFrame,
    tot: DataFrame,
    id_col: str,
    lam: float,
) -> DataFrame:
    """The scoring tail: batch bigram occurrences ⋈ count relations,
    per-doc mean, tokenless/unmatched docs carried with NULL scores.
    Shared verbatim by the direct form and the segmented serving path —
    only where the counts COME FROM differs.

    Round 12 (guide §2.3/§2.4): the logprob of a bigram depends only on
    (w1, w2) — so the count joins and the interpolation assemble a
    BIGRAM-VOCAB-sized logprob table first, and the occurrence relation
    (corpus-sized, the heavy side) crosses ONE exchange into it instead
    of three (it used to shuffle on (w1,w2), then w1, then w2). The
    per-(w1,w2) double is computed by the identical expression from the
    identical count doubles, so every occurrence row carries a
    bit-identical ``_l`` and the per-doc mean is unchanged; inner joins
    associate, so the matched row multiset is unchanged too."""
    lp_tbl = (
        bgc.join(uni.select(F.col("tk").alias("w1"), F.col("_c").alias("_c1")), "w1")
        .join(uni.select(F.col("tk").alias("w2"), F.col("_c").alias("_c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.log(
                lam * (F.col("_c12") / F.col("_c1"))
                + (1 - lam) * (F.col("_c2") / F.col("_n"))
            ).alias("_l"),
        )
    )
    # the logprob table scales with the LM's bigram vocabulary (1.6M
    # rows at the 50k-doc Zipf bed, unbounded at 100 TB) — letting the
    # planner broadcast it builds a multi-million-entry hash relation on
    # the driver per serve (measured 2.3x slower at zipf10). Pin the
    # occurrence join to sort-merge: both sides shuffle by (w1, w2) and
    # AQE's skew-join splitting still handles the Zipf head (guide §3.1).
    lp = bg.join(lp_tbl.hint("merge"), ["w1", "w2"]).select(id_col, "_l")
    agg = lp.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), F.round(F.avg("_l"), 4).alias("mean_logprob")
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            "mean_logprob",
        )
    )


# -- segmented bigram LM (round 10: the q104 pattern applied to q110) -----
#
# q110's fit (two count rollups + a token total) is the dominant
# corpus-derived cost, and its oracle DNFs at Zipf scale while the fit
# is also exactly what a deployment should never pay per scoring run.
# Both count relations are ADDITIVE — c12(w1,w2) and c(tk) sum across
# document subsets, T sums — so the incremental-index design applies
# verbatim: immutable segments of RAW counts, appends tokenize only the
# delta, serving merges per-segment counts with one Zipf-bounded
# rollup. No norms-refresh analog is needed (nothing in the LM is
# non-additive), which makes the bigram LM the cheapest member of the
# maintenance tier.

BIGRAM_LM_FORMAT = 1

_BGSEG_RE = None  # set lazily to avoid re-import at module load


def _bigram_segments(path: str) -> list[str]:
    """Complete bigram-LM segments (scalars marker last — half-written
    appends invisible, the segments.py contract)."""
    import os
    import re as _re

    try:
        names = sorted(
            n for n in os.listdir(path) if _re.match(r"^seg_[0-9A-Za-z]+$", n)
        )
    except OSError:
        return []
    return [
        os.path.join(path, n)
        for n in names
        if os.path.exists(os.path.join(path, n, "scalars", "_SUCCESS"))
    ]


def _resolve_segment(
    path: str, segs: list[str], name: str | None, skip_if_complete: bool
) -> tuple[str, bool]:
    """The epoch-keyed segment-naming contract shared by every additive
    LM write (bigram append/delete, unigram append/delete): with a
    ``name``, the directory is pinned (a replay lands on the SAME path)
    and ``skip_if_complete`` makes a completed replay a no-op; without
    one, the next zero-padded number. Returns (segment dir,
    already_complete)."""
    import os
    import re as _re

    if name is not None:
        if not _re.match(r"^seg_[0-9A-Za-z]+$", name):
            raise ValueError(f"segment name {name!r} must match seg_[0-9A-Za-z]+")
        seg = os.path.join(path, name)
        done = skip_if_complete and os.path.exists(
            os.path.join(seg, "scalars", "_SUCCESS")
        )
        return seg, done
    nums = [
        int(m.group(1))
        for s in segs
        if (m := _re.match(r"^seg_(\d+)$", os.path.basename(s)))
    ]
    return os.path.join(path, f"seg_{(max(nums, default=-1)) + 1:05d}"), False


def _write_bigram_segment(
    docs: DataFrame, seg_path: str, text_col: str, id_col: str
) -> None:
    """One segment from one tokenize pass: bigram counts, unigram
    counts, then the token-total scalar LAST (the completion marker).
    Raw counts only — no corpus-global enters a segment."""
    bg = _bigram_pairs(docs, text_col, id_col)
    bg.groupBy("w1", "w2").agg(F.count("*").alias("_c12")).write.mode(
        "overwrite"
    ).parquet(f"{seg_path}/bgc")
    tok = docs.select(
        F.explode(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias("tk")
    )
    tok.groupBy("tk").agg(F.count("*").alias("_c")).write.mode(
        "overwrite"
    ).parquet(f"{seg_path}/uni")
    tok.groupBy().agg(F.count("*").alias("_n")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{seg_path}/scalars")


def build_bigram_lm(
    docs: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """Initial segment from the starting corpus; everything after
    arrives via :func:`append_bigram_segment`."""
    import os

    seg = os.path.join(path, "seg_00000")
    _write_bigram_segment(docs, seg, text_col, id_col)
    return seg


def append_bigram_segment(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    name: str | None = None,
    skip_if_complete: bool = False,
) -> str:
    """Absorb new documents into the LM by tokenizing ONLY the delta —
    counts are additive, so old segments are never read or rewritten.
    ``name``/``skip_if_complete`` carry the epoch-keyed idempotency
    contract (segments.append_segment), so a streaming foreachBatch
    sink can feed this directly."""
    seg, done = _resolve_segment(path, _bigram_segments(path), name, skip_if_complete)
    if done:
        return seg
    _write_bigram_segment(new_docs, seg, text_col, id_col)
    return seg


def delete_bigram_docs(
    deleted_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    name: str | None = None,
    skip_if_complete: bool = False,
) -> str:
    """Remove documents from the LM by appending a NEGATIVE segment —
    the same counts a build would add, with sign flipped. Because the
    merge SUMS counts, serving after the delete is exactly a fresh fit
    on corpus-minus-deleted (bigrams/tokens whose merged count reaches
    zero vanish via the merge's positivity filter), and compaction
    folds the debt physically like any other segment.

    Caller contract (documented divergence from the lexical tier): the
    LM stores NO doc-keyed relation, so a delete must be charged with
    the documents' TEXT — pass the rows being taken down, and only rows
    that were actually ingested (a double-delete would over-subtract;
    the epoch-keyed ``name``/``skip_if_complete`` pair is the replay
    guard, same as appends). Takedown pipelines have the documents in
    hand by definition; callers that only have ids join them against
    the corpus first."""
    segs = _bigram_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — nothing to delete from")
    seg, done = _resolve_segment(path, segs, name, skip_if_complete)
    if done:
        return seg
    bg = _bigram_pairs(deleted_docs, text_col, id_col)
    bg.groupBy("w1", "w2").agg((-F.count("*")).alias("_c12")).write.mode(
        "overwrite"
    ).parquet(f"{seg}/bgc")
    tok = deleted_docs.select(
        F.explode(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias("tk")
    )
    tok.groupBy("tk").agg((-F.count("*")).alias("_c")).write.mode(
        "overwrite"
    ).parquet(f"{seg}/uni")
    tok.groupBy().agg((-F.count("*")).alias("_n")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{seg}/scalars")
    return seg


def compact_bigram_lm(spark, path: str, out_path: str) -> str:
    """Merge every segment into one — a numeric rollup (counts sum),
    no re-tokenization. Serving pre/post is bit-identical (the counts
    are the same integers)."""
    import os

    segs = _bigram_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — nothing to compact")
    seg = os.path.join(out_path, "seg_00000")
    bgc, uni, sc = _merged_bigram_counts(spark, segs)
    bgc.write.mode("overwrite").parquet(f"{seg}/bgc")
    uni.write.mode("overwrite").parquet(f"{seg}/uni")
    sc.coalesce(1).write.mode("overwrite").parquet(f"{seg}/scalars")
    return seg


# pinned by tests: the loud-failure message an un-keyed double delete
# produces (VERDICT r10 #4 / ADVICE r10). Kept as a constant so the
# test and all three raise sites stay in sync.
_NEG_COUNT_MSG = (
    "bigram LM merge produced a negative count: a delete subtracted "
    "documents that were never ingested (an un-keyed replayed "
    "double-delete?). Replay deletes with epoch-keyed name= and "
    "skip_if_complete=True, or rebuild the LM from the surviving corpus."
)


def _nonneg(c):
    """Fail LOUDLY (JVM-side raise_error, zero extra jobs) when a merged
    count is negative instead of letting the positivity filter silently
    drop still-live bigrams/tokens and skew ``_n``. A negative merged
    count has exactly one cause — a delete charged with rows that were
    never ingested — and serving wrong scores silently is the failure
    mode this module refuses (the _covered_norms philosophy)."""
    return F.when(c < 0, F.raise_error(F.lit(_NEG_COUNT_MSG)).cast("bigint")).otherwise(c)


def _merged_scalar_n(spark, segs: list[str]):
    """One-row ``_n`` total across segments. Every input is a one-row
    parquet relation, so when all are locally readable the signed sum
    happens on the driver (exact integer adds — the lexical
    _global_scalars precedent) and ships as a LocalTableScan, removing
    a distributed union+agg from every serve; the non-negative
    invariant (:func:`_nonneg`) is enforced identically — the driver
    path raises the SAME pinned message, just at plan-build time
    instead of first action. Falls back to the distributed form when
    any path is not locally readable."""
    from plumberapp_spark.session import (
        local_parquet_rows,
        one_row_relation,
        read_parquet_cached,
    )

    total, ok = 0, True
    for seg in segs:
        rows = local_parquet_rows(f"{seg}/scalars")
        if not rows:
            ok = False
            break
        total += int(rows[0]["_n"])
    if ok:
        if total < 0:
            raise ValueError(_NEG_COUNT_MSG)
        return one_row_relation(spark, "_n bigint", total)

    def _union_sc():
        out = None
        for seg in segs:
            df = read_parquet_cached(spark, f"{seg}/scalars")
            out = df if out is None else out.unionByName(df)
        return out

    return _union_sc().groupBy().agg(_nonneg(F.sum("_n")).alias("_n"))


def _merged_bigram_counts(spark, segs: list[str]):
    """(bgc, uni, scalars) summed across segments — the additive merge
    every serve/compact shares. Merged counts are invariant-checked
    non-negative (:func:`_nonneg`)."""
    from plumberapp_spark.session import read_parquet_cached

    def _union(rel):
        out = None
        for s in segs:
            df = read_parquet_cached(spark, f"{s}/{rel}")
            out = df if out is None else out.unionByName(df)
        return out

    if len(segs) == 1:
        # compacted / single-build LM: the counts ARE final — skip the
        # merge rollup exchanges entirely (what compact_bigram_lm buys)
        return (
            read_parquet_cached(spark, f"{segs[0]}/bgc"),
            read_parquet_cached(spark, f"{segs[0]}/uni"),
            read_parquet_cached(spark, f"{segs[0]}/scalars"),
        )
    # positivity filter: a count summed to zero means the bigram/token
    # no longer exists in the corpus (negative delete segments cancel
    # build/append segments exactly) — identical to a fresh fit on the
    # surviving documents
    bgc = (
        _union("bgc")
        .groupBy("w1", "w2")
        .agg(_nonneg(F.sum("_c12")).alias("_c12"))
        .filter(F.col("_c12") > 0)
    )
    uni = (
        _union("uni")
        .groupBy("tk")
        .agg(_nonneg(F.sum("_c")).alias("_c"))
        .filter(F.col("_c") > 0)
    )
    sc = _merged_scalar_n(spark, segs)
    return bgc, uni, sc


def bigram_logprob_score_segmented(
    spark,
    path: str,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """q110's scoring served from the persisted segmented LM: the batch
    pays only its own row-local bigram assembly plus the joins against
    the merged counts — the corpus-wide fit never reruns. The merge is
    one Zipf-bounded rollup per relation, semi-joined down to the
    batch's own vocabulary first so a delta-sized batch touches
    delta-sized count subsets (bigrams the LM has never seen drop from
    the mean — the free-text-OOV contract; a batch drawn from the
    indexed corpus matches everything, which is how the registered
    query hash-anchors to q110's oracle)."""
    segs = _bigram_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — build or append first")
    bg = _bigram_pairs(df, text_col, id_col)
    bgc, uni, sc = _merged_bigram_counts(spark, segs)
    bgc = bgc.join(bg.select("w1", "w2").distinct(), ["w1", "w2"], "left_semi")
    need_tk = bg.select(F.col("w1").alias("tk")).unionByName(
        bg.select(F.col("w2").alias("tk"))
    ).distinct()
    uni = uni.join(need_tk, "tk", "left_semi")
    return _score_with_bigram_counts(df, bg, bgc, uni, sc, id_col, lam)


def ensure_deleted_bigram_lm(
    spark,
    sf_dir: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Fixture for the LM deletion query: the ensure_bigram_lm shape
    (80/20 build+append) followed by a takedown of every
    ``doc_id % 7 == 3`` as one NEGATIVE segment — the deleted set cuts
    across both positive segments, so the merge exercises real
    cancellation (counts reaching zero must vanish)."""
    import os
    import re as _re
    from urllib.parse import urlparse

    from plumberapp_spark.session import _path_mtime, load_table

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "spark-warehouse"
    tag = _re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"bglmdel_{table}_{tag}")
    sidecar = os.path.join(path, "source_mtime.txt")
    source_mtime = _path_mtime(f"{sf_dir}/{table}.parquet")
    recorded, rec_format = None, None
    try:
        with open(sidecar) as fh:
            parts = fh.read().split()
            recorded = float(parts[0])
            rec_format = int(parts[1])
    except (OSError, ValueError, IndexError):
        recorded = None
    if (
        recorded is None
        or recorded != source_mtime
        or rec_format != BIGRAM_LM_FORMAT
        or len(_bigram_segments(path)) < 3
    ):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        docs = load_table(spark, sf_dir, table)
        build_bigram_lm(docs.filter(F.col(id_col) % 5 != 0), path, text_col, id_col)
        append_bigram_segment(
            docs.filter(F.col(id_col) % 5 == 0), path, text_col, id_col
        )
        delete_bigram_docs(
            docs.filter(F.col(id_col) % 7 == 3), path, text_col, id_col
        )
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {BIGRAM_LM_FORMAT}")
    return path


def ensure_bigram_lm(
    spark,
    sf_dir: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Build-once fixture contract (the ensure_segmented_index shape):
    the LM lives under the warehouse as ``bglm_{table}_{sfdir}``, built
    80/20 (seg_00000 from ``doc_id % 5 != 0``, the remaining fifth
    APPENDED) so serving exercises a real multi-segment merge while
    the union is exactly the full table — q110's oracle applies
    verbatim."""
    import os
    import re as _re
    from urllib.parse import urlparse

    from plumberapp_spark.session import _path_mtime, load_table

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "spark-warehouse"
    tag = _re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"bglm_{table}_{tag}")
    sidecar = os.path.join(path, "source_mtime.txt")
    source_mtime = _path_mtime(f"{sf_dir}/{table}.parquet")
    recorded, rec_format = None, None
    try:
        with open(sidecar) as fh:
            parts = fh.read().split()
            recorded = float(parts[0])
            rec_format = int(parts[1])
    except (OSError, ValueError, IndexError):
        recorded = None
    if (
        recorded is None
        or recorded != source_mtime
        or rec_format != BIGRAM_LM_FORMAT
        or len(_bigram_segments(path)) < 2
    ):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        docs = load_table(spark, sf_dir, table)
        build_bigram_lm(
            docs.filter(F.col(id_col) % 5 != 0), path, text_col, id_col
        )
        append_bigram_segment(
            docs.filter(F.col(id_col) % 5 == 0), path, text_col, id_col
        )
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {BIGRAM_LM_FORMAT}")
    return path


# -- segmented unigram LM (round 11: maintenance parity, VERDICT r10 #6) ---
#
# The persisted unigram LM (q96/q97) was rebuild-only while the bigram
# LM got segments + deletes in round 10 — yet the unigram counts are
# JUST AS additive (c(tk) and T sum over document subsets). The one
# subtlety the bigram tier did not have: the SERVED model is the
# top-``vocab_size`` TRUNCATION of the counts, and a truncation is NOT
# additive (the top-k of a union is not the union of top-ks) — so
# segments store FULL per-segment token counts (the Zipf-bounded
# relation, exactly the bigram tier's ``uni``), and the top-k
# vocabulary derives AT SERVE TIME from the merged counts with
# _fit_unigram_lm's own deterministic tie-break (count desc, token
# asc). That makes serving provably identical to a fresh fit on the
# union corpus (q122 shares q77/q96's oracle), and deletes — negative
# count segments, the q119 design — exactly a fresh fit on survivors.

UNIGRAM_LM_FORMAT = 1


def _unigram_segments(path: str) -> list[str]:
    """Complete unigram-LM segments (scalars marker last — half-written
    appends invisible; same layout contract as _bigram_segments)."""
    return _bigram_segments(path)


def _write_unigram_segment(
    docs: DataFrame, seg_path: str, text_col: str, sign: int = 1
) -> None:
    """One segment from one tokenize pass: RAW token counts, then the
    token-total scalar LAST (the completion marker). ``sign=-1`` writes
    a deletion segment (the counts a build would add, negated)."""
    tok = docs.select(
        F.explode(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias("tk")
    )
    tok.groupBy("tk").agg((sign * F.count("*")).alias("_c")).write.mode(
        "overwrite"
    ).parquet(f"{seg_path}/uni")
    tok.groupBy().agg((sign * F.count("*")).alias("_n")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{seg_path}/scalars")


def build_segmented_unigram_lm(
    docs: DataFrame, path: str, text_col: str = "text"
) -> str:
    """Initial segment from the starting corpus; everything after
    arrives via :func:`append_unigram_segment` /
    :func:`delete_unigram_docs`."""
    import os

    seg = os.path.join(path, "seg_00000")
    _write_unigram_segment(docs, seg, text_col)
    return seg


def append_unigram_segment(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    name: str | None = None,
    skip_if_complete: bool = False,
) -> str:
    """Absorb new documents into the LM by tokenizing ONLY the delta —
    token counts are additive, so old segments are never read or
    rewritten. ``name``/``skip_if_complete`` carry the epoch-keyed
    idempotency contract, so a streaming foreachBatch sink can feed
    this directly (the q106/q112 pattern)."""
    seg, done = _resolve_segment(
        path, _unigram_segments(path), name, skip_if_complete
    )
    if done:
        return seg
    _write_unigram_segment(new_docs, seg, text_col)
    return seg


def delete_unigram_docs(
    deleted_docs: DataFrame,
    path: str,
    text_col: str = "text",
    name: str | None = None,
    skip_if_complete: bool = False,
) -> str:
    """Remove documents from the LM by appending a NEGATIVE segment
    (the q119 design). Same caller contract as
    :func:`delete_bigram_docs`: the LM stores no doc-keyed relation, so
    the delete is charged with the documents' TEXT, and only rows that
    were actually ingested — the epoch-keyed ``name``/
    ``skip_if_complete`` pair is the replay guard, and the merge's
    non-negative invariant (:func:`_nonneg`) fails loudly on an
    un-keyed double delete instead of serving silently wrong scores."""
    segs = _unigram_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — nothing to delete from")
    seg, done = _resolve_segment(path, segs, name, skip_if_complete)
    if done:
        return seg
    _write_unigram_segment(deleted_docs, seg, text_col, sign=-1)
    return seg


def compact_unigram_lm(spark, path: str, out_path: str) -> str:
    """Merge every segment into one — a numeric rollup (counts sum,
    zero-count tokens drop physically), no re-tokenization. Serving
    pre/post is bit-identical (the counts are the same integers)."""
    import os

    segs = _unigram_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — nothing to compact")
    seg = os.path.join(out_path, "seg_00000")
    uni, sc = _merged_unigram_counts(spark, segs)
    uni.write.mode("overwrite").parquet(f"{seg}/uni")
    sc.coalesce(1).write.mode("overwrite").parquet(f"{seg}/scalars")
    return seg


def _merged_unigram_counts(spark, segs: list[str]):
    """(uni, scalars) summed across segments — the additive merge with
    the shared non-negative invariant and positivity filter (a count
    summed to zero means the token no longer exists in the corpus)."""

    from plumberapp_spark.session import read_parquet_cached

    def _union(rel):
        out = None
        for s in segs:
            df = read_parquet_cached(spark, f"{s}/{rel}")
            out = df if out is None else out.unionByName(df)
        return out

    if len(segs) == 1:
        return (
            read_parquet_cached(spark, f"{segs[0]}/uni"),
            read_parquet_cached(spark, f"{segs[0]}/scalars"),
        )
    uni = (
        _union("uni")
        .groupBy("tk")
        .agg(_nonneg(F.sum("_c")).alias("_c"))
        .filter(F.col("_c") > 0)
    )
    sc = _merged_scalar_n(spark, segs)
    return uni, sc


def unigram_logprob_score_segmented(
    spark,
    path: str,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """q77's scoring served from the segmented LM: ONE Zipf-bounded
    count merge + a ``vocab_size``-row top-k gather (count desc, token
    asc — _fit_unigram_lm's own deterministic tie-break, so the served
    vocabulary is EXACTLY the one a fresh fit on the union corpus
    selects), then the shared broadcast Arrow scoring pass. The
    corpus-wide tokenize never reruns — appends and deletes already
    paid their delta-sized passes."""
    segs = _unigram_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — build or append first")
    uni, sc = _merged_unigram_counts(spark, segs)
    rows = (
        uni.orderBy(F.col("_c").desc(), F.col("tk")).limit(vocab_size).collect()
    )
    vocab = {r["tk"]: int(r["_c"]) for r in rows}
    total = int(sc.first()["_n"] or 0)
    return _score_with_unigram_lm(df, vocab, total, text_col, id_col, vocab_size)


def perplexity_buckets_segmented(
    spark,
    path: str,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    n_buckets: int | None = None,
) -> DataFrame:
    """q79's CCNet terciles over the segmented LM: segmented scoring +
    the shared ranking/labeling tail (:func:`bucket_lm_scores`)."""
    scores = unigram_logprob_score_segmented(
        spark, path, df, text_col, id_col, vocab_size
    )
    return bucket_lm_scores(scores, id_col, n_buckets)


def ensure_segmented_unigram_lm(
    spark,
    sf_dir: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Build-once fixture contract (the ensure_bigram_lm shape): built
    80/20 (seg_00000 from ``doc_id % 5 != 0``, the remaining fifth
    APPENDED) so serving exercises a real multi-segment merge while the
    union is exactly the full table — q77/q96's oracle applies
    verbatim."""
    import os
    import re as _re
    from urllib.parse import urlparse

    from plumberapp_spark.session import _path_mtime, load_table

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "spark-warehouse"
    tag = _re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"uglm_{table}_{tag}")
    sidecar = os.path.join(path, "source_mtime.txt")
    source_mtime = _path_mtime(f"{sf_dir}/{table}.parquet")
    recorded, rec_format = None, None
    try:
        with open(sidecar) as fh:
            parts = fh.read().split()
            recorded = float(parts[0])
            rec_format = int(parts[1])
    except (OSError, ValueError, IndexError):
        recorded = None
    if (
        recorded is None
        or recorded != source_mtime
        or rec_format != UNIGRAM_LM_FORMAT
        or len(_unigram_segments(path)) < 2
    ):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        docs = load_table(spark, sf_dir, table)
        build_segmented_unigram_lm(
            docs.filter(F.col(id_col) % 5 != 0), path, text_col
        )
        append_unigram_segment(
            docs.filter(F.col(id_col) % 5 == 0), path, text_col
        )
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {UNIGRAM_LM_FORMAT}")
    return path


def ensure_deleted_unigram_lm(
    spark,
    sf_dir: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Fixture for the unigram deletion query: the 80/20 build+append
    followed by a takedown of every ``doc_id % 7 == 3`` as one NEGATIVE
    segment — the deleted set cuts across both positive segments, so
    the merge exercises real cancellation."""
    import os
    import re as _re
    from urllib.parse import urlparse

    from plumberapp_spark.session import _path_mtime, load_table

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "spark-warehouse"
    tag = _re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"uglmdel_{table}_{tag}")
    sidecar = os.path.join(path, "source_mtime.txt")
    source_mtime = _path_mtime(f"{sf_dir}/{table}.parquet")
    recorded, rec_format = None, None
    try:
        with open(sidecar) as fh:
            parts = fh.read().split()
            recorded = float(parts[0])
            rec_format = int(parts[1])
    except (OSError, ValueError, IndexError):
        recorded = None
    if (
        recorded is None
        or recorded != source_mtime
        or rec_format != UNIGRAM_LM_FORMAT
        or len(_unigram_segments(path)) < 3
    ):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        docs = load_table(spark, sf_dir, table)
        build_segmented_unigram_lm(
            docs.filter(F.col(id_col) % 5 != 0), path, text_col
        )
        append_unigram_segment(docs.filter(F.col(id_col) % 5 == 0), path, text_col)
        delete_unigram_docs(docs.filter(F.col(id_col) % 7 == 3), path, text_col)
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {UNIGRAM_LM_FORMAT}")
    return path
