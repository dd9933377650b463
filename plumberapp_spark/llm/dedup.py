"""Deduplication operators for web-scale corpora.

Four escalating strategies, all deterministic (md5-keyed) so each has an
exact DuckDB oracle:

=================  ==========================  ===========================
strategy           shuffle profile             100 TB posture
=================  ==========================  ===========================
exact              1 hash-exchange on digest   map-side combine; digest is
                                               32 bytes/row regardless of
                                               doc size
simhash            none (pure projection)      near-dup key computed
                                               row-local; bucket join later
minhash + LSH      1 exchange on band key      signature = k column exprs
                                               in ONE pass; candidate set
                                               bounded by band collisions
n-gram Jaccard     1 exchange on shingle       hot-shingle cap bounds the
                                               inverted-index blowup
=================  ==========================  ===========================
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from plumberapp_spark.functions.hashing import md5_long, minhash_value
from plumberapp_spark.functions.text import tokenize, word_ngrams


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content digest: one row per distinct text, keeping the
    smallest id (deterministic survivor), with the duplicate count.

    Plan: project(md5) -> hash-aggregate. Partial (map-side) aggregation
    means the exchange carries one digest row per distinct value per
    partition — the 100 TB-safe shape.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dupes"))
    )


def simhash(text: Column, bits: int = 16) -> Column:
    """SimHash over whitespace tokens: per-bit majority vote of 56-bit token
    hashes, packed little-endian into a BIGINT. Pure row-local expression —
    zero shuffle; near-dup candidates then group on the simhash key (or on
    rotated bit-bands for Hamming-distance search).

    Oracle: same construction with list_filter + bit ops on
    ``('0x'||substr(md5(t),1,14))::BIGINT``.
    """
    toks = tokenize(text)
    n = F.size(toks)

    def _ones(mask: int):
        # single-arg lambda: a 2-arg lambda would receive the array INDEX
        # as its second argument (PySpark higher-order-function contract)
        return F.size(F.filter(toks, lambda t: md5_long(t).bitwiseAND(F.lit(mask)) != 0))

    acc = F.lit(0).cast("bigint")
    for j in range(bits):
        bit_j = F.when(_ones(1 << j) * 2 > n, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        acc = acc + bit_j * F.lit(1 << j)
    return acc


def minhash_signature(df: DataFrame, text_col: str, id_col: str, num_perm: int, ngram: int = 3) -> DataFrame:
    """MinHash signature: ``num_perm`` seeded min-hashes over word
    ``ngram``-shingles, as ``mh_0..mh_{k-1}`` columns.

    One narrow pass: the shingle array and all k minima are computed
    row-local (no explode, no shuffle) — at 100 TB this is the difference
    between a projection and a k-times-exploded exchange.
    """
    toks = tokenize(F.col(text_col))
    shingles = F.array_distinct(word_ngrams(toks, ngram))
    out = df.select(F.col(id_col), shingles.alias("_shingles"))
    for s in range(num_perm):
        out = out.withColumn(f"mh_{s}", minhash_value(F.col("_shingles"), seed=s))
    return out.drop("_shingles")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 8,
    bands: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """LSH banding over the MinHash signature: docs sharing any band key are
    candidate near-duplicates. Returns distinct candidate pairs (a < b).

    The only exchange is the band-key groupBy; band keys are md5 digests of
    ``rows_per_band`` signature values, so the shuffle payload is fixed
    width. Skew guard: a pathological band bucket (e.g. empty docs) is
    bounded by AQE skew-join splitting; boilerplate-text buckets should be
    pre-filtered by a quality pass (see textqa).
    """
    rows_per_band = num_perm // bands
    sig = minhash_signature(df, text_col, id_col, num_perm, ngram)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("_", F.lit(str(b)), *parts)).alias(f"band_{b}"))
    banded = sig.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias("band_key"),
    )
    left = stacked.alias("l")
    right = stacked.alias("r")
    pairs = (
        left.join(right, on="band_key")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ngram: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted-index self-join:
    explode distinct shingles -> join on shingle -> |A∩B| / (|A|+|B|-|A∩B|).

    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs (boilerplate) — the standard trick that keeps the inverted index
    from exploding quadratically on hot shingles at corpus scale.
    """
    toks = tokenize(F.col(text_col))
    shingled = df.select(
        F.col(id_col), F.array_distinct(word_ngrams(toks, ngram)).alias("_sh")
    ).withColumn("_n", F.size("_sh"))
    inv = shingled.select(F.col(id_col), F.col("_n"), F.explode("_sh").alias("shingle"))
    if max_shingle_freq is not None:
        hot = Window.partitionBy("shingle")
        inv = inv.withColumn("_df", F.count("*").over(hot)).filter(
            F.col("_df") <= max_shingle_freq
        ).drop("_df")
    a = inv.select(F.col(id_col).alias("id_a"), F.col("_n").alias("n_a"), "shingle")
    b = inv.select(F.col(id_col).alias("id_b"), F.col("_n").alias("n_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
