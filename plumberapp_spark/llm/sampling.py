"""Deterministic sampling operators for training-data curation.

Stratified sampling ("k docs per language / source / quality band") is
the standard way a 100 TB corpus gets squeezed into a balanced training
mix. The sample here is a pure function of the data — rows are ranked
inside each stratum by a cross-engine content hash (md5), so the same
corpus yields the same sample on any cluster, any partitioning, any
engine (the DuckDB oracle reproduces it row-for-row).

Scale posture: the per-stratum rank is the distributed bucketed rank
from ``operators/windows.ranked_running_total`` (rank-only mode) — a
plain ``Window.partitionBy(stratum)`` is one task per stratum, the exact
low-cardinality wall q36 measured at 84× cost at 100× data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plumberapp_spark.functions.hashing import md5_long
from plumberapp_spark.operators.windows import ranked_running_total


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum
    by ``md5(id)`` descending (a seedable uniform order independent of
    storage layout) and keep ``sample_rank <= k``.

    ``n_buckets=1`` routes to a plain window (right below ~2M rows per
    the q36 measurement); ``None`` uses the cluster default parallelism
    for the bucketed distributed rank.

    Oracle: ``row_number() OVER (PARTITION BY strata ORDER BY
    ('0x'||substr(md5(CAST(id AS VARCHAR)),1,14))::BIGINT DESC, id)``.
    """
    keyed = df.withColumn("_skey", md5_long(F.col(id_col).cast("string")))
    ranked = ranked_running_total(
        keyed,
        part_col=strata_col,
        order_col="_skey",
        id_col=id_col,
        n_buckets=n_buckets,
        rank_name="sample_rank",
        total_name=None,
    )
    return ranked.filter(F.col("sample_rank") <= k).drop("_skey")


def pack_by_token_budget(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Deterministic sequence packing: walk the corpus in ``id_col``
    order and assign each document to the training bin in which its
    token span STARTS — ``bin_id = floor(exclusive_running_tokens /
    budget)`` — the standard "chunk the token stream into
    context-length bins" step in front of LLM training. Documents may
    straddle a boundary; they are counted into their starting bin
    (stream chunking, not bin-packing — deterministic and
    order-preserving, which first-fit-decreasing is not).

    The running token total is the distributed bucketed prefix sum
    (``operators/windows.ranked_running_total`` over a constant
    partition key — the exact single-task global window it exists to
    replace), ordered ascending by negating the id (the machinery
    ranks descending).

    Output: ``(id, tokens, token_offset, bin_id)`` where
    ``token_offset`` is the exclusive running total.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    keyed = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("bigint").alias(tokens_col),
        (-F.col(id_col)).cast("double").alias("_negid"),
        F.lit(0).alias("_all"),
    )
    ranked = ranked_running_total(
        keyed,
        part_col="_all",
        order_col="_negid",
        id_col=id_col,
        value_col=tokens_col,
        n_buckets=n_buckets,
        rank_name="_rk",
        total_name="_ct",
    )
    return ranked.select(
        F.col(id_col),
        F.col(tokens_col),
        (F.col("_ct") - F.col(tokens_col)).cast("bigint").alias("token_offset"),
        F.floor((F.col("_ct") - F.col(tokens_col)) / budget).cast("bigint").alias("bin_id"),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment: ``split`` is a pure
    function of ``md5(id)`` — stable across runs, engines, partitionings
    and cluster sizes, which is the property that keeps eval sets
    leak-free when the corpus is re-processed. ``weights`` maps split
    name to an integer percentage (must sum to 100); default 80/10/10.

    Zero shuffle: one row-local projection at any corpus size.
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"weights must sum to 100, got {weights}")
    bucket = md5_long(F.col(id_col).cast("string")) % 100
    expr = None
    acc = 0
    for name, w in weights.items():
        acc += w
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def quota_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    quotas: dict[str, int],
    n_buckets: int | None = None,
) -> DataFrame:
    """Mixture-weighting sampler: a DIFFERENT deterministic cap per
    stratum (``quotas[stratum]`` rows, md5-ranked) — the "rebalance the
    language/source mix" step of corpus assembly, generalizing
    :func:`stratified_sample`'s single k. Strata absent from ``quotas``
    are dropped (an explicit mixture is a whitelist).

    Same machinery and scale posture as :func:`stratified_sample`; the
    quota map rides a broadcast join (mixtures are tiny by definition).
    """
    spark = df.sparkSession
    keyed = df.withColumn("_skey", md5_long(F.col(id_col).cast("string")))
    ranked = ranked_running_total(
        keyed,
        part_col=strata_col,
        order_col="_skey",
        id_col=id_col,
        n_buckets=n_buckets,
        rank_name="sample_rank",
        total_name=None,
    )
    qdf = spark.createDataFrame(
        [(k, v) for k, v in quotas.items()], f"{strata_col} string, _quota int"
    )
    return (
        ranked.join(F.broadcast(qdf), on=strata_col)
        .filter(F.col("sample_rank") <= F.col("_quota"))
        .drop("_skey", "_quota")
    )
