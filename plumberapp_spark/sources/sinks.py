"""Sinks (SURVEY §2.1 S8–S11).

S9 (benchmark sink) lives in metrics.bench; here: the stats sink (metrics
parquet, the stats.pb analog), CSV/parquet analysis sinks, and the
graphviz dot writer for plan/metrics visualization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from plumberapp_spark.metrics.model import MetricsModel
from plumberapp_spark.plans.nodes import Pipeline


def write_stats(model: MetricsModel, path: str) -> None:
    """S8 stats sink: the per-operator model as parquet (the engine's
    stats.pb; periodic dumps = calling this on a timer thread —
    pa/gen_util.py:61-78)."""
    model.to_df().write.mode("overwrite").parquet(path)


def write_analysis_csv(df: DataFrame, path: str) -> None:
    """S10 CSV sink (node stats / thetas / benchmark logs,
    pa/graph_rewrites.py:970-983)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def plan_to_dot(pipeline: Pipeline, model: MetricsModel | None = None) -> str:
    """S11 graphviz sink (model.to_graphviz / nx write_dot analogs,
    pa/graph_rewrites.py:654-659). Edges point source→consumer; node
    labels carry op + observed rate when a model is supplied."""
    rates = {}
    if model is not None:
        rates = {s.name: s.observed_rate for s in model.stats}
    lines = ["digraph pipeline {", "  rankdir=TB;"]
    for n in pipeline.nodes():
        label = n.label()
        if n.name in rates:
            label += f"\\n{rates[n.name]:.1f} el/s"
        shape = "box" if n.op.startswith("source") else "ellipse"
        style = ' style=filled fillcolor="lightblue"' if n.cached else ""
        lines.append(f'  "{n.name}" [label="{label}" shape={shape}{style}];')
    for child, parent in pipeline.edges():
        lines.append(f'  "{child}" -> "{parent}";')
    lines.append("}")
    return "\n".join(lines)


def write_dot(pipeline: Pipeline, path: str, model: MetricsModel | None = None) -> None:
    with open(path, "w") as f:
        f.write(plan_to_dot(pipeline, model))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> DataFrame:
    """Write a curated corpus as ``n_shards`` TOKEN-BALANCED output
    shards plus a manifest — the shape a training dataloader consumes
    (shards of near-equal work, not near-equal row counts, so no reader
    stalls on a fat shard).

    The data is written ``partitionBy("shard")`` under ``{path}/data``
    in ``fmt``; the manifest (one row per shard: n_docs, n_tokens) is
    written to ``{path}/manifest`` as parquet and returned.

    Scale shape: shard assignment is ``stable_bucket(id, n_shards)`` —
    row-local, deterministic, engine-independent. Equal-probability md5
    buckets equalize token mass at corpus scale by the law of large
    numbers (relative imbalance shrinks as 1/sqrt(docs per shard)); the
    manifest exposes the ACTUAL per-shard token counts so a dataloader
    can verify the balance it is getting. The only exchanges are the
    write's shard repartition and the manifest aggregate.

    Returns the manifest DataFrame ``(shard, n_docs, n_tokens)``.
    """
    from pyspark.sql import functions as F

    from plumberapp_spark.functions.hashing import stable_bucket
    from plumberapp_spark.functions.text import tokenize

    assigned = df.withColumn(
        "shard",
        stable_bucket(F.col(id_col).cast("string"), n_shards).cast("int"),
    )
    (
        assigned.repartition("shard")
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
        .save(f"{path}/data")
    )
    manifest = (
        assigned.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(tokenize(F.coalesce(F.col(text_col), F.lit("")))))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/manifest")
    return df.sparkSession.read.parquet(f"{path}/manifest")
