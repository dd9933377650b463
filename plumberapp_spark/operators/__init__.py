"""Operator library — SURVEY.md §2 re-expressed as DataFrame combinators.

Each function is ``DataFrame -> DataFrame`` (plus parameters), so operators
compose exactly like the reference's dataset chain but stay declarative:
Catalyst sees one logical plan and applies pushdown/pruning/fusion across
operator boundaries, which the reference's opaque-UDF chain cannot do
(SURVEY §4.1).
"""

from plumberapp_spark.operators.stream import (
    with_row_idx,
    take,
    skip,
    shard,
    shuffle,
    repeat,
    zip_by_index,
    concatenate,
    choose_from,
    echo,
    cache,
    prefetch,
)
from plumberapp_spark.operators.batching import (
    batch,
    unbatch,
    padded_batch,
    group_by_window,
)

__all__ = [
    "with_row_idx",
    "take",
    "skip",
    "shard",
    "shuffle",
    "repeat",
    "zip_by_index",
    "concatenate",
    "choose_from",
    "echo",
    "cache",
    "prefetch",
    "batch",
    "unbatch",
    "padded_batch",
    "group_by_window",
]
