"""Aggregates every query group into the registry (import side effects),
and exposes the driver-contract accessors.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

import plumberapp_spark.queries  # noqa: F401  (q01-q13: core relational + stream ops)
import plumberapp_spark.queries_llm  # noqa: F401  (q14-q25: dedup/similarity/text/multimodal)

try:  # q26+: metrics model, windows, joins (added incrementally)
    import plumberapp_spark.queries_metrics  # noqa: F401
except ImportError:
    pass

try:  # q37+: optimizer-query shapes, TPC-H analogs, LP/MILP surface
    import plumberapp_spark.queries_analytic  # noqa: F401
except ImportError:
    pass

try:  # q52+: Structured Streaming surface under the driver contract
    import plumberapp_spark.queries_streaming  # noqa: F401
except ImportError:
    pass

from plumberapp_spark.registry import REGISTRY

# The correctness driver evaluates the first 50 registry entries, so order
# matters: every operator's primary evidence query must land inside the cap.
# Round-3 rotation (VERDICT r2 item 6): the TPC-H-shape family (q36,
# q39-q42) and the new streaming-dedup query (q57) move INSIDE the cap so
# they get driver-grade verification; rows that were driver-green in BOTH
# r1 and r2 and whose operators have in-cap siblings rotate out (q07
# take/skip/shard ~ q26/q27 stream-op family; q09 repeat ~ q27
# concatenate; q10 unbatch ~ q08 batch family; q13 hash-bucket ~ q12
# string pipeline; q27/q28 ~ q26 + each other's shared multiset
# machinery).
# Everything in the tail stays registered, benched, and oracle-checked by
# tests/test_queries_oracle.py at sf0.001 every run. q55 is tail by design:
# per-batch rates depend on micro-batch boundaries (rows-only check,
# reason in its docstring).
_TAIL = (
    "q07_take_skip_shard",
    "q09_repeat_echo",
    "q10_unbatch_roundtrip",
    "q13_hash_bucket",
    "q27_concatenate",
    "q28_choose_from",
    "q55_stateful_rate_monitor",
    # q58 carries a full oracle (verified every run by
    # tests/test_queries_oracle.py and benched); tail placement only
    # means the 50-entry driver cap keeps its current members — q19
    # in-cap already covers the uncapped family semantics.
    "q58_ngram_jaccard_capped",
)
for _name in _TAIL:
    if _name in REGISTRY:
        REGISTRY[_name] = REGISTRY.pop(_name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
