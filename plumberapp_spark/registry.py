"""Query registry core: name -> (Spark builder, DuckDB oracle).

Query groups register themselves from separate modules
(``queries``, ``queries_llm``, ``queries_metrics``); ``all_queries``
imports them all for the driver contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco
