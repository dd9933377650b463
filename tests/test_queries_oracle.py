"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the same comparison the driver runs at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import plumberapp_spark.all_queries  # noqa: F401
from plumberapp_spark.registry import REGISTRY
from tests.conftest import SF_DIR
from tools.check_correctness import frame_digest


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_DIR)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]
    if qd.oracle is None:
        assert len(srows) >= 0  # rows-only contract
        return
    res = duck.execute(qd.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    sh, sn = frame_digest(scols, srows)
    oh, on = frame_digest(ocols, orows)
    assert sn == on, f"{name}: row count spark={sn} duck={on}"
    assert sh == oh, f"{name}: value hash mismatch over {sn} rows"
