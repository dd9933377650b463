"""Driver-harness compatibility: queries() must work on a VANILLA SparkSession.

Round-1 regression: the correctness driver builds its own bare
``SparkSession`` (no ``nanosAsLong``, default confs), and 20/56 queries died
at the ``events.parquet`` scan with PARQUET_TYPE_ILLEGAL because the fix
lived only in :func:`plumberapp_spark.session.get_spark`.  The repair is
``ensure_read_confs`` inside :func:`load_table` — this test pins it by
reproducing the driver's environment exactly: a fresh subprocess whose
session is built with ``SparkSession.builder`` and zero engine configs.

A subprocess is required because ``getOrCreate`` in the test JVM would
silently reuse the already-configured session and prove nothing.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.001"

# One events-reading query per module that touches events.parquet:
# queries.py (q03), queries_metrics.py (q29 via _metrics_df),
# queries_analytic.py (q43 via _stats_df), queries_streaming.py (q52,
# which also calls spark.read.parquet directly).
PROBE = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla_driver_mirror")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import importlib
entry = importlib.import_module("__spark_entry__")
qs = entry.queries()
out = {{}}
for name in ["q03_topk", "q29_bottleneck_node", "q43_disk_bound", "q52_streaming_window_counts"]:
    df = qs[name](spark, {sf_dir!r})
    out[name] = {{"rows": df.count(), "cols": df.columns}}
print("RESULT:" + json.dumps(out))
"""


def test_queries_run_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", PROBE.format(repo=str(REPO), sf_dir=SF_DIR)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, f"vanilla-session probe failed:\n{proc.stderr[-4000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, f"no RESULT line in probe stdout:\n{proc.stdout[-2000:]}"
    out = json.loads(line[0][len("RESULT:"):])
    for name, info in out.items():
        assert info["rows"] > 0, f"{name} returned no rows on a vanilla session"
        assert info["cols"], f"{name} lost its schema on a vanilla session"
