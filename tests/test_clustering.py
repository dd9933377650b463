"""k-means curation family (round 9): assignment must be a map-only
pass (no exchange), empty clusters must not renumber survivors, ties
must break to the lowest cluster id, and the representative sample must
be bounded per cluster."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_assignment_is_shuffle_free(spark):
    """The argmin rides array literals + array_min inside the row
    projection: the assignment plan must contain NO Exchange — corpus
    size only widens the scan, never a shuffle."""
    from plumberapp_spark.llm.clustering import assign_clusters, seed_centroids

    emb = _emb(spark)
    cents = seed_centroids(emb, 8)
    plan = (
        assign_clusters(emb, cents)
        .select("vec_id", "cluster", "dist2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_every_point_gets_nearest_centroid(spark):
    """Cross-check the struct-min argmin against an explicit per-
    centroid distance comparison on a small slice."""
    from plumberapp_spark.llm.clustering import assign_clusters, seed_centroids

    emb = _emb(spark).filter(F.col("vec_id") < 50)
    cents = seed_centroids(emb, 4)
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in assign_clusters(emb, cents).select("vec_id", "cluster", "dist2").collect()
    }
    rows = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e")).collect()
    for r in rows:
        dists = [
            (sum((a - b) ** 2 for a, b in zip(r["e"], cv)), cid) for cid, cv in cents
        ]
        # same algebra as the plan: a·a − 2a·c + c·c
        dots = [
            (
                sum(a * a for a in r["e"])
                - 2 * sum(a * b for a, b in zip(r["e"], cv))
                + sum(b * b for b in cv),
                cid,
            )
            for cid, cv in cents
        ]
        best = min(dots)
        assert got[r["vec_id"]][0] == best[1]
        assert abs(got[r["vec_id"]][1] - best[0]) < 1e-9
        # and the two distance forms agree to float tolerance
        assert abs(min(dists)[0] - best[0]) < 1e-6


def test_duplicate_seeds_tie_break_low_and_empty_cluster_keeps_cids(spark):
    """Two identical seed centroids: every point ties between them and
    must break to the LOWER cid, leaving the higher one empty — and the
    update must drop the empty cluster WITHOUT renumbering survivors."""
    from plumberapp_spark.llm.clustering import assign_clusters, update_centroids

    pts = spark.createDataFrame(
        [(i, [float(i % 3), 0.0]) for i in range(30)]
        + [(100, [50.0, 50.0]), (101, [50.0, 51.0])],
        "vec_id bigint, embedding array<double>",
    )
    cents = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [50.0, 50.0])]
    assigned = assign_clusters(pts, cents)
    by_cluster = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert by_cluster.get(1) is None, "tie must break to cid 0"
    assert by_cluster[0] == 30 and by_cluster[2] == 2

    updated = update_centroids(assigned, dim=2)
    assert [cid for cid, _ in updated] == [0, 2], "survivor cids renumbered"
    assert updated[1][1] == [50.0, 50.5]


def test_kmeans_fit_converges_on_separated_blobs(spark):
    """Well-separated blobs: two iterations must land one centroid per
    blob and a zero-dispersion profile for the tight blobs."""
    from plumberapp_spark.llm.clustering import (
        assign_clusters,
        cluster_profile,
        kmeans_fit,
    )

    pts = spark.createDataFrame(
        [(i, [0.0 + 0.001 * (i % 5), 0.0]) for i in range(20)]
        + [(100 + i, [100.0, 100.0 + 0.001 * (i % 5)]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    cents = kmeans_fit(pts, k=2, iters=2)
    prof = {
        r["cluster"]: (r["n_members"], r["avg_dist2"])
        for r in cluster_profile(assign_clusters(pts, cents)).collect()
    }
    assert set(prof) == {0, 1}
    assert prof[0][0] == 20 and prof[1][0] == 20
    assert prof[0][1] < 1e-5 and prof[1][1] < 1e-5


def test_representatives_bounded_per_cluster(spark):
    from plumberapp_spark.llm.clustering import (
        assign_clusters,
        cluster_representatives,
        seed_centroids,
    )

    emb = _emb(spark)
    cents = seed_centroids(emb, 8)
    reps = cluster_representatives(assign_clusters(emb, cents), per_cluster=3)
    counts = reps.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 3 for r in counts)
    # picks are 1..n dense and ordered by distance within each cluster
    rows = reps.orderBy("cluster", "pick").collect()
    last = {}
    for r in rows:
        if r["cluster"] in last:
            assert r["dist2"] >= last[r["cluster"]]
        last[r["cluster"]] = r["dist2"]


def test_ensure_centroids_fit_once(spark, tmp_path, monkeypatch):
    """The fit persists keyed on (source mtime, k, iters): a second call
    returns the identical centroids without re-running Lloyd; a source
    rewrite refits."""
    import os
    import shutil

    import plumberapp_spark.llm.clustering as cl
    from plumberapp_spark.session import clear_table_cache

    sf_dir = str(tmp_path / "sfK")
    os.makedirs(sf_dir)
    src = f"{SF_DIR}/embeddings.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, f"{sf_dir}/embeddings.parquet")
    else:
        shutil.copy(src, f"{sf_dir}/embeddings.parquet")
    c1 = cl.ensure_kmeans_centroids(spark, sf_dir, k=4, iters=1)

    calls = []
    real_fit = cl.kmeans_fit
    monkeypatch.setattr(
        cl, "kmeans_fit", lambda *a, **k: calls.append(1) or real_fit(*a, **k)
    )
    c2 = cl.ensure_kmeans_centroids(spark, sf_dir, k=4, iters=1)
    assert calls == [], "cached fit re-ran Lloyd"
    assert c2 == c1

    tbl = f"{sf_dir}/embeddings.parquet"
    targets = [e.path for e in os.scandir(tbl)] if os.path.isdir(tbl) else [tbl]
    for p in targets:
        os.utime(p, (1000.0, 1000.0))
    clear_table_cache()
    cl.ensure_kmeans_centroids(spark, sf_dir, k=4, iters=1)
    assert calls == [1], "source rewrite did not refit"


# ---- round 10 hardening (VERDICT r9 #8) ---------------------------------


def test_update_centroids_high_dim_route_matches_expr_route(spark):
    """dim 256: the posexplode route (constant codegen cost in dim)
    must reproduce the wide-agg route's table on the same assignment —
    to within ONE 1e-6 rounding step, not bit-exactly: the routes run
    different float-sum plans, so a mean within an ulp of a 6th-decimal
    rounding boundary may legitimately round differently (the
    documented cross-route tolerance, ADVICE r10)."""
    import random

    from plumberapp_spark.llm.clustering import assign_clusters, update_centroids

    rng = random.Random(7)
    dim = 256
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = [(0, rows[0][1]), (1, rows[1][1]), (2, rows[2][1])]
    assigned = assign_clusters(emb, cents)
    wide = update_centroids(assigned, dim, max_expr_dim=1024)
    tall = update_centroids(assigned, dim, max_expr_dim=16)
    assert [c for c, _ in wide] == [c for c, _ in tall]
    for (_, a), (_, b) in zip(wide, tall):
        assert len(a) == len(b) == dim
        assert all(abs(x - y) <= 1.000001e-6 for x, y in zip(a, b))


def test_kmeans_tol_early_stop_is_bit_identical_to_full_run(spark):
    """Two tight, well-separated blobs: the fit converges after one
    real move, so tol=0.0 stops early — and the stopped table must be
    BIT-identical to the all-iterations run (the oracle contract: a
    converged tol fit still matches the full generated-CTE replay)."""
    from plumberapp_spark.llm.clustering import kmeans_fit

    rows = [(i, [0.0 + 0.001 * i, 1.0]) for i in range(5)]
    rows += [(10 + i, [10.0 + 0.001 * i, -3.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    stats: dict = {}
    stopped = kmeans_fit(emb, k=2, iters=8, tol=0.0, stats=stats)
    full = kmeans_fit(emb, k=2, iters=8)
    assert stats["iters_run"] < 8, "tol must actually stop early"
    assert stopped == full
