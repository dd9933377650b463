"""Segment-based INCREMENTAL lexical index — append new documents
without touching (or re-reading) what is already indexed.

The persisted index in :mod:`plumberapp_spark.llm.lexical` is
build-once/serve-many: adding even one document means rebuilding the
whole thing, because its postings store FINAL weights (tf-idf, BM25)
that bake in the corpus globals ``N`` / ``df(t)`` / ``avgdl`` — and an
append shifts every one of those, staling every stored weight. At
100 TB a full rebuild to absorb a 1 % crawl delta re-tokenizes 100 TB
of text; that is the cost this module removes.

The design is the classic segmented (Lucene-style) inverted index,
re-expressed as parquet relations:

* a **segment** is an immutable trio of relations under
  ``{path}/seg_NNNNN/``:

  - ``postings`` — ``(tk, doc_id, _tf, _dl, _b)``: RAW statistics only
    (in-doc term frequency and doc length), partitioned by
    ``_b = crc32(tk) % n_buckets`` exactly like the lexical index so a
    query prunes its scan to the buckets its terms hash into;
  - ``termstats`` — ``(tk, _df, _b)``: the segment's per-term document
    frequency, same bucket layout (a query reads df for ITS terms via
    the same pruned pattern);
  - ``scalars`` — one row ``(_nd, _tt, _n_buckets)``: segment doc
    count, segment token count, and the bucket modulus the segment was
    laid out under.

* :func:`append_segment` tokenizes ONLY the new documents and writes
  one new segment directory. Existing segments are never read, never
  rewritten — append cost is proportional to the delta, not the
  corpus.

* :func:`bm25_topk_segmented` serves EXACT BM25 over the union of all
  segments. This works because every corpus-global BM25 needs is
  **additive across segments**: ``N = Σ nd_i``, ``df(t) = Σ df_i(t)``,
  ``avgdl = Σ tt_i / Σ nd_i`` — so the serving path sums the (tiny)
  per-segment scalars, merges df for just the query's terms out of the
  pruned termstats scans, and computes the weight per pruned posting
  row on the fly. The scores are bit-identical to a from-scratch build
  over the union corpus (q104's oracle IS q102's full-corpus oracle).

  tf-idf **cosine** is deliberately NOT served incrementally: a doc's
  L2 norm ``sqrt(Σ_t (tf·idf_t)²)`` is NOT additive — it shifts with
  every df/N change, and recomputing it needs all of the doc's terms,
  not just the query's. That is precisely why production incremental
  indexes score BM25; callers who need the cosine family compact first
  (:func:`compact_segments`) and build the weighted index from the
  merged corpus.

* :func:`compact_segments` merges all segments into one — a pure
  numeric pass over the raw postings (union + df re-roll), with NO
  re-tokenization, which is the expensive step at scale. Compaction
  bounds the per-query segment fan-out (each query run opens
  ``|segments| × |query-term buckets|`` pruned reads).

100 TB posture: append = tokenize-delta + one bucket-partitioned
write; serve = pruned scans (bucket partition filter + broadcast
semi-join) + a query-vocab-sized df merge + one bounded aggregate; the
only corpus-sized relation a query ever touches is the pruned postings
subset of its own terms. Reference analog: the reference resumes /
extends pipelines without replaying finished work
(plumber_analysis/src/plumber_analysis/pipeline_optimizer.py's
ResumeDataset handling); the segment trick is that same
"don't redo what's done" contract applied to index maintenance.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plumberapp_spark.llm.lexical import (
    DEFAULT_BUCKETS,
    _bucket,
    _two_stage_topk,
)

# bumped whenever the on-disk segment layout changes; recorded in the
# ensure-path sidecar so a layout change rebuilds instead of serving an
# incompatible schema (same contract as lexical.INDEX_FORMAT).
# 2: completion marker moved from postings to scalars — postings is
# written FIRST (the only relation needing the tokenize pass) and
# termstats/scalars are derived by reading it back, so a segment costs
# ONE tokenize pass instead of three.
# 3: added the slim ``doclens`` relation — (doc_id, _dl), ONE row per
# document INCLUDING token-less ones — which is what makes DELETION
# exact and cheap: a tombstone's scalar deltas (how much N and Σdl
# shrink) come from a two-int-column doc-count-sized scan instead of a
# postings scan, and token-less docs (invisible in postings) still
# decrement N correctly.
SEG_FORMAT = 3

# manual appends use zero-padded ints; streaming ingest uses epoch-keyed
# names (seg_s…). Segment ORDER is irrelevant to correctness — the union
# is a multiset and the globals are additive — so the name only needs to
# be unique within the index.
_SEG_RE = re.compile(r"^seg_[0-9A-Za-z]+$")
_SEG_NUM_RE = re.compile(r"^seg_(\d+)$")
_TOMB_RE = re.compile(r"^tomb_(\d+)$")


def _recover_swap(path: str) -> None:
    """Complete or roll back a compaction swap that died between its two
    renames (ADVICE r10, medium). :func:`_swap_compacted` writes a
    sibling intent marker BEFORE touching the live path, so every crash
    state is decidable:

    * marker absent — no swap in flight; nothing to do.
    * marker present, live path present — the crash hit either before
      the first rename (live index untouched) or after both (swap
      complete): the path serves correctly either way, so the marker is
      stale — discard it.
    * marker present, live path absent, ``<path>.compact`` present —
      the crash hit BETWEEN the renames (the silent-data-loss window:
      a restarted sink would otherwise recreate ``path`` holding only
      the replayed epoch while the real corpus sits in ``.old.N``).
      Roll FORWARD: the compacted index is complete by construction
      (it was only renamed after :func:`compact_segments` returned).
    * marker present, neither directory — unrecoverable externally
      induced state; refuse loudly rather than serve an empty index.

    Called from :func:`_list_segments`, the choke point every reader,
    appender, deleter and sink passes through — so recovery happens on
    the first touch after a crash, before any segment write could
    recreate ``path``."""
    intent = f"{path}.swapintent"
    if not os.path.exists(intent):
        return
    tmp = f"{path}.compact"
    if os.path.isdir(path):
        os.remove(intent)
        return
    if os.path.isdir(tmp):
        os.rename(tmp, path)
        os.remove(intent)
        return
    raise RuntimeError(
        f"interrupted compaction swap at {path!r}: neither the live index "
        f"nor {tmp!r} survived — restore from the newest {path}.old.N "
        "sibling before serving or appending"
    )


def _swap_compacted(path: str) -> str:
    """The default two-rename POSIX swap behind :func:`maybe_compact`
    (and the IVF twin), made crash-recoverable: an intent marker is
    written before the first rename and removed after the second, so a
    death anywhere in between is repaired by :func:`_recover_swap` on
    the next index touch instead of silently serving a near-empty
    recreated path. Returns the retired path. Still NOT atomic on
    object stores — pass a ``swap=`` callback there (see
    :func:`maybe_compact`'s contract)."""
    intent = f"{path}.swapintent"
    tmp = f"{path}.compact"
    n = 0
    while os.path.exists(f"{path}.old.{n}"):
        n += 1
    retired = f"{path}.old.{n}"
    with open(intent, "w") as fh:
        fh.write(retired)
    os.rename(path, retired)
    os.rename(tmp, path)
    os.remove(intent)
    return retired


def _list_segments(path: str) -> list[str]:
    """Complete segments under ``path``. A segment is complete iff its
    scalars marker exists — scalars is the LAST relation a segment
    write lands, so a half-written segment (died mid-append) is
    invisible to serving rather than AnalysisException. Also the
    recovery choke point for interrupted compaction swaps
    (:func:`_recover_swap`) — one marker stat per call."""
    _recover_swap(path)
    try:
        names = sorted(n for n in os.listdir(path) if _SEG_RE.match(n))
    except OSError:
        return []
    return [
        os.path.join(path, n)
        for n in names
        if os.path.exists(os.path.join(path, n, "scalars", "_SUCCESS"))
    ]


def _write_bucketed(df: DataFrame, out: str) -> None:
    """Bucket-partitioned write, one file per bucket (a pruned read
    opens |query buckets| files per segment, not |buckets| × |shuffle
    partitions|). A ZERO-ROW frame falls back to a plain parquet write:
    ``partitionBy`` emits no data files for an empty frame and the
    read-back dies on schema inference — the plain write keeps the
    schema in a footer and the serving filter on ``_b`` still applies
    (an ordinary column filter over zero rows)."""
    if df.limit(1).count() == 0:
        df.coalesce(1).write.mode("overwrite").parquet(out)
        return
    df.repartition("_b").write.partitionBy("_b").mode("overwrite").parquet(out)


def _write_segment(
    docs: DataFrame,
    seg_path: str,
    text_col: str,
    id_col: str,
    n_buckets: int,
) -> None:
    """One segment from ONE tokenize pass: postings first (the only
    relation that needs the text), then termstats and scalars DERIVED
    from the written postings (numeric reads — no second tokenize),
    scalars last as the completion marker. Raw statistics only — no
    corpus-global enters a segment, which is what keeps old segments
    immutable under append."""
    from plumberapp_spark.llm.dedup import term_frequencies

    spark = docs.sparkSession
    tf = term_frequencies(docs, text_col, id_col, with_doc_len=True)
    _write_bucketed(
        tf.withColumn("_b", _bucket("tk", n_buckets).cast("int")).select(
            "tk", F.col(id_col).alias("doc_id"), "_tf", "_dl", "_b"
        ),
        f"{seg_path}/postings",
    )
    postings = spark.read.parquet(f"{seg_path}/postings")
    _write_bucketed(
        postings.groupBy("tk", "_b").agg(F.count("*").alias("_df")),
        f"{seg_path}/termstats",
    )
    # doclens: (doc_id, _dl) for EVERY doc of the segment — token-less
    # docs carry _dl=0 (they have no postings rows but still weight N
    # and avgdl, and a later delete must be able to see them). This is
    # the relation the deletion tier charges its scalar deltas against.
    (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            postings.groupBy("doc_id").agg(F.first("_dl").alias("_dl")),
            "doc_id",
            "left",
        )
        .select("doc_id", F.coalesce(F.col("_dl"), F.lit(0)).alias("_dl"))
        .write.mode("overwrite")
        .parquet(f"{seg_path}/doclens")
    )
    # _nd counts ALL docs (token-less ones too — they weight avgdl),
    # straight off the corpus frame, not the postings rows
    nd = docs.groupBy().agg(F.count("*").alias("_nd"))
    (
        postings.groupBy()
        .agg(F.coalesce(F.sum("_tf"), F.lit(0)).alias("_tt"))
        .crossJoin(F.broadcast(nd))
        .select("_nd", "_tt", F.lit(int(n_buckets)).alias("_n_buckets"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{seg_path}/scalars")
    )


def _seg_buckets(spark, seg_path: str) -> int:
    """The segment's recorded bucket modulus. One-row relation: the
    driver-side pyarrow fast path (the ``stats_bounds`` precedent)
    reads it with ZERO Spark jobs; non-local paths fall back to the
    Spark read (cached thereafter)."""
    from plumberapp_spark.session import local_parquet_rows, read_parquet_cached

    rows = local_parquet_rows(f"{seg_path}/scalars")
    if rows:
        return int(rows[0]["_n_buckets"])
    return int(
        read_parquet_cached(spark, f"{seg_path}/scalars")
        .select("_n_buckets")
        .first()[0]
    )


# ---- deletion (tombstone segments) --------------------------------------
#
# A takedown/retraction on a 100 TB corpus must not force the full
# rebuild the segment tier exists to avoid. The inverse of
# append_segment is an immutable TOMBSTONE: ``tomb_NNNNN/`` holding
#   - ``ids``     — the doc_ids actually removed (⊆ live index docs,
#                   pairwise disjoint across tombstones by construction);
#   - ``scalars`` — one row (_nd, _tt): how many docs and how much Σdl
#                   this tombstone subtracts from the additive globals
#                   (written LAST — the completion marker, exactly like
#                   a segment's scalars).
# Serving anti-joins the (broadcast) tombstone ids inside the pruned
# postings scan, corrects df(t) for the query's terms by COUNTING the
# removed rows already in that pruned scan (each (doc, term) appears
# once in postings, so removed-row count IS the df delta), and subtracts
# the signed scalars — algebraically identical to an index built on
# corpus-minus-deleted. Compaction drops tombstoned rows physically.
# Reference analog: cache REMOVAL is a first-class plan rewrite in the
# reference (plumber_analysis/src/plumber_analysis/graphdef_util.py
# splices CacheDataset out of a graph); this is the same inverse
# operation applied to the index tier.


def _list_tombstones(path: str) -> list[str]:
    """Complete tombstones under ``path`` — complete iff the scalars
    marker landed (half-written deletes are invisible, like segments)."""
    try:
        names = sorted(n for n in os.listdir(path) if _TOMB_RE.match(n))
    except OSError:
        return []
    return [
        os.path.join(path, n)
        for n in names
        if os.path.exists(os.path.join(path, n, "scalars", "_SUCCESS"))
    ]


def _absorbed_segments(path: str) -> set[str]:
    """Names of segments a PRIOR COMPACTION folded into this index
    (``absorbed.json``, written by compact_segments). An epoch-keyed
    replay must treat an absorbed segment as complete — its rows are
    already in the compacted segment — or a post-compaction replay
    would double-ingest the epoch. This is what makes in-sink
    auto-compaction (streaming_segment_ingest's ``max_segments``)
    exactly-once-preserving."""
    import json

    try:
        with open(os.path.join(path, "absorbed.json")) as fh:
            return set(json.load(fh))
    except (OSError, ValueError):
        return set()


def _require_doclens(segs: list[str]) -> None:
    """Fail with GUIDANCE when a segment predates the ``doclens``
    relation (layout format ≤ 2) instead of a raw parquet
    path-not-found deep inside a delete/compaction plan (ADVICE r10).
    A backfill from postings would be silently WRONG: token-less
    documents carry no postings rows, so a derived doclens would miss
    them — a later delete of such a doc would no-op and leave ``N``
    permanently overcounted. The only exact repair is a rebuild, which
    every ``ensure_*`` fixture already performs via the format sidecar;
    hand-built indexes rebuild via build_segmented_index/append_segment."""
    missing = [
        s
        for s in segs
        if not os.path.exists(os.path.join(s, "doclens", "_SUCCESS"))
    ]
    if missing:
        raise ValueError(
            f"segment(s) {[os.path.basename(s) for s in missing]} carry no "
            f"doclens relation (written under layout format <= 2; current "
            f"format {SEG_FORMAT}) — deletes and compaction need the exact "
            "per-document lengths, which postings cannot reconstruct for "
            "token-less documents. Rebuild the index (the ensure_* fixtures "
            "do this automatically via their format sidecar)."
        )


def _tombstone_ids(spark, tombs: list[str]) -> DataFrame | None:
    """Union of all tombstoned doc_ids, or None when no deletes exist.
    Takedown sets are tiny relative to the corpus — the broadcast
    contract every consumer applies (same class as the vocab/quota
    broadcast maps)."""
    if not tombs:
        return None
    from plumberapp_spark.session import read_parquet_cached

    out = None
    for t in tombs:
        df = read_parquet_cached(spark, f"{t}/ids")
        out = df if out is None else out.unionByName(df)
    return out


def delete_docs(spark, path: str, ids: DataFrame, id_col: str = "doc_id") -> str:
    """Remove documents from the index WITHOUT touching any segment:
    write one immutable tombstone. Cost is one scan of the slim doclens
    relations (two int columns, one row per doc) — never the postings,
    never a re-tokenize. Ids that are absent from the index or already
    deleted are dropped here (the inner semi-join against live doclens),
    which keeps tombstones pairwise disjoint — so the signed scalar
    deltas stay exact under replayed or overlapping delete requests."""
    segs = _list_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — nothing to delete from")
    _require_doclens(segs)
    tombs = _list_tombstones(path)
    nums = [int(_TOMB_RE.match(os.path.basename(t)).group(1)) for t in tombs]
    tomb = os.path.join(path, f"tomb_{(max(nums, default=-1)) + 1:05d}")
    doclens = _union_pruned(spark, segs, "doclens", [])
    prior = _tombstone_ids(spark, tombs)
    if prior is not None:
        doclens = doclens.join(F.broadcast(prior), "doc_id", "left_anti")
    req = ids.select(F.col(id_col).alias("doc_id")).distinct()
    matched = doclens.join(F.broadcast(req), "doc_id", "left_semi")
    matched.select("doc_id").coalesce(1).write.mode("overwrite").parquet(
        f"{tomb}/ids"
    )
    # scalars last — the completion marker (read ids back so the two
    # relations are derived from the same materialized row set)
    (
        doclens.join(
            F.broadcast(spark.read.parquet(f"{tomb}/ids")), "doc_id", "left_semi"
        )
        .groupBy()
        .agg(
            F.count("*").alias("_nd"),
            F.coalesce(F.sum("_dl"), F.lit(0)).alias("_tt"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{tomb}/scalars")
    )
    return tomb


def _apply_tombstones(
    spark, path: str, postings: DataFrame, dfreq: DataFrame
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Splice deletions into a serving plan: anti-join the (broadcast)
    tombstoned ids out of the pruned postings, and REPLACE the
    termstats-derived df with a count over the live postings — each
    (doc, term) posting row is one df unit, so ``count(live rows per
    tk)`` IS ``Σ termstats − removed`` exactly (the q101 free-text
    trick: the postings are their own df relation). That costs one
    aggregate over rows the scoring scan touches anyway and saves both
    the termstats scans and a correction join; with no tombstones the
    cheaper summed-termstats ``dfreq`` passes through untouched.
    Returns (live postings, effective dfreq, tombs)."""
    tombs = _list_tombstones(path)
    dead_ids = _tombstone_ids(spark, tombs)
    if dead_ids is None:
        return postings, dfreq, tombs
    live = postings.join(F.broadcast(dead_ids), "doc_id", "left_anti")
    return live, live.groupBy("tk").agg(F.count("*").alias("_df")), tombs


def build_segmented_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """Initial segment (``seg_00000``) from the starting corpus.
    Everything after this arrives via :func:`append_segment`."""
    seg = os.path.join(path, "seg_00000")
    _write_segment(corpus, seg, text_col, id_col, n_buckets)
    return seg


def append_segment(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    name: str | None = None,
    skip_if_complete: bool = False,
) -> str:
    """Absorb new documents WITHOUT reading or rewriting any existing
    segment: tokenize only ``new_docs``, write one new segment. The
    bucket modulus is read back from the index's own first segment
    (never from the constant) — all segments of one index MUST share a
    layout or serve-time pruning would silently drop rows (the
    ADVICE-r8 lexical hardening, applied here from day one).

    ``name`` pins the segment directory (callers with a natural
    idempotency key — a streaming epoch id — pass it so a replayed
    write lands on the same path); with ``skip_if_complete`` a replay
    of an already-complete segment is a no-op, which is what turns
    foreachBatch's at-least-once delivery into exactly-once index
    contents."""
    segs = _list_segments(path)
    if name is not None:
        if not _SEG_RE.match(name):
            raise ValueError(f"segment name {name!r} must match {_SEG_RE.pattern}")
        seg = os.path.join(path, name)
        if skip_if_complete and (
            os.path.exists(os.path.join(seg, "scalars", "_SUCCESS"))
            or name in _absorbed_segments(path)
        ):
            return seg
        # first segment of an empty index keeps the caller's name — a
        # replay must land on the SAME directory or epoch 0 would
        # double-ingest under two names
        if not segs:
            _write_segment(new_docs, seg, text_col, id_col, DEFAULT_BUCKETS)
            return seg
    elif not segs:
        return build_segmented_index(new_docs, path, text_col, id_col)
    else:
        nums = [
            int(m.group(1))
            for s in segs
            if (m := _SEG_NUM_RE.match(os.path.basename(s)))
        ]
        seg = os.path.join(path, f"seg_{(max(nums, default=-1)) + 1:05d}")
    n_buckets = _seg_buckets(new_docs.sparkSession, segs[0])
    _write_segment(new_docs, seg, text_col, id_col, n_buckets)
    return seg


def _union_pruned(spark, segs: list[str], rel: str, buckets: list[int]) -> DataFrame:
    """Union of one relation across segments, each scan pruned to the
    query terms' buckets (an IN filter on the int partition column —
    partition pruning, not a runtime row filter). Segment relations are
    immutable, so each read is footer-cached per (session, path, mtime)
    — the round-11 profiler measured repeated ``read.parquet``
    resolutions as the bulk of the 10-14 driver-side jobs a serve paid
    before any task ran (guide §1/§7.3: driver-side planning work)."""
    from plumberapp_spark.session import read_parquet_cached

    frames = []
    for seg in segs:
        df = read_parquet_cached(spark, f"{seg}/{rel}")
        if buckets:
            df = df.filter(F.col("_b").isin(buckets))
        frames.append(df)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df)
    return out


def _global_scalars(spark, segs: list[str], tombs: list[str] = ()) -> DataFrame:
    """One-row union-corpus globals: BM25's N and avgdl are ADDITIVE
    over segments — summing the per-segment one-row scalars relations
    reconstructs them exactly, which is the algebraic fact the whole
    module stands on. Tombstones are the same fact WITH SIGN: each
    contributes its (_nd, _tt) negatively, so the sum is exactly the
    globals of corpus-minus-deleted.

    Fast path (round 11): every input is a one-row parquet relation, so
    when all of them are locally readable the sums happen on the driver
    (exact integer adds; the float division ``Σtt / Σnd`` is the same
    IEEE double Spark's long/long division produces) and the result
    ships as a one-row local relation — removing one distributed
    aggregate + its scan jobs from EVERY serve. Falls back to the
    distributed form whenever any path isn't locally readable."""
    from plumberapp_spark.session import local_parquet_rows, one_row_relation

    acc_nd, acc_tt, ok = 0, 0, True
    for s in segs:
        rows = local_parquet_rows(f"{s}/scalars")
        if not rows:
            ok = False
            break
        acc_nd += int(rows[0]["_nd"])
        acc_tt += int(rows[0]["_tt"])
    if ok:
        for t in tombs:
            rows = local_parquet_rows(f"{t}/scalars")
            if not rows:
                ok = False
                break
            acc_nd -= int(rows[0]["_nd"])
            acc_tt -= int(rows[0]["_tt"])
    if ok:
        avgdl = (acc_tt / acc_nd) if acc_nd else None
        return one_row_relation(spark, "_nd bigint, _avgdl double", acc_nd, avgdl)
    return _signed_scalars(spark, segs, tombs).groupBy().agg(
        F.sum("_nd").alias("_nd"),
        (F.sum("_tt") / F.sum("_nd")).alias("_avgdl"),
    )


def _signed_scalars(spark, segs: list[str], tombs: list[str]) -> DataFrame:
    """Per-segment scalars unioned with each tombstone's NEGATED ones —
    the signed additive series both the serving globals and compaction
    fold (exact integer arithmetic; never reconstructed from avgdl)."""
    sc = _union_pruned(spark, segs, "scalars", []).select("_nd", "_tt")
    for t in tombs:
        sc = sc.unionByName(
            spark.read.parquet(f"{t}/scalars").select(
                (-F.col("_nd")).alias("_nd"), (-F.col("_tt")).alias("_tt")
            )
        )
    return sc


def bm25_topk_segmented(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "q_text",
    id_col: str = "query_id",
    k1: float = 1.2,
    b: float = 0.75,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Exact BM25 top-k for free-text queries over ALL segments —
    score-identical to a from-scratch index over the union corpus
    (same Robertson/Lucene formula as ``dedup.bm25_topk``, 6-decimal
    rounding before rank, neighbor-id tie-break; the registered query's
    oracle is the full-corpus q102 oracle verbatim).

    Per query run: one pruned postings scan per segment (bucket
    partition filter + broadcast semi-join on the query's terms), a
    query-vocab-sized df merge from the pruned termstats scans, the
    per-row weight arithmetic, one bounded aggregate, and the family's
    shared two-stage top-k. Nothing corpus-sized is recomputed.

    ``doc_filter`` (round 11 — FILTERED retrieval, the production shape
    where results are predicated on metadata: lang, source, date
    range): a slim one-column relation of servable doc ids, semi-joined
    against the pruned postings BEFORE scoring/top-k — so the filter
    rides the rows the scan already touches, inside partition pruning,
    never a post-rank re-query that could return fewer than k hits.
    Corpus statistics (df, N, avgdl) deliberately stay those of the
    whole live corpus — Lucene/ES filtered-query semantics: a filter
    restricts CANDIDATES, it does not re-weigh the collection (that
    would be a different index; deletes are the operation that moves
    the stats, and they do). Build the relation by projecting doc_id
    from any attribute predicate (e.g. ``docs.filter("lang='en'")
    .select("doc_id")``); the plan semi-joins it without a forced
    broadcast, so AQE picks broadcast for small filters and a shuffled
    semi-join for wide ones."""
    from plumberapp_spark.functions.text import tokenize
    from plumberapp_spark.session import local_relation

    segs = _list_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — build or append first")
    n_buckets = _seg_buckets(spark, segs[0])
    # ONE bounded collect of the (query, term) pairs (the same
    # small-side contract as the ANN query-matrix collects, guarded);
    # everything query-sided then serves from a LOCAL relation — the
    # pruning buckets compute driver-side under the index's RECORDED
    # modulus (zlib.crc32 == Spark's crc32, both CRC-32/zlib over the
    # utf-8 bytes), and the three broadcast joins of qterms ship a
    # LocalTableScan instead of re-executing tokenize+distinct per
    # branch (round 11: 3 fewer jobs per serve, identical rows by
    # construction — they ARE the collected output of the old plan).
    qterms_plan = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(tokenize(F.col(text_col))).alias("tk"),
    ).distinct()
    q_rows = qterms_plan.limit(100_001).collect()
    if len(q_rows) > 100_000:
        raise ValueError(
            "bm25_topk_segmented: query term set exceeds the broadcastable "
            "contract (> 100000 (query, term) pairs); batch the queries"
        )
    qterms = local_relation(spark, q_rows, qterms_plan.schema)
    import zlib

    buckets = sorted(
        {zlib.crc32(r["tk"].encode("utf-8")) % n_buckets for r in q_rows}
    )
    dfreq = (
        _union_pruned(spark, segs, "termstats", buckets)
        .join(F.broadcast(qterms.select("tk").distinct()), "tk", "left_semi")
        .groupBy("tk")
        .agg(F.sum("_df").alias("_df"))
    )
    postings = _union_pruned(spark, segs, "postings", buckets).join(
        F.broadcast(qterms.select("tk").distinct()), "tk", "left_semi"
    )
    postings, dfreq, tombs = _apply_tombstones(spark, path, postings, dfreq)
    if tombs:
        # BM25 needs df only per posting row, so on a tombstoned index
        # it rides a window COUNT over the single live pruned scan —
        # the separate dfreq relation would re-execute that scan (its
        # termstats shortcut is invalid once deletes shift df). One
        # Zipf-hot query term makes one fat window partition; that
        # beats doubling the scan (measured at zipf100: 6.7 s → 4.9 s).
        from pyspark.sql import Window

        postings = postings.withColumn(
            "_df", F.count("*").over(Window.partitionBy("tk"))
        )
    if doc_filter is not None:
        # AFTER df settles (stats are corpus-level by contract), BEFORE
        # weighting (don't score rows the filter will drop)
        allowed = doc_filter.select(
            F.col(doc_filter.columns[0]).alias("doc_id")
        ).distinct()
        postings = postings.join(allowed, "doc_id", "left_semi")
    if tombs:
        weighted = postings.join(F.broadcast(qterms), "tk")
    else:
        weighted = postings.join(F.broadcast(qterms), "tk").join(
            F.broadcast(dfreq), "tk"
        )
    scored = (
        weighted
        .crossJoin(F.broadcast(_global_scalars(spark, segs, tombs)))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_nd") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1))
                / (
                    F.col("_tf")
                    + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
                )
            ).alias("_w"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_w"), 6).alias("bm25"))
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "bm25")
    )
    return _two_stage_topk(scored, k, "bm25")


def refresh_tfidf_norms(spark, path: str) -> str:
    """The maintenance job that buys tf-idf COSINE serving over the
    segmented index. A doc's L2 norm sqrt(Σ_t (tf·ln(N/df_t))²) is the
    ONE quantity an append invalidates corpus-wide (df/N shift for
    every doc), so it cannot live inside immutable segments; this job
    recomputes the norms relation over the CURRENT segment set — a
    numeric pass (postings ⋈ global df on the token, one doc-keyed
    aggregate), crucially with NO re-tokenization — and records which
    segments it covered. Serving raises if the segment set has moved
    since the last refresh (fail-fast with guidance, never a silently
    stale cosine). BM25 needs none of this — its globals are additive —
    which is exactly why BM25 is the zero-maintenance scoring function
    and tf-idf costs one numeric pass per delta batch."""
    import json

    segs = _list_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — nothing to refresh")
    postings = _union_pruned(spark, segs, "postings", [])
    dfreq = (
        _union_pruned(spark, segs, "termstats", [])
        .groupBy("tk")
        .agg(F.sum("_df").alias("_df"))
    )
    # deletions shift every df and N too — the refresh applies them the
    # same way serving does (anti-join + counted corrections), so the
    # norms it writes are those of corpus-minus-deleted
    postings, dfreq, tombs = _apply_tombstones(spark, path, postings, dfreq)
    nd = _global_scalars(spark, segs, tombs).select("_nd")
    (
        postings.join(dfreq, "tk")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            (F.col("_tf") * F.log(F.col("_nd") / F.col("_df"))).alias("_w"),
        )
        .groupBy("doc_id")
        .agg(F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("nrm"))
        .write.mode("overwrite")
        .parquet(f"{path}/norms")
    )
    cover = {
        "segs": [os.path.basename(s) for s in segs],
        "tombs": [os.path.basename(t) for t in tombs],
    }
    with open(os.path.join(path, "norms_cover.json"), "w") as fh:
        json.dump(cover, fh)
    return f"{path}/norms"


def ensure_tfidf_norms(spark, path: str) -> None:
    """Refresh the norms relation iff it does not cover the current
    segment set (idempotent — the fixture-side convenience around
    :func:`refresh_tfidf_norms`)."""
    segs = _list_segments(path)
    try:
        _covered_norms(spark, path, segs)
    except ValueError:
        refresh_tfidf_norms(spark, path)


def _covered_norms(spark, path: str, segs: list[str]) -> DataFrame:
    """The norms relation, IF it covers exactly the current segment
    set; raises with guidance otherwise — a cosine over stale norms is
    wrong silently, the one failure mode this module refuses."""
    import json

    try:
        with open(os.path.join(path, "norms_cover.json")) as fh:
            cover = json.load(fh)
    except OSError:
        cover = None
    if isinstance(cover, list):  # pre-deletion cover format (format ≤2)
        cover = {"segs": cover, "tombs": []}
    current = {
        "segs": [os.path.basename(s) for s in segs],
        "tombs": [os.path.basename(t) for t in _list_tombstones(path)],
    }
    if cover != current:
        raise ValueError(
            f"tf-idf norms under {path!r} cover {cover!r} but the index now "
            f"holds {current!r} — run refresh_tfidf_norms(path) after "
            "appends or deletes (BM25 serving needs no refresh)"
        )
    from plumberapp_spark.session import read_parquet_cached

    return read_parquet_cached(spark, f"{path}/norms")


def tfidf_topk_segmented(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "q_text",
    id_col: str = "query_id",
) -> DataFrame:
    """Free-text tf-idf cosine top-k over the segmented index —
    output-identical to ``lexical.tfidf_topk_freetext`` on the union
    corpus (q111 shares q101's full-corpus oracle). Doc-side weights
    compute at serve time from the pruned scans (every SCORED posting
    carries a query term, so its df is already in the pruned df
    relation); the query vector weights from the same df; the only
    extra relation is the refreshed norms, joined against the bounded
    scored frame (one slim doc-keyed scan per run)."""
    from plumberapp_spark.functions.text import tokenize
    from plumberapp_spark.llm.lexical import _two_stage_topk
    from plumberapp_spark.session import local_relation

    segs = _list_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — build or append first")
    norms = _covered_norms(spark, path, segs)
    n_buckets = _seg_buckets(spark, segs[0])
    # one bounded collect; local query relations thereafter (see
    # bm25_topk_segmented — same contract, same crc32 parity)
    qtf_plan = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(tokenize(F.col(text_col))).alias("tk"),
        )
        .groupBy("query_id", "tk")
        .agg(F.count("*").alias("_qtf"))
    )
    q_rows = qtf_plan.limit(100_001).collect()
    if len(q_rows) > 100_000:
        raise ValueError(
            "tfidf_topk_segmented: query term set exceeds the broadcastable "
            "contract (> 100000 (query, term) pairs); batch the queries"
        )
    qtf = local_relation(spark, q_rows, qtf_plan.schema)
    import zlib

    buckets = sorted(
        {zlib.crc32(r["tk"].encode("utf-8")) % n_buckets for r in q_rows}
    )
    qterms = qtf.select("tk").distinct()
    dfreq = (
        _union_pruned(spark, segs, "termstats", buckets)
        .join(F.broadcast(qterms), "tk", "left_semi")
        .groupBy("tk")
        .agg(F.sum("_df").alias("_df"))
    )
    postings = _union_pruned(spark, segs, "postings", buckets).join(
        F.broadcast(qterms), "tk", "left_semi"
    )
    postings, dfreq, tombs = _apply_tombstones(spark, path, postings, dfreq)
    nd = _global_scalars(spark, segs, tombs).select("_nd")
    qw = (
        qtf.join(dfreq, "tk")
        .crossJoin(F.broadcast(nd))
        .select(
            "query_id",
            "tk",
            (F.col("_qtf") * F.log(F.col("_nd") / F.col("_df"))).alias("_qw"),
        )
    )
    qn = qw.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("_qw") * F.col("_qw"))).alias("_qn")
    )
    scored = (
        postings.join(F.broadcast(dfreq), "tk")
        .crossJoin(F.broadcast(nd))
        .select(
            "tk",
            "doc_id",
            (F.col("_tf") * F.log(F.col("_nd") / F.col("_df"))).alias("_w"),
        )
        .join(F.broadcast(qw.join(qn, "query_id")), "tk")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("_w") * F.col("_qw")).alias("_dot"),
            F.first("_qn").alias("_qn2"),
        )
    )
    out = (
        norms.join(F.broadcast(scored), "doc_id")
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            F.round(F.col("_dot") / (F.col("nrm") * F.col("_qn2")), 6).alias(
                "cos_sim"
            ),
        )
    )
    return _two_stage_topk(out, k, "cos_sim")


def compact_segments(spark, path: str, out_path: str) -> str:
    """Merge every segment into ONE — a pure numeric pass over the raw
    relations (postings union is already disjoint by doc, termstats
    re-rolls df by token, scalars sum) with NO re-tokenization, the
    step that dominates build cost at scale. Tombstoned documents are
    dropped PHYSICALLY here: live postings/doclens are the anti-joined
    unions, termstats re-counts from the surviving postings, and the
    scalars fold the signed tombstone deltas — so the compacted index
    carries no tombstones at all and serving it needs no corrections.
    Writes a fresh single-segment index at ``out_path`` and leaves the
    source index untouched (compaction runs beside serving; swap is the
    caller's atomic-rename problem — see :func:`maybe_compact`).
    Serving the compacted index returns bit-identical scores to serving
    the segments — q105 pins this with the same full-corpus oracle as
    q104, and the delete family pins the tombstone case."""
    segs = _list_segments(path)
    if not segs:
        raise ValueError(f"no segments under {path!r} — nothing to compact")
    _require_doclens(segs)
    n_buckets = _seg_buckets(spark, segs[0])
    tombs = _list_tombstones(path)
    dead = _tombstone_ids(spark, tombs)
    seg = os.path.join(out_path, "seg_00000")
    postings = _union_pruned(spark, segs, "postings", [])
    if dead is not None:
        postings = postings.join(F.broadcast(dead), "doc_id", "left_anti")
    _write_bucketed(postings, f"{seg}/postings")
    if dead is None:
        termstats = (
            _union_pruned(spark, segs, "termstats", [])
            .groupBy("tk", "_b")
            .agg(F.sum("_df").alias("_df"))
        )
    else:
        # deletes shift df — recount from the SURVIVING postings (read
        # back, so the counts come from exactly what was written)
        termstats = (
            spark.read.parquet(f"{seg}/postings")
            .groupBy("tk", "_b")
            .agg(F.count("*").alias("_df"))
        )
    _write_bucketed(termstats, f"{seg}/termstats")
    doclens = _union_pruned(spark, segs, "doclens", [])
    if dead is not None:
        doclens = doclens.join(F.broadcast(dead), "doc_id", "left_anti")
    doclens.write.mode("overwrite").parquet(f"{seg}/doclens")
    # scalars last — the completion marker
    (
        _signed_scalars(spark, segs, tombs)
        .groupBy()
        .agg(F.sum("_nd").alias("_nd"), F.sum("_tt").alias("_tt"))
        .select("_nd", "_tt", F.lit(int(n_buckets)).alias("_n_buckets"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{seg}/scalars")
    )
    # record what was folded in: absorbed = the source's own absorbed
    # set plus every segment this compaction merged — the idempotency
    # ledger an epoch-keyed replay checks after a swap (see
    # _absorbed_segments)
    import json

    absorbed = sorted(
        _absorbed_segments(path) | {os.path.basename(s) for s in segs}
    )
    with open(os.path.join(out_path, "absorbed.json"), "w") as fh:
        json.dump(absorbed, fh)
    return seg


def streaming_segment_ingest(
    stream_docs: DataFrame,
    path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    max_segments: int | None = None,
):
    """Live index maintenance: each non-empty micro-batch of the
    document stream becomes ONE immutable segment, named by its epoch
    id — so a foreachBatch replay after failure rewrites the SAME
    segment directory (and skips it outright once complete), turning
    the sink's at-least-once delivery into exactly-once index contents.
    Serving (:func:`bm25_topk_segmented`) sees each segment the instant
    its scalars marker lands; readers never block on the writer.

    This is the streaming face of :func:`append_segment`, exactly as
    ``streaming_exact_dedup`` is the streaming face of the batch dedup
    family — same engine, same relations, provably the same results
    (q106 shares the full-corpus q102 oracle).

    ``max_segments`` (round 10) wires the compaction policy INTO the
    sink: after each append, :func:`maybe_compact` runs under the
    given bound, so the per-query segment fan-out stays bounded under
    indefinite ingest with no external orchestration. Exactly-once
    survives the swap because compaction records the epoch segments it
    folded in (``absorbed.json``) and a replayed epoch treats an
    absorbed segment as complete. Left None, compaction cadence stays
    the caller's knob (micro-batch-per-segment = flattest ingest
    latency)."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.limit(1).count() == 0:
            return
        append_segment(
            batch_df,
            path,
            text_col,
            id_col,
            name=f"seg_s{epoch_id:09d}",
            skip_if_complete=True,
        )
        if max_segments is not None:
            maybe_compact(batch_df.sparkSession, path, max_segments)

    writer = (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .queryName("segment_ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ensure_segmented_index(
    spark,
    sf_dir: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Build-once fixture contract for the registered queries: the
    segmented index lives under the session warehouse as
    ``seglex_{table}_{sfdir}``, built as an 80/20 split — seg_00000
    from ``doc_id % 5 != 0``, then the remaining fifth APPENDED as
    seg_00001 — so serving exercises real multi-segment merge while the
    union is exactly the full table (q102's oracle applies verbatim).
    Rebuilt when the marker is missing, the recorded source mtime
    differs, or the recorded layout format differs (sidecar contract
    shared with ensure_lexical_index)."""
    from urllib.parse import urlparse

    from plumberapp_spark.session import _path_mtime, load_table

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "spark-warehouse"
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"seglex_{table}_{tag}")
    sidecar = os.path.join(path, "source_mtime.txt")
    source_mtime = _path_mtime(f"{sf_dir}/{table}.parquet")
    recorded, rec_format, rec_nseg = None, None, None
    try:
        with open(sidecar) as fh:
            parts = fh.read().split()
            recorded = float(parts[0])
            rec_format = int(parts[1])
            rec_nseg = int(parts[2])
    except (OSError, ValueError, IndexError):
        recorded = None
    segs = _list_segments(path)
    stale = (
        recorded is None
        or recorded != source_mtime
        or rec_format != SEG_FORMAT
        or rec_nseg != len(segs)
        or len(segs) < 2
    )
    if stale:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        docs = load_table(spark, sf_dir, table)
        build_segmented_index(
            docs.filter(F.col(id_col) % 5 != 0), path, text_col, id_col
        )
        append_segment(docs.filter(F.col(id_col) % 5 == 0), path, text_col, id_col)
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {SEG_FORMAT} {len(_list_segments(path))}")
    return path


def maybe_compact(
    spark,
    path: str,
    max_segments: int = 16,
    swap=None,
) -> str | None:
    """Size-bounded maintenance policy: when the index has accumulated
    more than ``max_segments`` complete segments, compact them into a
    sibling ``<path>.compact`` index and swap it in. Returns the
    retired path when a compaction ran, None otherwise. Keeps the
    per-query fan-out (|segments| × |query buckets| pruned reads)
    bounded no matter how many micro-batch appends arrive; tombstoned
    docs are dropped physically in the process (compact_segments).

    SWAP CONTRACT (VERDICT r9 #7): the default swap is two POSIX
    renames — old index → ``<path>.old.<n>``, compacted → ``path`` —
    which is atomic per-rename on POSIX filesystems but NOT on object
    stores, where "rename" is copy+delete and a reader can observe the
    path missing between the two steps. Deployments on S3/GCS/ABFS
    must pass ``swap(compacted_path, live_path) -> retired_path``
    implementing their store's pointer flip (a manifest/alias update,
    or a versioned-prefix switch); this function then performs NO
    filesystem mutation of its own. The caller (either way) removes
    the retired copy once no in-flight readers reference it.

    CRASH SAFETY (ADVICE r10): the default swap records an intent
    marker around its renames; a crash between them is repaired —
    rolled forward — by :func:`_recover_swap` the next time anything
    touches the index, so a restarted streaming sink can no longer
    recreate ``path`` holding only the replayed epoch while the real
    corpus sits in ``.old.N``."""
    segs = _list_segments(path)
    if len(segs) <= max_segments:
        return None
    tmp = f"{path}.compact"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    compact_segments(spark, path, tmp)
    if swap is not None:
        return swap(tmp, path)
    return _swap_compacted(path)


def ensure_streamed_index(
    spark,
    sf_dir: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Streaming-built fixture for the registered query: ingest the
    table through a real ``readStream`` file source + foreachBatch
    segment sink (availableNow — drain everything, then stop), under
    the same sidecar staleness contract as the batch ensure paths. The
    checkpoint lives inside the index dir and is wiped with it: a
    rebuild must re-deliver every file, not trust the dead index's
    progress log."""
    from urllib.parse import urlparse

    from plumberapp_spark.session import _path_mtime, ensure_read_confs

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "spark-warehouse"
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"seglexst_{table}_{tag}")
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
        or rec_format != SEG_FORMAT
        or not _list_segments(path)
    ):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        ensure_read_confs(spark)
        schema = spark.read.parquet(f"{sf_dir}/{table}.parquet").schema
        # FileStreamSource needs a directory base; the glob scopes it to
        # the table's file(s) (the q52 pattern)
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .load(f"{sf_dir}/{table}.*")
        )
        q = streaming_segment_ingest(
            stream, path, os.path.join(path, "_checkpoint"), text_col, id_col
        )
        q.awaitTermination()
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {SEG_FORMAT}")
    return path


def ensure_deleted_segmented_index(
    spark,
    sf_dir: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Fixture for the DELETION queries: the q104 shape (80 % build +
    20 % append, union = the full table) followed by a takedown batch —
    ``delete_docs`` of every ``doc_id % 7 == 3`` — as one tombstone.
    The deleted set cuts across BOTH segments, so serving exercises the
    anti-join, the counted df corrections, and the signed scalars on a
    real multi-segment index; the oracle is the full derivation over
    ``documents WHERE doc_id % 7 != 3``."""
    from urllib.parse import urlparse

    from plumberapp_spark.session import _path_mtime, load_table

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "spark-warehouse"
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"seglexdel_{table}_{tag}")
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
        or rec_format != SEG_FORMAT
        or len(_list_segments(path)) < 2
        or not _list_tombstones(path)
    ):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        docs = load_table(spark, sf_dir, table)
        build_segmented_index(
            docs.filter(F.col(id_col) % 5 != 0), path, text_col, id_col
        )
        append_segment(docs.filter(F.col(id_col) % 5 == 0), path, text_col, id_col)
        delete_docs(
            spark, path, docs.filter(F.col(id_col) % 7 == 3).select(id_col), id_col
        )
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {SEG_FORMAT}")
    return path


def ensure_deleted_compacted_index(
    spark, sf_dir: str, table: str = "documents"
) -> str:
    """Compacted twin of :func:`ensure_deleted_segmented_index` — the
    tombstoned docs are dropped PHYSICALLY, so the compacted index
    serves corpus-minus-deleted with zero correction terms (and the
    registered query's hash proves the physical drop is exact)."""
    from plumberapp_spark.session import _path_mtime

    src = ensure_deleted_segmented_index(spark, sf_dir, table)
    wh = os.path.dirname(src)
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"seglexdelc_{table}_{tag}")
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
        or rec_format != SEG_FORMAT
        or not _list_segments(path)
    ):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        compact_segments(spark, src, path)
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {SEG_FORMAT}")
    return path


def ensure_compacted_index(spark, sf_dir: str, table: str = "documents") -> str:
    """Compacted twin of :func:`ensure_segmented_index`'s fixture:
    compacts the segmented index into ``seglexc_{table}_{sfdir}``,
    keyed on the same source mtime + format so a source change flows
    through both tiers."""
    from plumberapp_spark.session import _path_mtime

    src = ensure_segmented_index(spark, sf_dir, table)
    wh = os.path.dirname(src)
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    path = os.path.join(wh, f"seglexc_{table}_{tag}")
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
        or rec_format != SEG_FORMAT
        or not _list_segments(path)
    ):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        compact_segments(spark, src, path)
        with open(sidecar, "w") as fh:
            fh.write(f"{source_mtime!r} {SEG_FORMAT}")
    return path
