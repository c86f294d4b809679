"""Continuous corpus-ingestion job: O(delta) per-batch curation against the
materialized dedup signature index, exactly-once across replays/restarts."""

import json
import os

import pytest
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.jobs import ingest_corpus_job
from bigtwine_streamprocessor_spark.operators import dedup_index


def _docs(spark, sf_dir, lo, hi):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter((F.col("doc_id") % 7 >= lo) & (F.col("doc_id") % 7 < hi))
    )


def _write_batch_file(df, indir, name):
    os.makedirs(indir, exist_ok=True)
    rows = df.collect()
    with open(os.path.join(indir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")
    return len(rows)


def test_ingest_batches_dedup_against_accumulated_corpus(
    spark, sf_dir, tmp_path
):
    """Three arriving batches: batch 2 repeats batch 1's docs verbatim
    (exact dups vs corpus), batch 3 repeats them with a two-token suffix
    (near dups vs corpus) plus genuinely new docs. The curated corpus must
    keep each document exactly once, and the ledger must account for every
    drop."""
    b1 = _docs(spark, sf_dir, 0, 2).persist()
    fresh = _docs(spark, sf_dir, 2, 3)
    # near-dup seeds come from LONG docs only: on a short text a two-token
    # suffix legitimately drops true Jaccard below the 0.5 sketch threshold
    # (the K=12 estimate tracks it), so short seeds may rightfully survive
    near = (
        b1.filter(F.col("n_chars") > 300)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" trailing tokens")))
    )
    indir = tmp_path / "in"
    _write_batch_file(b1, str(indir), "b1.json")
    _write_batch_file(
        b1.withColumn("doc_id", F.col("doc_id") + F.lit(20_000_000)),
        str(indir),
        "b2.json",
    )
    _write_batch_file(near.unionByName(fresh), str(indir), "b3.json")

    out = str(tmp_path / "out")
    q = ingest_corpus_job.start_ingest(
        spark, str(indir), out, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    ledger = ingest_corpus_job.read_ledger(os.path.join(out, "ledger"))
    nonempty = [b for b in ledger if b["input"] > 0]
    assert len(nonempty) == 3
    total_written = sum(b["written"] for b in nonempty)
    corpus = ingest_corpus_job.read_corpus(spark, os.path.join(out, "corpus"))
    assert corpus.count() == total_written

    # batch 2 was verbatim copies of batch 1: every quality survivor must
    # drop as an exact dup vs the corpus
    b2 = next(b for b in nonempty if b["epoch"] == 1)
    assert b2["written"] == 0
    assert b2["dropped_exact_vs_corpus"] == b2["after_quality_and_batch_dedup"]

    # batch 3's near copies drop as near dups; the fresh docs survive
    b3 = next(b for b in nonempty if b["epoch"] == 2)
    assert b3["dropped_near_vs_corpus"] > 0
    assert b3["written"] > 0
    assert corpus.filter(F.col("doc_id") >= 10_000_000).count() == 0

    # no text duplicated anywhere in the accumulated corpus
    assert (
        corpus.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    )
    # index state covers exactly the corpus
    stats = dedup_index.dedup_index_stats(spark, os.path.join(out, "dedup_index"))
    assert stats["n_docs"] == corpus.count()
    b1.unpersist()


def test_ingest_batch_replay_is_exactly_once(spark, sf_dir, tmp_path):
    """The two replay classes a restart produces:

    * committed epoch (marker present) — short-circuits, no state change;
    * partially-committed epoch (index appended, corpus written, marker
      missing) — recomputes IDENTICALLY: scan_delta excludes the epoch's
      own index subdir, so the batch's own appended signatures can't flag
      its survivors as duplicates of themselves."""
    docs = _docs(spark, sf_dir, 0, 2)
    out = str(tmp_path / "out")
    corpus_dir, index_dir, ledger_dir = (
        os.path.join(out, d) for d in ("corpus", "dedup_index", "ledger")
    )

    c0 = ingest_corpus_job.ingest_batch(
        docs, 0, corpus_dir, index_dir, ledger_dir
    )
    assert c0["written"] > 0
    # committed replay: no-op
    assert (
        ingest_corpus_job.ingest_batch(docs, 0, corpus_dir, index_dir, ledger_dir)
        is None
    )

    # epoch 1: new docs; simulate a crash AFTER the index/corpus writes by
    # running it fully, then deleting only the ledger marker
    docs1 = _docs(spark, sf_dir, 2, 3)
    c1 = ingest_corpus_job.ingest_batch(
        docs1, 1, corpus_dir, index_dir, ledger_dir
    )
    assert c1["written"] > 0
    os.remove(os.path.join(ledger_dir, "batch-e000001.json"))
    c1b = ingest_corpus_job.ingest_batch(
        docs1, 1, corpus_dir, index_dir, ledger_dir
    )
    assert c1b is not None, "uncommitted epoch must recompute"
    assert c1b["written"] == c1["written"], (
        "replay after partial commit must not drop survivors against "
        "their own appended signatures"
    )
    assert c1b.get("dropped_exact_vs_corpus", 0) == c1.get(
        "dropped_exact_vs_corpus", 0
    )
    corpus = ingest_corpus_job.read_corpus(spark, corpus_dir)
    assert corpus.count() == c0["written"] + c1["written"]
    assert corpus.select("doc_id").distinct().count() == corpus.count()
    stats = dedup_index.dedup_index_stats(spark, index_dir)
    assert stats["n_docs"] == corpus.count()


def test_ingest_restart_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Stop the ingester, add more arriving files, restart with the same
    out_root: the checkpoint resumes the feed, committed epochs replay as
    no-ops, and the corpus ends exactly-once."""
    b1 = _docs(spark, sf_dir, 0, 2)
    indir = tmp_path / "in"
    _write_batch_file(b1, str(indir), "b1.json")
    out = str(tmp_path / "out")

    q = ingest_corpus_job.start_ingest(
        spark, str(indir), out, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = ingest_corpus_job.read_corpus(spark, os.path.join(out, "corpus")).count()
    assert first > 0

    # second life: one duplicate file (all drops) + one fresh file
    _write_batch_file(
        b1.withColumn("doc_id", F.col("doc_id") + F.lit(30_000_000)),
        str(indir),
        "b2.json",
    )
    fresh = _docs(spark, sf_dir, 2, 3)
    _write_batch_file(fresh, str(indir), "b3.json")
    q = ingest_corpus_job.start_ingest(
        spark, str(indir), out, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    corpus = ingest_corpus_job.read_corpus(spark, os.path.join(out, "corpus"))
    assert corpus.filter(F.col("doc_id") >= 30_000_000).count() == 0
    assert (
        corpus.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    )
    ledger = ingest_corpus_job.read_ledger(os.path.join(out, "ledger"))
    assert sum(b["written"] for b in ledger) == corpus.count()


def test_near_within_flags_lower_id_survivor(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir, 0, 1).limit(20)
    near = docs.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    both = docs.unionByName(near)
    flagged = dedup_index.near_within(both).collect()
    assert flagged, "identical texts must flag as intra-batch near dups"
    for r in flagged:
        assert r["doc_id"] >= 1_000_000, "lower doc_id must survive"
        assert r["match_id"] == r["doc_id"] - 1_000_000
        assert r["score"] == 1.0


def test_ingest_scan_plans_are_scale_safe(spark, sf_dir, tmp_path):
    """Plan audit for the per-batch path: no cartesian product, no
    row-at-a-time Python, and the DELTA side broadcasts into the index
    joins (the index side must never shuffle — it is the 100 TB side)."""
    docs = _docs(spark, sf_dir, 0, 2)
    idx = str(tmp_path / "idx")
    dedup_index.build_dedup_index(docs, idx)
    delta = _docs(spark, sf_dir, 2, 3).limit(50)

    for name, df in (
        ("scan_delta", dedup_index.scan_delta(delta, idx)),
        ("near_within", dedup_index.near_within(delta)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
    scan_plan = (
        dedup_index.scan_delta(delta, idx)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in scan_plan, (
        "index probes must broadcast the delta side"
    )


def test_compact_corpus_flattens_epoch_deltas(spark, sf_dir, tmp_path):
    """Compaction rewrites the epoch-subdir corpus into fewer
    source-clustered files with identical rows; a later batch still
    dedupes against it (the index is untouched)."""
    out = str(tmp_path / "out")
    corpus_dir, index_dir, ledger_dir = (
        os.path.join(out, d) for d in ("corpus", "dedup_index", "ledger")
    )
    ingest_corpus_job.ingest_batch(
        _docs(spark, sf_dir, 0, 2), 0, corpus_dir, index_dir, ledger_dir
    )
    ingest_corpus_job.ingest_batch(
        _docs(spark, sf_dir, 2, 3), 1, corpus_dir, index_dir, ledger_dir
    )
    before = ingest_corpus_job.read_corpus(spark, corpus_dir)
    rows_before = sorted(r["doc_id"] for r in before.select("doc_id").collect())

    report = ingest_corpus_job.compact_corpus(spark, corpus_dir)
    assert report["rows"] == len(rows_before)
    assert report["files_after"] < report["files_before"]
    after = ingest_corpus_job.read_corpus(spark, corpus_dir)
    assert (
        sorted(r["doc_id"] for r in after.select("doc_id").collect())
        == rows_before
    )

    # a verbatim replay batch after compaction still fully dedupes
    dup = _docs(spark, sf_dir, 0, 2).withColumn(
        "doc_id", F.col("doc_id") + F.lit(40_000_000)
    )
    c2 = ingest_corpus_job.ingest_batch(
        dup, 2, corpus_dir, index_dir, ledger_dir
    )
    assert c2["written"] == 0
    assert c2["dropped_exact_vs_corpus"] == c2["after_quality_and_batch_dedup"]


def test_ingest_bootstrap_epoch_replay_does_not_duplicate_index(
    spark, sf_dir, tmp_path
):
    """The very first batch bootstraps the index; a partial-commit replay
    of THAT epoch (marker deleted, meta sidecar present) must not
    re-append the survivors' signatures — the empty-index bootstrap puts
    even epoch 0 on the idempotent subdir path."""
    docs = _docs(spark, sf_dir, 0, 2)
    out = str(tmp_path / "out")
    corpus_dir, index_dir, ledger_dir = (
        os.path.join(out, d) for d in ("corpus", "dedup_index", "ledger")
    )
    c0 = ingest_corpus_job.ingest_batch(
        docs, 0, corpus_dir, index_dir, ledger_dir
    )
    assert c0["written"] > 0
    os.remove(os.path.join(ledger_dir, "batch-e000000.json"))
    c0b = ingest_corpus_job.ingest_batch(
        docs, 0, corpus_dir, index_dir, ledger_dir
    )
    assert c0b["written"] == c0["written"]
    stats = dedup_index.dedup_index_stats(spark, index_dir)
    assert stats["n_docs"] == c0["written"], (
        "bootstrap replay duplicated index signature rows"
    )
    idx = dedup_index.read_dedup_index(spark, index_dir)
    assert idx["digests"].count() == idx["digests"].distinct().count()


def test_ingest_compact_refuses_uncommitted_epochs(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    corpus_dir, index_dir, ledger_dir = (
        os.path.join(out, d) for d in ("corpus", "dedup_index", "ledger")
    )
    ingest_corpus_job.ingest_batch(
        _docs(spark, sf_dir, 0, 2), 0, corpus_dir, index_dir, ledger_dir
    )
    os.remove(os.path.join(ledger_dir, "batch-e000000.json"))
    assert ingest_corpus_job.uncommitted_epochs(out) == [0]
    with pytest.raises(SystemExit, match="refusing to compact"):
        ingest_corpus_job.run(["--op", "compact", "--out-root", out])
    # committed again -> compaction proceeds
    ingest_corpus_job.ingest_batch(
        _docs(spark, sf_dir, 0, 2), 0, corpus_dir, index_dir, ledger_dir
    )
    assert ingest_corpus_job.uncommitted_epochs(out) == []
    rep = ingest_corpus_job.run(["--op", "compact", "--out-root", out])
    assert rep["corpus"]["rows"] > 0


def test_composed_lifecycle_matches_batch_funnel(spark, sf_dir, tmp_path):
    """r8 verdict task 6 (pinned at test scale; the sf10 run is in
    PERF.md): the full lifecycle — N ingest epochs -> compact corpus +
    index -> batch funnel over the accumulated corpus (resumable workdir)
    — must produce funnel counts and an output row set IDENTICAL to a
    from-scratch batch curate over the same surviving docs (no workdir,
    no compaction). Compaction is pure re-layout and the stage
    checkpoints are pure persistence, so any divergence is a bug in one
    of them."""
    from bigtwine_streamprocessor_spark.jobs import curate_corpus_job
    from bigtwine_streamprocessor_spark.operators import (
        dedup_index as dedup_index_mod,
    )

    out = str(tmp_path / "out")
    corpus_dir, index_dir, ledger_dir = (
        os.path.join(out, d) for d in ("corpus", "dedup_index", "ledger")
    )
    # three epochs with a dup mix so the ingest-side funnel is non-vacuous
    b1 = _docs(spark, sf_dir, 0, 3)
    ingest_corpus_job.ingest_batch(b1, 0, corpus_dir, index_dir, ledger_dir)
    ingest_corpus_job.ingest_batch(
        b1.withColumn("doc_id", F.col("doc_id") + F.lit(30_000_000)),
        1,
        corpus_dir,
        index_dir,
        ledger_dir,
    )
    ingest_corpus_job.ingest_batch(
        _docs(spark, sf_dir, 3, 7), 2, corpus_dir, index_dir, ledger_dir
    )

    assert ingest_corpus_job.uncommitted_epochs(out) == []
    ingest_corpus_job.compact_corpus(spark, corpus_dir)
    dedup_index_mod.compact_dedup_index(spark, index_dir)

    accumulated = ingest_corpus_job.read_corpus(spark, corpus_dir)
    out_a, funnel_a = curate_corpus_job.curate(
        accumulated, workdir=str(tmp_path / "wd")
    )
    rows_a = sorted(r["doc_id"] for r in out_a.select("doc_id").collect())

    out_b, funnel_b = curate_corpus_job.curate(accumulated)
    rows_b = sorted(r["doc_id"] for r in out_b.select("doc_id").collect())

    assert rows_a == rows_b and len(rows_a) > 0
    drop = {"wall_s", "written"}
    assert {k: v for k, v in funnel_a.items() if k not in drop} == {
        k: v for k, v in funnel_b.items() if k not in drop
    }
    spark.catalog.clearCache()
