"""Continuous corpus-ingestion job: streaming documents -> curated corpus.

The streaming complement of ``curate_corpus_job`` (which batch-curates a
corpus that already exists): documents ARRIVE continuously, and each
micro-batch must be quality-gated and deduplicated against everything
ingested so far WITHOUT rescanning the corpus — the cost model that holds
at 100 TB, where a batch is ~0.01% of the accumulated corpus. The per-batch
work is O(delta) by construction:

    1. quality gate     — Gopher-style rules on the batch only (map-only)
    2. intra-batch dedup — exact (digest groupBy) + near
                           (``dedup_index.near_within``: band-bucket
                           candidates inside the batch, MinHash-estimate
                           scored, lower doc_id survives)
    3. index scan       — ``dedup_index.scan_delta``: the batch probes the
                           materialized signature index (broadcast delta vs
                           index equi-joins; the index side never shuffles)
    4. index append     — survivors' signatures land under an epoch-keyed
                           subdir (``delta-e<N>`` overwrite = replay-safe)
    5. corpus append    — surviving documents land under the same epoch key
    6. ledger stamp     — per-batch funnel counts as an atomic JSON marker

Exactly-once across restarts, by the same discipline as the topology
transport: every write is an OVERWRITE of an epoch-keyed directory, the
ledger marker lands atomically last, and a replayed epoch (a) short-circuits
on its marker if it committed, or (b) recomputes identically if it did not —
``scan_delta`` excludes the batch's own ``delta-e<N>`` index files, so a
crash after step 4 cannot make the replay see the batch's own signatures
and drop every survivor as its own duplicate. Pinned in
``tests/test_ingest.py`` (replay after partial commit, cross-batch and
intra-batch dedup, restart from checkpoint).

The batch reference engine has no ingestion pipeline (the reference consumes
a finite GridFS dataset, `DatasetStreamProcessor.java`); this is the
training-data-pipeline scale extension built on this repo's dedup index.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation, dedup, dedup_index
from ..session import get_spark

DOCS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT"
)


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The accumulated curated corpus (epoch-keyed subdirs read flat)."""
    return spark.read.option("recursiveFileLookup", "true").parquet(corpus_dir)


def compact_corpus(spark: SparkSession, corpus_dir: str) -> dict:
    """Flatten the epoch-subdir corpus into source-clustered files.

    Thousands of ingest epochs mean thousands of small parquet deltas —
    the classic streaming small-file problem. Staged rewrite-verify-swap
    (same machinery as the index compactions), clustered by ``source`` so
    a source-filtered read prunes row groups. Run only on a QUIESCED
    ingester: committed epochs short-circuit on their ledger markers so
    compaction never changes replay behavior, but an in-flight epoch's
    delta directory would be swept into the rewrite mid-write. At real
    scale this is a transactional table-format rewrite."""
    from ..operators.similarity import _staged_compact

    def write_clustered(src: DataFrame, staging: str) -> None:
        src.repartition(F.col("source")).sortWithinPartitions(
            "source", "doc_id"
        ).write.mode("overwrite").parquet(staging)

    return _staged_compact(
        spark,
        corpus_dir,
        lambda s, pth: s.read.option("recursiveFileLookup", "true").parquet(pth),
        write_clustered,
    )


def uncommitted_epochs(out_root: str) -> list[int]:
    """Epoch numbers with a delta directory (corpus or index) but NO ledger
    marker — i.e. partially-committed epochs a restart would replay.
    Compaction must refuse while any exist: flattening a replayable
    epoch's delta-e<N>/ breaks the replay's own-epoch exclusion AND turns
    its re-append into a duplicate (the subdir it would overwrite is
    gone, the rows are not)."""
    ledger_dir = os.path.join(out_root, "ledger")
    committed: set[int] = set()
    if os.path.isdir(ledger_dir):
        for fn in os.listdir(ledger_dir):
            if fn.startswith("batch-e") and fn.endswith(".json"):
                committed.add(int(fn[len("batch-e"):-len(".json")]))
    found: set[int] = set()
    for sub in (
        "corpus",
        "dedup_index/digests",
        "dedup_index/sigs",
        "dedup_index/bands",
    ):
        d = os.path.join(out_root, sub)
        if os.path.isdir(d):
            for fn in os.listdir(d):
                if fn.startswith("delta-e"):
                    found.add(int(fn[len("delta-e"):]))
    return sorted(found - committed)


def read_ledger(ledger_dir: str) -> list[dict]:
    out = []
    for fn in sorted(os.listdir(ledger_dir)) if os.path.isdir(ledger_dir) else []:
        if fn.startswith("batch-") and fn.endswith(".json"):
            with open(os.path.join(ledger_dir, fn)) as f:
                out.append(json.load(f))
    return out


def ingest_batch(
    batch_df: DataFrame,
    epoch_id: int,
    corpus_dir: str,
    index_dir: str,
    ledger_dir: str,
    threshold: float = dedup_index.NEAR_EST_THRESHOLD,
) -> dict | None:
    """Process one micro-batch (steps 1-6 above). Returns the funnel counts,
    or None for a replay of an already-committed epoch."""
    marker = os.path.join(ledger_dir, f"batch-e{epoch_id:06d}.json")
    if os.path.exists(marker):
        return None  # committed epoch replayed after restart: done already
    os.makedirs(ledger_dir, exist_ok=True)
    subdir = f"delta-e{epoch_id}"
    counts: dict = {"epoch": epoch_id}

    batch_df = batch_df.persist()
    try:
        counts["input"] = batch_df.count()
        if counts["input"] == 0:
            _stamp(marker, counts)
            return counts

        # 1. quality gate (batch-local, map-only)
        kept = batch_df.join(
            curation.gopher_rules(batch_df).filter("passes").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        # 2a. intra-batch exact dedup (keep min doc_id per digest)
        kept = dedup.dedup_exact(kept).persist()
        # ONE signature computation per batch (the dominant O(delta) cost:
        # shingle explode + K-component min-agg); the intra-batch near
        # scan, the index probe, and the index append all reuse these
        # frames (downstream survivors = a doc_id semijoin, never a
        # re-shingle)
        tabs = {
            k: v.persist()
            for k, v in dedup_index.signature_tables(kept).items()
        }
        # 2b. intra-batch near dedup (lower doc_id survives)
        kept = kept.join(
            dedup_index.near_within(kept, threshold, tables=tabs).select(
                "doc_id"
            ),
            "doc_id",
            "left_anti",
        ).persist()
        counts["after_quality_and_batch_dedup"] = kept.count()
        tabs = _filter_tables(tabs, kept)

        # Bootstrap an EMPTY index if none exists, so every batch —
        # including the very first — takes the epoch-subdir append path.
        # (The old shape, build_dedup_index(kept) on batch 0, was not
        # replay-safe: a crash before the ledger stamp left the meta
        # sidecar behind, and the replay then saw have_index=True and
        # re-APPENDED the same survivors under delta-e0/ — permanent
        # duplicate signature rows.)
        if (
            dedup_index.read_index_meta(batch_df.sparkSession, index_dir)
            is None
        ):
            dedup_index.build_dedup_index(kept.limit(0), index_dir)
        # 3. probe the accumulated index; exclude this epoch's own
        # subdir so a replay after a partial commit is identical
        # (delimited: bare "delta-e1" would also exclude delta-e10..)
        flags = dedup_index.scan_delta(
            kept,
            index_dir,
            threshold,
            exclude_file_substr=f"/{subdir}/",
            tables=tabs,
        ).persist()
        by_kind = {
            r["dup_kind"]: r["n"]
            for r in flags.groupBy("dup_kind").agg(
                F.count("*").alias("n")
            ).collect()
        }
        counts["dropped_exact_vs_corpus"] = by_kind.get("exact", 0)
        counts["dropped_near_vs_corpus"] = by_kind.get("near", 0)
        kept = kept.join(
            flags.select("doc_id"), "doc_id", "left_anti"
        ).persist()
        flags.unpersist()
        counts["written"] = kept.count()
        tabs = _filter_tables(tabs, kept)

        # 4./5. epoch-keyed overwrites: replay-idempotent by construction
        dedup_index.append_dedup_index(
            kept, index_dir, subdir=subdir, tables=tabs
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, subdir)
        )
        # 6. marker last: a crash anywhere above leaves a replayable epoch
        _stamp(marker, counts)
        return counts
    finally:
        batch_df.unpersist()
        # scan_delta/near_within persist per-batch signature frames
        # internally; drop ALL cache between batches so a long-running
        # ingester can't accumulate per-epoch cached RDDs (clearCache only
        # costs recompute — never correctness — for any co-resident caller)
        batch_df.sparkSession.catalog.clearCache()


def _filter_tables(tables: dict, kept: DataFrame) -> dict:
    """Signature tables restricted to the surviving docs — a doc_id
    semijoin over the already-computed frames, never a re-shingle."""
    ids = kept.select("doc_id")
    return {k: v.join(ids, "doc_id", "left_semi") for k, v in tables.items()}


def _stamp(marker: str, counts: dict) -> None:
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(counts, f, indent=2)
    os.replace(tmp, marker)


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    out_root: str,
    max_files_per_trigger: int = 8,
    trigger_s: int = 1,
    threshold: float = dedup_index.NEAR_EST_THRESHOLD,
    input_format: str = "json",
):
    """Start the streaming ingester; returns the StreamingQuery.

    Layout under ``out_root``: ``corpus/`` (curated docs), ``dedup_index/``
    (signature index), ``ledger/`` (per-batch funnel), ``_chk/`` (Spark
    checkpoint — offsets + commit log, so a restart resumes the feed)."""
    corpus_dir = os.path.join(out_root, "corpus")
    index_dir = os.path.join(out_root, "dedup_index")
    ledger_dir = os.path.join(out_root, "ledger")
    reader = spark.readStream.schema(DOCS_SCHEMA).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    stream = (
        reader.json(input_dir)
        if input_format == "json"
        else reader.parquet(input_dir)
    )

    def _batch(bdf: DataFrame, epoch_id: int) -> None:
        ingest_batch(
            bdf, epoch_id, corpus_dir, index_dir, ledger_dir, threshold
        )

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", os.path.join(out_root, "_chk"))
        .trigger(processingTime=f"{trigger_s} seconds")
        .start()
    )


def run(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="ingest-corpus-job")
    p.add_argument(
        "--op",
        choices=["ingest", "compact"],
        default="ingest",
        help="ingest = run the streaming ingester; compact = flatten the "
        "corpus epoch deltas + the dedup index (quiesced ingester only)",
    )
    p.add_argument("--input-dir", help="arriving documents (ingest op)")
    p.add_argument("--out-root", required=True)
    p.add_argument("--input-format", choices=["json", "parquet"], default="json")
    p.add_argument("--max-files-per-trigger", type=int, default=8)
    p.add_argument(
        "--run-until-idle",
        action="store_true",
        help="process everything currently in --input-dir, then stop "
        "(bounded-run mode for finite feeds; default runs until killed)",
    )
    args = p.parse_args(argv)

    spark = get_spark(app_name="ingest-corpus")
    if args.op == "compact":
        pending = uncommitted_epochs(args.out_root)
        if pending:
            raise SystemExit(
                f"refusing to compact: epochs {pending} have delta dirs but "
                "no ledger marker (a restart would replay them, and "
                "compaction would turn that replay into duplicate rows). "
                "Resume the ingester to completion first."
            )
        report = {
            "corpus": compact_corpus(spark, os.path.join(args.out_root, "corpus")),
            "dedup_index": dedup_index.compact_dedup_index(
                spark, os.path.join(args.out_root, "dedup_index")
            ),
        }
        print(json.dumps(report))
        return report
    if not args.input_dir:
        p.error("--input-dir is required for --op ingest")
    q = start_ingest(
        spark,
        args.input_dir,
        args.out_root,
        max_files_per_trigger=args.max_files_per_trigger,
        input_format=args.input_format,
    )
    if args.run_until_idle:
        q.processAllAvailable()
        q.stop()
    else:  # pragma: no cover - service mode
        q.awaitTermination()
    ledger = read_ledger(os.path.join(args.out_root, "ledger"))
    totals = {
        "batches": len(ledger),
        "input": sum(b.get("input", 0) for b in ledger),
        "written": sum(b.get("written", 0) for b in ledger),
    }
    print(json.dumps(totals))
    return totals


if __name__ == "__main__":
    run()
