"""End-to-end training-corpus curation job.

The composition a 100 TB data pipeline actually runs between raw corpus and
tokenizer, chaining the curation operators (`operators/curation.py`,
`operators/dedup.py`, `operators/similarity.py`) in their production order:

    1. quality gate   — Gopher-style composite rules (map-only scan)
    2. PII redaction  — regex scrub, redaction counts kept as metadata
    3. decontaminate  — drop docs sharing n-grams with the benchmark/eval set
    4. exact dedup    — keep min doc_id per byte-identical text hash
    5. fuzzy dedup    — MinHash banded LSH candidates -> exact n-gram
                        Jaccard on candidates only -> connected components
                        -> keep one representative per cluster
    6. near dedup     — SimHash banded Hamming pairs over the survivors
                        (catches small edits the shingle Jaccard threshold
                        lets through) -> components -> keep representative
    7. paragraph dedup — strip chunks repeated ACROSS the surviving docs
                        (CCNet-style boilerplate removal; docs emptied by it
                        are dropped); placed after doc-level dedup so each
                        stage catches its own duplicate class
    8. pack + shuffle — 512-token block assignment, seeded global order,
                        plus power-of-two length-bucket batch assignment
    9. write          — parquet partitioned by source (partition pruning at
                        read time), plus a one-row JSON funnel report

Stage order matters at scale: the cheap map-only gates run FIRST so every
shuffle-bearing stage (dedup, packing) sees only surviving rows. Each stage
is also exposed separately in the registry with its own oracle; this job is
the glue + the funnel accounting.

**Resumability** (``--workdir``): at 100 TB each funnel stage is hours of
cluster time, and a driver crash at stage 6 must not restart the pipeline
from the raw scan. With a workdir every stage's surviving frame is
checkpointed to parquet with a chained JSON marker (stage row count, the
parent stage's row count, and the funnel config); a rerun walks the chain
and resumes at the first stage whose marker is missing or whose parent
rows / config no longer match — everything upstream loads from parquet,
everything downstream recomputes and overwrites. The markers make a stale
resume structurally impossible: changing the input, the benchmark set, or
a threshold breaks the chain at the first affected stage. The parquet
checkpoints double as the persist points (replacing the in-memory
persist-then-count), which is also the right call at scale — a multi-TB
stage does not fit in executor memory, and each stage is consumed 2-4
times downstream.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import corpus_prep, curation, dedup
from ..session import get_spark


def _fingerprint(df: DataFrame) -> dict:
    """Order-independent content fingerprint: (row count, sum of per-row
    xxhash64 over doc_id+text). One map-only scan + scalar agg."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal sum: exact, order-independent, and immune to the ANSI
        # long-overflow a bigint sum of 64-bit hashes hits immediately
        F.sum(F.xxhash64("doc_id", "text").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return {"n": int(row["n"] or 0), "h": str(row["h"] or 0)}


class _StageStore:
    """Parquet checkpoints + chained markers for funnel stages (see module
    docstring). Local paths only in this sandbox; on a cluster the workdir
    is any Hadoop-FS URI the driver can also reach for the JSON markers."""

    def __init__(self, workdir: str, config: dict):
        self.dir = workdir
        self.config = config
        os.makedirs(workdir, exist_ok=True)

    def _marker(self, name: str) -> str:
        return os.path.join(self.dir, f"stage_{name}.json")

    def _data(self, name: str) -> str:
        return os.path.join(self.dir, f"stage_{name}.parquet")

    def valid_meta(self, name: str, parent_rows: int) -> dict | None:
        """The stage's marker, iff it chains onto the parent's observed row
        count and was produced under the same funnel config."""
        path = self._marker(name)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            meta = json.load(f)
        if meta.get("parent_rows") != parent_rows:
            return None
        if meta.get("config") != self.config:
            return None
        return meta

    def load(self, spark, name: str) -> DataFrame:
        return spark.read.parquet(self._data(name))

    def checkpoint(self, df: DataFrame, name: str) -> tuple[DataFrame, int]:
        """Write the stage data; returns (parquet-backed frame, row count).
        No marker yet — ``stamp`` lands it atomically once the stage's
        funnel counts are final, so a crash anywhere in between leaves a
        marker-less stage that simply recomputes, never a torn resume."""
        df.write.mode("overwrite").parquet(self._data(name))
        loaded = df.sparkSession.read.parquet(self._data(name))
        return loaded, loaded.count()

    def stamp(
        self, name: str, rows: int, parent_rows: int, counts: dict
    ) -> None:
        meta = {
            "stage": name,
            "rows": rows,
            "parent_rows": parent_rows,
            "counts": counts,
            "config": self.config,
        }
        tmp = self._marker(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(tmp, self._marker(name))


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    simhash_max_distance: int = 3,
    lsh_jaccard_threshold: float = 0.5,
    workdir: str | None = None,
) -> tuple[DataFrame, dict]:
    """Run the funnel over ``docs`` (doc_id, text, lang, source, n_chars).

    Returns (curated DataFrame ready to write, funnel counts dict). The
    funnel dict is driver-side scalars only — one count per stage. With
    ``workdir``, stages checkpoint to parquet and a rerun resumes from the
    first invalid stage (see module docstring).
    """
    spark = docs.sparkSession
    if workdir:
        # CONTENT fingerprints anchor the resume chain: a changed input or
        # a different benchmark set must invalidate every marker, even at
        # an identical row count (row counts alone let a same-sized
        # replacement resume stale decontamination). One map-only agg per
        # frame — cheap next to any funnel stage.
        in_fp = _fingerprint(docs)
        funnel: dict[str, int] = {"input": in_fp["n"]}
        store = _StageStore(
            workdir,
            {
                "input_fp": in_fp,
                "benchmark_fp": (
                    _fingerprint(benchmark) if benchmark is not None else None
                ),
                "simhash_max_distance": simhash_max_distance,
                "lsh_jaccard_threshold": lsh_jaccard_threshold,
            },
        )
    else:
        funnel = {"input": docs.count()}
        store = None
    resuming = store is not None  # flips off at the first invalid marker
    prev_rows = funnel["input"]

    # Without a workdir, each funnel count is an in-memory materialization
    # point: every stage below consumes its predecessor 2-4 times (count +
    # anti join + pair generation, or the final 4-way pack/shuffle/bucket
    # join), so without persist points the lazy chain recomputes quality ->
    # PII -> ... from the scan at EVERY stage — O(stages^2) total work at
    # sf10+. The persist-then-count caches each stage on its first full
    # pass and drops the predecessor's cache once the successor is fully
    # materialized, keeping at most one stage's rows cached at a time.
    # With a workdir, the parquet checkpoint IS the materialization point.
    _stale: list[DataFrame] = []

    def _stage(name: str, build, extra_counts=None) -> DataFrame:
        """Materialize one funnel stage.

        ``build``: () -> DataFrame, lazy so a resumed stage never
        constructs its plan. ``extra_counts``: (materialized df) -> dict of
        additional funnel scalars (computed once, stored in the marker).
        """
        nonlocal resuming, prev_rows
        if store is not None:
            if resuming:
                meta = store.valid_meta(name, prev_rows)
                if meta is not None:
                    funnel.update(meta["counts"])
                    prev_rows = meta["rows"]
                    return store.load(spark, name)
                resuming = False  # first broken link: recompute from here on
            loaded, rows = store.checkpoint(build(), name)
            counts: dict = {name: rows}
            if extra_counts is not None:
                counts.update(extra_counts(loaded))
            store.stamp(name, rows, prev_rows, counts)
            funnel.update(counts)
            prev_rows = rows
            return loaded
        df = build()
        if _stale and df is _stale[-1]:
            # passthrough stage (e.g. decontaminate with no benchmark):
            # build() returned the predecessor itself. persist() would be a
            # no-op on the already-cached plan and the unpersist below
            # would then EVICT it — forcing the next stage to recompute
            # the whole chain from the scan. Count against the live cache
            # and leave it in place.
            funnel[name] = df.count()
            if extra_counts is not None:
                funnel.update(extra_counts(df))
            return df
        df = df.persist()
        funnel[name] = df.count()
        if extra_counts is not None:
            funnel.update(extra_counts(df))
        while _stale:
            _stale.pop().unpersist()
        _stale.append(df)
        return df

    # 1. quality gate (map-only; no shuffle)
    kept = _stage(
        "after_quality",
        lambda: docs.join(
            curation.gopher_rules(docs).filter("passes").select("doc_id"),
            "doc_id",
            "left_semi",
        ),
    )

    # 2. PII redaction (map-only; keeps the cleaned text)
    def _build_pii(kept=kept):
        red = curation.redact_pii(kept)
        return (
            kept.drop("text")
            .join(red.select("doc_id", "n_redactions", "text_clean"), "doc_id")
            .withColumnRenamed("text_clean", "text")
        )

    kept = _stage(
        "after_pii",
        _build_pii,
        extra_counts=lambda df: {
            "redactions": int(df.agg(F.sum("n_redactions")).collect()[0][0] or 0)
        },
    )

    # 3. benchmark decontamination (broadcast gram semijoin -> anti join)
    def _build_decontaminate(kept=kept):
        if benchmark is None:
            return kept
        flagged = curation.decontaminate(kept, benchmark).select("doc_id")
        return kept.join(flagged, "doc_id", "left_anti")

    kept = _stage("after_decontaminate", _build_decontaminate)

    # 4. exact dedup (digest-only shuffle)
    kept = _stage("after_exact_dedup", lambda kept=kept: dedup.dedup_exact(kept))

    # 5. fuzzy dedup: MinHash banded LSH -> exact Jaccard on candidate pairs
    # only (never all-pairs) -> components -> keep min doc_id per cluster
    def _build_lsh(kept=kept):
        lsh_pairs = dedup.ngram_jaccard_pairs(kept, lsh_jaccard_threshold)
        lsh_cc = dedup.connected_components(lsh_pairs.select("doc_a", "doc_b"))
        lsh_drop = lsh_cc.filter(
            F.col("cluster_id") != F.col("doc_id")
        ).select("doc_id")
        return kept.join(lsh_drop, "doc_id", "left_anti")

    kept = _stage("after_lsh_dedup", _build_lsh)

    # 6. near dedup: SimHash banded-Hamming pairs over the LSH survivors ->
    # components -> keep min (catches small-edit near-dups below the shingle
    # Jaccard threshold)
    def _build_near(kept=kept):
        pairs = dedup.simhash_pairs(kept, hamming_t=simhash_max_distance)
        cc = dedup.connected_components(pairs.select("doc_a", "doc_b"))
        drop = cc.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id")
        return kept.join(drop, "doc_id", "left_anti")

    kept = _stage("after_near_dedup", _build_near)

    # 7. paragraph dedup: drop chunks repeated across the surviving docs and
    # keep the reassembled text; docs emptied entirely are boilerplate
    def _build_para(kept=kept):
        para = corpus_prep.paragraph_dedup(kept)
        return kept.drop("text").join(
            para.filter(F.col("n_kept") > 0).select(
                "doc_id", F.col("text_kept").alias("text")
            ),
            "doc_id",
        )

    kept = _stage("after_paragraph_dedup", _build_para)

    # 8. pack + deterministic shuffle order + length-bucket batch layout
    # (derived from the stage-7 frame; not checkpointed — the output write
    # is this stage's materialization, and a crash here resumes from 7)
    packed = curation.pack_sequences(kept).select(
        "doc_id", "n_tokens", "block_id", "block_offset"
    )
    order = curation.global_shuffle(kept)
    buckets = corpus_prep.bucket_by_length(kept).select(
        "doc_id", "bucket", "batch_id"
    )
    out = (
        kept.join(packed, "doc_id")
        .join(order, "doc_id")
        .join(buckets, "doc_id")
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            "n_tokens",
            "n_redactions",
            "block_id",
            "block_offset",
            "bucket",
            "batch_id",
            "shuffle_pos",
        )
    )
    return out, funnel


def run(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="curate-corpus-job")
    p.add_argument("--input-path", required=True, help="documents parquet")
    p.add_argument("--benchmark-path", help="eval-set parquet (doc_id, text)")
    p.add_argument("--output-path", required=True)
    p.add_argument("--report-path")
    p.add_argument(
        "--workdir",
        help="stage-checkpoint dir: every funnel stage lands here as "
        "parquet + a chained marker, and a rerun resumes from the first "
        "invalid stage instead of the raw scan",
    )
    args = p.parse_args(argv)

    import time

    spark = get_spark(app_name="curate-corpus")
    docs = spark.read.parquet(args.input_path)
    benchmark = (
        spark.read.parquet(args.benchmark_path) if args.benchmark_path else None
    )
    t0 = time.perf_counter()
    out, funnel = curate(docs, benchmark, workdir=args.workdir)
    # partitioned by source: a reader filtering one source prunes the scan
    out.write.mode("overwrite").partitionBy("source").parquet(args.output_path)
    funnel["written"] = spark.read.parquet(args.output_path).count()
    funnel["wall_s"] = round(time.perf_counter() - t0, 1)
    spark.catalog.clearCache()  # drop the last stage's persisted frame
    report = args.report_path or os.path.join(args.output_path, "_funnel.json")
    with open(report, "w") as f:
        json.dump(funnel, f, indent=2)
    print(json.dumps(funnel))
    return funnel


if __name__ == "__main__":
    run()
