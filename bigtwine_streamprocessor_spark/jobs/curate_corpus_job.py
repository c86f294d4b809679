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
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import corpus_prep, curation, dedup
from ..session import get_spark


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    simhash_max_distance: int = 3,
    lsh_jaccard_threshold: float = 0.5,
) -> tuple[DataFrame, dict]:
    """Run the funnel over ``docs`` (doc_id, text, lang, source, n_chars).

    Returns (curated DataFrame ready to write, funnel counts dict). The
    funnel dict is driver-side scalars only — one count per stage.
    """
    funnel: dict[str, int] = {"input": docs.count()}

    # Each funnel count is a natural materialization point, and every stage
    # below consumes its predecessor 2-4 times (the count + an anti join +
    # pair generation, or the final 4-way pack/shuffle/bucket join), so
    # without persist points the lazy chain recomputes quality -> PII ->
    # ... from the scan at EVERY stage — O(stages^2) total work at sf10+.
    # The persist-then-count below caches each stage on its first full pass
    # and drops the predecessor's cache as soon as the successor is fully
    # materialized, keeping at most one stage's rows cached at a time.
    _stale: list[DataFrame] = []

    def _materialize(df: DataFrame, key: str) -> DataFrame:
        df = df.persist()
        funnel[key] = df.count()
        while _stale:
            _stale.pop().unpersist()
        _stale.append(df)
        return df

    # 1. quality gate (map-only; no shuffle)
    quality = curation.gopher_rules(docs).filter("passes").select("doc_id")
    kept = _materialize(docs.join(quality, "doc_id", "left_semi"), "after_quality")

    # 2. PII redaction (map-only; keeps the cleaned text)
    red = curation.redact_pii(kept)
    kept = (
        kept.drop("text")
        .join(red.select("doc_id", "n_redactions", "text_clean"), "doc_id")
        .withColumnRenamed("text_clean", "text")
    ).persist()
    funnel["redactions"] = int(
        kept.agg(F.sum("n_redactions")).collect()[0][0] or 0
    )
    while _stale:  # the sum scanned every partition: cache is full
        _stale.pop().unpersist()
    _stale.append(kept)

    # 3. benchmark decontamination (broadcast gram semijoin -> anti join)
    if benchmark is not None:
        flagged = curation.decontaminate(kept, benchmark).select("doc_id")
        kept = kept.join(flagged, "doc_id", "left_anti")
    kept = _materialize(kept, "after_decontaminate")

    # 4. exact dedup (digest-only shuffle)
    kept = _materialize(dedup.dedup_exact(kept), "after_exact_dedup")

    # 5. fuzzy dedup: MinHash banded LSH -> exact Jaccard on candidate pairs
    # only (never all-pairs) -> components -> keep min doc_id per cluster
    lsh_pairs = dedup.ngram_jaccard_pairs(kept, lsh_jaccard_threshold)
    lsh_cc = dedup.connected_components(lsh_pairs.select("doc_a", "doc_b"))
    lsh_drop = lsh_cc.filter(
        F.col("cluster_id") != F.col("doc_id")
    ).select("doc_id")
    kept = _materialize(kept.join(lsh_drop, "doc_id", "left_anti"), "after_lsh_dedup")

    # 6. near dedup: SimHash banded-Hamming pairs over the LSH survivors ->
    # components -> keep min (catches small-edit near-dups below the shingle
    # Jaccard threshold)
    pairs = dedup.simhash_pairs(kept, hamming_t=simhash_max_distance)
    cc = dedup.connected_components(pairs.select("doc_a", "doc_b"))
    drop = cc.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id")
    kept = _materialize(kept.join(drop, "doc_id", "left_anti"), "after_near_dedup")

    # 7. paragraph dedup: drop chunks repeated across the surviving docs and
    # keep the reassembled text; docs emptied entirely are boilerplate
    para = corpus_prep.paragraph_dedup(kept)
    kept = _materialize(
        kept.drop("text").join(
            para.filter(F.col("n_kept") > 0).select(
                "doc_id", F.col("text_kept").alias("text")
            ),
            "doc_id",
        ),
        "after_paragraph_dedup",
    )

    # 8. pack + deterministic shuffle order + length-bucket batch layout
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
    args = p.parse_args(argv)

    import time

    spark = get_spark(app_name="curate-corpus")
    docs = spark.read.parquet(args.input_path)
    benchmark = (
        spark.read.parquet(args.benchmark_path) if args.benchmark_path else None
    )
    t0 = time.perf_counter()
    out, funnel = curate(docs, benchmark)
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
