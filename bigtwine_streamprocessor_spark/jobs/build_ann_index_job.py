"""Ingest-time ANN index builder (training-data-pipeline extension).

Writes the query-ready layout for the embedding similarity family so the
per-query fixed costs (LSH plane dots over the full corpus, IVF k-means
training + corpus scoring) are paid ONCE at ingest — the 100 TB-correct
design (PERF.md "ingest-time bucket materialization": 24.9 s -> 0.72 s
warm ANN at 200k vectors / 16 bits).

    python -m bigtwine_streamprocessor_spark.jobs.build_ann_index_job \
        --embeddings-path /root/testdata/sf0.01/embeddings.parquet \
        --output-path /tmp/ann_index --mode lsh --n-bits 16

    # query side:
    #   lsh: similarity.ann_lsh_topk(None, ..., bucketed=read_bucketized(spark, out))
    #   ivf: similarity.ivf_topk(None, ..., index=read_ivf_index(spark, out))

Maintenance verbs for a live index (never rebuild for a delta):

    # daily arrivals -> bucket/cell-assign the DELTA only, append in place
    ... --op append --embeddings-path <delta.parquet> --output-path <index>
    # undo append-driven small-file growth (re-layout only, never rescores)
    ... --op compact --output-path <index>
    # occupancy/skew/file-count health read (the retrain/compact signal)
    ... --op stats --output-path <index>
    # probe quality: recall@k vs exact ground truth on a query sample
    ... --op recall --output-path <index> --k 5 --n-queries 20
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F

from ..operators import similarity
from ..session import get_spark

# The measured serving shape (PERF.md round-10 recall grid, r10 verdict
# task 3 / r11 task 7): ~6 Lloyd iterations on a 1-in-10 hash sample with
# n_cells ~ 2-5x sqrt(n) took recall@5-at-5%-scanned from 0.48 to 0.58 on
# the realistic 200k-vector replica; iteration count, not cell count, was
# the binding constraint. --serving applies these wherever the knob is
# unset so a deployment gets the measured curve without reading PERF.md.
SERVING_ITERS = 6
SERVING_SAMPLE_MOD = 10


def serving_cells(n_vectors: int) -> int:
    """Next power of two >= 2*sqrt(n) — the low end of the measured
    2-5x sqrt(n) band (1024 for the 200k-vector sweep corpus)."""
    import math

    return 2 ** math.ceil(math.log2(max(2.0, 2.0 * math.sqrt(n_vectors))))


def _check_neardup_mode(mode: str, neardup_threshold: float | None) -> None:
    """--neardup-threshold needs the LSH bucket layout (the IVF index has
    no bucket probe). Validated where the index KIND is first resolved —
    run()/start_stream_append — so the CLI fails BEFORE the stream starts
    (the r8 shape validated per-batch inside foreachBatch: the query
    started, created checkpoint/ledger dirs, and only failed on the first
    non-empty batch as a StreamingQueryException)."""
    if neardup_threshold is not None and mode != "lsh":
        raise ValueError(
            "near-dup suppression needs the LSH bucket layout; the IVF "
            "index has no bucket probe"
        )


def append_stream_batch(
    batch_df,
    epoch_id: int,
    index_path: str,
    mode: str,
    ledger_dir: str,
    neardup_threshold: float | None = None,
) -> dict | None:
    """One micro-batch of arriving embeddings -> epoch-keyed index append.

    Exactly-once by the ingest-job discipline: the append is an OVERWRITE
    of ``delta-e<N>/`` (a replayed epoch re-lands on the same directory),
    and the ledger marker lands atomically last (a committed epoch's
    replay short-circuits here). Returns the batch counts, or None for a
    committed-epoch replay."""
    marker = os.path.join(ledger_dir, f"batch-e{epoch_id:06d}.json")
    if os.path.exists(marker):
        return None
    _check_neardup_mode(mode, neardup_threshold)
    os.makedirs(ledger_dir, exist_ok=True)
    counts = {"epoch": epoch_id, "vectors": batch_df.count()}
    if counts["vectors"]:
        subdir = f"delta-e{epoch_id}"
        if neardup_threshold is not None:
            # intra-batch pass FIRST (r8-advisor gap: two near-duplicate
            # vectors arriving in the same micro-batch both survived the
            # index-only probe): bucket self-join within the batch, lower
            # vec_id survives — the same pairing the doc ingester runs
            # (near_within before the index scan). Deterministic under
            # replay: survivors depend only on the batch's content.
            meta = similarity.read_index_meta(batch_df.sparkSession, index_path)
            n_bits = int((meta or {}).get("n_bits", similarity.N_BITS))
            within = similarity.embedding_neardup_pairs(
                batch_df, neardup_threshold, n_bits=n_bits
            )
            batch_df = batch_df.join(
                within.select(F.col("doc_b").alias("vec_id")).distinct(),
                "vec_id",
                "left_anti",
            )
            counts["dropped_within_batch"] = counts["vectors"] - batch_df.count()
            # then drop survivors near-duplicating the indexed corpus;
            # exclude this epoch's own subdir so a partial-commit replay
            # re-lands identically (same rule as the doc ingester)
            flags = similarity.scan_delta_neardup(
                batch_df,
                index_path,
                threshold=neardup_threshold,
                exclude_file_substr=f"/{subdir}/",
            )
            batch_df = batch_df.join(
                flags.select("vec_id"), "vec_id", "left_anti"
            )
            counts["appended"] = batch_df.count()
            counts["dropped_neardup"] = (
                counts["vectors"]
                - counts["dropped_within_batch"]
                - counts["appended"]
            )
        if mode == "lsh":
            similarity.append_to_bucketized(
                batch_df, index_path, subdir=subdir
            )
        else:
            similarity.append_to_ivf_index(batch_df, index_path, subdir=subdir)
        if neardup_threshold is not None:
            # embedding_neardup_pairs persists its bucketed frame for the
            # multi-action pairing; a continuously-running stream (1 s
            # triggers) would otherwise accumulate one cached DataFrame per
            # non-empty epoch. All of this batch's actions are done — drop
            # the whole cache, mirroring ingest_corpus_job's per-batch
            # discipline.
            batch_df.sparkSession.catalog.clearCache()
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(counts, f)
    os.replace(tmp, marker)
    return counts


def start_stream_append(
    spark,
    input_dir: str,
    index_path: str,
    stream_root: str,
    mode: str = "lsh",
    max_files_per_trigger: int = 8,
    trigger_s: int = 1,
    neardup_threshold: float | None = None,
):
    """Maintain a live ANN index from continuously-arriving embedding
    parquet files (the streaming twin of ``--op append``). The index must
    already exist (its sidecar pins plane count / frozen centroids);
    ``stream_root`` holds the Spark checkpoint and the batch ledger —
    OUTSIDE the index dir, so compaction (which rewrites the index dir
    wholesale) can never destroy replay protection."""
    _check_neardup_mode(mode, neardup_threshold)  # fail before the stream starts
    # recursive: arrivals are often parquet DIRECTORIES (a writer's output
    # dir per delivery), not bare files
    schema = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(input_dir)
        .schema
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    ledger_dir = os.path.join(stream_root, "ledger")

    def _batch(bdf, epoch_id: int) -> None:
        append_stream_batch(
            bdf, epoch_id, index_path, mode, ledger_dir, neardup_threshold
        )

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", os.path.join(stream_root, "_chk"))
        .trigger(processingTime=f"{trigger_s} seconds")
        .start()
    )


def run(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="build-ann-index-job")
    p.add_argument(
        "--embeddings-path",
        default=None,
        help="corpus (build) or delta (append); unused by compact/stats",
    )
    p.add_argument("--output-path", required=True)
    p.add_argument("--mode", choices=["lsh", "ivf"], default="lsh")
    p.add_argument(
        "--op",
        choices=[
            "build",
            "append",
            "compact",
            "stats",
            "drift",
            "retrain",
            "recall",
            "stream",
        ],
        default="build",
        help="build a fresh index, append a delta to one, compact a "
        "layout's files, report occupancy stats, report per-epoch "
        "quantizer-fit drift (ivf), recluster a drifted quantizer in "
        "place (ivf; staged rebuild-verify-swap), measure probe "
        "recall@k against exact ground truth on a query sample, or "
        "stream-append continuously-arriving embedding files "
        "(exactly-once epoch-keyed appends; see --input-dir/--stream-root)",
    )
    p.add_argument(
        "--sample-mod",
        type=int,
        default=None,
        help="retrain/build: train centroids on a deterministic 1-in-N "
        "hash sample of the corpus (default 1 = full corpus, or "
        f"{SERVING_SAMPLE_MOD} under --serving; at scale Lloyd should "
        "never scan everything)",
    )
    p.add_argument(
        "--input-dir", help="stream op: dir where embedding parquet arrives"
    )
    p.add_argument(
        "--stream-root",
        help="stream op: checkpoint + ledger dir (outside the index)",
    )
    p.add_argument(
        "--run-until-idle",
        action="store_true",
        help="stream op: process everything currently arrived, then stop",
    )
    p.add_argument(
        "--neardup-threshold",
        type=float,
        default=None,
        help="stream op, lsh only: drop arrivals whose cosine vs an indexed "
        "vector meets this threshold (near-dup suppression at ingest)",
    )
    p.add_argument("--k", type=int, default=5, help="recall: neighbors per query")
    p.add_argument(
        "--probe-radius",
        type=int,
        default=similarity.PROBE_RADIUS,
        help="recall, lsh only: Hamming multiprobe radius — the "
        "recall-vs-candidate-volume knob this verb exists to tune",
    )
    p.add_argument(
        "--n-probe",
        type=int,
        default=similarity.IVF_PROBE,
        help="recall, ivf only: cells probed per query — the IVF "
        "recall-vs-candidate-volume knob, like --probe-radius for lsh",
    )
    p.add_argument(
        "--n-queries",
        type=int,
        default=20,
        help="recall: query-sample size (ground truth is a brute-force "
        "scan per query — keep this a sample at scale)",
    )
    p.add_argument(
        "--n-bits",
        type=int,
        default=None,
        help=f"lsh plane count (build default {similarity.N_BITS}; append "
        "defaults to the index sidecar's value)",
    )
    p.add_argument(
        "--n-tables",
        type=int,
        default=None,
        help="lsh: independent OR-amplified plane families (build default 1; "
        "recall defaults to the index sidecar's value — pass MORE than the "
        "sidecar to sweep what an extra materialized table would buy, the "
        "extra tables are derived on the fly)",
    )
    p.add_argument(
        "--n-cells",
        type=int,
        default=None,
        help=f"ivf cell count (build default {similarity.IVF_CELLS}; "
        "retrain defaults to the index sidecar's value)",
    )
    p.add_argument(
        "--n-iters",
        type=int,
        default=None,
        help=f"ivf Lloyd iterations (default {similarity.IVF_ITERS}, or "
        f"{SERVING_ITERS} under --serving)",
    )
    p.add_argument(
        "--serving",
        action="store_true",
        help="ivf build: apply the measured serving shape wherever a knob "
        "is unset — n_cells = next power of 2 >= 2*sqrt(n), n_iters "
        f"{SERVING_ITERS}, centroids trained on a 1-in-{SERVING_SAMPLE_MOD}"
        " hash sample (PERF.md round-10 recall grid: 0.58 recall@5 at "
        "4.98% scanned vs 0.48 for the bare shape). The bare defaults "
        "stay the small oracle-pinned gate shape",
    )
    p.add_argument(
        "--target-recall",
        type=float,
        default=None,
        help="ivf: ask for RECALL, not probes (r11 verdict task 4). On "
        "--op build: measure a recall@k-vs-n_probe curve on a held-out "
        "query sample after the build, store it in _index_meta, and report "
        "the smallest probe budget meeting the target. On --op recall: "
        "resolve --n-probe from the stored curve instead of taking it as "
        "an input",
    )
    p.add_argument(
        "--curve-queries",
        type=int,
        default=64,
        help="--target-recall: held-out query-sample size for the measured "
        "curve (hash-sliced, disjoint from the serving pre-train sample)",
    )
    p.add_argument(
        "--spill",
        type=int,
        default=1,
        help="ivf build: store each vector in its top-N cells (assignment "
        "rank kept as a_rank; queries dedup). N-fold storage/scan for a "
        "measured recall jump per scanned row — the sf10 frontier shape "
        "is 2048 cells / spill 3: recall@5 0.753 at 7.6%% scanned vs "
        "0.747 at 13.0%% single-assigned (PERF.md round-13). append and "
        "retrain inherit the sidecar's value",
    )
    p.add_argument(
        "--n-files",
        type=int,
        default=None,
        help="output file count (default: session shuffle partitions)",
    )
    p.add_argument(
        "--partition-by-bucket",
        action=argparse.BooleanOptionalAction,
        default=False,
        help="lsh mode: write bucket=<id>/ Hive partitions so probe joins "
        "dynamic-partition-prune (the 100 TB layout; flat clustered files "
        "stay the small-corpus default)",
    )
    args = p.parse_args(argv)
    # --serving resolves UNSET knobs only; an explicit flag always wins, and
    # without --serving the bare defaults stay the oracle-pinned gate shape
    if args.n_iters is None:
        args.n_iters = SERVING_ITERS if args.serving else similarity.IVF_ITERS
    if args.sample_mod is None:
        args.sample_mod = SERVING_SAMPLE_MOD if args.serving else 1

    spark = get_spark(app_name="build-ann-index")

    if args.op == "stream":
        if not args.input_dir or not args.stream_root:
            p.error("--input-dir and --stream-root are required for --op stream")
        kind = _index_kind(spark, args.output_path, args.mode)
        q = start_stream_append(
            spark,
            args.input_dir,
            args.output_path,
            args.stream_root,
            kind,
            neardup_threshold=args.neardup_threshold,
        )
        if args.run_until_idle:
            q.processAllAvailable()
            q.stop()
        else:  # pragma: no cover - service mode
            q.awaitTermination()
        ledger_dir = os.path.join(args.stream_root, "ledger")
        batches = sorted(os.listdir(ledger_dir)) if os.path.isdir(ledger_dir) else []
        report = {"op": "stream", "mode": kind, "batches": len(batches)}
        print(json.dumps(report))
        return report

    if args.op in ("compact", "retrain"):
        # retrain swaps the whole layout like compact does — flattening a
        # replayable delta-e<N>/ breaks the replay's own-epoch exclusion
        _guard_compact_replay_safety(args)
    if args.op != "build":
        return _run_maintenance(spark, args)

    if args.embeddings_path is None:
        p.error("--embeddings-path is required for --op build")
    if args.spill > 1 and args.mode != "ivf":
        p.error("--spill is an IVF cell-assignment knob (lsh has no cells)")
    emb = spark.read.parquet(args.embeddings_path)
    n_bits = args.n_bits if args.n_bits is not None else similarity.N_BITS
    if args.mode == "lsh":
        similarity.bucketize_corpus(
            emb,
            args.output_path,
            n_bits=n_bits,
            n_files=args.n_files,
            partition_by_bucket=args.partition_by_bucket,
            n_tables=args.n_tables or 1,
        )
        out = similarity.read_bucketized(spark, args.output_path)
        report = {
            "mode": "lsh",
            "n_bits": n_bits,
            "n_tables": args.n_tables or 1,
            "vectors": out.count(),
            "buckets": out.select("bucket").distinct().count(),
        }
    else:
        # An explicit --sample-mod must be honored (or rejected), never
        # silently dropped: at scale the sampled pre-train path is exactly
        # the full-corpus Lloyd scan the flag exists to avoid.
        centroids = None
        pretrain = args.serving or args.sample_mod > 1
        if pretrain:
            n_cells = args.n_cells or (
                serving_cells(emb.count()) if args.serving else similarity.IVF_CELLS
            )
            train = emb.select("vec_id", "embedding")
            if args.sample_mod > 1:
                train = train.filter(
                    F.pmod(F.xxhash64(F.col("vec_id")), args.sample_mod) == 0
                )
            centroids = similarity.kmeans_centroids(
                train, n_cells, args.n_iters
            )
        else:
            n_cells = args.n_cells or similarity.IVF_CELLS
        similarity.build_ivf_index(
            emb,
            args.output_path,
            n_cells=n_cells,
            n_iters=args.n_iters,
            n_files=args.n_files,
            centroids=centroids,
            spill=args.spill,
        )
        corpus, cents = similarity.read_ivf_index(spark, args.output_path)
        report = {
            "mode": "ivf",
            "n_cells": n_cells,
            "vectors": corpus.count(),
            "cells": cents.count(),
        }
        if args.spill > 1:
            report["spill"] = args.spill
        if args.serving:
            report["serving"] = {
                "n_iters": args.n_iters,
                "sample_mod": args.sample_mod,
            }
        elif pretrain:
            report["sample_mod"] = args.sample_mod
        if args.target_recall is not None:
            curve = similarity.measure_recall_curve(
                spark, args.output_path, k=args.k, n_queries=args.curve_queries
            )
            similarity.store_recall_curve(spark, args.output_path, curve)
            report["recall_curve"] = curve
            report["resolved"] = {
                "target_recall": args.target_recall,
                **similarity.resolve_n_probe(curve, args.target_recall),
            }
    print(json.dumps(report))
    return report


def _guard_compact_replay_safety(args) -> None:
    """Refuse to compact while stream-append epoch dirs exist that the
    ledger cannot prove committed: flattening a replayable delta-e<N>/
    breaks the replay's own-epoch exclusion and duplicates its rows.
    Batch-append indexes (no epoch dirs) are unaffected."""
    epoch_dirs: set[int] = set()
    for sub in ("", "corpus"):
        d = os.path.join(args.output_path, sub) if sub else args.output_path
        if os.path.isdir(d):
            for fn in os.listdir(d):
                if fn.startswith("delta-e"):
                    epoch_dirs.add(int(fn[len("delta-e"):]))
    if not epoch_dirs:
        return
    if not args.stream_root:
        raise SystemExit(
            f"refusing to compact: stream-append epoch dirs {sorted(epoch_dirs)} "
            "exist but no --stream-root was given to check their ledger; "
            "pass the ingester's --stream-root so committed epochs can be "
            "verified"
        )
    ledger_dir = os.path.join(args.stream_root, "ledger")
    committed: set[int] = set()
    if os.path.isdir(ledger_dir):
        for fn in os.listdir(ledger_dir):
            if fn.startswith("batch-e") and fn.endswith(".json"):
                committed.add(int(fn[len("batch-e"):-len(".json")]))
    pending = sorted(epoch_dirs - committed)
    if pending:
        raise SystemExit(
            f"refusing to compact: epochs {pending} have delta dirs but no "
            "ledger marker (a restarted stream would replay them, and "
            "compaction would turn that replay into duplicate rows)"
        )


def _index_kind(spark, path: str, fallback: str) -> str:
    meta = similarity.read_index_meta(spark, path)
    if meta and meta.get("kind"):
        return meta["kind"]
    try:  # an IVF layout is self-identifying by its centroids dir
        spark.read.parquet(f"{path}/centroids")
        return "ivf"
    except Exception:
        return fallback


def _run_maintenance(spark, args) -> dict:
    kind = _index_kind(spark, args.output_path, args.mode)
    if args.op == "stats":
        stats = (
            similarity.bucketized_stats(spark, args.output_path)
            if kind == "lsh"
            else similarity.ivf_index_stats(spark, args.output_path)
        )
        report = {"op": "stats", "mode": kind, **stats}
    elif args.op == "compact":
        compact = (
            similarity.compact_bucketized
            if kind == "lsh"
            else similarity.compact_ivf_index
        )
        report = {
            "op": "compact",
            "mode": kind,
            **compact(spark, args.output_path, n_files=args.n_files),
        }
    elif args.op == "drift":
        if kind != "ivf":
            raise SystemExit(
                "--op drift reads quantizer fit; only the ivf layout has a "
                "quantizer (lsh planes are data-independent — use --op "
                "stats/recall there)"
            )
        report = {
            "op": "drift",
            "mode": kind,
            **similarity.ivf_drift_stats(spark, args.output_path),
        }
    elif args.op == "retrain":
        if kind != "ivf":
            raise SystemExit("--op retrain only applies to the ivf layout")
        report = {
            "op": "retrain",
            "mode": kind,
            **similarity.retrain_ivf_index(
                spark,
                args.output_path,
                n_cells=args.n_cells,
                n_iters=args.n_iters,
                sample_mod=args.sample_mod,
                n_files=args.n_files,
            ),
        }
    elif args.op == "recall":
        n_probe = args.n_probe
        resolved = None
        if args.target_recall is not None:
            if kind != "ivf":
                raise SystemExit(
                    "--target-recall resolves an IVF probe budget; the lsh "
                    "layout's knob is --probe-radius"
                )
            meta = similarity.read_index_meta(spark, args.output_path) or {}
            curve = meta.get("recall_curve")
            if not curve:
                raise SystemExit(
                    "--target-recall needs a stored recall curve; rebuild "
                    "with --op build --target-recall R (or run "
                    "measure_recall_curve + store_recall_curve)"
                )
            resolved = similarity.resolve_n_probe(curve, args.target_recall)
            n_probe = resolved["n_probe"]
        report = {
            "op": "recall",
            "mode": kind,
            "k": args.k,
            **_measure_recall(
                spark,
                args.output_path,
                kind,
                args.k,
                args.n_queries,
                args.probe_radius,
                n_probe,
                args.n_tables,
            ),
        }
        if resolved is not None:
            report["resolved"] = {
                "target_recall": args.target_recall,
                **resolved,
            }
    else:  # append
        if args.embeddings_path is None:
            raise SystemExit("--embeddings-path (the delta) is required for --op append")
        delta = spark.read.parquet(args.embeddings_path)
        if kind == "lsh":
            similarity.append_to_bucketized(
                delta, args.output_path, n_bits=args.n_bits, n_files=args.n_files
            )
        else:
            similarity.append_to_ivf_index(
                delta, args.output_path, n_files=args.n_files
            )
        report = {
            "op": "append",
            "mode": kind,
            "appended": delta.count(),
        }
    print(json.dumps(report))
    return report


def _measure_recall(
    spark,
    path: str,
    kind: str,
    k: int,
    n_queries: int,
    probe_radius: int = similarity.PROBE_RADIUS,
    n_probe: int = similarity.IVF_PROBE,
    n_tables: int | None = None,
) -> dict:
    # probe the index the way a user queries it; ground truth is exact
    # cosine over the index's OWN vectors, so drift/occupancy decay shows
    # up as recall loss without needing the original corpus parquet
    if kind == "lsh":
        bucketed = similarity.read_bucketized(spark, path)
        meta = similarity.read_index_meta(spark, path) or {}
        if n_tables is None:
            n_tables = int(meta.get("n_tables", 1))
        approx = similarity.ann_lsh_topk(
            None,
            k,
            n_queries,
            n_bits=meta.get("n_bits", similarity.N_BITS),
            probe_radius=probe_radius,
            bucketed=bucketed,
            n_tables=n_tables,
        )
        vectors = bucketed.select("vec_id", "embedding")
    else:
        index = similarity.read_ivf_index(spark, path)
        approx = similarity.ivf_topk(
            None, k, n_queries, n_probe=n_probe, index=index
        )
        vectors = index[0].select("vec_id", "embedding")
    exact = similarity.cosine_topk(vectors, k, n_queries)
    out = similarity.recall_at_k(approx, exact)
    if kind == "lsh":
        out.update({"n_tables": n_tables, "probe_radius": probe_radius})
    else:
        out["n_probe"] = n_probe
    return out


if __name__ == "__main__":
    run()
