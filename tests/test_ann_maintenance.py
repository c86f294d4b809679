"""Ingest-time ANN index MAINTENANCE: at 100 TB an index is appended to and
periodically compacted, never rebuilt for a delta. Pins: (1) append == full
rebuild for the LSH layouts (both flat and Hive-partitioned, layout
auto-detected from the sidecar); (2) append under a frozen quantizer == a
rebuild with the same centroids for IVF; (3) compaction preserves rows and
shrinks file counts; (4) the stats APIs expose the occupancy/skew retrain
signal (the r7 probe read, productized)."""

import os

import pytest
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.operators import similarity

N_CLUSTERS = 40
MEMBERS = 10
DIM = 16
K = 5
N_QUERIES = 20
SPLIT = 250  # vec_id < SPLIT -> base corpus, rest -> delta


@pytest.fixture(scope="module")
def corpus(spark):
    # same deterministic clustered corpus as test_similarity.py
    rows = []
    for c in range(N_CLUSTERS):
        center = [float(((c * 37 + d * 11) % 19) - 9) for d in range(DIM)]
        for m in range(MEMBERS):
            vec = [
                center[d] + ((m * 13 + d * 7 + c) % 5 - 2) * 0.01
                for d in range(DIM)
            ]
            rows.append((m * N_CLUSTERS + c, vec))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).cache()


def _halves(corpus):
    return (
        corpus.filter(F.col("vec_id") < SPLIT),
        corpus.filter(F.col("vec_id") >= SPLIT),
    )


def _as_set(df):
    return {
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in df.collect()
    }


@pytest.mark.parametrize("partitioned", [False, True])
def test_lsh_append_matches_full_rebuild(spark, corpus, tmp_path, partitioned):
    base, delta = _halves(corpus)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    similarity.bucketize_corpus(
        base, inc, n_bits=8, partition_by_bucket=partitioned
    )
    # n_bits and layout both default from the _index_meta sidecar
    similarity.append_to_bucketized(delta, inc)
    similarity.bucketize_corpus(
        corpus, full, n_bits=8, partition_by_bucket=partitioned
    )

    inc_df, full_df = (
        similarity.read_bucketized(spark, p) for p in (inc, full)
    )
    assert _as_set(inc_df.select("vec_id", "bucket", "nrm")) == _as_set(
        full_df.select("vec_id", "bucket", "nrm")
    )
    # the query a user actually runs is identical against either index
    topk = lambda df: similarity.ann_lsh_topk(  # noqa: E731
        None, K, N_QUERIES, n_bits=8, bucketed=df
    )
    assert _as_set(topk(inc_df)) == _as_set(topk(full_df))
    assert len(_as_set(topk(inc_df))) > 0

    meta = similarity.read_index_meta(spark, inc)
    assert meta == {
        "kind": "lsh",
        "n_bits": 8,
        "layout": "hive" if partitioned else "flat",
        "n_tables": 1,
    }
    if partitioned:  # delta rows landed inside existing bucket= dirs
        assert any(d.startswith("bucket=") for d in os.listdir(inc))
    with pytest.raises(ValueError, match="n_bits=8"):
        similarity.append_to_bucketized(delta, inc, n_bits=6)


def test_lsh_append_layout_probe_without_sidecar(spark, corpus, tmp_path):
    # pre-sidecar index: auto-detect falls back to the input_file_name probe
    base, delta = _halves(corpus)
    path = str(tmp_path / "nosidecar")
    similarity.bucketize_corpus(base, path, n_bits=6, partition_by_bucket=True)
    import shutil

    shutil.rmtree(os.path.join(path, "_index_meta"))
    assert similarity.read_index_meta(spark, path) is None
    with pytest.raises(ValueError, match="no _index_meta"):
        similarity.append_to_bucketized(delta, path)  # can't default n_bits
    similarity.append_to_bucketized(delta, path, n_bits=6)
    got = similarity.read_bucketized(spark, path)
    assert got.count() == corpus.count()
    assert dict(got.dtypes)["bucket"] == "int"


def test_compact_bucketized_preserves_rows_and_shrinks_files(
    spark, corpus, tmp_path
):
    base, delta = _halves(corpus)
    path = str(tmp_path / "compactable")
    similarity.bucketize_corpus(base, path, n_bits=6, n_files=8)
    # several small appends -> file growth (the small-files problem)
    for lo in range(SPLIT, N_CLUSTERS * MEMBERS, 50):
        similarity.append_to_bucketized(
            delta.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)
            ),
            path,
            n_bits=6,
            n_files=8,
        )
    keyed = lambda df: df.select("vec_id", "bucket", "nrm")  # noqa: E731
    before = _as_set(keyed(similarity.read_bucketized(spark, path)))
    report = similarity.compact_bucketized(spark, path, n_files=8)
    after_df = similarity.read_bucketized(spark, path)
    assert _as_set(keyed(after_df)) == before
    assert report["rows"] == corpus.count()
    assert report["files_after"] < report["files_before"]
    # staging dir swapped away, sidecar survived the rewrite
    assert not os.path.exists(path + ".compacting")
    assert similarity.read_index_meta(spark, path)["n_bits"] == 6

    with pytest.raises(NotImplementedError):
        similarity.compact_bucketized(spark, "s3://bucket/idx")


def test_ivf_append_matches_rebuild_under_frozen_quantizer(
    spark, corpus, tmp_path
):
    base, delta = _halves(corpus)
    inc = str(tmp_path / "ivf_inc")
    full = str(tmp_path / "ivf_full")
    similarity.build_ivf_index(base, inc, n_cells=16, n_iters=2)
    similarity.append_to_ivf_index(delta, inc)
    # rebuild-equality anchor: full build under the SAME (frozen) centroids
    _, cents = similarity.read_ivf_index(spark, inc)
    similarity.build_ivf_index(corpus, full, centroids=cents)

    inc_corpus, inc_cents = similarity.read_ivf_index(spark, inc)
    full_corpus, full_cents = similarity.read_ivf_index(spark, full)
    assert _as_set(inc_cents) == _as_set(full_cents)
    assert _as_set(inc_corpus.select("vec_id", "cell", "nrm")) == _as_set(
        full_corpus.select("vec_id", "cell", "nrm")
    )
    topk = lambda idx: similarity.ivf_topk(  # noqa: E731
        None, K, N_QUERIES, n_probe=4, index=idx
    )
    assert _as_set(topk((inc_corpus, inc_cents))) == _as_set(
        topk((full_corpus, full_cents))
    )
    assert len(_as_set(topk((inc_corpus, inc_cents)))) > 0


def test_compact_ivf_relayouts_corpus_without_rescoring(
    spark, corpus, tmp_path
):
    base, delta = _halves(corpus)
    path = str(tmp_path / "ivf_compactable")
    similarity.build_ivf_index(base, path, n_cells=16, n_iters=2, n_files=4)
    for lo in range(SPLIT, N_CLUSTERS * MEMBERS, 50):
        similarity.append_to_ivf_index(
            delta.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)
            ),
            path,
            n_files=4,
        )
    keyed = lambda c: c.select("vec_id", "cell", "nrm")  # noqa: E731
    corpus_before, cents_before = similarity.read_ivf_index(spark, path)
    before = _as_set(keyed(corpus_before))
    cents_set = _as_set(cents_before)

    report = similarity.compact_ivf_index(spark, path, n_files=4)
    corpus_after, cents_after = similarity.read_ivf_index(spark, path)
    assert _as_set(keyed(corpus_after)) == before
    assert _as_set(cents_after) == cents_set  # frozen quantizer untouched
    assert report["rows"] == corpus.count()
    assert report["files_after"] < report["files_before"]
    assert not os.path.exists(os.path.join(path, "corpus.compacting"))
    assert similarity.read_index_meta(spark, path)["kind"] == "ivf"
    got = similarity.ivf_topk(
        None, K, N_QUERIES, n_probe=4, index=(corpus_after, cents_after)
    )
    assert len(_as_set(got)) > 0

    with pytest.raises(NotImplementedError):
        similarity.compact_ivf_index(spark, "s3://bucket/idx")


def test_recall_at_k_semantics(spark):
    # q0: both true neighbors found; q1: one of two -> macro avg 0.75
    truth = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 20, 1), (1, 21, 2)],
        "query_id bigint, neighbor_id bigint, rank int",
    )
    approx = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 20, 1), (1, 99, 2)],
        "query_id bigint, neighbor_id bigint, rank int",
    )
    got = similarity.recall_at_k(approx, truth)
    assert got == {"recall": 0.75, "min_recall": 0.5, "n_queries": 2}
    # k= truncates both sides: at k=1 every query's top hit is correct
    assert similarity.recall_at_k(approx, truth, k=1)["recall"] == 1.0
    # identity recall is exactly 1.0
    assert similarity.recall_at_k(truth, truth) == {
        "recall": 1.0,
        "min_recall": 1.0,
        "n_queries": 2,
    }


def test_recall_cli_reads_materialized_index(spark, corpus, tmp_path):
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job

    path = str(tmp_path / "recall_idx")
    similarity.bucketize_corpus(corpus, path, n_bits=8)
    report = build_ann_index_job.run(
        ["--op", "recall", "--output-path", path, "--k", "3", "--n-queries", "10"]
    )
    assert report["op"] == "recall" and report["mode"] == "lsh"
    assert report["n_queries"] == 10
    # tight clusters + multiprobe: the sample's neighbors are found
    assert 0.0 < report["recall"] <= 1.0
    assert report["min_recall"] <= report["recall"]


def test_recall_cli_ivf_n_probe_monotone(spark, corpus, tmp_path):
    # probing every cell makes IVF exact over the index's own vectors, so
    # recall must be 1.0 there and no lower than at the default probe count
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job

    path = str(tmp_path / "recall_ivf")
    similarity.build_ivf_index(corpus, path, n_cells=8, n_iters=2)
    args = ["--op", "recall", "--output-path", path, "--k", "3",
            "--n-queries", "10", "--mode", "ivf"]
    r_default = build_ann_index_job.run(args + ["--n-probe", "2"])
    r_all = build_ann_index_job.run(args + ["--n-probe", "8"])
    assert r_all["recall"] == 1.0
    assert r_default["recall"] <= r_all["recall"]


def test_stats_expose_occupancy_and_skew(spark, corpus, tmp_path):
    lsh = str(tmp_path / "stats_lsh")
    ivf = str(tmp_path / "stats_ivf")
    similarity.bucketize_corpus(corpus, lsh, n_bits=6)
    similarity.build_ivf_index(corpus, ivf, n_cells=16, n_iters=2)

    s = similarity.bucketized_stats(spark, lsh)
    assert s["n_vectors"] == corpus.count()
    assert 1 <= s["n_buckets"] <= 2**6
    assert s["max_bucket"] >= s["p99_bucket"] >= 1
    assert s["skew"] >= 1.0 and s["n_files"] >= 1

    s = similarity.ivf_index_stats(spark, ivf)
    assert s["n_vectors"] == corpus.count()
    assert 1 <= s["n_cells"] <= 16
    assert s["skew"] >= 1.0
    assert similarity.read_index_meta(spark, ivf)["kind"] == "ivf"


def test_lsh_epoch_subdir_append_is_idempotent(spark, corpus, tmp_path):
    """The streaming append shape: an epoch-keyed subdir append replayed
    twice lands once, equals the plain append row-for-row, and rejects the
    hive layout (whose partition dirs cannot nest epochs)."""
    base, delta = _halves(corpus)
    flat = str(tmp_path / "flat")
    similarity.bucketize_corpus(base, flat, n_bits=6)
    similarity.append_to_bucketized(delta, flat, subdir="delta-e3")
    similarity.append_to_bucketized(delta, flat, subdir="delta-e3")  # replay
    got = similarity.read_bucketized(spark, flat)
    ref = str(tmp_path / "ref")
    similarity.bucketize_corpus(base, ref, n_bits=6)
    similarity.append_to_bucketized(delta, ref)
    want = similarity.read_bucketized(spark, ref)
    assert _as_set(got) == _as_set(want)

    hive = str(tmp_path / "hive")
    similarity.bucketize_corpus(base, hive, n_bits=6, partition_by_bucket=True)
    with pytest.raises(ValueError, match="flat layout"):
        similarity.append_to_bucketized(delta, hive, subdir="delta-e0")


def test_ivf_epoch_subdir_append_is_idempotent(spark, corpus, tmp_path):
    base, delta = _halves(corpus)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(base, idx, n_cells=8, n_iters=2)
    similarity.append_to_ivf_index(delta, idx, subdir="delta-e1")
    similarity.append_to_ivf_index(delta, idx, subdir="delta-e1")  # replay
    got, _ = similarity.read_ivf_index(spark, idx)
    assert got.count() == corpus.count()
    assert got.select("vec_id").distinct().count() == corpus.count()


def test_stream_append_maintains_index_exactly_once(spark, corpus, tmp_path):
    """Arriving embedding files stream-append into a live LSH index with a
    per-epoch ledger; the final index equals a batch rebuild, a committed
    epoch's replay is a no-op, and a partial-commit replay (marker
    deleted) re-lands identically."""
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job as job

    base, delta = _halves(corpus)
    idx = str(tmp_path / "idx")
    similarity.bucketize_corpus(base, idx, n_bits=6)
    indir = tmp_path / "arrive"
    indir.mkdir()
    d1 = delta.filter(F.col("vec_id") % 2 == 0)
    d2 = delta.filter(F.col("vec_id") % 2 == 1)
    d1.coalesce(1).write.parquet(str(indir / "f1.parquet"))
    d2.coalesce(1).write.parquet(str(indir / "f2.parquet"))

    stream_root = str(tmp_path / "sr")
    q = job.start_stream_append(
        spark, str(indir), idx, stream_root, mode="lsh",
        max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # materialize once: later epoch-dir overwrites invalidate this frame's
    # cached file listing (fresh reads stay valid)
    got = _as_set(similarity.read_bucketized(spark, idx))
    ref = str(tmp_path / "ref")
    similarity.bucketize_corpus(base, ref, n_bits=6)
    similarity.append_to_bucketized(delta, ref)
    assert got == _as_set(similarity.read_bucketized(spark, ref))

    ledger = os.path.join(stream_root, "ledger")
    markers = sorted(os.listdir(ledger))
    assert len(markers) >= 2

    # committed replay: no-op
    assert (
        job.append_stream_batch(d1, 0, idx, "lsh", ledger) is None
    )
    # partial-commit replay: marker deleted -> re-lands identically
    os.remove(os.path.join(ledger, markers[0]))
    c = job.append_stream_batch(d1, 0, idx, "lsh", ledger)
    assert c is not None and c["vectors"] == d1.count()
    assert _as_set(similarity.read_bucketized(spark, idx)) == got

    # compaction flattens the epoch dirs without changing rows
    rep = similarity.compact_bucketized(spark, idx)
    assert rep["rows"] == corpus.count()
    assert _as_set(similarity.read_bucketized(spark, idx)) == got


def _orthogonal_fresh(spark, n: int, base_id: int = 900_000):
    """n mutually-far vectors (axis-aligned one-hots, sign-flipped on wrap):
    pairwise cos in {0, -1}, and cos vs any dense corpus vector well under
    a 0.95 threshold — survive BOTH near-dup passes."""
    rows = []
    for i in range(n):
        v = [0.0] * DIM
        v[i % DIM] = 50.0 if i < DIM else -50.0
        rows.append((base_id + i, v))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_stream_append_suppresses_neardups_at_ingest(spark, corpus, tmp_path):
    """With --neardup-threshold, arriving vectors that near-duplicate the
    indexed corpus OR each other within the batch are dropped before the
    append; mutually-far fresh vectors land. The partial-commit replay
    stays identical (own-epoch exclusion + deterministic intra-batch
    survivors)."""
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job as job

    base, _ = _halves(corpus)
    idx = str(tmp_path / "idx")
    similarity.bucketize_corpus(base, idx, n_bits=6)

    # arrivals: verbatim copies of indexed vectors (cos 1.0; some are also
    # intra-batch near-dups of each other — cluster-mates) + far vectors
    dup = base.limit(30).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    fresh = _orthogonal_fresh(spark, 20)
    arrive = dup.unionByName(fresh)
    ledger = str(tmp_path / "ledger")

    c = job.append_stream_batch(arrive, 0, idx, "lsh", ledger, 0.95)
    assert c["vectors"] == 50
    # every verbatim copy drops — split between the intra-batch pass
    # (cluster-mate copies dedup against each other) and the index scan
    assert c["dropped_within_batch"] + c["dropped_neardup"] == 30
    assert c["dropped_neardup"] > 0
    assert c["appended"] == 20
    got = similarity.read_bucketized(spark, idx)
    assert got.count() == base.count() + 20
    assert got.filter(
        (F.col("vec_id") >= 100_000) & (F.col("vec_id") < 900_000)
    ).count() == 0

    # partial-commit replay: marker gone, epoch dir present -> identical
    os.remove(os.path.join(ledger, "batch-e000000.json"))
    c2 = job.append_stream_batch(arrive, 0, idx, "lsh", ledger, 0.95)
    assert c2["appended"] == 20
    assert similarity.read_bucketized(spark, idx).count() == base.count() + 20

    # IVF has no bucket probe: suppression must refuse loudly
    with pytest.raises(ValueError, match="LSH"):
        job.append_stream_batch(arrive, 1, idx, "ivf", ledger, 0.95)


def test_stream_append_dedups_within_batch(spark, corpus, tmp_path):
    """The r8-advisor gap: two near-duplicate vectors arriving in the SAME
    micro-batch — neither matching the indexed corpus — must not both
    enter the index; the lower vec_id survives."""
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job as job

    base, _ = _halves(corpus)
    idx = str(tmp_path / "idx")
    similarity.bucketize_corpus(base, idx, n_bits=6)
    fresh = _orthogonal_fresh(spark, 3)
    twin = fresh.limit(1).select(
        (F.col("vec_id") + 50).alias("vec_id"), "embedding"
    )
    c = job.append_stream_batch(
        fresh.unionByName(twin), 0, idx, "lsh", str(tmp_path / "lg"), 0.95
    )
    assert c["vectors"] == 4
    assert c["dropped_within_batch"] == 1
    assert c["appended"] == 3
    got = similarity.read_bucketized(spark, idx)
    assert got.filter(F.col("vec_id") == 900_050).count() == 0  # twin dropped
    assert got.filter(F.col("vec_id") == 900_000).count() == 1  # lower id kept


def test_stream_neardup_vs_ivf_fails_before_stream_starts(
    spark, corpus, tmp_path
):
    """--op stream --neardup-threshold against an IVF index must fail FAST
    in start_stream_append — before the streaming query starts and creates
    checkpoint/ledger state (r8-advisor: the old per-batch validation
    surfaced only as a StreamingQueryException on the first non-empty
    batch)."""
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job as job

    base, delta = _halves(corpus)
    idx = str(tmp_path / "ivf_idx")
    similarity.build_ivf_index(base, idx, n_cells=8, n_iters=1)
    indir = str(tmp_path / "arrivals")
    delta.write.parquet(indir)
    stream_root = str(tmp_path / "stream_root")
    with pytest.raises(ValueError, match="LSH"):
        job.start_stream_append(
            spark, indir, idx, stream_root, mode="ivf", neardup_threshold=0.9
        )
    assert not os.path.exists(os.path.join(stream_root, "_chk"))
    assert not os.path.exists(os.path.join(stream_root, "ledger"))


def test_scan_delta_neardup_flags_best_match(spark, corpus, tmp_path):
    base, _ = _halves(corpus)
    idx = str(tmp_path / "idx")
    similarity.bucketize_corpus(base, idx, n_bits=6)
    probe = base.limit(5).select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "embedding"
    )
    flags = similarity.scan_delta_neardup(probe, idx, threshold=0.99)
    rows = {r["vec_id"]: r for r in flags.collect()}
    assert set(rows) == {r["vec_id"] for r in probe.collect()}
    for vid, r in rows.items():
        assert r["cos"] == 1.0
        # ties broken by lowest indexed id; the original is among matches
        assert r["match_id"] < 500_000


def test_compact_refuses_replayable_epoch_dirs(spark, corpus, tmp_path):
    """CLI compaction must refuse while an epoch dir lacks its ledger
    marker — flattening it would turn the epoch's replay into duplicates."""
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job as job

    base, delta = _halves(corpus)
    idx = str(tmp_path / "idx")
    similarity.bucketize_corpus(base, idx, n_bits=6)
    ledger = str(tmp_path / "sr" / "ledger")
    job.append_stream_batch(delta, 0, idx, "lsh", ledger)
    os.remove(os.path.join(ledger, "batch-e000000.json"))  # partial commit

    with pytest.raises(SystemExit, match="refusing to compact"):
        job.run(["--op", "compact", "--output-path", idx,
                 "--stream-root", str(tmp_path / "sr")])
    # no --stream-root at all: also refused while epoch dirs exist
    with pytest.raises(SystemExit, match="stream-root"):
        job.run(["--op", "compact", "--output-path", idx])
    # once the marker is restored (committed), compaction proceeds
    job.append_stream_batch(delta, 0, idx, "lsh", ledger)  # re-stamps
    rep = job.run(["--op", "compact", "--output-path", idx,
                   "--stream-root", str(tmp_path / "sr")])
    assert rep["rows"] == corpus.count()


def test_ivf_drift_signal_and_retrain(spark, corpus, tmp_path):
    """r8 verdict task 5: appends under frozen centroids decay silently
    when the ingest distribution shifts. The drift verb must show the
    shifted epoch fitting WORSE than the base corpus, and retrain must
    recover quantizer fit (staged rebuild-verify-swap, rows preserved)."""
    base, _ = _halves(corpus)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(base, idx, n_cells=8, n_iters=2)

    # distribution-shifted arrivals: a large constant offset pushes every
    # vector toward the all-ones direction no trained centroid covers
    shifted = (
        corpus.filter(F.col("vec_id") >= SPLIT)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x + F.lit(40.0))
            .cast("array<float>")
            .alias("embedding"),
        )
    )
    similarity.append_to_ivf_index(shifted, idx, subdir="delta-e1")

    drift = similarity.ivf_drift_stats(spark, idx)
    assert set(drift["per_epoch"]) == {"base", "delta-e1"}
    assert (
        drift["per_epoch"]["delta-e1"]["mean_assigned_cos"]
        < drift["per_epoch"]["base"]["mean_assigned_cos"]
    ), drift
    # the aggregate stats read carries the same number
    stats = similarity.ivf_index_stats(spark, idx)
    assert 0.0 < stats["mean_assigned_cos"] < 1.0

    rep = similarity.retrain_ivf_index(spark, idx, n_iters=2)
    assert rep["rows"] == base.count() + shifted.count()
    assert rep["mean_assigned_cos_after"] > rep["mean_assigned_cos_before"], rep
    # swapped layout is intact and epoch dirs are flattened
    got, cents = similarity.read_ivf_index(spark, idx)
    assert got.count() == rep["rows"]
    assert similarity.read_index_meta(spark, idx)["kind"] == "ivf"


def test_retrain_output_matches_fresh_build(spark, corpus, tmp_path):
    """Pinned equality: retraining over the indexed rows must produce the
    SAME layout a from-scratch build over those rows produces (both train
    the deterministic kmeans on the identical frame)."""
    base, _ = _halves(corpus)
    idx = str(tmp_path / "retrained")
    fresh = str(tmp_path / "fresh")
    similarity.build_ivf_index(base, idx, n_cells=8, n_iters=1)
    similarity.retrain_ivf_index(spark, idx, n_cells=8, n_iters=2)
    similarity.build_ivf_index(base, fresh, n_cells=8, n_iters=2)
    a, ca = similarity.read_ivf_index(spark, idx)
    b, cb = similarity.read_ivf_index(spark, fresh)
    assert _as_set(a) == _as_set(b)
    assert _as_set(ca) == _as_set(cb)


def test_build_cli_serving_preset(spark, corpus, tmp_path):
    """--serving applies the measured serving shape (r10 verdict task 7):
    n_iters 6 + 1-in-10 sample-trained centroids + n_cells ~ 2*sqrt(n)
    when the knobs are unset, with explicit flags always winning — and the
    bare build (no --serving) keeps the gate/oracle defaults untouched."""
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job as job

    # shape resolution is pure arithmetic
    assert job.serving_cells(200_000) == 1024  # the PERF.md sweep corpus
    assert job.serving_cells(64) == 16

    n = corpus.count()
    emb_path = str(tmp_path / "emb.parquet")
    corpus.write.parquet(emb_path)

    path = str(tmp_path / "serving_idx")
    report = job.run(
        ["--op", "build", "--mode", "ivf", "--embeddings-path", emb_path,
         "--output-path", path, "--serving", "--n-cells", "8"]
    )
    assert report["serving"] == {
        "n_iters": job.SERVING_ITERS,
        "sample_mod": job.SERVING_SAMPLE_MOD,
    }
    assert report["n_cells"] == 8  # explicit flag wins over the preset
    assert report["vectors"] == n  # sample-trained, FULL corpus laid out

    # unset n_cells under --serving resolves from the corpus size
    path2 = str(tmp_path / "serving_idx2")
    report2 = job.run(
        ["--op", "build", "--mode", "ivf", "--embeddings-path", emb_path,
         "--output-path", path2, "--serving", "--sample-mod", "1",
         "--n-iters", "2"]
    )
    assert report2["n_cells"] == job.serving_cells(n)
    assert report2["serving"] == {"n_iters": 2, "sample_mod": 1}

    # without --serving the defaults are the oracle-pinned gate shape
    path3 = str(tmp_path / "bare_idx")
    report3 = job.run(
        ["--op", "build", "--mode", "ivf", "--embeddings-path", emb_path,
         "--output-path", path3]
    )
    from bigtwine_streamprocessor_spark.operators import similarity as sim

    assert report3["n_cells"] == sim.IVF_CELLS
    assert "serving" not in report3


def test_build_cli_sample_mod_honored_without_serving(spark, corpus, tmp_path):
    """--op build --sample-mod M without --serving must sample-pre-train
    (advisor r11: the flag was silently ignored outside the --serving
    branch, so the build ran full-corpus Lloyd — at scale exactly the scan
    the flag exists to avoid). The full corpus is still laid out; only
    centroid TRAINING samples."""
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job as job
    from bigtwine_streamprocessor_spark.operators import similarity as sim

    n = corpus.count()
    emb_path = str(tmp_path / "emb.parquet")
    corpus.write.parquet(emb_path)

    path = str(tmp_path / "sampled_idx")
    report = job.run(
        ["--op", "build", "--mode", "ivf", "--embeddings-path", emb_path,
         "--output-path", path, "--sample-mod", "10"]
    )
    assert report["sample_mod"] == 10  # honored and reported
    assert "serving" not in report
    assert report["n_cells"] == sim.IVF_CELLS  # bare-build default kept
    assert report["vectors"] == n  # full corpus laid out

    # sampled pre-training really changes the quantizer: centroids differ
    # from the full-corpus build's (same seed-free deterministic Lloyd)
    full = str(tmp_path / "full_idx")
    job.run(
        ["--op", "build", "--mode", "ivf", "--embeddings-path", emb_path,
         "--output-path", full]
    )
    _, c_sampled = sim.read_ivf_index(spark, path)
    _, c_full = sim.read_ivf_index(spark, full)
    s = {tuple(r["c_emb"]) for r in c_sampled.collect()}
    f = {tuple(r["c_emb"]) for r in c_full.collect()}
    assert s != f


def test_target_recall_resolution(spark, corpus, tmp_path):
    """--target-recall (r11 verdict task 4): build measures a recall-vs-
    n_probe curve on a held-out hash sample, stores it in _index_meta, and
    resolves the smallest probe budget meeting the target; --op recall
    then takes a TARGET instead of a probe count."""
    from bigtwine_streamprocessor_spark.jobs import build_ann_index_job as job
    from bigtwine_streamprocessor_spark.operators import similarity as sim

    emb_path = str(tmp_path / "emb.parquet")
    corpus.write.parquet(emb_path)
    path = str(tmp_path / "idx")
    # k=15 > cluster size 10: true neighbors span cells, so low probe
    # budgets measurably miss and the curve is non-trivial
    report = job.run(
        ["--op", "build", "--mode", "ivf", "--embeddings-path", emb_path,
         "--output-path", path, "--n-cells", "8", "--target-recall", "0.7",
         "--curve-queries", "16", "--k", "15"]
    )
    curve = report["recall_curve"]
    assert [pt["n_probe"] for pt in curve] == sorted(
        pt["n_probe"] for pt in curve
    )
    # probing every (non-empty) cell ends the curve at exact recall
    assert curve[-1]["n_probe"] == report["cells"]
    assert curve[-1]["recall"] == 1.0
    # monotone non-decreasing in probes (same ground truth, superset scan)
    recalls = [pt["recall"] for pt in curve]
    assert recalls == sorted(recalls)
    # (this tight-cluster fixture saturates at probe 1 — cells hold whole
    # clusters — so mid-curve resolution is pinned synthetically below;
    # the measured non-trivial curve is the sf10 PERF.md run)
    synth = [
        {"n_probe": 1, "recall": 0.4, "scan_frac": 0.01},
        {"n_probe": 4, "recall": 0.66, "scan_frac": 0.04},
        {"n_probe": 8, "recall": 0.74, "scan_frac": 0.08},
        {"n_probe": 16, "recall": 0.9, "scan_frac": 0.16},
    ]
    assert sim.resolve_n_probe(synth, 0.7)["n_probe"] == 8  # smallest >= R
    assert sim.resolve_n_probe(synth, 0.9)["n_probe"] == 16
    assert sim.resolve_n_probe(synth, 0.95) == {**synth[-1], "unmet": True}
    # curve persisted to the sidecar
    meta = sim.read_index_meta(spark, path)
    assert meta["recall_curve"] == curve
    # resolution: smallest measured budget meeting the target
    res = report["resolved"]
    assert res["target_recall"] == 0.7
    expect = next(pt for pt in curve if pt["recall"] >= 0.7)
    assert res["n_probe"] == expect["n_probe"]
    assert "unmet" not in res

    # --op recall takes the target and resolves the SAME budget
    r2 = job.run(
        ["--op", "recall", "--output-path", path, "--target-recall", "0.7",
         "--n-queries", "16", "--k", "15"]
    )
    assert r2["resolved"]["n_probe"] == expect["n_probe"]
    assert r2["n_probe"] == expect["n_probe"]

    # an unreachable target resolves to the max budget, flagged unmet
    assert sim.resolve_n_probe(curve, 1.1)["unmet"] is True
    assert sim.resolve_n_probe(curve, 1.1)["n_probe"] == report["cells"]


def test_recall_curve_single_pass_equals_per_level_ivf_topk(
    spark, corpus, tmp_path
):
    """The single-pass curve (one max-probe corpus join, c_rank-filtered
    per level) must equal running ivf_topk per probe level — same window,
    same tie-breaks, same rounded cosines."""
    path = str(tmp_path / "idx")
    similarity.build_ivf_index(corpus, path, n_cells=8, n_iters=2)
    idx = similarity.read_ivf_index(spark, path)
    n = corpus.count()
    _, qf = similarity.holdout_filter(n, 16)
    curve = similarity.measure_recall_curve(spark, path, k=15, n_queries=16)
    vectors = idx[0].select("vec_id", "embedding")
    exact = similarity.cosine_topk(vectors, 15, query_filter=qf)
    for pt in curve:
        approx = similarity.ivf_topk(
            None, 15, n_probe=pt["n_probe"], index=idx, query_filter=qf
        )
        r = similarity.recall_at_k(approx, exact)
        assert r["recall"] == pt["recall"], pt
        assert r["min_recall"] == pt["min_recall"], pt
        assert r["n_queries"] == pt["n_queries"], pt


# --- spilled IVF layout (r12 verdict task 3: the recall/scan frontier) ------


def test_spilled_ivf_full_probe_equals_exact(spark, corpus, tmp_path):
    """A spill-3 index probed at ALL cells must return exactly the
    brute-force top-k: duplicates from multi-assignment dedup away and the
    candidate set is the whole corpus. Strongest correctness pin for the
    spilled layout."""
    path = str(tmp_path / "ivf_spill_exact")
    similarity.build_ivf_index(corpus, path, n_cells=16, n_iters=2, spill=3)
    idx = similarity.read_ivf_index(spark, path)
    assert "a_rank" in idx[0].columns
    assert idx[0].count() == corpus.count() * 3
    meta = similarity.read_index_meta(spark, path)
    assert meta["spill"] == 3
    got = similarity.ivf_topk(None, K, N_QUERIES, n_probe=16, index=idx)
    exact = similarity.cosine_topk(corpus, K, N_QUERIES)
    assert _as_set(got) == _as_set(exact)
    # no neighbor may appear twice for a query at ANY probe budget
    dup = (
        similarity.ivf_topk(None, K, N_QUERIES, n_probe=4, index=idx)
        .groupBy("query_id", "neighbor_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_spilled_ivf_recall_dominates_single_assignment(
    spark, corpus, tmp_path
):
    """At the same probe budget the spilled index must find at least the
    single-assigned index's neighbors (the boundary-loss fix the layout
    exists for) — and on this clustered corpus strictly more at a small
    budget."""
    single = str(tmp_path / "ivf_s1")
    spilled = str(tmp_path / "ivf_s2")
    similarity.build_ivf_index(corpus, single, n_cells=16, n_iters=2)
    _, cents = similarity.read_ivf_index(spark, single)
    similarity.build_ivf_index(corpus, spilled, centroids=cents, spill=2)
    exact = similarity.cosine_topk(corpus, K, N_QUERIES)
    r1 = similarity.recall_at_k(
        similarity.ivf_topk(
            None, K, N_QUERIES, n_probe=2,
            index=similarity.read_ivf_index(spark, single),
        ),
        exact,
    )["recall"]
    r2 = similarity.recall_at_k(
        similarity.ivf_topk(
            None, K, N_QUERIES, n_probe=2,
            index=similarity.read_ivf_index(spark, spilled),
        ),
        exact,
    )["recall"]
    assert r2 >= r1


def test_spilled_ivf_append_matches_rebuild(spark, corpus, tmp_path):
    """append inherits the sidecar's spill: appending a delta to a spill-2
    index equals a from-scratch spill-2 build under the same centroids."""
    base, delta = _halves(corpus)
    inc = str(tmp_path / "ivf_sp_inc")
    full = str(tmp_path / "ivf_sp_full")
    similarity.build_ivf_index(base, inc, n_cells=16, n_iters=2, spill=2)
    similarity.append_to_ivf_index(delta, inc)
    _, cents = similarity.read_ivf_index(spark, inc)
    similarity.build_ivf_index(corpus, full, centroids=cents, spill=2)
    inc_corpus, _ = similarity.read_ivf_index(spark, inc)
    full_corpus, _ = similarity.read_ivf_index(spark, full)
    assert _as_set(
        inc_corpus.select("vec_id", "cell", "a_rank", "nrm")
    ) == _as_set(full_corpus.select("vec_id", "cell", "a_rank", "nrm"))


def test_spilled_ivf_retrain_preserves_spill_and_fit(spark, corpus, tmp_path):
    path = str(tmp_path / "ivf_sp_retrain")
    similarity.build_ivf_index(corpus, path, n_cells=8, n_iters=1, spill=2)
    report = similarity.retrain_ivf_index(spark, path, n_iters=3)
    assert report["rows"] == corpus.count()
    new_corpus, _ = similarity.read_ivf_index(spark, path)
    assert new_corpus.count() == corpus.count() * 2
    assert similarity.read_index_meta(spark, path)["spill"] == 2
    assert (
        report["mean_assigned_cos_after"]
        >= report["mean_assigned_cos_before"] - 1e-9
    )


def test_recall_curve_on_spilled_index_measures_scan(spark, corpus, tmp_path):
    """The stored curve must charge a spilled layout its REAL scanned
    fraction (duplication included) and stay consistent with ivf_topk at
    every level; the full-probe point still reaches recall 1.0."""
    path = str(tmp_path / "ivf_sp_curve")
    similarity.build_ivf_index(corpus, path, n_cells=16, n_iters=2, spill=2)
    curve = similarity.measure_recall_curve(
        spark, path, k=K, n_queries=10, probes=[2, 16]
    )
    by_p = {pt["n_probe"]: pt for pt in curve}
    assert by_p[16]["recall"] == 1.0
    # full probe on a spill=2 layout: every copy is reached and SCORED, so
    # the measured fraction charges the duplication — ~spill, not ~1
    # (advisor r13: the field counts pre-dedup scored rows, the scan a
    # deployment actually pays; ranking still dedups per pair)
    assert 1.8 <= by_p[16]["scan_frac_measured"] <= 2.01
    idx = similarity.read_ivf_index(spark, path)
    n = corpus.count()
    _, qf = similarity.holdout_filter(n, 10)
    for p in (2, 16):
        approx = similarity.ivf_topk(
            None, K, n_probe=p, index=idx, query_filter=qf
        )
        exact = similarity.cosine_topk(
            corpus.select("vec_id", "embedding"), K, query_filter=qf
        )
        r = similarity.recall_at_k(approx, exact)
        assert abs(r["recall"] - by_p[p]["recall"]) < 1e-9


def test_ivf_topk_rejects_spill_with_index(spark, corpus, tmp_path):
    """spill= is the on-the-fly knob; an index= layout carries its own
    spill via a_rank, so combining them is a loud error (advisor r13)."""
    path = str(tmp_path / "ivf_spill_guard")
    similarity.build_ivf_index(corpus, path, n_cells=8, n_iters=1, spill=2)
    idx = similarity.read_ivf_index(spark, path)
    with pytest.raises(ValueError, match="on-the-fly"):
        similarity.ivf_topk(None, K, n_probe=2, index=idx, spill=2)


def test_retrain_shrinking_cells_below_spill(spark, corpus, tmp_path):
    """Retraining a spill=3 index down to 2 cells is legitimate: each
    vector can only occupy min(spill, surviving cells) cells — Lloyd may
    additionally drop an empty cell — and the row-count invariant must
    account for that instead of raising (advisor r13)."""
    path = str(tmp_path / "ivf_shrink")
    similarity.build_ivf_index(corpus, path, n_cells=8, n_iters=1, spill=3)
    report = similarity.retrain_ivf_index(spark, path, n_cells=2, n_iters=1)
    assert report["rows"] == corpus.count()
    new_corpus, new_cents = similarity.read_ivf_index(spark, path)
    n_cells_trained = new_cents.count()
    assert 1 <= n_cells_trained <= 2
    assert new_corpus.count() == corpus.count() * min(3, n_cells_trained)


def test_spilled_curve_refresh_after_append(spark, corpus, tmp_path):
    """r13 verdict task 6: the stored recall curve is only remeasured at
    retrain, so after appends a spilled index's curve — and the probe
    budget --target-recall resolves from it — is stale. Pin the
    maintenance contract: append ~25% new vectors, REMEASURE, re-store.
    The remeasured curve must cover the appended rows (full probe back to
    recall 1.0 on the grown corpus), the appended epoch must be visible
    to the drift trigger, and serving must resolve from the refreshed
    sidecar (meeting the target or loudly 'unmet', never silently stale)."""
    path = str(tmp_path / "ivf_sp_append_curve")
    base = corpus.filter(F.col("vec_id") < 320)
    delta = corpus.filter(F.col("vec_id") >= 320)
    similarity.build_ivf_index(base, path, n_cells=16, n_iters=2, spill=2)
    curve0 = similarity.measure_recall_curve(
        spark, path, k=K, n_queries=16, probes=[2, 4, 16]
    )
    similarity.store_recall_curve(spark, path, curve0)

    # epoch-keyed append: the drift trigger reads epochs off the delta-e<N>
    # subdirs (ivf_drift_stats), so the maintenance pin appends the way a
    # streaming ingester does — a bare append is drift-INVISIBLE by design
    similarity.append_to_ivf_index(delta, path, subdir="delta-e1")
    curve1 = similarity.measure_recall_curve(
        spark, path, k=K, n_queries=16, probes=[2, 4, 16]
    )
    by_p = {pt["n_probe"]: pt for pt in curve1}
    assert by_p[16]["recall"] == 1.0
    assert by_p[16]["n_queries"] > 0
    # spilled append: the appended epoch must appear in the drift read
    drift = similarity.ivf_drift_stats(spark, path)
    assert any(e.startswith("delta-") for e in drift["per_epoch"])

    similarity.store_recall_curve(spark, path, curve1)
    meta = similarity.read_index_meta(spark, path)
    assert meta["recall_curve"] == curve1
    assert meta["spill"] == 2
    pt = similarity.resolve_n_probe(curve1, 0.95)
    assert pt["recall"] >= 0.95 or pt.get("unmet")
