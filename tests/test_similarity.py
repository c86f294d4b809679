"""ANN quality gates: multiprobed sign-LSH and k-means IVF must recover most
of the exact top-k on clustered data at SCALE parameters (2^16 buckets /
sqrt-n cells) — the regime the oracle queries can't exercise at tiny sf."""

import pytest
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.operators import similarity

N_CLUSTERS = 40
MEMBERS = 10
DIM = 16
K = 5
N_QUERIES = 20


@pytest.fixture(scope="module")
def clustered_emb(spark):
    # deterministic clustered corpus: 40 tight clusters of 10 near-identical
    # vectors; vec_id = member*40 + cluster so queries (vec_id < 20) are the
    # member-0 representatives of clusters 0..19
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


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(truth, approx):
    per_q = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    return sum(per_q) / len(per_q)


def test_ann_lsh_recall_at_scale_params(spark, clustered_emb):
    truth = _topk_sets(similarity.cosine_topk(clustered_emb, K, N_QUERIES))
    approx = _topk_sets(
        similarity.ann_lsh_topk(
            clustered_emb, K, N_QUERIES, n_bits=16, probe_radius=1
        )
    )
    r = _recall(truth, approx)
    assert r >= 0.6, f"LSH recall@{K} too low at 16 bits + multiprobe: {r:.2f}"


def test_ivf_recall_with_kmeans_cells(spark, clustered_emb):
    truth = _topk_sets(similarity.cosine_topk(clustered_emb, K, N_QUERIES))
    approx = _topk_sets(
        similarity.ivf_topk(
            clustered_emb, K, N_QUERIES, n_cells=16, n_probe=4, n_iters=2
        )
    )
    r = _recall(truth, approx)
    assert r >= 0.6, f"IVF recall@{K} too low with kmeans cells: {r:.2f}"


def test_multiprobe_improves_candidate_recall(spark, clustered_emb):
    """Radius-1 multiprobe must dominate exact-bucket-only recall."""
    truth = _topk_sets(similarity.cosine_topk(clustered_emb, K, N_QUERIES))
    r0 = _recall(
        truth,
        _topk_sets(
            similarity.ann_lsh_topk(
                clustered_emb, K, N_QUERIES, n_bits=16, probe_radius=0
            )
        ),
    )
    r1 = _recall(
        truth,
        _topk_sets(
            similarity.ann_lsh_topk(
                clustered_emb, K, N_QUERIES, n_bits=16, probe_radius=1
            )
        ),
    )
    r2 = _recall(
        truth,
        _topk_sets(
            similarity.ann_lsh_topk(
                clustered_emb, K, N_QUERIES, n_bits=16, probe_radius=2
            )
        ),
    )
    assert r2 >= r1 >= r0


def test_probe_masks_cover_hamming_ball():
    from math import comb

    for n_bits, radius in [(8, 1), (16, 2), (10, 3)]:
        masks = similarity._probe_masks(n_bits, radius)
        assert masks[0] == 0
        assert len(masks) == len(set(masks))  # each pair joins once
        assert len(masks) == sum(comb(n_bits, r) for r in range(radius + 1))
        assert all(bin(m).count("1") <= radius and m < 2**n_bits for m in masks)
    with pytest.raises(ValueError, match="probes per query"):
        similarity._probe_masks(24, 3)  # 2,325 probes — past the cap


def test_lsh_radius2_matches_oracle(spark, ddb, sf_dir):
    from tests.conftest import assert_frames_match

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = similarity.ann_lsh_topk(emb, K, N_QUERIES, n_bits=8, probe_radius=2)
    assert_frames_match(
        got, ddb, similarity.ann_lsh_topk_sql(K, N_QUERIES, 8, 2)
    )


def test_plane_family_decorrelated():
    """Pairwise sign agreement between hyperplanes must hover near 1/2.

    The r1-r6 truncated-LCG family failed this badly (LCG composition is
    affine, so constant-stride planes stay correlated; measured 450x bucket
    over-occupancy for random directions at 14 bits). md5-derived signs are
    pinned here: over the _MAX_PLANE_DIM sign vectors, every plane pair
    among the first 16 agrees on 0.3..0.7 of components (binomial 3-sigma
    at 64 dims ~ 0.5 +- 0.19;
    a correlated family shows pairs near 0 or 1)."""
    signs = [similarity._plane_signs(i) for i in range(16)]
    n = float(len(signs[0]))
    for i in range(16):
        for j in range(i + 1, 16):
            agree = sum(a == b for a, b in zip(signs[i], signs[j])) / n
            assert 0.3 <= agree <= 0.7, (i, j, agree)


def test_bucketize_corpus_materialized_matches_onthefly(
    spark, clustered_emb, tmp_path
):
    """Ingest-time bucket materialization (VERDICT r7 task 2): querying a
    bucketize_corpus() parquet must return byte-identical results to the
    on-the-fly path, with ZERO plane-dot work in the materialized plan."""
    path = str(tmp_path / "bucketized")
    similarity.bucketize_corpus(clustered_emb, path, n_bits=8)
    mat = similarity.read_bucketized(spark, path)
    assert sorted(mat.columns) == ["bucket", "embedding", "nrm", "vec_id"]

    fly_topk = similarity.ann_lsh_topk(clustered_emb, K, N_QUERIES, n_bits=8)
    mat_topk = similarity.ann_lsh_topk(
        None, K, N_QUERIES, n_bits=8, bucketed=mat
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(mat_topk) == as_set(fly_topk)

    fly_nd = similarity.embedding_neardup_pairs(clustered_emb, 0.9, n_bits=8)
    mat_nd = similarity.embedding_neardup_pairs(
        None, 0.9, n_bits=8, bucketed=mat
    )
    assert as_set(mat_nd) == as_set(fly_nd)
    assert len(as_set(fly_nd)) > 0

    # plane dots are the only element_at user: present on the fly, absent
    # (computed once at ingest) in the materialized plan
    plan = lambda df: df._jdf.queryExecution().optimizedPlan().toString()  # noqa: E731
    assert "element_at" in plan(fly_topk)
    assert "element_at" not in plan(mat_topk)
    assert "element_at" not in plan(mat_nd)


def test_bucketize_partitioned_layout_prunes(spark, clustered_emb, tmp_path):
    """partition_by_bucket=True (the 100 TB layout): results identical to
    the flat layout, and the probe join's corpus scan carries a
    dynamicpruning partition filter — a query reads ONLY probed bucket
    directories, ~(n_probes/2^n_bits) of the corpus."""
    path = str(tmp_path / "bucketized_part")
    similarity.bucketize_corpus(
        clustered_emb, path, n_bits=6, partition_by_bucket=True
    )
    import os

    assert any(d.startswith("bucket=") for d in os.listdir(path))
    mat = similarity.read_bucketized(spark, path)
    assert sorted(mat.columns) == ["bucket", "embedding", "nrm", "vec_id"]
    assert dict(mat.dtypes)["bucket"] == "int"

    fly = similarity.ann_lsh_topk(clustered_emb, K, N_QUERIES, n_bits=6)
    mat_topk = similarity.ann_lsh_topk(None, K, N_QUERIES, n_bits=6, bucketed=mat)
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(mat_topk) == as_set(fly)

    # static pruning proof: an explicit bucket filter becomes a partition
    # filter (zero data files of other buckets touched) ...
    one = mat.filter(F.col("bucket") == 3)
    exec_plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in exec_plan and "bucket" in exec_plan
    # ... and the probe JOIN gets a runtime dynamicpruning filter on the
    # partition column (query touches only probed directories)
    join_plan = mat_topk._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in join_plan


def test_ivf_index_materialized_matches_onthefly(spark, clustered_emb, tmp_path):
    """Ingest-time IVF index: querying a build_ivf_index() layout must return
    byte-identical results to the on-the-fly path, with NO quantizer
    training (Lloyd's posexplode marker) in the materialized plan."""
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(clustered_emb, path, n_cells=16, n_iters=2)
    idx = similarity.read_ivf_index(spark, path)
    assert sorted(idx[0].columns) == ["cell", "embedding", "nrm", "vec_id"]
    # empty cells drop out of the Lloyd mean groupBy (same on the fly)
    assert 1 <= idx[1].count() <= 16

    fly = similarity.ivf_topk(
        clustered_emb, K, N_QUERIES, n_cells=16, n_probe=4, n_iters=2
    )
    mat = similarity.ivf_topk(
        None, K, N_QUERIES, n_cells=16, n_probe=4, n_iters=2, index=idx
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(mat) == as_set(fly)
    assert len(as_set(fly)) > 0

    plan = lambda df: df._jdf.queryExecution().optimizedPlan().toString()  # noqa: E731
    # Lloyd training feeds the on-the-fly plan through a checkpointed
    # centroid frame (LogicalRDD — the r9 lineage-truncation fix); the
    # materialized plan reads BOTH centroids and corpus from parquet, so
    # no RDD scan and no training appear anywhere in it
    assert "LogicalRDD" in plan(fly)
    assert "posexplode" not in plan(mat)
    assert "LogicalRDD" not in plan(mat)


def test_bucketed_width_guard(spark):
    """Embeddings wider than _MAX_PLANE_DIM must fail LOUDLY (not silently
    collapse into bucket 0) in every ANSI config: the when()-guard in
    _bucketed raises before any element_at can go NULL."""
    wide = spark.createDataFrame(
        [(0, [1.0] * (similarity._MAX_PLANE_DIM + 1))],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.raises(Exception, match="_MAX_PLANE_DIM"):
        similarity._bucketed(wide, n_bits=4).collect()


def test_salted_join_matches_unsalted(spark, clustered_emb):
    """Adaptive salting must not change the pair set — only spread it.

    salt_cap=2 forces every 10-member cluster bucket into >=5 slices (the
    mega-bucket path); the result must equal the effectively-unsalted
    salt_cap=10**6 run row-for-row."""
    def pairs(cap):
        return {
            (r["doc_a"], r["doc_b"], r["cos"])
            for r in similarity.embedding_neardup_pairs(
                clustered_emb, 0.9, n_bits=8, salt_cap=cap
            ).collect()
        }

    salted, plain = pairs(2), pairs(10**6)
    assert salted == plain
    assert len(plain) > 0  # the clusters guarantee real near-dup pairs


# ---------------------------------------------------------------------------
# multi-table OR-amplification (r8 verdict task 3: the ANN serving story)
# ---------------------------------------------------------------------------


def test_multitable_matches_oracle(spark, ddb, sf_dir):
    """The L-table tagged-candidate construction must match its DuckDB twin
    exactly (DISTINCT pair semantics: a neighbor found by several tables
    scores once)."""
    from tests.conftest import assert_frames_match

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = similarity.ann_lsh_topk(emb, K, N_QUERIES, n_bits=8, n_tables=3)
    assert_frames_match(
        got, ddb, similarity.ann_lsh_topk_sql(K, N_QUERIES, 8, n_tables=3)
    )


def test_multitable_single_table_unchanged(spark, sf_dir):
    """n_tables=1 must be BIT-IDENTICAL to the pre-multi-table path (table 0
    uses global planes 0..n_bits-1), so existing indexes and the registry
    oracle are unaffected."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    one = similarity.ann_lsh_topk(emb, K, N_QUERIES, n_bits=8)
    explicit = similarity.ann_lsh_topk(emb, K, N_QUERIES, n_bits=8, n_tables=1)
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(one) == as_set(explicit)


def test_multitable_or_amplification_improves_recall(spark, sf_dir):
    """The serving-quality claim: on the near-uniform testdata embeddings —
    the regime where the r8 sweep showed radius widening buys almost
    nothing (+0.10 recall for 41x candidates) — each extra independent
    plane family can only ADD candidates (union over tables), so recall is
    monotone in L, and strictly improves here (measured 0.12 -> 0.25 ->
    0.44 for L=1/2/4 at 8 bits radius 1; deterministic: md5 plane family,
    fixed corpus)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = similarity.cosine_topk(emb, K, N_QUERIES)
    recalls = [
        similarity.recall_at_k(
            similarity.ann_lsh_topk(
                emb, K, N_QUERIES, n_bits=8, probe_radius=1, n_tables=L
            ),
            exact,
        )["recall"]
        for L in (1, 2, 4)
    ]
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    assert recalls[2] >= 2 * recalls[0], recalls


def test_multitable_materialized_matches_onthefly(spark, clustered_emb, tmp_path):
    """A bucketize_corpus(n_tables=2) layout must serve ann_lsh_topk
    byte-identically to the on-the-fly multi-table path with zero plane-dot
    work, appends must carry every table's bucket column (sidecar-driven),
    and a SINGLE-table layout must still serve an L=2 query by deriving the
    missing family on the fly."""
    path = str(tmp_path / "bucketized_l2")
    similarity.bucketize_corpus(clustered_emb, path, n_bits=8, n_tables=2)
    mat = similarity.read_bucketized(spark, path)
    assert sorted(mat.columns) == [
        "bucket",
        "bucket_1",
        "embedding",
        "nrm",
        "vec_id",
    ]

    fly = similarity.ann_lsh_topk(clustered_emb, K, N_QUERIES, n_bits=8, n_tables=2)
    mat_topk = similarity.ann_lsh_topk(
        None, K, N_QUERIES, n_bits=8, bucketed=mat, n_tables=2
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(mat_topk) == as_set(fly)

    plan = lambda df: df._jdf.queryExecution().optimizedPlan().toString()  # noqa: E731
    assert "element_at" not in plan(mat_topk)  # both families materialized

    # append: sidecar says n_tables=2, so the delta carries bucket_1 too and
    # incremental == rebuild
    base = clustered_emb.filter(F.col("vec_id") < 250)
    delta = clustered_emb.filter(F.col("vec_id") >= 250)
    inc = str(tmp_path / "inc_l2")
    similarity.bucketize_corpus(base, inc, n_bits=8, n_tables=2)
    similarity.append_to_bucketized(delta, inc)
    rows = lambda df: {  # noqa: E731 - embedding arrays need tuple-izing
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in df.collect()
    }
    assert rows(similarity.read_bucketized(spark, inc)) == rows(mat)

    # single-table layout + L=2 query: missing family derived on the fly
    p1 = str(tmp_path / "bucketized_l1")
    similarity.bucketize_corpus(clustered_emb, p1, n_bits=8)
    m1 = similarity.read_bucketized(spark, p1)
    hybrid = similarity.ann_lsh_topk(
        None, K, N_QUERIES, n_bits=8, bucketed=m1, n_tables=2
    )
    assert as_set(hybrid) == as_set(fly)


def test_multitable_probe_budget_guard():
    """Total probes across tables are capped like the single-table ring."""
    with pytest.raises(ValueError, match="per query"):
        similarity.ann_lsh_topk(None, n_bits=16, probe_radius=2, n_tables=16)
