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
    assert r1 >= r0
