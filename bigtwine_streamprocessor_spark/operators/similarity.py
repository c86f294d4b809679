"""Similarity search over embedding columns (`embeddings` table: vec_id,
embedding array<float>, label).

Two paths, as a 100 TB pipeline needs both:

* **brute-force cosine top-k** — exact baseline: broadcast the (small) query
  set against the full corpus; per-row dot product with `zip_with` +
  `aggregate` higher-order functions (JVM-side, no Python); top-k via ranking
  window partitioned by query. Scales as O(|Q| * N) with N fully partitioned —
  right answer for |Q| small.
* **sign-LSH bucketed ANN** — scale path: 4 data-derived anchor hyperplanes
  (the first 4 vectors) give a 4-bit bucket; candidates = same-bucket rows
  only, then exact cosine within bucket. The anchor join is a broadcast; the
  bucket self-join shuffles on uniform 16-value keys (salt-friendly).

Cosines are rounded to 6 decimals on BOTH engine and oracle before ranking so
float summation order can't flip the comparison; ties break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_ANCHORS = 4
COS_ROUND = 6


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(emb: DataFrame, k: int = 5, n_queries: int = 20) -> DataFrame:
    """Exact cosine top-k neighbors for the first ``n_queries`` vectors.

    Output: (query_id, neighbor_id, cos, rank). Self-pairs excluded.
    """
    from pyspark.sql import Window as W

    base = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")),
        COS_ROUND,
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_sql(k: int = 5, n_queries: int = 20) -> str:
    return f"""
WITH norms AS (
    SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
),
pairs AS (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           round(list_sum(list_transform(
                     generate_series(1, len(q.embedding)),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
                 / (q.nrm * n.nrm), {COS_ROUND}) AS cos
    FROM norms q JOIN norms n ON n.vec_id <> q.vec_id
    WHERE q.vec_id < {n_queries}
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


def _bucket(emb: DataFrame) -> DataFrame:
    """4-bit sign-LSH bucket per vector from the first N_ANCHORS vectors."""
    anchors = (
        emb.filter(F.col("vec_id") < N_ANCHORS)
        .select(F.col("vec_id").alias("aid"), F.col("embedding").alias("a_emb"))
    )
    crossed = emb.crossJoin(F.broadcast(anchors))
    signed = crossed.select(
        "vec_id",
        "embedding",
        "aid",
        F.when(_dot(F.col("embedding"), F.col("a_emb")) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        ).alias("bit"),
    )
    return (
        signed.groupBy("vec_id")
        .agg(
            F.first("embedding").alias("embedding"),
            F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("aid")).cast("long"))
            .cast("int")
            .alias("bucket"),
        )
    )


def ann_lsh_topk(emb: DataFrame, k: int = 5, n_queries: int = 20) -> DataFrame:
    """Approximate top-k: exact cosine restricted to same-LSH-bucket candidates."""
    from pyspark.sql import Window as W

    b = _bucket(emb)
    base = b.select(
        "vec_id", "bucket", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("q_bucket"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = base.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")),
        COS_ROUND,
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_lsh_topk_sql(k: int = 5, n_queries: int = 20) -> str:
    return f"""
WITH anchors AS (
    SELECT vec_id AS aid, embedding AS a_emb FROM embeddings
    WHERE vec_id < {N_ANCHORS}
),
buckets AS (
    SELECT e.vec_id,
           CAST(sum(CASE WHEN list_sum(list_transform(
                        generate_series(1, len(e.embedding)),
                        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.a_emb[i] AS DOUBLE)
                    )) >= 0 THEN CAST(pow(2, a.aid) AS BIGINT) ELSE 0 END) AS INT)
             AS bucket
    FROM embeddings e, anchors a
    GROUP BY e.vec_id
),
norms AS (
    SELECT e.vec_id, b.bucket, e.embedding,
           sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id
),
pairs AS (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           round(list_sum(list_transform(
                     generate_series(1, len(q.embedding)),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
                 / (q.nrm * n.nrm), {COS_ROUND}) AS cos
    FROM norms q JOIN norms n ON n.bucket = q.bucket AND n.vec_id <> q.vec_id
    WHERE q.vec_id < {n_queries}
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets (scale path:
    candidate generation is bucket-local, never O(n^2))."""
    b = _bucket(emb)
    base = b.select(
        "vec_id", "bucket", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("bucket").alias("bucket_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    pairs = base.join(
        a,
        (F.col("bucket") == F.col("bucket_a")) & (F.col("id_a") < F.col("vec_id")),
    )
    cos = F.round(
        _dot(F.col("emb_a"), F.col("embedding")) / (F.col("nrm_a") * F.col("nrm")),
        COS_ROUND,
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("vec_id").alias("doc_b"),
        cos.alias("cos"),
    ).filter(F.col("cos") >= threshold)


def embedding_neardup_sql(threshold: float = 0.9) -> str:
    return f"""
WITH anchors AS (
    SELECT vec_id AS aid, embedding AS a_emb FROM embeddings
    WHERE vec_id < {N_ANCHORS}
),
buckets AS (
    SELECT e.vec_id,
           CAST(sum(CASE WHEN list_sum(list_transform(
                        generate_series(1, len(e.embedding)),
                        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.a_emb[i] AS DOUBLE)
                    )) >= 0 THEN CAST(pow(2, a.aid) AS BIGINT) ELSE 0 END) AS INT)
             AS bucket
    FROM embeddings e, anchors a
    GROUP BY e.vec_id
),
norms AS (
    SELECT e.vec_id, b.bucket, e.embedding,
           sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id
)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       round(list_sum(list_transform(
                 generate_series(1, len(a.embedding)),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.nrm * b.nrm), {COS_ROUND}) AS cos
FROM norms a JOIN norms b ON b.bucket = a.bucket AND a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(
          generate_series(1, len(a.embedding)),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / (a.nrm * b.nrm), {COS_ROUND}) >= {threshold}
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

N_CELLS = 8
N_PROBE = 2


def _assignments(emb: DataFrame, centroids: DataFrame, n_best: int) -> DataFrame:
    """Rank cells per vector by cosine to each centroid (deterministic
    tie-break on centroid id); keep the top ``n_best`` cells."""
    from pyspark.sql import Window as W

    scored = emb.join(F.broadcast(centroids)).select(
        "vec_id",
        "embedding",
        "cid",
        F.round(
            _dot(F.col("embedding"), F.col("c_emb"))
            / (_norm(F.col("embedding")) * _norm(F.col("c_emb"))),
            COS_ROUND,
        ).alias("c_cos"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("cid"))
    return (
        scored.withColumn("c_rank", F.row_number().over(w))
        .filter(F.col("c_rank") <= n_best)
    )


def ivf_topk(emb: DataFrame, k: int = 5, n_queries: int = 20) -> DataFrame:
    """IVF approximate top-k: coarse-quantize into N_CELLS cells (centroids =
    the first N_CELLS vectors, a deterministic stand-in for k-means), assign
    each vector to its nearest cell, probe the query's N_PROBE nearest cells,
    exact cosine only within the probed cells.

    At scale this is the classic IVF layout: the corpus partitions by cell id
    (each cell a shard), queries fan out to n_probe shards — candidate count
    is ~n_probe/n_cells of the corpus, and the join key (cell) is uniform.
    """
    from pyspark.sql import Window as W

    centroids = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    # corpus side: each vector lives in its single nearest cell
    corpus = _assignments(emb, centroids, 1).select(
        "vec_id", "embedding", F.col("cid").alias("cell")
    )
    corpus = corpus.withColumn("nrm", _norm(F.col("embedding")))
    # query side: probe the N_PROBE nearest cells
    queries = (
        _assignments(emb.filter(F.col("vec_id") < n_queries), centroids, N_PROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("cid").alias("cell"),
        )
        .withColumn("q_nrm", _norm(F.col("q_emb")))
    )
    pairs = corpus.join(
        queries, ["cell"]
    ).filter(F.col("vec_id") != F.col("query_id"))
    cos = F.round(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")),
        COS_ROUND,
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
        )
        .distinct()  # a neighbor can appear via both probed cells
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk_sql(k: int = 5, n_queries: int = 20) -> str:
    return f"""
WITH centroids AS (
    SELECT vec_id AS cid, embedding AS c_emb FROM embeddings
    WHERE vec_id < {N_CELLS}
),
scored AS (
    SELECT e.vec_id, e.embedding, c.cid,
           round(list_sum(list_transform(
                     generate_series(1, len(e.embedding)),
                     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(c.c_emb,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                 {COS_ROUND}) AS c_cos
    FROM embeddings e, centroids c
),
ranked_cells AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY c_cos DESC, cid) AS c_rank
    FROM scored
),
corpus AS (
    SELECT vec_id, embedding, cid AS cell,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM ranked_cells WHERE c_rank = 1
),
queries AS (
    SELECT vec_id AS query_id, embedding AS q_emb, cid AS cell,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS q_nrm
    FROM ranked_cells WHERE c_rank <= {N_PROBE} AND vec_id < {n_queries}
),
pairs AS (
    SELECT DISTINCT q.query_id, n.vec_id AS neighbor_id,
           round(list_sum(list_transform(
                     generate_series(1, len(q.q_emb)),
                     i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
                 / (q.q_nrm * n.nrm), {COS_ROUND}) AS cos
    FROM corpus n JOIN queries q ON n.cell = q.cell AND n.vec_id <> q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""
