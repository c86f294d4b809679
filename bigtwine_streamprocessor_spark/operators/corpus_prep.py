"""Corpus-preparation operators for training-data pipelines: cardinality
sketching, paragraph-level dedup, weighted source mixing, length-bucketed
batching, URL/domain auditing, and random-projection embedding compression.

The layer between curation (``operators/curation.py``) and the trainer: once
a corpus is cleaned, a pipeline still has to (a) audit per-source vocabulary
cardinality without a full distinct (KMV sketch), (b) drop boilerplate
paragraphs repeated across documents (CCNet-style line dedup, here on
fixed-width word chunks since the synthetic corpus has no newlines),
(c) sample sources into a training mixture at fixed ratios, (d) group
similar-length documents into batches to minimize padding, (e) audit/block
documents by URL domain, and (f) compress embeddings with a deterministic
random projection for cheap downstream ANN.

Every operator is pure Column expressions (whole-stage codegen, zero
Python rows) with a DuckDB SQL twin generated from the SAME constants, so
the oracle can never drift from the engine. All randomness is md5-derived:
identical on Spark, DuckDB, and hashlib, which is what makes the sketches
and samplers oracle-checkable bit-for-bit.

Scale posture (100 TB):
- the KMV sketch shuffles distinct (source, token) pairs once, then finds
  the k smallest hashes with a TWO-PHASE rank (salted local top-k, then
  top-k of the <=16k survivors) so no single per-source task sees more than
  k*16 candidate rows — a global per-source window would serialize each
  source through one task;
- paragraph dedup shuffles (chunk-hash, doc, pos) triples; chunk hashes are
  uniform, and the per-hash window is bounded by the duplication factor;
- mixing/bucketing windows partition on (source | bucket); with few groups
  at cluster scale, switch to the md5-prefix bucketed two-phase rank used by
  ``curation.global_shuffle`` (same trick: the bucket is a prefix of the
  sort key, so local rank + broadcast offsets = the global rank);
- the projection matrix is a compile-time literal (md5-derived), so the
  projection is a map-only scan — no shuffle, no Python, no broadcast.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.corpus import spread_small_scan


def _rd(col, d: int):
    """d-dp half-up rounding as the explicit floor(x*10^d + 0.5)/10^d IEEE
    sequence — identical on every engine, so tie-breaking is defined by the
    arithmetic, not by engine round() (Spark BigDecimal HALF_UP vs DuckDB
    nearbyint HALF_EVEN diverge exactly at half ties). Mirrored by _rd_sql;
    same policy as textstats._r6. Also kills -0.0: floor yields an exact
    integer and 0/10^d is always +0.0."""
    m = F.lit(float(10 ** d))
    return F.floor(col * m + F.lit(0.5)) / m


def _rd_sql(expr: str, d: int) -> str:
    m = repr(float(10 ** d))
    return f"(floor(({expr}) * {m} + 0.5) / {m})"


# --- KMV (k-minimum-values) distinct sketch -------------------------------
KMV_K = 128
KMV_HEX = 12  # 48-bit hash prefix: exact in doubles, negligible collisions
KMV_SPACE = 16**KMV_HEX

# --- paragraph dedup ------------------------------------------------------
CHUNK_WORDS = 16  # "paragraph" = fixed word chunk (corpus has no newlines)

# --- weighted source mixing ----------------------------------------------
MIX_TOTAL = 200
MIX_SEED = "mix"

# --- length-bucketed batching --------------------------------------------
LEN_BOUNDS = (16, 32, 64, 128, 256, 512)
LEN_OVERFLOW = 1024
BATCH_DOCS = 8

# --- URL/domain audit ----------------------------------------------------
URL_MOD = 5  # every URL_MOD-th doc gets a synthetic URL (corpus has none)
URL_SITES = 13
BLOCKED_SITES = (3, 7, 11)
URL_RE = "https://([a-z0-9.]+)/"

# --- random projection ---------------------------------------------------
PROJ_IN = 64
PROJ_OUT = 16


def _hexnum_sql(expr: str, pos_fn: str) -> str:
    """Numeric value of the first KMV_HEX chars of a lowercase hex string.

    Emitted as a sum of exact-integer terms (digit * 16^k, all < 2^48), so
    the double result is exact and ORDER-INDEPENDENT — bit-identical on any
    engine. ``pos_fn`` is the (haystack, needle) position function: Spark
    ``instr``, DuckDB ``strpos``.
    """
    terms = [
        f"(({pos_fn}('0123456789abcdef', substr({expr}, {i}, 1)) - 1)"
        f" * {16 ** (KMV_HEX - i)}.0)"
        for i in range(1, KMV_HEX + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def kmv_distinct_by_source(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-source distinct-token estimate via a KMV (k-minimum-values)
    sketch, with the exact count and relative error alongside — the
    cardinality audit a pipeline runs per shard before committing to a full
    vocabulary build. Estimator: (k-1) / h_k where h_k is the k-th smallest
    hash normalized to [0,1) (Bar-Yossef et al. 2002); with fewer than k
    distinct values the sketch IS the exact count.

    All hashes are md5-derived and the estimate arithmetic is the same
    literal expression on both engines, so the sketch is oracle-checkable
    exactly — unlike HLL, whose register layout is engine-private.
    """
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).distinct()
    # Spark evaluates the hash prefix with conv() — ONE md5 reference.
    # (_hexnum_sql's 12-term digit sum re-executes its argument per digit:
    # codegen does no CSE, and CollapseProject re-inlines any intermediate
    # column, so the md5 ran 12x per row — 6x slower at sf0.1. The DuckDB
    # twin keeps the digit sum over a hash-once CTE; both are the exact
    # integer value of the first 12 hex chars.)
    h = toks.withColumn(
        "_hv", F.expr(f"CAST(conv(substr(md5(tok), 1, {KMV_HEX}), 16, 10) AS DOUBLE)")
    )
    # two-phase k-smallest: salted local top-k bounds every task at k rows,
    # then the true per-source top-k runs over <= 16k survivors
    salted = h.withColumn("_s", F.pmod(F.col("_hv").cast("bigint"), F.lit(16)))
    w1 = Window.partitionBy("source", "_s").orderBy("_hv", "tok")
    cand = (
        salted.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_r", "_s")
    )
    w2 = Window.partitionBy("source").orderBy("_hv", "tok")
    top = cand.withColumn("_r", F.row_number().over(w2)).filter(F.col("_r") <= k)
    sketch = top.groupBy("source").agg(
        F.max("_hv").alias("_hk"), F.count(F.lit(1)).alias("_m")
    )
    exact = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    est = F.when(F.col("_m") < k, F.col("_m").cast("double")).otherwise(
        F.expr(_rd_sql(f"({k - 1} * {KMV_SPACE}.0) / _hk", 2))
    )
    return (
        sketch.join(F.broadcast(exact), "source")
        .withColumn("kmv_est", est)
        .withColumn(
            "rel_err",
            _rd(
                F.abs(F.col("kmv_est") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ),
        )
        .select("source", "kmv_est", "exact_distinct", "rel_err")
    )


def kmv_distinct_sql(k: int = KMV_K, source: str = "documents") -> str:
    hv = _hexnum_sql("m", "strpos")
    return f"""
WITH toks AS (
    SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
    FROM {source}
),
hm AS (SELECT source, tok, md5(tok) AS m FROM toks),
h AS (SELECT source, tok, {hv} AS hv FROM hm),
r AS (
    SELECT source, hv,
           row_number() OVER (PARTITION BY source ORDER BY hv, tok) AS rn
    FROM h
),
sk AS (
    SELECT source, max(hv) AS hk, count(*) AS m
    FROM r WHERE rn <= {k} GROUP BY source
),
ex AS (
    SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct
    FROM toks GROUP BY source
),
est AS (
    SELECT sk.source,
           CASE WHEN sk.m < {k} THEN CAST(sk.m AS DOUBLE)
                ELSE {_rd_sql(f"({k - 1} * {16**KMV_HEX}.0) / sk.hk", 2)}
           END AS kmv_est,
           ex.exact_distinct
    FROM sk JOIN ex USING (source)
)
SELECT source, kmv_est, exact_distinct,
       {_rd_sql("abs(kmv_est - exact_distinct) / exact_distinct", 4)} AS rel_err
FROM est
"""


def paragraph_dedup(docs: DataFrame, chunk_words: int = CHUNK_WORDS) -> DataFrame:
    """CCNet-style cross-document paragraph dedup: cut each document into
    fixed ``chunk_words``-word chunks (the corpus has no newline paragraphs),
    keep only the globally FIRST occurrence of each chunk (by (doc_id, pos)),
    and re-assemble the surviving text. Output: (doc_id, n_chunks, n_kept,
    text_kept) — the boilerplate-stripping pass run before exact dedup.

    Plan: one explode -> row_number over the chunk-hash partitions (uniform
    md5 keys; group size = cross-corpus duplication factor) -> per-doc
    re-assembly with collect_list bounded by document length.
    """
    toks = F.split(F.col("text"), " ")
    nch = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(chunk_words))).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(1), nch),
        lambda i: F.array_join(
            F.slice(toks, (i - 1) * chunk_words + 1, chunk_words), " "
        ),
    )
    ch = docs.select(
        "doc_id", F.posexplode(chunks).alias("_p", "chunk")
    ).withColumn("pos", (F.col("_p") + 1).cast("bigint"))
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "pos")
    r = ch.withColumn("_kept", F.row_number().over(w) == 1)
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_kept"), F.struct("pos", "chunk"))
                    )
                ),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("text_kept"),
    )


def paragraph_dedup_sql(
    chunk_words: int = CHUNK_WORDS, source: str = "documents"
) -> str:
    n = f"greatest(CAST(ceil(len(tk) / {chunk_words}.0) AS BIGINT), 1)"
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM {source}),
c AS (
    SELECT doc_id,
           unnest(generate_series(1, {n})) AS pos,
           unnest(list_transform(
               generate_series(1, {n}),
               i -> array_to_string(
                   tk[(i-1)*{chunk_words}+1:(i-1)*{chunk_words}+{chunk_words}],
                   ' ')
           )) AS chunk
    FROM t
),
r AS (
    SELECT doc_id, pos, chunk,
           row_number() OVER (PARTITION BY md5(chunk)
                              ORDER BY doc_id, pos) AS rn
    FROM c
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
                '') AS text_kept
FROM r GROUP BY doc_id
"""


def mix_weighted_quota(docs: DataFrame, total: int = MIX_TOTAL) -> DataFrame:
    """Deterministic weighted training mixture: each source gets a quota
    proportional to its weight (floor(total * w / sum_w), min 1) and fills it
    with its quota-smallest docs by seeded md5 — i.e. fixed epoch ratios with
    a reproducible per-source sample, the standard corpus-mixing contract.
    Source weights derive from the source name (1 + id % 3) so the oracle
    computes the identical plan with zero side-channel state.

    Output: (doc_id, source, mix_rank).
    """
    # try_cast + coalesce: a digit-free source name extracts '' — plain cast
    # would THROW under Spark ANSI and error in DuckDB, and the two engines
    # disagree on the failure mode; coalescing to id 0 (weight 1) on BOTH
    # engines makes digit-free sources behave identically.
    wt = (
        1
        + F.coalesce(
            F.regexp_extract(F.col("source"), "([0-9]+)", 1).try_cast("int"),
            F.lit(0),
        )
        % 3
    )
    dims = docs.select("source").distinct().withColumn("_w", wt)
    total_w = dims.agg(F.sum("_w").alias("_tw"))
    quota = (
        dims.crossJoin(F.broadcast(total_w))
        .withColumn(
            "quota",
            F.greatest(
                F.floor(F.lit(float(total)) * F.col("_w") / F.col("_tw")),
                F.lit(1),
            ),
        )
        .select("source", "quota")
    )
    key = F.md5(
        F.concat(F.lit(f"{MIX_SEED}:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy(key, "doc_id")
    ranked = docs.select("doc_id", "source").withColumn(
        "mix_rank", F.row_number().over(w).cast("bigint")
    )
    return ranked.join(F.broadcast(quota), "source").filter(
        F.col("mix_rank") <= F.col("quota")
    ).select("doc_id", "source", "mix_rank")


def mix_weighted_sql(total: int = MIX_TOTAL, source: str = "documents") -> str:
    return f"""
WITH dims AS (SELECT DISTINCT source FROM {source}),
w AS (
    SELECT source,
           1 + (coalesce(TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INT), 0) % 3) AS wt
    FROM dims
),
q AS (
    SELECT source,
           greatest(CAST(floor({total}.0 * wt / (SELECT sum(wt) FROM w))
                    AS BIGINT), 1) AS quota
    FROM w
),
r AS (
    SELECT doc_id, source,
           CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5('{MIX_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS mix_rank
    FROM {source}
)
SELECT r.doc_id, r.source, r.mix_rank
FROM r JOIN q USING (source)
WHERE r.mix_rank <= q.quota
"""


def bucket_by_length(docs: DataFrame, batch_docs: int = BATCH_DOCS) -> DataFrame:
    """Length-bucketed batch assignment: documents fall into power-of-two
    token-length buckets and each bucket packs ``batch_docs`` docs per batch
    in doc_id order — the padding-minimizing batching a trainer's data
    loader does, precomputed engine-side. Output: (doc_id, n_tokens, bucket,
    batch_id, pos_in_batch).

    The per-bucket window has as many partitions as buckets (7 here); at
    cluster scale use the md5-prefix two-phase rank from
    ``curation.global_shuffle`` (bucket stays the partition prefix).
    """
    n = F.size(F.split(F.col("text"), " ")).cast("bigint")
    bucket = F.lit(LEN_OVERFLOW)
    for b in reversed(LEN_BOUNDS):
        bucket = F.when(F.col("n_tokens") <= b, F.lit(b)).otherwise(bucket)
    w = Window.partitionBy("bucket").orderBy("doc_id")
    return (
        docs.select("doc_id", n.alias("n_tokens"))
        .withColumn("bucket", bucket.cast("int"))
        .withColumn("_rn", F.row_number().over(w))
        .select(
            "doc_id",
            "n_tokens",
            "bucket",
            F.floor((F.col("_rn") - 1) / F.lit(float(batch_docs)))
            .cast("bigint")
            .alias("batch_id"),
            ((F.col("_rn") - 1) % batch_docs).cast("int").alias("pos_in_batch"),
        )
    )


def bucket_by_length_sql(
    batch_docs: int = BATCH_DOCS, source: str = "documents"
) -> str:
    case = " ".join(
        f"WHEN n_tokens <= {b} THEN {b}" for b in LEN_BOUNDS
    )
    return f"""
WITH t AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM {source}
),
b AS (
    SELECT doc_id, n_tokens,
           CAST(CASE {case} ELSE {LEN_OVERFLOW} END AS INT) AS bucket
    FROM t
),
r AS (
    SELECT doc_id, n_tokens, bucket,
           row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
    FROM b
)
SELECT doc_id, n_tokens, bucket,
       CAST(floor((rn - 1) / {batch_docs}.0) AS BIGINT) AS batch_id,
       CAST((rn - 1) % {batch_docs} AS INT) AS pos_in_batch
FROM r
"""


def url_domain_audit(docs: DataFrame) -> DataFrame:
    """Extract URL domains and flag blocklisted ones — the domain-level
    filter a web-scale pipeline applies before any content-level scoring.
    The synthetic corpus has no URLs, so every ``URL_MOD``-th doc gets a
    deterministic one injected (same convention as the PII path:
    ``curation.with_synthetic_pii``), making the extraction non-vacuous and
    exactly mirrored by the oracle. Output: (doc_id, domain, blocked) for
    docs carrying a URL. Map-only scan, no shuffle.
    """
    url = F.concat(
        F.lit(" see https://site"),
        (F.col("doc_id") % URL_SITES).cast("string"),
        F.lit(".example.com/page"),
    )
    text = F.when(
        F.col("doc_id") % URL_MOD == 0, F.concat(F.col("text"), url)
    ).otherwise(F.col("text"))
    dom = F.regexp_extract(text, URL_RE, 1)
    blocked_domains = [f"site{s}.example.com" for s in BLOCKED_SITES]
    return (
        docs.select("doc_id", dom.alias("domain"))
        .filter(F.col("domain") != "")
        .withColumn("blocked", F.col("domain").isin(blocked_domains))
    )


def url_domain_sql(source: str = "documents") -> str:
    blocked = ", ".join(f"'site{s}.example.com'" for s in BLOCKED_SITES)
    return f"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN doc_id % {URL_MOD} = 0
                THEN text || ' see https://site'
                     || CAST(doc_id % {URL_SITES} AS VARCHAR)
                     || '.example.com/page'
                ELSE text END AS text
    FROM {source}
),
d AS (SELECT doc_id, regexp_extract(text, '{URL_RE}', 1) AS domain FROM t)
SELECT doc_id, domain, domain IN ({blocked}) AS blocked
FROM d WHERE domain <> ''
"""


def _proj_sign(j: int, i: int) -> float:
    """Deterministic +-1 from md5 — identical by construction to what the
    engines would compute, but folded at build time so the projection plan
    is a pure literal-matrix scan (no per-row hashing)."""
    d = int(hashlib.md5(f"proj:{j}:{i}".encode()).hexdigest()[0], 16)
    return 1.0 if d % 2 == 0 else -1.0


def embedding_random_projection(
    emb: DataFrame, out_dim: int = PROJ_OUT, in_dim: int = PROJ_IN
) -> DataFrame:
    """Sign random projection (Achlioptas 2003): compress ``in_dim``-float
    embeddings to ``out_dim`` components with a deterministic md5-derived
    +-1 matrix — the cheap dimensionality reduction in front of ANN/dedup
    at 100 TB. The matrix is a compile-time literal, so the plan is a
    map-only whole-stage-codegen scan at scale: no Python, no broadcast, and
    no shuffle beyond the conditional small-scan spread below (a no-op once
    the scan has >= cluster-parallelism splits; locally the testdata is one
    unsplittable row group and the 1024-term fold would run on one core).

    Each component serializes fixed-point (%.4f after round-4) and the
    vector joins with commas — the canonical-string encoding the driver
    harness compares exactly (same pattern as ``embedding_label_centroids``).
    Sums fold left in index order on both engines over exact float->double
    casts, so the strings are bit-identical.

    The matrix rides as ONE literal array-of-arrays evaluated through
    ``transform``/``aggregate`` HOFs rather than out_dim*in_dim explicit
    expression nodes: the flat form made Janino compile an 8-second
    whole-stage method; the HOF form plans instantly and runs the same
    left-fold.
    """
    emb = spread_small_scan(emb)  # r15: see docstring
    matrix = F.array(
        *[
            F.array(*[F.lit(_proj_sign(j, i)) for i in range(in_dim)])
            for j in range(out_dim)
        ]
    )
    def _nz(v):
        # -0.0 normalization belt-and-braces: _rd's floor form already
        # yields +0.0 (0 / 10^d), but keep the explicit map so the contract
        # doesn't depend on that detail (twin does the same).
        return F.when(v == 0, F.lit(0.0)).otherwise(v)

    comps = F.transform(
        F.sequence(F.lit(1), F.lit(out_dim)),
        lambda j: F.format_string(
            "%.4f",
            _nz(
                _rd(
                    F.aggregate(
                        F.sequence(F.lit(1), F.lit(in_dim)),
                        F.lit(0.0),
                        lambda acc, i: acc
                        + F.element_at(F.col("embedding"), i).cast("double")
                        * F.element_at(F.element_at(matrix, j), i),
                    ),
                    4,
                )
            ),
        ),
    )
    return emb.select(
        "vec_id", "label", F.array_join(comps, ",").alias("proj")
    )


def embedding_projection_sql(
    out_dim: int = PROJ_OUT, in_dim: int = PROJ_IN, source: str = "embeddings"
) -> str:
    comps = []
    for j in range(out_dim):
        terms = " + ".join(
            f"(CAST(embedding[{i + 1}] AS DOUBLE) * {_proj_sign(j, i)})"
            for i in range(in_dim)
        )
        # CASE maps -0.0 (equal to 0 in SQL) to +0.0 before printf — see
        # the _nz note in embedding_random_projection
        r4 = _rd_sql(terms, 4)
        comps.append(
            f"printf('%.4f', CASE WHEN {r4} = 0 THEN 0.0"
            f" ELSE {r4} END)"
        )
    joined = ", ".join(comps)
    return f"""
SELECT vec_id, label, concat_ws(',', {joined}) AS proj
FROM {source}
"""


# --- incremental (new-batch vs corpus) dedup ------------------------------
INC_EXACT_MOD = 50  # every 50th doc gets an exact incoming copy
INC_EXACT_OFFSET = 1_000_000
INC_NEAR_MOD = 37  # every 37th doc gets a near incoming copy
INC_NEAR_OFFSET = 2_000_000
INC_NEAR_SUFFIX = " trailing tokens appended"
INC_SHINGLE_N = 3
INC_DF_CAP = 100  # drop shingles seen in more existing docs than this
INC_JACCARD_MIN = 0.35

SEEDED_INCREMENTAL_SQL = f"""
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + {INC_EXACT_OFFSET} AS doc_id, text
FROM documents WHERE doc_id % {INC_EXACT_MOD} = 0
UNION ALL
SELECT doc_id + {INC_NEAR_OFFSET} AS doc_id, text || '{INC_NEAR_SUFFIX}' AS text
FROM documents WHERE doc_id % {INC_NEAR_MOD} = 0
"""


def with_seeded_incremental(docs: DataFrame) -> DataFrame:
    """Seed an 'incoming batch' onto the corpus: exact copies (+1M ids) of
    every INC_EXACT_MOD-th doc and near copies (+2M ids, a few appended
    tokens) of every INC_NEAR_MOD-th — the synthetic corpus is word salad,
    so without seeding the incremental scan proves nothing. Mirrored
    verbatim by SEEDED_INCREMENTAL_SQL."""
    base = docs.select("doc_id", "text")
    exact = base.filter(F.col("doc_id") % INC_EXACT_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + INC_EXACT_OFFSET
    )
    near = (
        base.filter(F.col("doc_id") % INC_NEAR_MOD == 0)
        .withColumn("doc_id", F.col("doc_id") + INC_NEAR_OFFSET)
        .withColumn("text", F.concat(F.col("text"), F.lit(INC_NEAR_SUFFIX)))
    )
    return base.unionByName(exact).unionByName(near)


def seeded_delta(docs: DataFrame) -> DataFrame:
    """JUST the synthetic incoming batch (the exact + near derived rows of
    ``with_seeded_incremental``, without the corpus). The index-backed gate
    query scans THIS against the corpus index: deriving the delta directly
    mirrors the oracle's ``_INC_DELTA_SQL`` construction at any doc_id
    distribution — filtering the seeded union by ``doc_id >=
    INC_EXACT_OFFSET`` instead silently reclassified 45k CORPUS docs as
    incoming on the sf1 replica, whose stride-shifted ids (replica i adds
    i x 10M) all clear the 1M offset (caught by the r10 sf1 oracle
    sweep)."""
    base = docs.select("doc_id", "text")
    exact = base.filter(F.col("doc_id") % INC_EXACT_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + INC_EXACT_OFFSET
    )
    near = (
        base.filter(F.col("doc_id") % INC_NEAR_MOD == 0)
        .withColumn("doc_id", F.col("doc_id") + INC_NEAR_OFFSET)
        .withColumn("text", F.concat(F.col("text"), F.lit(INC_NEAR_SUFFIX)))
    )
    return exact.unionByName(near)


def incremental_dedup(corpus: DataFrame) -> DataFrame:
    """Incremental dedup: flag INCOMING docs (doc_id >= INC_EXACT_OFFSET)
    that duplicate the EXISTING corpus (doc_id below it) — the scan every
    ingestion pipeline runs per batch, where re-deduping the whole corpus
    would be quadratic over time. Output: (doc_id, dup_kind, match_id,
    score); exact matches score 1.0, near matches carry their (DF-capped)
    shingle Jaccard.

    Plan shape at 100 TB: the exact pass shuffles (md5, doc_id) digests
    only. The near pass joins distinct shingles inverted-index style with a
    document-frequency cap (INC_DF_CAP) so stop-grams can't explode the
    co-occurrence join — the classic candidate-bounding trick; the Jaccard
    uses FULL distinct-shingle counts, so capping only ever LOWERS a
    pair's score (lower-bound semantics, documented contract).
    """
    existing = corpus.filter(F.col("doc_id") < INC_EXACT_OFFSET)
    incoming = corpus.filter(F.col("doc_id") >= INC_EXACT_OFFSET)

    ex_h = existing.select(F.col("doc_id").alias("ex_id"), F.md5("text").alias("h"))
    in_h = incoming.select("doc_id", F.md5("text").alias("h"))
    exact = (
        in_h.join(ex_h, "h")
        .groupBy("doc_id")
        .agg(F.min("ex_id").alias("match_id"))
        .select(
            "doc_id",
            F.lit("exact").alias("dup_kind"),
            "match_id",
            F.lit(1.0).alias("score"),
        )
    )

    toks = F.split(F.col("text"), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size(toks) - INC_SHINGLE_N, F.lit(0))
            ),
            lambda i: F.array_join(F.slice(toks, i + 1, INC_SHINGLE_N), " "),
        )
    )
    ex_sh = existing.select(
        F.col("doc_id").alias("ex_id"), F.explode(grams).alias("g")
    )
    # grams is already array_distinct, so per-doc shingle-set sizes are just
    # size(grams) — map-only, instead of a third/second full explode+shuffle
    # (groupBy ex_id / doc_id over the exploded shingles)
    # size(NULL array) is NULL under Spark 4 defaults (legacy.sizeOfNull
    # false; -1 only under the legacy flag): greatest(coalesce(...), 0)
    # covers BOTH configs, so null-text docs carry a sane set size even
    # though today's inner joins (keyed off exploded shingles, which null
    # text never emits) can't reach those rows
    ex_sizes = existing.select(
        F.col("doc_id").alias("ex_id"),
        F.greatest(F.coalesce(F.size(grams), F.lit(0)), F.lit(0)).alias("n_ex"),
    )
    # DF cap computed over the EXISTING side (the big, growing one)
    rare = (
        ex_sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= INC_DF_CAP)
        .select("g")
    )
    in_near = incoming.join(exact.select("doc_id"), "doc_id", "left_anti")
    in_sh = in_near.select("doc_id", F.explode(grams).alias("g"))
    in_sizes = in_near.select(
        "doc_id", F.coalesce(F.size(grams), F.lit(0)).alias("n_in")
    )
    shared = (
        in_sh.join(rare, "g")
        .join(ex_sh, "g")
        .groupBy("doc_id", "ex_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jacc = (
        shared.join(in_sizes, "doc_id")
        .join(ex_sizes, "ex_id")
        .withColumn(
            "score",
            _rd(
                F.col("shared")
                / (F.col("n_in") + F.col("n_ex") - F.col("shared")),
                6,
            ),
        )
        .filter(F.col("score") >= INC_JACCARD_MIN)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "ex_id")
    near = (
        jacc.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "doc_id",
            F.lit("near").alias("dup_kind"),
            F.col("ex_id").alias("match_id"),
            "score",
        )
    )
    return exact.unionByName(near)


def incremental_dedup_sql() -> str:
    n = INC_SHINGLE_N
    return f"""
WITH corpus AS ({SEEDED_INCREMENTAL_SQL}),
existing AS (SELECT * FROM corpus WHERE doc_id < {INC_EXACT_OFFSET}),
incoming AS (SELECT * FROM corpus WHERE doc_id >= {INC_EXACT_OFFSET}),
exact AS (
    SELECT i.doc_id, 'exact' AS dup_kind, min(e.doc_id) AS match_id,
           1.0 AS score
    FROM incoming i JOIN existing e ON md5(i.text) = md5(e.text)
    GROUP BY i.doc_id
),
ex_sh AS (
    SELECT doc_id AS ex_id,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text,' ')) - {n - 1}, 1)),
               i -> array_to_string(string_split(text,' ')[i:i+{n - 1}], ' ')
           ))) AS g
    FROM existing
),
ex_sizes AS (SELECT ex_id, count(*) AS n_ex FROM ex_sh GROUP BY ex_id),
rare AS (
    SELECT g FROM ex_sh GROUP BY g HAVING count(*) <= {INC_DF_CAP}
),
in_near AS (
    SELECT * FROM incoming WHERE doc_id NOT IN (SELECT doc_id FROM exact)
),
in_sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text,' ')) - {n - 1}, 1)),
               i -> array_to_string(string_split(text,' ')[i:i+{n - 1}], ' ')
           ))) AS g
    FROM in_near
),
in_sizes AS (SELECT doc_id, count(*) AS n_in FROM in_sh GROUP BY doc_id),
shared AS (
    SELECT i.doc_id, e.ex_id, count(*) AS shared
    FROM in_sh i JOIN rare USING (g) JOIN ex_sh e USING (g)
    GROUP BY i.doc_id, e.ex_id
),
jacc AS (
    SELECT s.doc_id, s.ex_id,
           {_rd_sql("s.shared / (i.n_in + e.n_ex - s.shared)", 6)} AS score
    FROM shared s
    JOIN in_sizes i USING (doc_id)
    JOIN ex_sizes e USING (ex_id)
    WHERE {_rd_sql("s.shared / (i.n_in + e.n_ex - s.shared)", 6)} >= {INC_JACCARD_MIN}
),
near AS (
    SELECT doc_id, 'near' AS dup_kind, ex_id AS match_id, score
    FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, ex_id) AS rn
        FROM jacc
    ) WHERE rn = 1
)
SELECT * FROM exact
UNION ALL
SELECT * FROM near
"""


# --- quality classifier score (algebraic sigmoid) -------------------------
QS_BIAS = -0.75
QS_W_LEN = 1.0
QS_W_STOP = 3.0
QS_W_DUP = -1.5
QS_STOPWORDS = ("the", "a", "of", "and", "is")
QS_LEN_NORM = 100.0


def _quality_score_col():
    """The sigmoid quality score as a reusable Column over ``text`` (shared
    by quality_sigmoid_score and curriculum_token_budget so the selection
    never joins two frames derived from the same scan)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    stop_ratio = F.size(
        F.filter(toks, lambda t: t.isin(*QS_STOPWORDS))
    ) / n.cast("double")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
    )
    dup3 = (
        (F.size(grams) - F.size(F.array_distinct(grams)))
        / F.size(grams).cast("double")
    )
    z = (
        F.lit(QS_BIAS)
        + F.lit(QS_W_LEN) * F.least(n / F.lit(QS_LEN_NORM), F.lit(1.0))
        + F.lit(QS_W_STOP) * stop_ratio
        + F.lit(QS_W_DUP) * dup3
    )
    sig = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
    # explicit half-up floor rounding: engine round() tie-breaks differ at
    # exact half ties (see textstats._r6)
    return F.floor(sig * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def quality_sigmoid_score(docs: DataFrame) -> DataFrame:
    """Classifier-lite quality score: a fixed-weight linear model over three
    cheap features (length saturation, stopword ratio, duplicate-3-gram
    fraction) squashed by the ALGEBRAIC sigmoid 0.5 + z/(2(1+|z|)) — chosen
    over 1/(1+e^-z) because it is exact IEEE arithmetic, so both engines
    produce bit-identical scores (libm exp() is not correctly rounded and
    may differ across implementations). Output: (doc_id, score, passes);
    map-only scan, no shuffle.
    """
    score = _quality_score_col()
    return docs.select(
        "doc_id", score.alias("score"), (score >= 0.5).alias("passes")
    )


def quality_sigmoid_sql(source: str = "documents") -> str:
    sw = ", ".join(f"'{s}'" for s in QS_STOPWORDS)
    return f"""
WITH f AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n,
           len(list_filter(string_split(text, ' '), t -> t IN ({sw})))
             AS n_stop,
           list_transform(
               generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
               i -> array_to_string(string_split(text,' ')[i:i+2], ' ')
           ) AS grams
    FROM {source}
),
z AS (
    SELECT doc_id,
           {QS_BIAS} + {QS_W_LEN} * least(n / {QS_LEN_NORM}, 1.0)
           + {QS_W_STOP} * (n_stop / CAST(n AS DOUBLE))
           + {QS_W_DUP} * ((len(grams) - len(list_distinct(grams)))
                           / CAST(len(grams) AS DOUBLE)) AS z
    FROM f
)
SELECT doc_id,
       floor((0.5 + z / (2.0 * (1.0 + abs(z)))) * 1000000.0 + 0.5)
         / 1000000.0 AS score,
       floor((0.5 + z / (2.0 * (1.0 + abs(z)))) * 1000000.0 + 0.5)
         / 1000000.0 >= 0.5 AS passes
FROM z
"""


# --- Count-Min sketch -----------------------------------------------------
CMS_D = 4
CMS_W = 256
CMS_TOP = 20


# The d-th row-hash is hex digits [1+6d, 6+6d) of ONE md5(tok): 24 bits per
# row, mutually disjoint digit ranges — d independent bucket functions from
# a single hash evaluation per token occurrence.
_CMS_BUCKET_DUCK = (
    "(CAST(("
    + " + ".join(
        f"((strpos('0123456789abcdef', substr(md5(tok), 1 + 6*d + {i}, 1)) - 1)"
        f" * {16 ** (5 - i)}.0)"
        for i in range(6)
    )
    + ") AS BIGINT) % "
    + str(CMS_W)
    + ")"
)
_CMS_BUCKET_SPARK = (
    f"(CAST(conv(substr(md5(tok), 1 + 6*d, 6), 16, 10) AS BIGINT) % {CMS_W})"
)


def countmin_topterms(docs: DataFrame, top: int = CMS_TOP) -> DataFrame:
    """Count-Min sketch (d={CMS_D} rows x w={CMS_W} buckets) over ALL token
    occurrences, evaluated on the top-``top`` exact terms: (tok, exact_n,
    cms_est, overest). The CMS invariant — est >= exact, with overestimates
    from bucket collisions only — holds by construction and is pinned in
    tests; every count is an integer, so the sketch is oracle-exact.

    Scale shape: one token explode feeds the exact counts (map-side
    partials); the d x w = {CMS_D}x{CMS_W} cell table is then derived from
    the VOCABULARY (r14, guide §1.2 step 1): a bucket's cell count is the
    integer sum of ``exact_n`` over the tokens hashing into it — bit-equal
    to counting every occurrence, at |vocab| x d md5s instead of
    |occurrences| x d (measured 3.5x the whole query co-timed at sf0.1,
    OPTIMIZATION_r14.md). The bounded cell table is BROADCAST back to score
    query terms — at 100 TB the sketch stays 1024 rows no matter the
    corpus, which is the entire point of CMS.
    """
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    # one md5 per row via conv() — see kmv_distinct_by_source for why the
    # digit-sum form is DuckDB-only
    bucket = F.expr(_CMS_BUCKET_SPARK)
    rows = exact.select(
        "tok",
        "exact_n",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
    ).withColumn("bucket", bucket)
    cells = rows.groupBy("d", "bucket").agg(F.sum("exact_n").alias("cell_n"))
    q = (
        exact.orderBy(F.col("exact_n").desc(), "tok")
        .limit(top)
        .select(
            "tok",
            "exact_n",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
        )
        .withColumn("bucket", bucket)
    )
    return (
        q.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cell_n").alias("cms_est"))
        .select(
            "tok",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overest"),
        )
    )


def countmin_sql(top: int = CMS_TOP, source: str = "documents") -> str:
    b = _CMS_BUCKET_DUCK
    return f"""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS tok FROM {source}
),
exact AS (SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok),
rows_ AS (
    SELECT tok, d, {b} AS bucket
    FROM (SELECT tok, unnest(generate_series(0, {CMS_D - 1})) AS d FROM toks)
),
cells AS (
    SELECT d, bucket, count(*) AS cell_n FROM rows_ GROUP BY d, bucket
),
q AS (
    SELECT tok, exact_n, unnest(generate_series(0, {CMS_D - 1})) AS d
    FROM (SELECT * FROM exact ORDER BY exact_n DESC, tok LIMIT {top})
),
qb AS (SELECT tok, exact_n, d, {b} AS bucket FROM q)
SELECT qb.tok, CAST(qb.exact_n AS BIGINT) AS exact_n,
       CAST(min(c.cell_n) AS BIGINT) AS cms_est,
       CAST(min(c.cell_n) - qb.exact_n AS BIGINT) AS overest
FROM qb JOIN cells c USING (d, bucket)
GROUP BY qb.tok, qb.exact_n
"""


# --- token-budget curriculum selection ------------------------------------
CURR_BUDGET = 10_000  # token budget for the "train on the best" selection
CURR_SCORE_DP = 2  # histogram granularity (score rounded to 2 decimals)


def curriculum_token_budget(
    docs: DataFrame, budget: int = CURR_BUDGET, tokenizer: str = "whitespace"
) -> DataFrame:
    """Select the highest-quality docs until a token budget is exhausted —
     'train on the best N tokens', the curriculum/selection step after
    scoring. Order: quality score desc, doc_id asc (deterministic).

    Computed WITHOUT a global sort: scores quantize to a {CURR_SCORE_DP}-dp
    histogram (<= ~100 live buckets), per-bucket token totals broadcast back
    as cumulative offsets, and each bucket runs its own bounded running-sum
    window — rounding is monotonic, so (bucket desc, exact score desc,
    doc_id) IS the global order. Same two-phase shape as
    ``curation.global_shuffle``: a total order in the output with no
    data-sized single-partition stage.
    Output: (doc_id, score, n_tokens, cum_tokens) for selected docs.
    """
    # score and size come from ONE scan — no self-join of two frames
    # derived from the same documents read. The tiny (doc_id, score,
    # n_tokens) projection persists lazily: both the histogram branch and
    # the data branch read it, instead of each re-evaluating the
    # n-gram-heavy score expression over the full corpus (2-3x the query
    # cost at any scale; the projection is O(rows), not O(text bytes)).
    # persist() rather than localCheckpoint(eager=True): the eager variant
    # ran a job per invocation and pinned un-evictable RDD blocks forever
    # (checkpoint blocks truncate lineage, so the store can't drop them);
    # persisted blocks keep lineage, so the LRU store can evict and
    # recompute them — repeated calls in one session stay bounded by
    # executor storage, at worst re-running the deterministic score scan.
    # (_b is engine-internal: any monotone bucketing yields the same final
    # order, but use the explicit floor form anyway per the repo-wide
    # no-engine-round policy.)
    # tokenizer seam: whitespace stays a Column in the same single scan;
    # subword kernels add one Arrow-batched map stage before the projection
    from .tokenize import with_n_tokens

    base = (
        with_n_tokens(docs, tokenizer)
        .select(
            "doc_id",
            _quality_score_col().alias("score"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .withColumn("_b", _rd(F.col("score"), CURR_SCORE_DP))
        .persist()
    )
    htotals = base.groupBy("_b").agg(F.sum("n_tokens").alias("_bn"))
    w_off = Window.orderBy(F.col("_b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = htotals.select(
        "_b", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off")
    )
    joined = base.join(F.broadcast(offsets), "_b")
    # in-bucket rank: deterministic (score desc, doc_id) within the bucket;
    # every bucket is bounded by the histogram granularity at cluster scale
    w_in = Window.partitionBy("_b").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    ranked = joined.withColumn(
        "_cum",
        F.col("_off")
        + F.sum("n_tokens").over(
            w_in.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        ranked.filter(F.col("_cum") <= budget)
        .select(
            "doc_id", "score", "n_tokens", F.col("_cum").alias("cum_tokens")
        )
    )


def curriculum_sql(
    budget: int = CURR_BUDGET, source: str = "documents"
) -> str:
    inner = quality_sigmoid_sql(source).strip().rstrip()
    return f"""
WITH scored AS ({inner}),
base AS (
    SELECT s.doc_id, s.score,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
    FROM scored s JOIN {source} d USING (doc_id)
),
cum AS (
    SELECT doc_id, score, n_tokens,
           sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM base
)
SELECT doc_id, score, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cum WHERE cum_tokens <= {budget}
"""
