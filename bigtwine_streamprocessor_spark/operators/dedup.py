"""Deduplication operators for large-scale training-data pipelines.

These extend the engine beyond the reference's NEEL surface (which has no
dedup) with the standard document-dedup arsenal, each designed for the
1000-executor / 100 TB regime:

* **exact** — hash-groupBy on content: one shuffle on a 128-bit digest, never
  on the raw text (shuffle payload stays tiny no matter how long documents
  are).
* **MinHash + LSH** — shingle -> k independent MinHash values -> band buckets
  -> candidate pairs only within buckets. Avoids the O(n^2) cross join: the
  only shuffles are (a) explode-shingles -> per-doc min-agg and (b) the
  band-bucket self-join, both key-partitioned and skew-tolerant (band keys
  are uniform by construction of the hash).
* **SimHash** — 64-bit signature from per-token md5 bits, bit-majority folded
  per document; near-dups by banded sub-signature equality (4 x 16-bit bands)
  plus an exact Hamming-distance check — complete for distance <= 3 by
  pigeonhole, without the n^2/65536 random-collision floor of a 16-bit
  whole-signature join.
* **n-gram Jaccard** — exact pairwise similarity, but only over LSH/bucket
  candidates, never all pairs.

Everything is built-in Column expressions (md5 / substring / conv / explode /
groupBy) — no Python UDFs — and every hash is md5-derived so the DuckDB oracle
reproduces values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.corpus import spread_small_scan
from bigtwine_streamprocessor_spark.fp import rd as _rd, rd_sql as _rd_sql

# MinHash configuration: K permutations, B bands x R rows per band (K = B*R).
# Permutations come from MD5_ROUNDS md5 digests per shingle, each split into
# CHUNKS_PER_MD5 independent 32-bit (8-hex-char) chunks — 4x fewer digest
# computations than one md5 per permutation, identical statistical contract
# (chunks of a cryptographic hash are independent).
MINHASH_K = 12
MD5_ROUNDS = 3
CHUNKS_PER_MD5 = 4
LSH_BANDS = 4
LSH_ROWS = 3
SHINGLE_N = 3  # word n-grams


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

# The synthetic documents corpus contains no byte-identical rows, so exact
# dedup over it is trivially empty at every sf (round-1 finding: green on 0
# rows proves nothing). Seeding re-tagged copies of every DUP_SEED_MOD-th doc
# gives the queries real duplicate groups to find — mirrored verbatim in the
# oracle so both sides dedup the same corpus.
DUP_SEED_MOD = 50
DUP_SEED_OFFSET = 1_000_000


def with_seeded_duplicates(docs: DataFrame) -> DataFrame:
    """Documents plus deterministic exact duplicates (every 50th doc copied
    under doc_id + 1e6)."""
    dups = docs.filter(F.col("doc_id") % DUP_SEED_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(DUP_SEED_OFFSET)
    )
    return docs.unionByName(dups)


SEEDED_DOCS_SQL = f"""(
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + {DUP_SEED_OFFSET} AS doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % {DUP_SEED_MOD} = 0
)"""


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical documents: (text_hash, keeper, dup_ids, n_dups).

    Keeper = min doc_id (deterministic). Shuffles only (hash, doc_id) pairs.
    """
    return (
        docs.select(F.col("doc_id"), F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )


def exact_sql(source: str = "documents") -> str:
    return f"""
SELECT md5(text) AS text_hash,
       min(doc_id) AS keeper,
       count(*) AS group_size
FROM {source}
GROUP BY 1
HAVING count(*) > 1
"""


EXACT_SQL = exact_sql()


def dedup_exact(docs: DataFrame) -> DataFrame:
    """The dedup itself: keep one row per distinct text (min doc_id wins)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_exact_sql(source: str = "documents") -> str:
    return f"""
SELECT doc_id, text, lang, source, n_chars
FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS _rn
    FROM {source}
) WHERE _rn = 1
"""


DEDUP_EXACT_SQL = dedup_exact_sql()


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def _shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Word n-gram shingles, distinct per doc: (doc_id, shingle)."""
    docs = spread_small_scan(docs)  # r15: single-row-group scans are 1-core
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - SHINGLE_N, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, SHINGLE_N), " "),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def _shingles_sql(source: str = "documents") -> str:
    return f"""
shingles AS (
    SELECT DISTINCT doc_id, shingle
    FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(string_split(text, ' ')) - {SHINGLE_N - 1}, 1)),
                   i -> array_to_string(string_split(text, ' ')[i:i+{SHINGLE_N - 1}], ' ')
               )) AS shingle
        FROM {source}
    )
)
"""


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """K MinHash values per doc: (doc_id, sig array<string>).

    Permutation (s, c) = 8-hex-char chunk c of md5(s || '|' || shingle); the
    min over shingles per permutation is the signature component. Fixed-width
    lowercase-hex min == numeric min, and stays portable to the oracle.
    """
    # Plan shape matters here (measured at sf0.1):
    # - explode (shingle x perm) then groupBy(doc_id, perm): 35M rows through
    #   the exchange — slow;
    # - per-row nested HOFs: no shuffle but HOFs are CodegenFallback with no
    #   common-subexpression elimination, so every md5 re-evaluates 12x —
    #   13x slower;
    # - THIS: explode shingles once, one projection computing the 3 digests,
    #   12 substring chunks as plain columns, then a single groupBy(doc_id)
    #   with 12 min aggregates — partial aggregation collapses map-side to
    #   ~|docs| rows before the one exchange.
    sh = _shingles(docs)
    digests = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle"))).alias(f"_m{s}")
            for s in range(MD5_ROUNDS)
        ],
    )
    chunks = digests.select(
        "doc_id",
        *[
            F.substring(f"_m{s}", c * 8 + 1, 8).alias(f"_h{s * CHUNKS_PER_MD5 + c}")
            for s in range(MD5_ROUNDS)
            for c in range(CHUNKS_PER_MD5)
        ],
    )
    mins = chunks.groupBy("doc_id").agg(
        *[F.min(f"_h{p}").alias(f"_s{p}") for p in range(MINHASH_K)]
    )
    return mins.select(
        "doc_id", F.array(*[f"_s{p}" for p in range(MINHASH_K)]).alias("sig")
    )


def minhash_sql(source: str = "documents") -> str:
    return f"""
{_shingles_sql(source).strip().rstrip(',')},
perm_hashes AS (
    SELECT doc_id, s * {CHUNKS_PER_MD5} + c AS perm,
           min(substr(md5(CAST(s AS VARCHAR) || '|' || shingle), c * 8 + 1, 8))
             AS minh
    FROM shingles,
         (SELECT unnest(generate_series(0, {MD5_ROUNDS - 1})) AS s),
         (SELECT unnest(generate_series(0, {CHUNKS_PER_MD5 - 1})) AS c)
    GROUP BY doc_id, 2
),
signatures AS (
    SELECT doc_id, list(minh ORDER BY perm) AS sig
    FROM perm_hashes GROUP BY doc_id
)
"""


def signature_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) — banded signature hashes, the LSH join key.
    ``bucket`` is md5 of a band's R signature components, so two docs share a
    bucket iff they agree on the whole band."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.array_join(
                            F.slice(F.col("sig"), b * LSH_ROWS + 1, LSH_ROWS), ","
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(docs: DataFrame, sigs: DataFrame | None = None) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH: (doc_a, doc_b, band).

    Docs sharing ALL R rows of any band land in the same bucket; the self-join
    runs per (band, bucket_key) — uniform keys, no skew, no cross join.
    ``sigs`` takes an ALREADY-MATERIALIZED signature frame (persisted or
    checkpointed by the caller) so a caller composing several signature
    consumers pays the shingle explode once — probing a pre-materialized
    frame measured 0.32 s vs 3.0 s recomputed at sf0.1. Deliberately NOT
    materialized here when absent: Spark runs the self-join's two chain
    executions in parallel, so the redundant compute costs CPU but almost
    no wall time, while an eager checkpoint inserts a serializing barrier
    that measured SLOWER end-to-end (3.1 -> 2.0 s claim did not survive
    whole-query measurement: ngram_jaccard went 2.9 -> 5.3 s with the
    barrier). At 100 TB the calculus flips — there the caller persists
    sigs and passes it in.
    """
    bands = signature_bands(
        sigs if sigs is not None else minhash_signatures(docs)
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def lsh_pairs_sql(source: str = "documents") -> str:
    return f"""
{minhash_sql(source).strip().rstrip(',')},
bands AS (
    SELECT doc_id, band,
           md5(array_to_string(sig[band * {LSH_ROWS} + 1 : band * {LSH_ROWS} + {LSH_ROWS}], ',')) AS bucket
    FROM signatures, (SELECT unnest(generate_series(0, {LSH_BANDS - 1})) AS band)
),
lsh_pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
"""


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, cands: DataFrame | None = None
) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates only: (doc_a, doc_b, jaccard).

    The expensive exact measure runs on the tiny candidate set, not on n^2.
    Jaccard computed distributively: |A ∩ B| via shingle co-occurrence join,
    |A ∪ B| = |A| + |B| - |A ∩ B| — no arrays shipped between stages.
    ``cands`` takes a precomputed candidate set (same reuse contract as
    ``lsh_candidate_pairs(sigs=...)``).
    """
    docs = spread_small_scan(docs)  # r15: see _shingles (no-op at scale)
    if cands is None:
        cands = lsh_candidate_pairs(docs)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - SHINGLE_N, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, SHINGLE_N), " "),
        )
    )
    sh = docs.select("doc_id", grams.alias("sh"))
    # join the (tiny) candidate set to the per-doc shingle ARRAYS and compute
    # |A ∩ B| with array_intersect per row: two id-keyed joins instead of a
    # shingle co-occurrence join — shuffle payload is |cands|, not |shingles|
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_sql(source: str = "documents", threshold: float = 0.5) -> str:
    return f"""
{lsh_pairs_sql(source).strip().rstrip(',')},
sizes AS (
    SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_inter
    FROM lsh_pairs c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY c.doc_a, c.doc_b
),
jaccard_pairs AS (
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS DOUBLE) / CAST(a.n_sh + b.n_sh - i.n_inter AS DOUBLE)
             AS jaccard
    FROM inter i
    JOIN sizes a ON a.doc_id = i.doc_a
    JOIN sizes b ON b.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / CAST(a.n_sh + b.n_sh - i.n_inter AS DOUBLE)
          >= {threshold}
)
"""


# ---------------------------------------------------------------------------
# Duplicate clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

CLUSTER_MAX_ITERS = 50
# Loop-side partition sizing for connected_components: ~250k edge rows (two
# bigints) per map task keeps tasks in the hundreds-of-ms band; small graphs
# collapse to one task, billion-edge graphs keep thousands.
EDGES_PER_PARTITION = 250_000


def connected_components(edges: DataFrame) -> DataFrame:
    """Connected components over an undirected pair graph (doc_a, doc_b) ->
    (doc_id, cluster_id), cluster_id = min doc_id of the component.

    Min-label propagation to fixpoint: each iteration joins labels across
    edges and takes the component-wise min (one doc_id-keyed shuffle per
    iteration; iteration count ~ component diameter, which is tiny for
    near-dup cliques). The per-iteration convergence check is a scalar
    count — the standard driver-side loop for iterative graph algorithms
    (GraphX/GraphFrames do the same under the hood).

    Takes the edge frame as INPUT (rather than recomputing candidate
    generation internally) so production pipelines feed cached/precomputed
    pairs and clustering costs only the propagation rounds.
    """
    # localCheckpoint (not persist): materializes the edge frame AND truncates
    # its lineage BEFORE the union — candidate-generation plans can carry
    # enormous expression trees (e.g. unrolled 64-dim LSH hyperplanes), and
    # unioning two copies of that tree doubles it into a plan the driver
    # can't even compile (observed heap OOM on the embedding edge source).
    # Checkpoint once, then both union branches read the truncated frame.
    edges = edges.localCheckpoint(eager=True)
    # Right-size the loop's map-side task count to the GRAPH, not to the
    # candidate-generation stage: upstream pins its join parallelism high
    # (the cos-fold fan-out needs it), but every propagation round then
    # rescans the checkpointed frames with that many map tasks — on a small
    # graph that is hundreds of near-empty tasks per round of pure scheduling
    # overhead (measured 2x the whole query at bench scale). The count is a
    # cheap job over the just-materialized checkpoint; coalesce merges
    # partitions without a shuffle. Scale-proportional by construction: a
    # billion-edge graph keeps thousands of partitions.
    n_edges = edges.count()
    cur_parts = edges.rdd.getNumPartitions()
    target = max(1, min(cur_parts, -(-n_edges // EDGES_PER_PARTITION)))
    if target < cur_parts:
        edges = edges.coalesce(target)
    bidir = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=True)
    labels = (
        bidir.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(CLUSTER_MAX_ITERS):
        nb = bidir.join(
            labels.withColumnRenamed("doc_id", "doc_b"), "doc_b"
        ).select(F.col("doc_a").alias("doc_id"), "label")
        prop = (
            labels.unionByName(nb)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: also adopt the label OF my label (one extra
        # id-keyed join per round) — convergence drops from O(diameter) to
        # O(log diameter), which is what makes long chain-shaped components
        # (loose-threshold embedding graphs) tractable.
        prop = (
            prop.alias("p")
            .join(
                prop.select(
                    F.col("doc_id").alias("label"),
                    F.col("label").alias("_ll"),
                ).alias("pl"),
                "label",
                "left",
            )
            .select(
                F.col("doc_id"),
                F.least(F.col("label"), F.col("_ll")).alias("label"),
            )
        )
        # Fold convergence detection into the same materialization: the
        # changed flag rides along, so the per-round cost is ONE job plus a
        # count over the cached result (no separate compare join/job).
        # localCheckpoint, NOT persist: persist keeps the full lineage, so
        # each round's plan embeds the previous round's twice and the plan
        # tree (and its explain string) grows exponentially — observed
        # driver heap OOM around round 8. Checkpointing truncates lineage to
        # the materialized result, keeping every round's plan constant-size.
        prop = (
            prop.join(
                labels.withColumnRenamed("label", "_old"), "doc_id", "left"
            )
            .select(
                "doc_id",
                "label",
                (F.col("label") != F.col("_old")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = prop.filter(F.col("_chg")).count()
        labels = prop.select("doc_id", "label")
        if changed == 0:
            break
    else:  # pragma: no cover - tiny diameters converge in a few rounds
        raise RuntimeError("connected_components did not converge")
    # materialize with truncated lineage, then release every cached frame —
    # returning the persisted `labels` directly would leak one cached
    # DataFrame per invocation (the loop unpersists all but the last round)
    out = labels.select(
        "doc_id", F.col("label").alias("cluster_id")
    ).localCheckpoint(eager=True)
    labels.unpersist()
    return out


def dedup_clusters(
    docs: DataFrame, threshold: float = 0.5, edges: DataFrame | None = None
) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the verified near-dup
    pair graph (n-gram Jaccard >= threshold on LSH candidates). Output:
    (doc_id, cluster_id) for every doc in at least one pair — cluster_id =
    the keeper doc each group dedups onto.

    Thin composition of ``ngram_jaccard_pairs`` + ``connected_components``;
    pass a precomputed ``edges`` frame (doc_a, doc_b) to skip the LSH+Jaccard
    chain (production caches the pair stage — recomputing it inside every
    clustering run was the dominant cost). The DuckDB oracle computes the
    same fixpoint with a recursive CTE, so this iterative operator is still
    fully hash-gated.
    """
    if edges is None:
        edges = ngram_jaccard_pairs(docs, threshold).select("doc_a", "doc_b")
    return connected_components(edges)


def dedup_clusters_sql(source: str = "documents", threshold: float = 0.5) -> str:
    """Full oracle: WITH RECURSIVE fixpoint of the same min-label reachability
    (must be the FIRST clause of the query — includes the jaccard chain)."""
    return f"""
WITH RECURSIVE {ngram_jaccard_sql(source, threshold).strip().rstrip(',')},
cluster_edges AS (
    SELECT doc_a, doc_b FROM jaccard_pairs
    UNION ALL
    SELECT doc_b AS doc_a, doc_a AS doc_b FROM jaccard_pairs
),
walk(doc_id, label) AS (
    SELECT DISTINCT doc_a AS doc_id, doc_a AS label FROM cluster_edges
    UNION
    SELECT e.doc_b AS doc_id, w.label
    FROM walk w JOIN cluster_edges e ON e.doc_a = w.doc_id
)
SELECT doc_id, min(label) AS cluster_id FROM walk GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# SimHash (64-bit, banded Hamming candidates)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 16  # BITS = BANDS * BAND_BITS
SIMHASH_HAMMING_T = 3
# Banded recall guarantee: a pair at Hamming distance <= 3 differs in at most
# 3 of the 4 bands, so AT LEAST ONE 16-bit band matches exactly (pigeonhole)
# -> the band-equality join finds every such pair. Random 64-bit collisions
# per band are ~n^2/65536 per band but only for docs that genuinely agree on
# 16 signature bits — unlike the round-1 16-bit whole-signature join, where
# EVERY pair collided at rate 1/65536 with Hamming-0-only recall.


def simhash_bands(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per doc: (doc_id, bands array<int>[4], simhash hex).

    Bit j of a token's hash = bit (j mod 32) of 32-bit chunk (j div 32) of
    md5(token) (chunks = the first two 8-hex-char slices). The doc
    signature takes the majority vote over tokens per bit (>=0 ties -> 1,
    weighted by token multiplicity). Signature is materialized as four 16-bit
    band values (the LSH join keys) plus a 16-hex-char display string — a
    64-bit value with bit 63 set would overflow signed BIGINT arithmetic
    portably, band ints never do. Pure Column expressions; one exchange
    (groupBy doc_id) with map-side partial votes.
    """
    t = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).withColumn("h", F.md5("token"))
    # two 32-bit hex chunks per token (2 convs, not 32 per-digit convs —
    # measured ~35% off the whole-query wall); bit j lives in chunk j div 32
    chunks = t.select(
        "doc_id",
        *[
            F.conv(F.substring("h", c * 8 + 1, 8), 16, 10)
            .cast("long")
            .alias(f"_c{c}")
            for c in range(2)
        ],
    )
    bit_votes = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"_c{j // 32}"), j % 32).bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = chunks.groupBy("doc_id").agg(*bit_votes)
    band_cols = []
    for b in range(SIMHASH_BANDS):
        band = sum(
            (
                F.when(F.col(f"b{b * SIMHASH_BAND_BITS + i}") >= 0, 1).otherwise(0)
                * (1 << i)
            )
            for i in range(SIMHASH_BAND_BITS)
        )
        band_cols.append(band.cast("int").alias(f"band{b}"))
    sig = votes.select("doc_id", *band_cols)
    hex_str = F.concat(
        *[
            F.lpad(F.lower(F.hex(F.col(f"band{b}"))), 4, "0")
            for b in reversed(range(SIMHASH_BANDS))
        ]
    )
    return sig.select(
        "doc_id",
        F.array(*[f"band{b}" for b in range(SIMHASH_BANDS)]).alias("bands"),
        hex_str.alias("simhash"),
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash hex string) — the signature view of simhash_bands."""
    return simhash_bands(docs).select("doc_id", "simhash")


def simhash_sql(source: str = "documents") -> str:
    """CTE chain ending in ``simhash(doc_id, band0..3, simhash)`` — the
    DuckDB twin of simhash_bands, same chunk/vote/band/hex arithmetic."""
    vote_terms = ", ".join(
        f"sum(CASE WHEN (_c{j // 32} >> {j % 32}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    digit_terms = ", ".join(
        f"CAST(concat('0x', substr(h, {c * 8 + 1}, 8)) AS BIGINT) AS _c{c}"
        for c in range(2)
    )
    band_terms = ", ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN b{b * SIMHASH_BAND_BITS + i} >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(SIMHASH_BAND_BITS)
        )
        + f" AS INT) AS band{b}"
        for b in range(SIMHASH_BANDS)
    )
    hex_expr = " || ".join(
        f"printf('%04x', band{b})" for b in reversed(range(SIMHASH_BANDS))
    )
    return f"""
tok_digits AS (
    SELECT doc_id, {digit_terms}
    FROM (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM {source})
),
votes AS (
    SELECT doc_id, {vote_terms}
    FROM tok_digits GROUP BY doc_id
),
simhash AS (
    SELECT doc_id, {band_terms}, {hex_expr} AS simhash FROM votes
)
"""


def simhash_pairs(
    docs: DataFrame, hamming_t: int = SIMHASH_HAMMING_T
) -> DataFrame:
    """Near-dup pairs by banded SimHash: (doc_a, doc_b, hamming).

    Candidates = pairs sharing any 16-bit band value (band-keyed self-join,
    uniform keys, no cross join); survivors = exact 64-bit Hamming distance
    <= hamming_t via bit_count(xor) over the band ints. Guaranteed complete
    for hamming_t <= 3 with 4 bands (pigeonhole).
    """
    sb = simhash_bands(docs)
    bands = sb.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_val")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sig_a = sb.select(F.col("doc_id").alias("doc_a"), F.col("bands").alias("bands_a"))
    sig_b = sb.select(F.col("doc_id").alias("doc_b"), F.col("bands").alias("bands_b"))
    hamming = sum(
        F.bit_count(
            F.col("bands_a")[i].bitwiseXOR(F.col("bands_b")[i])
        )
        for i in range(SIMHASH_BANDS)
    )
    return (
        cands.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= hamming_t)
    )


def simhash_pairs_sql(
    source: str = "documents", hamming_t: int = SIMHASH_HAMMING_T
) -> str:
    ham = " + ".join(
        f"bit_count(xor(a.band{b}, b.band{b}))" for b in range(SIMHASH_BANDS)
    )
    return f"""
{simhash_sql(source).strip().rstrip(',')},
sim_bands AS (
    SELECT doc_id, i AS band_idx,
           [band0, band1, band2, band3][i + 1] AS band_val
    FROM simhash, (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS i)
),
sim_cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sim_bands a JOIN sim_bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
),
simhash_pairs AS (
    SELECT c.doc_a, c.doc_b, CAST({ham} AS INT) AS hamming
    FROM sim_cands c
    JOIN simhash a ON a.doc_id = c.doc_a
    JOIN simhash b ON b.doc_id = c.doc_b
    WHERE {ham} <= {hamming_t}
)
"""


# ---------------------------------------------------------------------------
# Streaming dedup
# ---------------------------------------------------------------------------

def streaming_dedup(stream: DataFrame, key_cols: list[str], watermark_col: str,
                    delay: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: drop duplicate keys within the watermark window.

    The state store keeps one entry per key inside the watermark horizon —
    bounded state, unlike an unwatermarked dropDuplicates. This is the
    streaming face of `dedup_exact` for continuous ingestion pipelines.
    """
    return stream.withWatermark(watermark_col, delay).dropDuplicates(key_cols)


def minhash_estimate_pairs(
    docs: DataFrame,
    sigs: DataFrame | None = None,
    cands: DataFrame | None = None,
) -> DataFrame:
    """Sketch calibration: for every LSH candidate pair, the MinHash ESTIMATE
    of Jaccard (fraction of agreeing signature components) beside the exact
    n-gram Jaccard and the absolute error. Both sides are deterministic
    (fixed md5-chunk permutations), so the whole calibration is oracle-exact
    — the audit that tells you whether K=12 permutations is enough before
    trusting the sketch at 100 TB.

    The signature frame feeds three consumers here (banded candidates +
    both sides of the agreement join). It is deliberately NOT materialized:
    local measurement showed the redundant chain executions run in parallel
    (wall-time-free at 32 threads) while an eager checkpoint's serializing
    barrier made the whole query SLOWER (3.5 -> 4.6 s at sf0.1). A 100 TB
    caller persists signatures and passes them through the ``sigs=`` /
    ``cands=`` seams instead (equality pinned in test_dedup.py; the
    composed persisted-sigs measurement lives in scripts/sigs_reuse_bench
    .py and PERF.md "Signature reuse seams").
    """
    exact = ngram_jaccard_pairs(docs, 0.0, cands=cands).withColumnRenamed(
        "jaccard", "exact_jaccard"
    )
    if sigs is None:
        sigs = minhash_signatures(docs)
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("_sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("_sb"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("_sa"), F.col("_sb"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    est = agree.cast("double") / F.lit(float(MINHASH_K))
    return (
        exact.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            _rd("exact_jaccard", 6).alias("exact_jaccard"),
            _rd(est, 6).alias("est_jaccard"),
            _rd(F.abs(est - F.col("exact_jaccard")), 6).alias("abs_err"),
        )
    )


def minhash_estimate_sql(source: str = "documents") -> str:
    return f"""
WITH {ngram_jaccard_sql(source, 0.0).strip().rstrip(',')},
calib AS (
    SELECT j.doc_a, j.doc_b, j.jaccard AS exact_jaccard,
           CAST(len([i FOR i IN generate_series(1, {MINHASH_K})
                     IF sa.sig[i] = sb.sig[i]]) AS DOUBLE) / {MINHASH_K}
             AS est_jaccard
    FROM jaccard_pairs j
    JOIN signatures sa ON sa.doc_id = j.doc_a
    JOIN signatures sb ON sb.doc_id = j.doc_b
)
SELECT doc_a, doc_b, (floor((exact_jaccard) * 1000000.0 + 0.5) / 1000000.0) AS exact_jaccard,
       (floor((est_jaccard) * 1000000.0 + 0.5) / 1000000.0) AS est_jaccard,
       (floor((abs(est_jaccard - exact_jaccard)) * 1000000.0 + 0.5) / 1000000.0) AS abs_err
FROM calib
"""
