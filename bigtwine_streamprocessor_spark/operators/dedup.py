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
* **SimHash** — 16-bit signature from per-token md5 nibbles, bit-majority
  folded per document; near-dups = signature collision.
* **n-gram Jaccard** — exact pairwise similarity, but only over LSH/bucket
  candidates, never all pairs.

Everything is built-in Column expressions (md5 / substring / conv / explode /
groupBy) — no Python UDFs — and every hash is md5-derived so the DuckDB oracle
reproduces values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


EXACT_SQL = """
SELECT md5(text) AS text_hash,
       min(doc_id) AS keeper,
       count(*) AS group_size
FROM documents
GROUP BY 1
HAVING count(*) > 1
"""


def dedup_exact(docs: DataFrame) -> DataFrame:
    """The dedup itself: keep one row per distinct text (min doc_id wins)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


DEDUP_EXACT_SQL = """
SELECT doc_id, text, lang, source, n_chars
FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS _rn
    FROM documents
) WHERE _rn = 1
"""


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def _shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Word n-gram shingles, distinct per doc: (doc_id, shingle)."""
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


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH: (doc_a, doc_b, band).

    Docs sharing ALL R rows of any band land in the same bucket; the self-join
    runs per (band, bucket_key) — uniform keys, no skew, no cross join.
    """
    sigs = minhash_signatures(docs)
    bands = sigs.select(
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


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates only: (doc_a, doc_b, jaccard).

    The expensive exact measure runs on the tiny candidate set, not on n^2.
    Jaccard computed distributively: |A ∩ B| via shingle co-occurrence join,
    |A ∪ B| = |A| + |B| - |A ∩ B| — no arrays shipped between stages.
    """
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
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """16-bit SimHash per doc from per-token md5 nibble parities.

    Bit j of a token's hash = parity of hex digit j of md5(token); the doc
    signature takes the majority vote over tokens per bit (>=0 ties -> 1,
    weighting by token multiplicity). Pure Column expressions.
    """
    toks = F.explode(F.split(F.col("text"), " ")).alias("token")
    t = docs.select("doc_id", toks)
    t = t.withColumn("h", F.md5("token"))
    bit_votes = [
        F.sum(
            F.when(
                F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int") % 2 == 1, 1
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = t.groupBy("doc_id").agg(*bit_votes)
    sig = sum(
        (F.when(F.col(f"b{j}") >= 0, 1).otherwise(0) * (1 << j))
        for j in range(SIMHASH_BITS)
    )
    return votes.select("doc_id", sig.cast("int").alias("simhash"))


def simhash_sql(source: str = "documents") -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (CASE WHEN substr(h, {j + 1}, 1) BETWEEN '0' AND '9' "
        f"THEN CAST(substr(h, {j + 1}, 1) AS INT) "
        f"ELSE ascii(substr(h, {j + 1}, 1)) - 87 END) % 2 = 1 THEN 1 ELSE -1 END) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
tok_hashes AS (
    SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
    FROM {source}
),
simhash AS (
    SELECT doc_id, CAST({bit_terms} AS INT) AS simhash
    FROM tok_hashes GROUP BY doc_id
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
