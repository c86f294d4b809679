"""Training-data curation operators: benchmark decontamination, composite
quality rules, context-window packing, deterministic global shuffle, PII
redaction, and inverted-index construction.

These are the operations a large-scale LLM training-data pipeline runs
between raw corpus and tokenizer — the layer above the dedup/similarity
operators (``operators/dedup.py``, ``operators/similarity.py``). All hot
paths are pure Column expressions (whole-stage codegen, zero Python); every
operator has a DuckDB SQL twin built from the same constants so the oracle
can never drift from the engine.

Scale posture (100 TB):
- decontamination shuffles only (gram_hash, doc_id) pairs and broadcasts the
  benchmark gram set when it fits (a benchmark is ~1e3-1e6 docs — it fits);
- quality rules / redaction are embarrassingly parallel scans;
- packing is per-group (one window partition per source shard — no global
  sort); the global shuffle is the one intentional total order and uses a
  range-partitioned sort on a uniform hash key;
- the inverted index shuffles on term (uniform vocabulary keys) with map-side
  partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.fp import rd as _rd, rd_sql as _rd_sql

# n-gram size for benchmark decontamination (WMDP/benchmark-leak style scans
# use 8-13 word grams; 8 keeps hits meaningful on short docs).
DECONTAM_NGRAM = 8

# Gopher-style quality rule thresholds (Rae et al. 2021 use analogous bounds;
# values tuned to the synthetic corpus so both branches are exercised).
MIN_WORDS = 30
MIN_MEAN_WORD_LEN = 3.5
MAX_MEAN_WORD_LEN = 5.0
QUALITY_STOPWORDS = ("the", "a", "of", "and", "is")

# Context-window packing target (tokens per training sequence block).
PACK_WINDOW = 512

# Deterministic global-shuffle seed (any string; both engines md5 the same
# bytes so the order is engine-independent).
SHUFFLE_SEED = "42"

# Synthetic-PII injection + redaction (the corpus has no real PII; the
# injection column makes the redaction path non-vacuous and oracle-gated).
PII_MOD = 7
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"


def _grams(n: int):
    """Word n-gram array from ``text`` (trailing partial gram for short docs,
    mirrored exactly by the DuckDB twin's clamped list slice)."""
    toks = F.split(F.col("text"), " ")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def _grams_sql(n: int, text: str = "text") -> str:
    return (
        f"list_transform("
        f"generate_series(1, greatest(len(string_split({text}, ' ')) - {n - 1}, 1)),"
        f" i -> array_to_string(string_split({text}, ' ')[i:i+{n - 1}], ' '))"
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """Flag corpus docs sharing any word n-gram with a benchmark/eval set —
    the test-set-leak scan every training pipeline must run before training.
    Output: (doc_id, n_shared_grams) for contaminated docs only.

    Plan: both sides explode distinct gram hashes (md5 — digest-only shuffle,
    raw text never crosses an exchange); the benchmark side collapses to a
    distinct gram set that Spark broadcasts (benchmarks are small by
    definition); per-doc count of matched grams. At 100 TB the corpus side
    is a scan + broadcast-semijoin + doc-keyed partial count.
    """
    c = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(_grams(n))).alias("g"),
    ).select("doc_id", F.md5("g").alias("gh"))
    b = (
        benchmark.select(F.explode(F.array_distinct(_grams(n))).alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    return (
        c.join(F.broadcast(b), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def decontaminate_sql(
    corpus: str, benchmark: str, n: int = DECONTAM_NGRAM
) -> str:
    return f"""
WITH c AS (
    SELECT DISTINCT doc_id, md5(g) AS gh
    FROM (SELECT doc_id, unnest({_grams_sql(n)}) AS g FROM {corpus})
),
b AS (
    SELECT DISTINCT md5(g) AS gh
    FROM (SELECT unnest({_grams_sql(n)}) AS g FROM {benchmark})
)
SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
FROM c JOIN b USING (gh)
GROUP BY c.doc_id
"""


# ---------------------------------------------------------------------------
# Composite quality rules (Gopher-style)
# ---------------------------------------------------------------------------


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Composite document-quality gate: word count, mean word length, and
    stopword presence must all pass (the Gopher/C4 rule-stack shape). Output:
    per-doc signals + the pass verdict, so downstream can filter OR audit.

    Zero-shuffle codegen scan — at 100 TB this is a map-only pass.
    """
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    # mean word length from char count (n_words-1 separators), engine-stable
    mean_wl = (F.length("text") - n_words + 1).cast("double") / n_words.cast(
        "double"
    )
    sw = list(QUALITY_STOPWORDS)
    has_stop = F.size(F.filter(toks, lambda t: t.isin(sw))) > 0
    passes = (
        (n_words >= MIN_WORDS)
        & (mean_wl >= MIN_MEAN_WORD_LEN)
        & (mean_wl <= MAX_MEAN_WORD_LEN)
        & has_stop
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        _rd(mean_wl, 5).alias("mean_word_len"),
        has_stop.alias("has_stopword"),
        passes.alias("passes"),
    )


def gopher_rules_sql(source: str = "documents") -> str:
    sw_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    return f"""
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       (floor((mean_wl) * 100000.0 + 0.5) / 100000.0) AS mean_word_len,
       has_stop AS has_stopword,
       (n_words >= {MIN_WORDS}
        AND mean_wl >= {MIN_MEAN_WORD_LEN}
        AND mean_wl <= {MAX_MEAN_WORD_LEN}
        AND has_stop) AS passes
FROM (
    SELECT doc_id, len(toks) AS n_words,
           CAST(len(text) - len(toks) + 1 AS DOUBLE) / len(toks) AS mean_wl,
           len(list_filter(toks, t -> t IN ({sw_list}))) > 0 AS has_stop
    FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM {source})
)
"""


# ---------------------------------------------------------------------------
# Context-window packing
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame, window: int = PACK_WINDOW, tokenizer: str = "whitespace"
) -> DataFrame:
    """Assign docs to fixed-size training-sequence blocks by running token
    offset: within each source shard (deterministic doc_id order), a doc's
    block is ``floor(start_offset / window)`` — the streaming-concatenation
    packing an LLM data loader applies before tokenization. Output:
    (doc_id, source, n_tokens, block_id, block_offset).

    ``tokenizer`` routes through the :mod:`..operators.tokenize` seam:
    the default whitespace count is a pure Column (codegen, oracle-gated);
    real subword kernels (import-gated tiktoken / HF tokenizers, or any
    ``register_tokenizer`` kernel) swap in without changing the packing
    shape. The window partition is per-source — at 100 TB each shard packs
    independently in parallel (one shuffle on source; no global sort).
    """
    from . import tokenize

    w = Window.partitionBy("source").orderBy("doc_id")
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        tokenize.with_n_tokens(docs, tokenizer)
        .select("doc_id", "source", "n_tokens")
        .withColumn("block_id", F.floor(start / window))
        .withColumn("block_offset", start - F.col("block_id") * window)
    )


def pack_sequences_sql(
    window: int = PACK_WINDOW, source: str = "documents"
) -> str:
    return f"""
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(start_off / {window}) AS BIGINT) AS block_id,
       CAST(start_off - floor(start_off / {window}) * {window} AS BIGINT)
         AS block_offset
FROM (
    SELECT doc_id, source, n_tokens,
           coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS start_off
    FROM (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
          FROM {source})
)
"""


# ---------------------------------------------------------------------------
# Deterministic global shuffle
# ---------------------------------------------------------------------------


# Bucket count is DERIVED from the hex-prefix length actually used to split
# the sort key, so raising it genuinely widens the shuffle (a standalone
# bucket constant the code never read was a tuning trap). The oracle twin is
# unaffected: the bucket is a PREFIX of the md5 sort key, so the bucketed
# two-phase rank produces the identical total order at any prefix length.
SHUFFLE_PREFIX_CHARS = 2  # raise to 3 (4096 buckets) for larger clusters
SHUFFLE_BUCKETS = 16**SHUFFLE_PREFIX_CHARS


def global_shuffle(docs: DataFrame, seed: str = SHUFFLE_SEED) -> DataFrame:
    """Seeded, engine-independent global shuffle order for training: position
    = rank of md5(seed || doc_id). Output: (doc_id, shuffle_pos).

    The one intentional total order in the pipeline — computed WITHOUT a
    global window (``Window.orderBy`` with no partition collapses all rows
    to one task). Because the bucket is a PREFIX of the sort key, global
    order = (bucket, in-bucket order), so: rank locally per bucket (uniform
    md5 prefix -> SHUFFLE_BUCKETS balanced partitions), then add the
    cumulative count of lower buckets. The offset table is <= SHUFFLE_BUCKETS
    rows — its own
    window is single-partition but BOUNDED by construction, and it reaches
    the data-sized side as a broadcast join.
    """
    key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", key.alias("_k")).withColumn(
        "_b", F.substring("_k", 1, SHUFFLE_PREFIX_CHARS)
    )
    w_local = Window.partitionBy("_b").orderBy("_k", "doc_id")
    local = keyed.withColumn("_lr", F.row_number().over(w_local))
    counts = keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return local.join(F.broadcast(offsets), "_b").select(
        "doc_id",
        (F.col("_off") + F.col("_lr")).cast("bigint").alias("shuffle_pos"),
    )


def global_shuffle_sql(
    seed: str = SHUFFLE_SEED, source: str = "documents"
) -> str:
    return f"""
SELECT doc_id,
       CAST(row_number() OVER (
           ORDER BY md5('{seed}:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS shuffle_pos
FROM {source}
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def with_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Deterministically inject an email into every PII_MOD-th doc (the
    corpus is synthetic word salad with no real PII; this makes the redaction
    path non-vacuous and exactly mirrorable in the oracle)."""
    email = F.concat(
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
    )
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % PII_MOD == 0, F.concat(F.col("text"), email))
        .otherwise(F.col("text")),
    )


SYNTHETIC_PII_SQL = f"""(
    SELECT doc_id,
           CASE WHEN doc_id % {PII_MOD} = 0
                THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
                     || '@example.com'
                ELSE text END AS text,
           lang, source, n_chars
    FROM documents
)"""


def redact_pii(docs: DataFrame) -> DataFrame:
    """Scrub email addresses (the pattern family extends to phones/SSNs the
    same way): replace with a typed placeholder, count redactions per doc.
    Output: (doc_id, n_redactions, text_clean). Map-only codegen scan."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE))
        .cast("bigint")
        .alias("n_redactions"),
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>").alias("text_clean"),
    )


def redact_pii_sql(source: str = "documents") -> str:
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
         AS n_redactions,
       regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS text_clean
FROM {source}
"""


# ---------------------------------------------------------------------------
# Inverted index
# ---------------------------------------------------------------------------


POSTING_SEGMENT = 64  # max doc ids per (term, segment) output row


def inverted_index(
    docs: DataFrame, seg_size: int = POSTING_SEGMENT
) -> DataFrame:
    """Term -> segmented posting list + exact global document frequency. The
    search-side artifact a corpus service builds next to the training set.
    Output: (term, segment, df, postings) — ``postings`` is the
    comma-joined sorted doc-id run of ≤ ``seg_size`` ids; ``df`` is the
    EXACT per-term total across all of that term's segments.

    Shape for 100 TB: one term-keyed shuffle of (term, doc_id) pairs with
    map-side distinct; vocabulary keys are near-uniform so the exchange is
    balanced. A stop-word's postings are NOT collected into one group (an
    unbounded ``collect_list`` is a single-task OOM at scale) — instead a
    per-term ``row_number`` assigns each posting to a ``seg_size``-capped
    segment, so every collected group is bounded by construction. The
    row_number window sorts within the term partition (sort-spillable,
    disk-bounded) rather than buffering the term's postings in memory the
    way collect_list must. ``df`` is recovered as a window sum over the
    already-aggregated segment counts (rows = #segments, tiny).

    Postings serialize as a comma-joined string — a deterministic scalar
    encoding both engines produce identically (the canonical-form pattern
    of operators/export.py's JSON lines), which also keeps downstream
    hashing/diffing of index shards trivial.
    """
    pairs = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.length("term") > 0)
        .distinct()
    )
    w_rank = Window.partitionBy("term").orderBy("doc_id")
    seg = pairs.withColumn(
        "segment",
        F.floor((F.row_number().over(w_rank) - 1) / seg_size).cast("bigint"),
    )
    grouped = seg.groupBy("term", "segment").agg(
        F.count(F.lit(1)).alias("_n"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    w_df = Window.partitionBy("term")
    return grouped.select(
        "term",
        "segment",
        F.sum("_n").over(w_df).cast("bigint").alias("df"),
        "postings",
    )


def inverted_index_sql(
    source: str = "documents", seg_size: int = POSTING_SEGMENT
) -> str:
    return f"""
WITH pairs AS (
    SELECT DISTINCT doc_id, term
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM {source})
    WHERE len(term) > 0
),
seg AS (
    SELECT term, doc_id,
           CAST(floor((row_number() OVER (PARTITION BY term ORDER BY doc_id)
                       - 1) / {seg_size}) AS BIGINT) AS segment
    FROM pairs
),
grouped AS (
    SELECT term, segment, count(*) AS _n,
           array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id),
                           ',') AS postings
    FROM seg GROUP BY term, segment
)
SELECT term, segment,
       CAST(sum(_n) OVER (PARTITION BY term) AS BIGINT) AS df, postings
FROM grouped
"""
