"""Deterministic in-process mock enrichment services (local transport mode).

The reference fans every tweet out to four external microservices over Kafka
request/response topics (SURVEY.md §2.10): NER -> NEL -> link-resolver, plus a
geo-decoder. The services themselves live outside the reference repo; for the
correctness harness they are replaced by deterministic pure functions with the
same dataflow signature, expressed as built-in Column transforms (JVM-side,
whole-stage-codegen — no Python in the hot path):

* **NER** (`mock_ner`): dictionary match over a fixed lexicon. Token positions
  are 0-based character offsets into the text, matching the substring-backfill
  contract of `NeelProcessedTweetWindowFunction.java:85-95`.
* **NEL** (`mock_nel`): maps each recognized token to a link or NIL cluster
  with a confidence score — arithmetic on (position, token length) so the
  DuckDB oracle reproduces it bit-for-bit.
* **link-resolver** (`mock_resources`): resolves a *subset* of links (even
  token length) to resource records, mirroring "resolving only a subset"
  (FIXTURES.md §7); unresolved links simply have no resource row.
* **geo-decoder** (`mock_geo`): static location-string -> (lat, lng) decode for
  locations passing `statusHasUserLocation` (`TwitterNeelUtils.java:23-28`).

Scale note: NER avoids a per-tweet window shuffle entirely — token offsets are
computed with a single `aggregate` higher-order function fold over
`split(text)`, so recognition is embarrassingly parallel per row. The SQL
twins (``*_SQL`` CTE fragments) compute identical values with window functions,
which is fine for the oracle at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed NER lexicon (must be words that occur in the synthetic document vocab).
LEXICON = ("spark", "join", "window", "hash", "vector", "stream", "query", "batch")

LINK_PREFIX = "http://dbpedia.org/resource/"
THUMB_PREFIX = "https://img.example/"
CATEGORIES = ("organization", "product", "concept")


# ---------------------------------------------------------------------------
# NER
# ---------------------------------------------------------------------------

def mock_ner(parsed: DataFrame) -> DataFrame:
    """Recognize lexicon tokens with character positions; one row per entity.

    Output grain: (id, text, token, pos, ent_start, ent_end) where ``pos`` is
    the token index among all whitespace tokens and ``ent_start``/``ent_end``
    are 0-based char offsets (end exclusive), i.e. the bounds the assembler's
    value backfill uses (`NeelProcessedTweetWindowFunction.java:85-95`).

    Implemented as a shuffle-free fold: ``aggregate(split(text,' '))``
    accumulates the running character offset and collects matching tokens in
    one pass, then a single ``explode``. No window function, no repartition —
    the operator scales linearly with input splits.
    """
    lex_list = ", ".join(f"'{w}'" for w in LEXICON)
    ents = F.expr(
        f"""
        aggregate(
          split(text, ' '),
          named_struct(
            'off', 0, 'idx', 0,
            'ents', cast(array() as array<struct<token:string,pos:int,ent_start:int>>)
          ),
          (acc, t) -> named_struct(
            'off', acc.off + length(t) + 1,
            'idx', acc.idx + 1,
            'ents', case when t in ({lex_list})
                    then array_append(acc.ents,
                           named_struct('token', t, 'pos', acc.idx, 'ent_start', acc.off))
                    else acc.ents end),
          acc -> acc.ents
        )
        """
    )
    return (
        parsed.select("id", "text", F.explode(ents).alias("e"))
        .select(
            "id",
            "text",
            F.col("e.token").alias("token"),
            F.col("e.pos").alias("pos"),
            F.col("e.ent_start").alias("ent_start"),
            (F.col("e.ent_start") + F.length("e.token")).cast("int").alias("ent_end"),
        )
    )


def ner_sql(source: str = "parsed") -> str:
    """DuckDB CTEs computing the identical NER output from ``source``."""
    lex_list = ", ".join(f"'{w}'" for w in LEXICON)
    return f"""
toks AS (
    SELECT id, text,
           unnest(string_split(text, ' ')) AS token,
           unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
    FROM {source}
),
positioned AS (
    SELECT id, text, token, CAST(pos AS INT) AS pos,
           CAST(COALESCE(SUM(length(token) + 1) OVER (
                PARTITION BY id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
             AS ent_start
    FROM toks
),
ner AS (
    SELECT id, text, token, pos, ent_start,
           CAST(ent_start + length(token) AS INT) AS ent_end
    FROM positioned
    WHERE token IN ({lex_list})
)
"""


# ---------------------------------------------------------------------------
# NEL
# ---------------------------------------------------------------------------

def mock_nel(ner: DataFrame) -> DataFrame:
    """Link each recognized entity or assign it to a NIL cluster.

    Deterministic integer arithmetic on (pos, token length) picks the branch,
    mirroring the probability mix of isNil true/false in FIXTURES.md §7.
    Output adds: is_nil, link, nil_cluster, confidence, category.
    """
    tok_len = F.length("token")
    nil = ((F.col("pos") + tok_len) % 3 == 0).alias("is_nil")
    return ner.select(
        "*",
        nil,
        F.when(~nil, F.concat(F.lit(LINK_PREFIX), F.col("token"))).alias("link"),
        F.when(nil, F.concat(F.lit("nil-"), (tok_len % 5).cast("string"))).alias(
            "nil_cluster"
        ),
        (((F.col("pos") * 7 + tok_len * 13) % 100).cast("double") / F.lit(100.0)).alias(
            "confidence"
        ),
        F.when(tok_len % 3 == 0, CATEGORIES[0])
        .when(tok_len % 3 == 1, CATEGORIES[1])
        .otherwise(CATEGORIES[2])
        .alias("category"),
    )


NEL_SQL = f"""
nel AS (
    SELECT *,
           ((pos + length(token)) % 3 = 0) AS is_nil,
           CASE WHEN (pos + length(token)) % 3 = 0 THEN NULL
                ELSE '{LINK_PREFIX}' || token END AS link,
           CASE WHEN (pos + length(token)) % 3 = 0
                THEN 'nil-' || CAST(length(token) % 5 AS VARCHAR)
                ELSE NULL END AS nil_cluster,
           CAST((pos * 7 + length(token) * 13) % 100 AS DOUBLE) / 100.0 AS confidence,
           CASE WHEN length(token) % 3 = 0 THEN '{CATEGORIES[0]}'
                WHEN length(token) % 3 = 1 THEN '{CATEGORIES[1]}'
                ELSE '{CATEGORIES[2]}' END AS category
    FROM ner
)
"""


# ---------------------------------------------------------------------------
# Link resolver
# ---------------------------------------------------------------------------

def mock_resources(nel: DataFrame) -> DataFrame:
    """Resolve a subset of links (even token length) to resource records.

    Returns the distinct resource dimension (url, name, thumb) — the assembler
    attaches it back by ``entity.link == resource.url``
    (`NeelProcessedTweetWindowFunction.java:62-69, 78-84`).
    """
    return (
        nel.filter(F.col("link").isNotNull() & (F.length("token") % 2 == 0))
        .select(
            F.col("link").alias("url"),
            F.upper("token").alias("name"),
            F.concat(F.lit(THUMB_PREFIX), F.col("token"), F.lit(".png")).alias("thumb"),
        )
        .distinct()
    )


RESOURCES_SQL = f"""
resources AS (
    SELECT DISTINCT link AS url,
           upper(token) AS name,
           '{THUMB_PREFIX}' || token || '.png' AS thumb
    FROM nel
    WHERE link IS NOT NULL AND length(token) % 2 = 0
)
"""


# ---------------------------------------------------------------------------
# Geo decoder
# ---------------------------------------------------------------------------

def mock_geo(parsed: DataFrame) -> DataFrame:
    """Decode ``city_N`` locations to coordinates for tweets passing F5.

    Mirrors the static location-string -> (lat, lng) table of FIXTURES.md §7;
    only rows passing `statusHasUserLocation` (`TwitterNeelUtils.java:23-28`)
    are decoded — the rest take the empty-location synthetic branch
    (`TwitterStreamJob.java:339-343`).
    """
    from .operators.parse import has_user_location

    key = F.split(F.col("user__location"), "_").getItem(1).cast("int")
    return parsed.filter(has_user_location()).select(
        "id",
        F.col("user__location").alias("address"),
        (key.cast("double") * 1.5 - 10.0).alias("lat"),
        (F.lit(27.0) - key.cast("double") * 0.75).alias("lng"),
    )


GEO_SQL = """
geo AS (
    SELECT id,
           user__location AS address,
           CAST(CAST(string_split(user__location, '_')[2] AS INT) * 1.5 - 10.0
                AS DOUBLE) AS lat,
           CAST(27.0 - CAST(string_split(user__location, '_')[2] AS INT) * 0.75
                AS DOUBLE) AS lng
    FROM parsed
    WHERE user__location IS NOT NULL AND length(trim(user__location)) >= 2
)
"""
