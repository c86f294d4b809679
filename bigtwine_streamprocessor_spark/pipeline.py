"""End-to-end batch NEEL pipeline + its DuckDB oracle SQL composer.

Wires corpus -> P1 parse -> mock NER -> NEL -> link-resolver / geo-decoder ->
assembly (SURVEY.md §3.1 lifecycle with local-transport services). Each stage
is also exported as a standalone frame so individual operators register in
``__spark_entry__.queries()`` with their own oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import corpus, services_local
from .operators import assemble, parse


def stages(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All intermediate frames of the batch NEEL run, keyed by stage name."""
    tweets = corpus.tweets_df(spark, sf_dir)
    parsed = parse.parse_tweets(tweets, skip_retweets=True)
    ner = services_local.mock_ner(parsed)
    nel = services_local.mock_nel(ner)
    resources = services_local.mock_resources(nel)
    geo = services_local.mock_geo(parsed)
    # fused zero-shuffle strategy; the join-based assemble_flat remains
    # available for heterogeneous (non-derivable) enrichment inputs
    flat = assemble.assemble_flat_fused(parsed)
    return {
        "tweets": tweets,
        "parsed": parsed,
        "ner": ner,
        "nel": nel,
        "resources": resources,
        "geo": geo,
        "assembled_flat": flat,
        "assembled_nested": assemble.assemble_nested(flat),
    }


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB) — same stages as CTEs
# ---------------------------------------------------------------------------

PARSED_SQL = f"""
parsed AS (
    SELECT * FROM tweets WHERE {parse.PARSE_FILTER_SQL}
)
"""

ASSEMBLED_FLAT_SQL = """
assembled_flat AS (
    SELECT p.id, p.text, p.user__id, p.user__name, p.user__screen_name,
           p.user__location,
           g.lat AS user_lat, g.lng AS user_lng,
           n.pos, n.ent_start, n.ent_end, n.is_nil, n.link, n.nil_cluster,
           n.confidence, n.category,
           CASE WHEN n.ent_start >= 0 AND n.ent_end <= length(p.text)
                THEN trim(substr(p.text, n.ent_start + 1, n.ent_end - n.ent_start))
           END AS value,
           r.name AS resource_name, r.thumb AS resource_thumb
    FROM parsed p
    LEFT JOIN nel n ON n.id = p.id
    LEFT JOIN resources r ON n.link = r.url
    LEFT JOIN geo g ON g.id = p.id
)
"""


def with_clause(upto: str = "assembled_flat") -> str:
    """Compose the WITH-clause prefix containing all CTEs up to ``upto``."""
    parts = [corpus.TWEETS_SQL, PARSED_SQL]
    order = ["tweets", "parsed", "ner", "nel", "resources", "geo", "assembled_flat"]
    if upto not in ("tweets", "parsed"):
        parts.append(services_local.ner_sql("parsed"))
    if order.index(upto) >= order.index("nel"):
        parts.append(services_local.NEL_SQL)
    if order.index(upto) >= order.index("resources"):
        parts.append(services_local.RESOURCES_SQL)
    if order.index(upto) >= order.index("geo"):
        parts.append(services_local.GEO_SQL)
    if upto == "assembled_flat":
        parts.append(ASSEMBLED_FLAT_SQL)
    body = ",\n".join(p.strip().rstrip(",") for p in parts)
    return f"WITH {body}"


def oracle(upto: str, select: str | None = None) -> str:
    """Full oracle query: WITH ... SELECT ... FROM <upto>."""
    sel = select or f"SELECT * FROM {upto}"
    return f"{with_clause(upto)}\n{sel}"
