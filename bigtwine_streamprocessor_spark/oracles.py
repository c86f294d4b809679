"""DuckDB oracle SQL for every registered query (judge r11 task 8).

The one source of truth the driver's correctness gate compares against:
``ORACLE_SQL[name]`` is the ANSI SQL DuckDB runs on the same parquet views
as the Spark callable registered under ``name`` in ``registry``.
``registry.register`` attaches these automatically — a query whose name is
absent here is deliberately oracle-less (non-SQL-expressible; the driver
records the weaker rows-only check).

Split out of ``registry.py`` (2.9k lines and growing every round) so query
logic and oracle text evolve in separate files; the public contract —
``registry.QUERIES`` / ``registry.ORACLES`` — is unchanged. Shared
constants that both sides reference (PROCESS_DATE, CHUNK_S, ...) live here
and are re-exported by ``registry``.
"""

from __future__ import annotations

from . import pipeline
from .operators import (
    corpus_prep,
    curation,
    dedup,
    dedup_index,
    export,
    multimodal,
    similarity,
    textstats,
)


PROCESS_DATE = "2026-01-01T00:00:00Z"

ANALYSIS_ID = "analysis-r1"

def _neel_oracle(upto: str, extra_cte: str | None = None, select: str | None = None):
    sql = pipeline.with_clause(upto)
    if extra_cte:
        sql += ",\n" + extra_cte.strip().rstrip(",")
    sql += "\n" + (select or f"SELECT * FROM {upto}")
    return sql

_PROFILE_COLS = ["text", "lang", "source", "n_chars"]

def _profile_oracle():
    parts = [
        f"""SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count({c}) AS BIGINT) AS n_nonnull,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       min(CAST({c} AS VARCHAR)) AS min_repr,
       max(CAST({c} AS VARCHAR)) AS max_repr
FROM documents"""
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)

PROGRESS_CAP = 2000  # bounded input: the global window is a small-data analog

def _envelope_oracle():
    from .operators.enrich import DEFAULT_TIMEOUT_S
    from .sources.streams import topic

    out_topic = topic("geodecoder_responses", ANALYSIS_ID)
    return _neel_oracle(
        "geo",
        f"""
env_numbered AS (
    SELECT address, row_number() OVER (ORDER BY address) - 1 AS rn FROM geo
),
envelopes AS (
    SELECT CAST(floor(rn / 15) AS BIGINT) AS chunk_id,
           string_agg(address, '|' ORDER BY address) AS items,
           CAST(count(*) AS BIGINT) AS n_items
    FROM env_numbered GROUP BY 1
)
""",
        f"""SELECT chunk_id, '{out_topic}' AS output_topic,
       CAST({DEFAULT_TIMEOUT_S * 1000} AS BIGINT) AS expiration, items, n_items
FROM envelopes""",
    )

def _simhash_pairs_oracle():
    from .operators import dedup

    return (
        "WITH "
        + dedup.simhash_pairs_sql().strip()
        + "\nSELECT doc_a, doc_b, hamming FROM simhash_pairs"
    )

def _fp_overlap_oracle():
    from .operators import textstats

    return f"""
WITH fp AS ({textstats.FINGERPRINTS_SQL.strip()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
FROM fp a JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 5
"""

STRATIFIED_RATES = {"en": 0.25, "zh": 0.8}  # rebalance the training mix

def _stratified_oracle():
    from .operators import sampling

    pred = sampling.stratified_sample_sql(
        "lang", "doc_id", STRATIFIED_RATES, default_rate=0.5
    )
    return f"SELECT doc_id, lang, source FROM documents WHERE {pred}"

_FANIN_FLAT_SELECT = """
SELECT id, text, user__id, user__name, user__screen_name, user__location,
       user_lat, user_lng, ent_start, ent_end, is_nil, link, nil_cluster,
       confidence, category, value, resource_name, resource_thumb
FROM assembled_flat
"""

def _embedding_clusters_oracle():
    return f"""
WITH RECURSIVE {similarity.neardup_ctes_sql(0.2, n_bits=8).strip()},
cluster_edges AS (
    SELECT doc_a, doc_b FROM neardup_pairs
    UNION ALL
    SELECT doc_b AS doc_a, doc_a AS doc_b FROM neardup_pairs
),
walk(doc_id, label) AS (
    SELECT DISTINCT doc_a AS doc_id, doc_a AS label FROM cluster_edges
    UNION
    SELECT e.doc_b AS doc_id, w.label
    FROM walk w JOIN cluster_edges e ON e.doc_a = w.doc_id
)
SELECT doc_id, min(label) AS cluster_id FROM walk GROUP BY doc_id
"""

_BENCHMARK_SQL = f"""(
    SELECT doc_id + {dedup.DUP_SEED_OFFSET} AS doc_id, text
    FROM documents WHERE doc_id % {dedup.DUP_SEED_MOD} = 0
)"""

def _semantic_keep_oracle():
    return f"""
WITH RECURSIVE {similarity.neardup_ctes_sql(0.2, n_bits=8).strip()},
cluster_edges AS (
    SELECT doc_a, doc_b FROM neardup_pairs
    UNION ALL
    SELECT doc_b AS doc_a, doc_a AS doc_b FROM neardup_pairs
),
walk(doc_id, label) AS (
    SELECT DISTINCT doc_a AS doc_id, doc_a AS label FROM cluster_edges
    UNION
    SELECT e.doc_b AS doc_id, w.label
    FROM walk w JOIN cluster_edges e ON e.doc_a = w.doc_id
),
comp AS (SELECT doc_id, min(label) AS cluster_id FROM walk GROUP BY doc_id)
SELECT e.vec_id FROM embeddings e LEFT JOIN comp ON e.vec_id = comp.doc_id
WHERE comp.cluster_id IS NULL OR comp.cluster_id = e.vec_id
"""

_INC_DELTA_SQL = f"""(
SELECT doc_id + {corpus_prep.INC_EXACT_OFFSET} AS doc_id, text
FROM documents WHERE doc_id % {corpus_prep.INC_EXACT_MOD} = 0
UNION ALL
SELECT doc_id + {corpus_prep.INC_NEAR_OFFSET} AS doc_id,
       text || '{corpus_prep.INC_NEAR_SUFFIX}' AS text
FROM documents WHERE doc_id % {corpus_prep.INC_NEAR_MOD} = 0
)"""

CHUNK_W = 64  # sliding-window chunk width (tokens)

CHUNK_S = 48  # stride (tokens); W - S = 16-token overlap between chunks


ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["neel_parsed"] = (
_neel_oracle("parsed")
)

ORACLE_SQL["neel_ner"] = (
_neel_oracle("ner")
)

ORACLE_SQL["neel_nel"] = (
_neel_oracle("nel")
)

ORACLE_SQL["neel_resources"] = (
_neel_oracle("resources")
)

ORACLE_SQL["neel_geo"] = (
_neel_oracle("geo")
)

ORACLE_SQL["neel_assembled"] = (
_neel_oracle("assembled_flat")
)

ORACLE_SQL["neel_export_challenge"] = (
_neel_oracle("assembled_flat", export.CHALLENGE_SQL, "SELECT * FROM challenge")
)

ORACLE_SQL["neel_export_extended"] = (
_neel_oracle(
        "assembled_flat", export.extended_sql(PROCESS_DATE), "SELECT * FROM extended"
    )
)

ORACLE_SQL["neel_export_dataset"] = (
_neel_oracle("assembled_flat", export.DATASET_SQL, "SELECT * FROM dataset")
)

ORACLE_SQL["neel_export_json"] = (
_neel_oracle(
        "assembled_flat",
        export.json_canon_sql(ANALYSIS_ID, PROCESS_DATE),
        "SELECT json FROM json_canon",
    )
)

ORACLE_SQL["agg_pricing_summary"] = (
"""
    SELECT l_returnflag, l_linestatus,
           (floor(((CAST(sum(CAST(floor((l_quantity) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS sum_qty,
           (floor(((CAST(sum(CAST(floor((l_extendedprice) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS sum_base_price,
           (floor(((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS sum_disc_price,
           (floor((avg(l_quantity)) * 1000000.0 + 0.5) / 1000000.0) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """
)

ORACLE_SQL["join_broadcast_dims"] = (
"""
    SELECT n.n_name AS nation, r.r_name AS region,
           count(*) AS n_customers, (floor(((CAST(sum(CAST(floor((c.c_acctbal) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """
)

ORACLE_SQL["join_fact_fact"] = (
"""
    SELECT o.o_orderpriority,
           count(DISTINCT o.o_orderkey) AS n_orders,
           (floor(((CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderpriority
    """
)

ORACLE_SQL["window_topk_per_group"] = (
"""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """
)

ORACLE_SQL["window_tumbling_events"] = (
"""
    SELECT to_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300)
             AT TIME ZONE 'UTC' AS window_start,
           event_type,
           count(*) AS n_events,
           (floor(((CAST(sum(CAST(floor((value) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS total_value
    FROM events
    GROUP BY 1, 2
    """
)

ORACLE_SQL["union_tagged_streams"] = (
"""
    SELECT CAST(event_id AS VARCHAR) AS tag, 'status' AS stream_type
    FROM events WHERE event_type IN ('click', 'view')
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR) AS tag, 'linkedTweet' AS stream_type
    FROM documents WHERE lang = 'en'
    """
)

ORACLE_SQL["chunked_requests"] = (
"""
    WITH numbered AS (
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS rn
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, CAST(floor(rn / 15) AS BIGINT) AS chunk_id,
           count(*) AS n_items, min(event_id) AS first_item, max(event_id) AS last_item
    FROM numbered GROUP BY user_id, 2
    """
)

ORACLE_SQL["group_collect_entities"] = (
pipeline.with_clause("ner")
    + "\nSELECT id, array_to_string(list(token ORDER BY pos), ',') AS tokens,"
    + " count(*) AS n FROM ner GROUP BY id"
)

ORACLE_SQL["dedup_exact_groups"] = (
dedup.exact_sql(dedup.SEEDED_DOCS_SQL)
)

ORACLE_SQL["dedup_exact_keep"] = (
dedup.dedup_exact_sql(dedup.SEEDED_DOCS_SQL)
)

ORACLE_SQL["dedup_lsh_pairs"] = (
"WITH " + dedup.lsh_pairs_sql().strip() + "\nSELECT doc_a, doc_b FROM lsh_pairs"
)

ORACLE_SQL["dedup_ngram_jaccard"] = (
"WITH "
    + dedup.ngram_jaccard_sql().strip()
    + "\nSELECT doc_a, doc_b, jaccard FROM jaccard_pairs"
)

ORACLE_SQL["dedup_clusters"] = (
dedup.dedup_clusters_sql()
)

ORACLE_SQL["similarity_bruteforce_topk"] = (
similarity.cosine_topk_sql()
)

ORACLE_SQL["similarity_ann_lsh"] = (
similarity.ann_lsh_topk_sql(n_bits=8, n_tables=2)
)

ORACLE_SQL["similarity_embedding_neardup"] = (
similarity.embedding_neardup_sql(0.2, n_bits=8)
)

ORACLE_SQL["text_language_id"] = (
textstats.LANGUAGE_ID_SQL
)

ORACLE_SQL["text_quality_scores"] = (
textstats.QUALITY_SQL
)

ORACLE_SQL["text_token_counts"] = (
textstats.TOKEN_COUNTS_SQL
)

ORACLE_SQL["text_tfidf_topterms"] = (
textstats.tfidf_sql()
)

ORACLE_SQL["profile_documents"] = (
_profile_oracle()
)

ORACLE_SQL["multimodal_features"] = (
multimodal.FEATURES_SQL
)

ORACLE_SQL["project_nested_json"] = (
"""
    SELECT id,
           to_json(struct_pack(
               id := id,
               text := text,
               "user" := struct_pack(
                   id := user__id,
                   name := user__name,
                   screen_name := user__screen_name
               )
           )) AS tweet_json
    FROM (
        SELECT CAST(doc_id AS VARCHAR) AS id, text,
               CAST(doc_id * 7 + 11 AS VARCHAR) AS user__id,
               'user_' || CAST(doc_id % 50 AS VARCHAR) AS user__name,
               'sn_' || CAST(doc_id % 50 AS VARCHAR) AS user__screen_name
        FROM documents
    )
    """
)

ORACLE_SQL["project_dump_rows"] = (
"""
    SELECT CAST(doc_id AS VARCHAR) AS id,
           regexp_replace(text, '[\\n\\r]', '', 'g') AS text,
           CAST(doc_id * 7 + 11 AS VARCHAR) AS user__id,
           'sn_' || CAST(doc_id % 50 AS VARCHAR) AS user__screen_name
    FROM documents
    """
)

ORACLE_SQL["filter_has_links"] = (
pipeline.with_clause("nel")
    + """
SELECT p.id,
       COALESCE(bool_or(n.link IS NOT NULL), false) AS has_links
FROM parsed p LEFT JOIN nel n ON n.id = p.id
GROUP BY p.id
"""
)

ORACLE_SQL["progress_running_totals"] = (
f"""
    WITH capped AS (
        SELECT event_id, ts FROM events ORDER BY ts, event_id LIMIT {PROGRESS_CAP}
    )
    SELECT event_id, ts,
           CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS processed,
           (floor((CAST(row_number() OVER (ORDER BY ts, event_id) AS DOUBLE)
                 / (SELECT count(*) FROM capped)) * 1000000.0 + 0.5) / 1000000.0) AS progress
    FROM capped
    """
)

ORACLE_SQL["enrich_request_envelopes"] = (
_envelope_oracle()
)

ORACLE_SQL["dedup_simhash_pairs"] = (
_simhash_pairs_oracle()
)

ORACLE_SQL["text_fingerprint_overlap"] = (
_fp_overlap_oracle()
)

ORACLE_SQL["sampling_deterministic"] = (
"""
    SELECT CAST(doc_id AS VARCHAR) AS id, text
    FROM documents
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 7 = 0
    """
)

ORACLE_SQL["join_asof_last_purchase"] = (
"""
    WITH purchases AS (
        SELECT user_id, ts, max(event_id) AS purchase_event_id,
               (floor((max_by(value, event_id)) * 100.0 + 0.5) / 100.0) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.user_id, e.event_id, e.ts, e.event_type,
           p.purchase_event_id, p.purchase_value
    FROM events e ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """
)

ORACLE_SQL["join_interval_nearby_events"] = (
"""
    WITH purchases AS (
        SELECT user_id, event_id AS purchase_event_id, ts FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.purchase_event_id, p.user_id, CAST(count(*) AS BIGINT) AS n_nearby
    FROM purchases p JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts - INTERVAL 5 MINUTE AND e.ts <= p.ts + INTERVAL 5 MINUTE
    GROUP BY 1, 2
    """
)

ORACLE_SQL["sampling_stratified"] = (
_stratified_oracle()
)

ORACLE_SQL["agg_salted_heavy_hitters"] = (
"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           (floor(((CAST(sum(CAST(floor((value) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS total
    FROM events GROUP BY event_type
    """
)

ORACLE_SQL["agg_rollup"] = (
"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT) AS n,
           (floor(((CAST(sum(CAST(floor((l_quantity) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """
)

ORACLE_SQL["sessionize_events"] = (
"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_no
    """
)

ORACLE_SQL["pivot_event_types"] = (
"""
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
    FROM events
    GROUP BY user_id
    """
)

ORACLE_SQL["neel_fanin_batch"] = (
_neel_oracle("assembled_flat", None, _FANIN_FLAT_SELECT)
)

ORACLE_SQL["neel_assembled_join"] = (
_neel_oracle("assembled_flat")
)

ORACLE_SQL["agg_approx_distinct"] = (
"""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           (floor((quantile_cont(o_totalprice, 0.5)) * 100.0 + 0.5) / 100.0) AS median_price
    FROM orders GROUP BY o_orderpriority
    """
)

ORACLE_SQL["similarity_ivf_topk"] = (
similarity.ivf_topk_sql(spill=2)  # gate serves off the spilled layout (r13)
)

ORACLE_SQL["dedup_embedding_clusters"] = (
_embedding_clusters_oracle()
)

ORACLE_SQL["join_bloom_pruned"] = (
"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           (floor(((CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """
)

ORACLE_SQL["text_unigram_logprob"] = (
textstats.unigram_logprob_sql()
)

ORACLE_SQL["decontaminate_benchmark"] = (
curation.decontaminate_sql("documents", _BENCHMARK_SQL)
)

ORACLE_SQL["text_gopher_rules"] = (
curation.gopher_rules_sql()
)

ORACLE_SQL["text_repetition_ratio"] = (
textstats.repetition_ratio_sql()
)

ORACLE_SQL["pack_sequences"] = (
curation.pack_sequences_sql()
)

ORACLE_SQL["shuffle_global"] = (
curation.global_shuffle_sql()
)

ORACLE_SQL["text_pii_redaction"] = (
curation.redact_pii_sql(curation.SYNTHETIC_PII_SQL)
)

ORACLE_SQL["index_inverted"] = (
curation.inverted_index_sql()
)

ORACLE_SQL["dedup_semantic_keep"] = (
_semantic_keep_oracle()
)

ORACLE_SQL["agg_percentiles_exact"] = (
"""
    SELECT l_returnflag,
           (floor((quantile_cont(l_extendedprice, 0.5)) * 10000.0 + 0.5) / 10000.0) AS p50,
           (floor((quantile_cont(l_extendedprice, 0.9)) * 10000.0 + 0.5) / 10000.0) AS p90,
           (floor((quantile_cont(l_extendedprice, 0.99)) * 10000.0 + 0.5) / 10000.0) AS p99
    FROM lineitem GROUP BY l_returnflag
    """
)

ORACLE_SQL["window_event_deltas"] = (
"""
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS prev_gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """
)

ORACLE_SQL["compact_latest_events"] = (
"""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """
)

ORACLE_SQL["join_anti_customers_no_orders"] = (
"""
    SELECT c.c_custkey, c.c_nationkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """
)

ORACLE_SQL["agg_cube_events"] = (
"""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(hr AS VARCHAR), 'ALL') AS hour,
           CAST(count(*) AS BIGINT) AS n,
           (floor(((CAST(sum(CAST(floor((value) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS total_value
    FROM (SELECT event_type, hour(ts) AS hr, value FROM events)
    GROUP BY CUBE (event_type, hr)
    """
)

ORACLE_SQL["embedding_label_centroids"] = (
"""
    WITH comp AS (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS pos,
               unnest(embedding) AS v
        FROM embeddings
    ),
    means AS (
        SELECT label, pos, (floor((avg(CAST(v AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0) AS m
        FROM comp GROUP BY label, pos
    ),
    sizes AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_members
        FROM embeddings GROUP BY label
    )
    SELECT m.label, s.n_members,
           array_to_string(list(printf('%.6f', m.m) ORDER BY m.pos), ',')
             AS centroid
    FROM means m JOIN sizes s USING (label)
    GROUP BY m.label, s.n_members
    """
)

ORACLE_SQL["join_salted_skew"] = (
"""
    WITH dim AS (
        SELECT DISTINCT event_type,
               CASE WHEN event_type IN ('click', 'view')
                    THEN 'engagement' ELSE 'other' END AS category
        FROM events
    )
    SELECT d.category, CAST(count(*) AS BIGINT) AS n,
           (floor(((CAST(sum(CAST(floor((e.value) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS total_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY d.category
    """
)

ORACLE_SQL["agg_moments"] = (
"""
    WITH s AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS HUGEINT)) AS sp,
               sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS HUGEINT)
                   * CAST(floor(l_extendedprice * 10000.0 + 0.5) AS HUGEINT)) AS spp,
               sum(CAST(floor(l_discount * 10000.0 + 0.5) AS HUGEINT)) AS sd,
               sum(CAST(floor(l_discount * 10000.0 + 0.5) AS HUGEINT)
                   * CAST(floor(l_discount * 10000.0 + 0.5) AS HUGEINT)) AS sdd,
               sum(CAST(l_quantity AS HUGEINT)) AS sq,
               sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS sqq,
               sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS HUGEINT)
                   * CAST(l_quantity AS HUGEINT)) AS spq,
               sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS HUGEINT)
                   * CAST(floor(l_discount * 10000.0 + 0.5) AS HUGEINT)) AS spd
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (floor((sqrt(CAST(CAST(n AS HUGEINT) * spp - sp * sp AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                   / 10000.0) * 10000.0 + 0.5) / 10000.0) AS price_stddev,
           (floor(((CAST(CAST(n AS HUGEINT) * sdd - sd * sd AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                   / 100000000.0) * 1000000.0 + 0.5) / 1000000.0) AS discount_var,
           (floor((CAST(CAST(n AS HUGEINT) * spq - sp * sq AS DOUBLE)
                   / (sqrt(CAST(CAST(n AS HUGEINT) * spp - sp * sp AS DOUBLE))
                      * sqrt(CAST(CAST(n AS HUGEINT) * sqq - sq * sq AS DOUBLE))))
                  * 1000000.0 + 0.5) / 1000000.0) AS price_qty_corr,
           (floor(((CAST(CAST(n AS HUGEINT) * spd - sp * sd AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                   / 100000000.0) * 10000.0 + 0.5) / 10000.0) AS price_disc_cov
    FROM s
    """
)

ORACLE_SQL["dedup_minhash_estimate"] = (
dedup.minhash_estimate_sql()
)

ORACLE_SQL["multimodal_frame_sample"] = (
multimodal.frame_sample_sql()
)

ORACLE_SQL["text_bigram_logprob"] = (
textstats.bigram_logprob_sql()
)

ORACLE_SQL["text_lexical_diversity"] = (
textstats.lexical_diversity_sql()
)

ORACLE_SQL["sketch_kmv_distinct"] = (
corpus_prep.kmv_distinct_sql()
)

ORACLE_SQL["dedup_paragraphs"] = (
corpus_prep.paragraph_dedup_sql()
)

ORACLE_SQL["mix_weighted_sources"] = (
corpus_prep.mix_weighted_sql()
)

ORACLE_SQL["bucket_by_length"] = (
corpus_prep.bucket_by_length_sql()
)

ORACLE_SQL["filter_url_domains"] = (
corpus_prep.url_domain_sql()
)

ORACLE_SQL["embedding_random_projection"] = (
corpus_prep.embedding_projection_sql()
)

ORACLE_SQL["join_shipping_priority"] = (
"""
    SELECT l.l_orderkey,
           (floor(((CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """
)

ORACLE_SQL["join_local_supplier_volume"] = (
"""
    SELECT n.n_name AS nation,
           (floor(((CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """
)

ORACLE_SQL["dedup_incremental"] = (
dedup_index.scan_delta_sql(
        "(SELECT doc_id, text FROM documents)", _INC_DELTA_SQL
    )
)

ORACLE_SQL["quality_sigmoid_score"] = (
corpus_prep.quality_sigmoid_sql()
)

ORACLE_SQL["sketch_countmin_terms"] = (
corpus_prep.countmin_sql()
)

ORACLE_SQL["curriculum_token_budget"] = (
corpus_prep.curriculum_sql()
)

ORACLE_SQL["join_returned_items"] = (
"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           (floor(((CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """
)

ORACLE_SQL["join_nation_trade_volume"] = (
"""
    SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           (floor(((CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n2.n_name, n1.n_name, year(l.l_shipdate)
    """
)

ORACLE_SQL["window_rank_features"] = (
"""
    SELECT event_id, user_id,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           (floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0) AS prank,
           (floor((cume_dist() OVER w) * 1000000.0 + 0.5) / 1000000.0) AS cdist
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """
)

ORACLE_SQL["dedup_edit_distance"] = (
"WITH "
    + dedup.lsh_pairs_sql().strip()
    + """
SELECT p.doc_a, p.doc_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       (floor((levenshtein(a.text, b.text)
             / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
         AS edit_ratio
FROM lsh_pairs p
JOIN documents a ON p.doc_a = a.doc_id
JOIN documents b ON p.doc_b = b.doc_id
"""
)

ORACLE_SQL["events_gap_fill"] = (
"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id, date_trunc('hour', ts))
                 AS n_events
        FROM events
    ),
    per_hour AS (
        SELECT user_id, h, n_events, value AS last_val
        FROM hourly WHERE rn = 1
    ),
    bounds AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    )
    SELECT g.user_id, g.h AS hour,
           CAST(coalesce(p.n_events, 0) AS BIGINT) AS n_events,
           last_value(p.last_val IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS locf_value
    FROM grid g LEFT JOIN per_hour p
      ON g.user_id = p.user_id AND g.h = p.h
    """
)

ORACLE_SQL["join_full_outer_balance"] = (
"""
    SELECT CASE WHEN o.o_custkey IS NULL THEN 'customer_only'
                WHEN c.c_custkey IS NULL THEN 'order_only'
                ELSE 'both' END AS side,
           CAST(count(*) AS BIGINT) AS n,
           (floor(((CAST(sum(CAST(floor((coalesce(o.o_totalprice, 0)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) AS total_price
    FROM customer c
    FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """
)

ORACLE_SQL["agg_promo_revenue"] = (
"""
    SELECT (floor((100.0 * (floor(((CAST(sum(CAST(floor((CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0)
             / (floor(((CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0)) * 1000000.0 + 0.5) / 1000000.0)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    """
)

ORACLE_SQL["agg_small_quantity_revenue"] = (
"""
    WITH thresh AS (
        SELECT l_partkey, 0.2 * avg(l_quantity) AS t
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_small,
           (floor(((floor(((CAST(sum(CAST(floor((l.l_extendedprice) * 10000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000.0)) * 100.0 + 0.5) / 100.0) / 7.0) * 100.0 + 0.5) / 100.0) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thresh t ON t.l_partkey = l.l_partkey
    WHERE l.l_quantity < t.t
    GROUP BY p.p_brand
    """
)

ORACLE_SQL["chunk_sliding_windows"] = (
f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    n AS (
        SELECT doc_id, tk,
               greatest(CAST(ceil((len(tk) - {CHUNK_W}) / {CHUNK_S}.0) AS BIGINT)
                        + 1, 1) AS n_chunks
        FROM t
    )
    SELECT doc_id,
           unnest(generate_series(0, n_chunks - 1)) AS chunk_idx,
           unnest(list_transform(
               generate_series(0, n_chunks - 1),
               i -> array_to_string(tk[i*{CHUNK_S}+1:i*{CHUNK_S}+{CHUNK_W}], ' ')
           )) AS chunk_text,
           unnest(list_transform(
               generate_series(0, n_chunks - 1),
               i -> CAST(len(tk[i*{CHUNK_S}+1:i*{CHUNK_S}+{CHUNK_W}]) AS BIGINT)
           )) AS n_tokens
    FROM n
    """
)

ORACLE_SQL["embedding_norm_stats"] = (
"""
    WITH norms AS (
        SELECT label,
               floor(sqrt(list_reduce(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (a, b) -> a + b)) * 1000000.0 + 0.5) / 1000000.0 AS nrm
        FROM embeddings
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           min(nrm) AS min_norm, max(nrm) AS max_norm,
           floor(avg(nrm) * 10000.0 + 0.5) / 10000.0 AS mean_norm
    FROM norms GROUP BY label
    """
)

ORACLE_SQL["scd2_user_history"] = (
"""
    SELECT user_id, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to
    FROM events
    """
)

ORACLE_SQL["agg_event_transitions"] = (
"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    counts AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n,
           floor((n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS p
    FROM counts
    """
)

ORACLE_SQL["agg_retention_cohorts"] = (
"""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(floor(date_diff('day', f.cohort_week,
                                    CAST(date_trunc('week', e.ts) AS TIMESTAMP))
                          / 7.0)
                    AS BIGINT) AS week_n
        FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_week, week_n, CAST(count(*) AS BIGINT) AS active_users
    FROM activity GROUP BY cohort_week, week_n
    """
)

ORACLE_SQL["agg_funnel_steps"] = (
"""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT 'view' AS step, CAST((SELECT count(*) FROM v) AS BIGINT) AS users
    UNION ALL
    SELECT 'view>click', CAST((SELECT count(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 'view>click>purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
    """
)
