"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship NEEL assembly at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions) for the driver's
DuckDB-oracle correctness harness. Implementations live in
``bigtwine_streamprocessor_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigtwine_streamprocessor_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full batch NEEL assembly on /root/testdata/sf0.001."""
    return registry.QUERIES["neel_assembled"](spark, "/root/testdata/sf0.001")


# The driver's correctness harness samples the FIRST 50 queries in dict
# order. Gate-priority policy (rotation, refreshed every round so no query's
# newest driver row ages past ~2 rounds): (1) queries with NO green driver
# row yet, (2) queries whose implementation files changed this round,
# (3) queries whose newest green row is 2+ rounds old, then (4) the
# most-recently-verified set as the overflow tail, ordered so its head —
# which still lands inside the 50-sample — holds the queries whose operator
# modules saw collateral edits. New queries register outside both lists and
# sort between them automatically. (Every query, sampled or not, is still
# oracle-gated in tests/test_registry.py each round.)
_GATE_FIRST = [
    # -- newest green driver row is r3 (queries outside r4's 50-sample);
    #    lead the r5 sample so no evidence ages past 2 rounds. neel_parsed/
    #    neel_ner (green r1-r3, subsumed by r4-green neel_assembled) moved
    #    to the tail (with neel_export_challenge, same rationale: covered by
    #    r4-green family queries) to make room for the 25 queries NEW in r5
    #    — new queries outrank refreshing triple-green ones --
    "group_collect_entities",
    "similarity_bruteforce_topk",
    "similarity_ann_lsh",
    "similarity_embedding_neardup",
    "profile_documents",
    "progress_running_totals",
    "enrich_request_envelopes",
    "join_asof_last_purchase",
    "join_interval_nearby_events",
    "sampling_stratified",
    "agg_salted_heavy_hitters",
    "neel_fanin_batch",
    "neel_assembled_join",
    "agg_approx_distinct",
    "similarity_ivf_topk",
    "dedup_embedding_clusters",
    "dedup_semantic_keep",
    "agg_percentiles_exact",
    "window_event_deltas",
    "compact_latest_events",
    "join_anti_customers_no_orders",
    "agg_cube_events",
    "join_salted_skew",
    "agg_moments",
]
_GATE_LAST = [  # green in r4 (or triple-green r1-r3 for the first two);
    # head = most recently exercised modules
    "neel_parsed",
    "neel_ner",
    "neel_export_challenge",
    "neel_export_extended",
    "index_inverted",
    "embedding_label_centroids",
    "text_lexical_diversity",
    "shuffle_global",
    "pack_sequences",
    "text_pii_redaction",
    "text_gopher_rules",
    "decontaminate_benchmark",
    "decontaminate_keep",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "text_repetition_ratio",
    "text_tfidf_topterms",
    "dedup_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_minhash_estimate",
    "multimodal_features",
    "multimodal_frame_sample",
    "join_bloom_pruned",
    "neel_assembled",
    "neel_export_json",
    "project_nested_json",
    "project_dump_rows",
    "text_token_counts",
    "union_tagged_streams",
    "chunked_requests",
    "window_topk_per_group",
    "sampling_deterministic",
    "text_language_id",
    "agg_rollup",
    "neel_resources",
    "neel_nel",
    "filter_has_links",
    "agg_pricing_summary",
    "join_broadcast_dims",
    "window_tumbling_events",
    "neel_geo",
    "neel_export_dataset",
    "dedup_minhash_signatures",
    "text_quality_scores",
    "join_fact_fact",
    "dedup_exact_groups",
    "dedup_exact_keep",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "text_fingerprints",
    "text_fingerprint_overlap",
    "sessionize_events",
    "pivot_event_types",
]


def _gate_order(d: dict) -> dict:
    first = [k for k in _GATE_FIRST if k in d]
    last = [k for k in _GATE_LAST if k in d]
    mid = [k for k in d if k not in _GATE_FIRST and k not in _GATE_LAST]
    return {k: d[k] for k in first + mid + last}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _gate_order(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _gate_order(dict(registry.ORACLES))
