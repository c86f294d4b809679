"""External-enrichment RPC pattern (SURVEY.md §2.10): request envelopes,
chunking, response flattening, pluggable transport.

The reference micro-batches rows into request messages (3 s tumbling windows,
`TwitterStreamJob.java:240-243`), chunks large requests (15 items,
`AbstractRequestMessageBuilder.java:32-42`), wraps them in an envelope with a
random requestId / reply-to topic / expiration
(`AbstractRequestMessageBuilder.java:44-50`), produces to the service's Kafka
topic, and separately consumes + flattens the reply arrays
(`NerResponseMessageParser.java:32-40` et al.).

Spark realization:

* micro-batching IS the trigger (``trigger(processingTime='3 seconds')``);
* chunking = ranking window -> ``floor(rn / maxItems)`` + per-chunk
  ``collect_list`` (deterministic, shuffle on the chunk key only);
* envelopes = Column expressions + ``to_json`` (``uuid()`` for requestId,
  non-deterministic exactly like the reference's random id);
* transport is pluggable: **kafka** (produce inside ``foreachBatch`` /
  writeStream) or **local** — the deterministic in-process services of
  services_local.py applied as DataFrame transforms, which is the mode the
  correctness harness exercises end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_MAX_ITEMS = 15  # `TwitterStreamJob.java:300`
DEFAULT_TIMEOUT_S = 15  # `Constants.java:30`


def chunk_items(
    df: DataFrame,
    item_col: str,
    max_items: int = DEFAULT_MAX_ITEMS,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Group rows into ordered chunks of ``max_items`` (A/15 semantics).

    Output: one row per chunk with ``items array`` + ``chunk_id``.
    """
    from pyspark.sql import Window as W

    pcols = partition_cols or []
    w = (
        W.partitionBy(*pcols).orderBy(item_col)
        if pcols
        else W.partitionBy(F.lit(1)).orderBy(item_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w) - 1)
        .groupBy(*pcols, F.floor(F.col("_rn") / max_items).alias("chunk_id"))
        .agg(F.sort_array(F.collect_list(item_col)).alias("items"))
    )


def request_envelopes(
    chunks: DataFrame,
    service: str,
    analysis_id: str,
    timeout_s: int = DEFAULT_TIMEOUT_S,
    extra: dict[str, str] | None = None,
) -> DataFrame:
    """Wrap item chunks in request envelopes -> one JSON string per request.

    requestId = uuid (random like the reference — excluded from golden
    compares); outputTopic = per-analysis reply topic; expiration = now +
    timeout*1000 ms (`AbstractRequestMessageBuilder.java:44-50`).
    """
    from ..sources.streams import topic

    fields = [
        F.expr("uuid()").alias("requestId"),
        F.lit(topic(f"{service}_responses", analysis_id)).alias("outputTopic"),
        (F.unix_millis(F.current_timestamp()) + timeout_s * 1000).alias("expiration"),
        F.col("items"),
    ]
    for k, v in (extra or {}).items():
        fields.append(F.lit(v).alias(k))
    return chunks.select(F.to_json(F.struct(*fields)).alias("request_json"))


def request_envelope_fields(
    chunks: DataFrame,
    service: str,
    analysis_id: str,
    timeout_s: int = DEFAULT_TIMEOUT_S,
    now_ms: int = 0,
) -> DataFrame:
    """The DETERMINISTIC envelope fields — everything of
    `AbstractRequestMessageBuilder.java:44-50` except the random requestId,
    with expiration pinned to ``now_ms + timeout*1000`` so the oracle can
    reproduce it. Items stringify as a '|'-joined sorted list (array outputs
    hash unreliably across engines). This is the gated face of
    ``request_envelopes`` (which keeps the uuid + wall-clock expiration for
    production)."""
    from ..sources.streams import topic

    return chunks.select(
        F.col("chunk_id"),
        F.lit(topic(f"{service}_responses", analysis_id)).alias("output_topic"),
        F.lit(now_ms + timeout_s * 1000).cast("bigint").alias("expiration"),
        F.array_join(F.col("items"), "|").alias("items"),
        F.size(F.col("items")).cast("bigint").alias("n_items"),
    )


def parse_response_items(
    responses: DataFrame,
    item_schema: T.DataType,
    items_field: str = "items",
) -> DataFrame:
    """Response envelope JSON -> per-item rows (the ``*ResponseMessageParser``
    flatten, `NerResponseMessageParser.java:32-40`): parse, explode, drop
    malformed (null) envelopes like the reference's swallowed errors."""
    env_schema = T.StructType(
        [
            T.StructField("requestId", T.StringType()),
            T.StructField(items_field, T.ArrayType(item_schema)),
        ]
    )
    parsed = responses.select(
        F.from_json(F.col("response_json"), env_schema).alias("env")
    ).filter(F.col("env").isNotNull())
    return parsed.select(
        F.col("env.requestId").alias("request_id"),
        F.explode(F.col(f"env.{items_field}")).alias("item"),
    )


def regroup_by_tag(items: DataFrame, tag_col: str = "item.tag") -> DataFrame:
    """A3: regroup a response's item array per tweet tag
    (`LinkResolverResponseMessageParser.java:37-53`)."""
    return items.groupBy(F.col(tag_col).alias("tag")).agg(
        F.collect_list("item").alias("items")
    )
