"""Analysis-result events -> the flat export grain.

The export job's input is the results collection (`ExportResultsJob.java:
113-124`, one document per `AnalysisResultProducedEvent`); this module unnests
it to the per-(tweet, entity) grain the format shapers consume, preserving the
outer-unnest rule (zero-entity tweets keep one bare row,
`TwitterNeelExtendedResultRowMapper.java:48-50`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_results(events: DataFrame) -> DataFrame:
    """events(analysisId, processDate, payload) -> assembled_flat columns
    (+ process_date), ready for the export.py format shapers."""
    e = events.select(
        "analysisId",
        F.date_format("processDate", "yyyy-MM-dd'T'HH:mm:ssXXX").alias(
            "process_date"
        ),
        F.col("payload.status").alias("status"),
        F.explode_outer("payload.entities").alias("ent"),
    )
    return e.select(
        F.col("analysisId"),
        F.col("process_date"),
        F.col("status.id").alias("id"),
        F.col("status.text").alias("text"),
        F.col("status.user.id").alias("user__id"),
        F.col("status.user.name").alias("user__name"),
        F.col("status.user.screenName").alias("user__screen_name"),
        F.col("status.user.location").alias("user__location"),
        F.col("status.user.coordinates.lat").alias("user_lat"),
        F.col("status.user.coordinates.lng").alias("user_lng"),
        F.col("ent.position.start").alias("ent_start"),
        F.col("ent.position.end").alias("ent_end"),
        F.col("ent.isNil").alias("is_nil"),
        F.col("ent.link").alias("link"),
        F.col("ent.nilCluster").alias("nil_cluster"),
        F.col("ent.confidence").alias("confidence"),
        F.col("ent.category").alias("category"),
        F.col("ent.value").alias("value"),
        F.col("ent.resource.name").alias("resource_name"),
        F.col("ent.resource.thumb").alias("resource_thumb"),
    )
