"""Watermarked stream-stream joins.

The reference correlates its streams through the keyed fan-in window
(`streaming/fanin.py`); this module covers the OTHER correlation shape a
streaming deployment needs: joining two live streams on a key within an
event-time band, with watermarks bounding both sides' join state
(`TwitterStreamJob.java`'s single-stream topology never needs it, but the
100 TB replay/enrichment story does — e.g. matching purchase events to
nearby activity while both feeds are in flight).

Spark executes this as a symmetric hash join whose state is purged by the
watermark + time-range condition — per-key state is bounded by
``2 * window_s`` of data, independent of stream length. That bound only
exists if the join condition carries BOTH inequality directions; an
unbounded side would accumulate state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_pair_stream(
    points: DataFrame,
    anchors: DataFrame,
    key: str = "user_id",
    window_s: int = 300,
    watermark_s: int = 600,
) -> DataFrame:
    """Pairs (anchor_event_id, event_id) where the point event lies within
    ±``window_s`` of the anchor's event time for the same key — the streaming
    twin of ``operators.joins.interval_join_bucketed`` (batch oracle:
    join_interval_nearby_events before its count).

    Both inputs are streaming DataFrames with an ``event_id`` and ``ts``
    column. Inner joins emit eagerly (no watermark wait); the watermark +
    two-sided time bound let Spark drop join state older than the band.
    """
    a = (
        anchors.withWatermark("ts", f"{watermark_s} seconds")
        .select(
            F.col(key).alias("_k"),
            F.col("event_id").alias("anchor_event_id"),
            F.col("ts").alias("_ats"),
        )
    )
    p = points.withWatermark("ts", f"{watermark_s} seconds").select(
        F.col(key), F.col("event_id"), F.col("ts")
    )
    return (
        p.join(
            a,
            (F.col(key) == F.col("_k"))
            & (F.col("ts") >= F.col("_ats") - F.expr(f"INTERVAL {window_s} SECONDS"))
            & (F.col("ts") <= F.col("_ats") + F.expr(f"INTERVAL {window_s} SECONDS")),
        )
        .select("anchor_event_id", "event_id")
    )
