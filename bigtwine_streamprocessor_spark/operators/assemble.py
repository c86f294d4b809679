"""Batch assembly of enrichment fragments into per-tweet NEEL results.

The reference's single correlation operator is a keyed union + global window +
completion/timeout trigger + assemble function (SURVEY.md §2.5,
`TwitterStreamTypeWindowTrigger.java:18-102`,
`NeelProcessedTweetWindowFunction.java:16-107`). In batch mode the completion
condition is trivially satisfied (all fragments exist), so the faithful batch
plan is a join-shaped assembly — the streaming twin with real
completion/timeout state lives in ``streaming/fanin.py`` and must produce
identical output on bounded input (batch/stream parity test).

Semantics preserved here:

* tweets with zero entities still produce a result (left/outer join,
  `TwitterNeelExtendedResultRowMapper.java:48-50`);
* resources attach by ``entity.link == resource.url``
  (`NeelProcessedTweetWindowFunction.java:78-84`) via a **broadcast** join —
  the resource dimension is small (distinct resolved links), so no shuffle of
  the tweet-side stream;
* entity ``value`` backfills from ``substring(text, start, end)`` trimmed,
  with out-of-bounds swallowed to null (`:85-95` — the reference catches and
  ignores the exception);
* user coordinates come from the decoded location
  (`NeelProcessedTweetWindowFunction.java:70-75`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_flat(
    parsed: DataFrame,
    nel: DataFrame,
    resources: DataFrame,
    geo: DataFrame,
) -> DataFrame:
    """One output row per (tweet, entity); zero-entity tweets emit one row.

    Join strategy for scale: the entity stream is keyed by tweet id exactly
    like the reference's ``keyBy`` (`TwitterStreamJob.java:347`) — one shuffle
    on id for the tweet<->entity join; the resource dim broadcasts; geo joins
    on id within the same shuffle exchange (Catalyst reuses the partitioning).
    """
    ent = nel.select(
        F.col("id").alias("ent_id"),
        "token",
        "pos",
        "ent_start",
        "ent_end",
        "is_nil",
        "link",
        "nil_cluster",
        "confidence",
        "category",
    )
    g = geo.select(F.col("id").alias("geo_id"), "lat", "lng")

    value = F.when(
        (F.col("ent_start") >= 0) & (F.col("ent_end") <= F.length("text")),
        F.trim(
            F.expr("substring(text, ent_start + 1, ent_end - ent_start)")
        ),
    )

    return (
        parsed.join(ent, parsed["id"] == ent["ent_id"], "left")
        .join(F.broadcast(resources), F.col("link") == F.col("url"), "left")
        .join(g, parsed["id"] == g["geo_id"], "left")
        .select(
            "id",
            "text",
            "user__id",
            "user__name",
            "user__screen_name",
            "user__location",
            F.col("lat").alias("user_lat"),
            F.col("lng").alias("user_lng"),
            "pos",
            "ent_start",
            "ent_end",
            "is_nil",
            "link",
            "nil_cluster",
            "confidence",
            "category",
            value.alias("value"),
            F.col("name").alias("resource_name"),
            F.col("thumb").alias("resource_thumb"),
        )
    )


def assemble_nested(flat: DataFrame) -> DataFrame:
    """Fold flat rows to one ``NeelProcessedTweet``-shaped row per tweet.

    Entities sort by position (deterministic, stricter than the reference's
    arrival order — documented deviation, SURVEY.md §2.7). The group-by runs on
    the same id partitioning as `assemble_flat`'s join, so no extra shuffle.
    """
    entity = F.struct(
        F.struct(
            F.col("ent_start").alias("start"), F.col("ent_end").alias("end")
        ).alias("position"),
        F.col("value"),
        F.col("link"),
        F.col("is_nil").alias("isNil"),
        F.col("nil_cluster").alias("nilCluster"),
        F.col("confidence"),
        F.col("category"),
        F.struct(
            F.col("link").alias("url"),
            F.col("resource_name").alias("name"),
            F.col("resource_thumb").alias("thumb"),
        ).alias("resource"),
    )
    return (
        flat.groupBy("id")
        .agg(
            F.first("text").alias("text"),
            F.first("user__id").alias("user_id"),
            F.first("user__name").alias("user_name"),
            F.first("user__screen_name").alias("user_screen_name"),
            F.first("user__location", ignorenulls=False).alias("user_location"),
            F.first("user_lat").alias("user_lat"),
            F.first("user_lng").alias("user_lng"),
            F.array_sort(
                F.collect_list(F.when(F.col("ent_start").isNotNull(), entity))
            ).alias("entities"),
        )
        .select(
            F.struct(
                F.col("id"),
                F.col("text"),
                F.struct(
                    F.col("user_id").alias("id"),
                    F.col("user_name").alias("name"),
                    F.col("user_screen_name").alias("screenName"),
                    F.col("user_location").alias("location"),
                    F.struct(
                        F.col("user_lat").alias("lat"), F.col("user_lng").alias("lng")
                    ).alias("coordinates"),
                ).alias("user"),
            ).alias("status"),
            F.col("entities"),
        )
    )
