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


def assemble_flat_fused(parsed: DataFrame) -> DataFrame:
    """Shuffle-free physical strategy for the same logical assembly.

    The enrichment values are per-row derivable (deterministic local
    services), so the whole tweet x entity grain fuses into one codegen'd
    scan: NER fold -> entity transform -> ``explode_outer`` -> inline
    resource/geo attach. ZERO exchanges — verified with
    ``.explain("formatted")``; the join-based `assemble_flat` plan broadcasts
    the entity side, which stops being possible at cluster scale (the entity
    frame grows with the corpus), while this plan stays embarrassingly
    parallel at any scale.

    Output contract is identical to `assemble_flat` (same DuckDB oracle).
    """
    from ..fragments import _ner_array
    from ..services_local import CATEGORIES, LINK_PREFIX, THUMB_PREFIX
    from .parse import has_user_location

    e = F.col("e")
    tok_len = F.length(e["token"])
    nil = (e["pos"] + tok_len) % 3 == 0
    ent_end = (e["ent_start"] + tok_len).cast("int")
    link = F.when(~nil, F.concat(F.lit(LINK_PREFIX), e["token"]))
    resolved = link.isNotNull() & (tok_len % 2 == 0)
    value = F.when(
        (e["ent_start"] >= 0) & (ent_end <= F.length("text")),
        F.trim(F.expr("substring(text, e.ent_start + 1, length(e.token))")),
    )

    loc_key = F.split(F.col("user__location"), "_").getItem(1).cast("int")
    has_loc = has_user_location()
    user_lat = F.when(has_loc, loc_key.cast("double") * 1.5 - 10.0)
    user_lng = F.when(has_loc, F.lit(27.0) - loc_key.cast("double") * 0.75)

    return parsed.select(
        "id",
        "text",
        "user__id",
        "user__name",
        "user__screen_name",
        "user__location",
        user_lat.alias("user_lat"),
        user_lng.alias("user_lng"),
        F.explode_outer(_ner_array()).alias("e"),
    ).select(
        "id",
        "text",
        "user__id",
        "user__name",
        "user__screen_name",
        "user__location",
        "user_lat",
        "user_lng",
        e["pos"].alias("pos"),
        e["ent_start"].alias("ent_start"),
        ent_end.alias("ent_end"),
        F.when(e["pos"].isNotNull(), nil).alias("is_nil"),
        link.alias("link"),
        F.when(nil, F.concat(F.lit("nil-"), (tok_len % 5).cast("string"))).alias(
            "nil_cluster"
        ),
        (
            ((e["pos"] * 7 + tok_len * 13) % 100).cast("double") / F.lit(100.0)
        ).alias("confidence"),
        F.when(tok_len % 3 == 0, CATEGORIES[0])
        .when(tok_len % 3 == 1, CATEGORIES[1])
        .when(tok_len % 3 == 2, CATEGORIES[2])
        .alias("category"),
        value.alias("value"),
        F.when(resolved, F.upper(e["token"])).alias("resource_name"),
        F.when(
            resolved, F.concat(F.lit(THUMB_PREFIX), e["token"], F.lit(".png"))
        ).alias("resource_thumb"),
    )
