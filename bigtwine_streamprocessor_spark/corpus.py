"""Deterministic tweet corpus derived from the driver's ``documents`` table.

The reference consumes tweets from the live Twitter API or a GridFS TSV dump
(`TwitterStreamJob.java:154-209`). Neither exists in this environment, so the
test corpus maps the synthetic ``documents`` parquet table onto the
dataset-input schema (`TwitterNeelInputRow.java:6-13`, FIXTURES.md §2):

    doc_id -> id (stringified, `TwitterStreamJob.java:241`)
    text   -> text
    deterministic user id / name / screen_name / location columns

The location mix (null / blank / 1-char / ``city_N``) deliberately exercises
both branches of the ``statusHasUserLocation`` predicate
(`TwitterNeelUtils.java:23-28`): only ``city_N`` survives it.

Every derivation here exists twice — as a Spark DataFrame expression and as a
DuckDB SQL fragment — built from the same constants, so the correctness oracle
can never drift from the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Retweet flag synthesized deterministically (live corpus would carry
# `status.isRetweet`; `TwitterStreamJob.java:216-218` skips them on request).
RETWEET_MOD = 17

# user__location mix: 0 -> NULL, 1 -> blank, 2 -> single char (all three fail
# `TwitterNeelUtils.java:23-28`), else a geocodable "city_N" string.
LOCATION_MOD = 5
CITY_MOD = 20


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor for per-row-expensive chains
    (optimization guide §2.5, input skew: "one huge unsplittable file ...
    repartition immediately after the read"). The local testdata ships each
    table as ONE small parquet file = one row group, which Spark cannot
    split — the scan yields a single partition, so everything up to the
    first exchange (shingle explodes, md5 chains, HOF folds) runs on one
    core while the rest idle (r15 measured: the MinHash signature chain
    2.33 -> 0.88 s warm at sf0.1 once spread). A real deployment's scan
    yields >= defaultParallelism splits and this is a NO-OP there — the
    condition is the frame's CURRENT partition count against the cluster's
    parallelism, never a local constant. Streaming frames pass through
    untouched (micro-batches are already split by the source)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def tweets_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents parquet -> dataset-input-shaped tweet corpus (batch)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.col("text"),
        F.col("lang"),
        (F.col("doc_id") * 7 + 11).cast("string").alias("user__id"),
        F.concat(F.lit("user_"), (F.col("doc_id") % 50).cast("string")).alias(
            "user__name"
        ),
        F.concat(F.lit("sn_"), (F.col("doc_id") % 50).cast("string")).alias(
            "user__screen_name"
        ),
        F.when(F.col("doc_id") % LOCATION_MOD == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % LOCATION_MOD == 1, F.lit(" "))
        .when(F.col("doc_id") % LOCATION_MOD == 2, F.lit("x"))
        .otherwise(
            F.concat(F.lit("city_"), (F.col("doc_id") % CITY_MOD).cast("string"))
        )
        .alias("user__location"),
        (F.col("doc_id") % RETWEET_MOD == 0).alias("is_retweet"),
    )


# DuckDB CTE producing the identical corpus (driver pre-registers `documents`).
TWEETS_SQL = f"""
tweets AS (
    SELECT CAST(doc_id AS VARCHAR) AS id,
           text,
           lang,
           CAST(doc_id * 7 + 11 AS VARCHAR) AS user__id,
           'user_' || CAST(doc_id % 50 AS VARCHAR) AS user__name,
           'sn_' || CAST(doc_id % 50 AS VARCHAR) AS user__screen_name,
           CASE WHEN doc_id % {LOCATION_MOD} = 0 THEN NULL
                WHEN doc_id % {LOCATION_MOD} = 1 THEN ' '
                WHEN doc_id % {LOCATION_MOD} = 2 THEN 'x'
                ELSE 'city_' || CAST(doc_id % {CITY_MOD} AS VARCHAR)
           END AS user__location,
           (doc_id % {RETWEET_MOD} = 0) AS is_retweet
    FROM documents
)
"""
