"""Explicit StructType schemas for every record shape in the pipeline.

Shapes follow the reference DTOs (fields inferred from call sites, see
SURVEY.md §1.3): tweet/status (`NeelProcessedTweetWindowFunction.java:27-100`),
entity (`TwitterNeelResultRowMapper.java:26-44`), resource
(`TwitterNeelExtendedResultRowMapper.java:64-68`), decoded location
(`TwitterStreamJob.java:339-343`), request envelope
(`AbstractRequestMessageBuilder.java:44-50`), result event
(`TwitterStreamJob.java:356-366`), heartbeat (`JobHeartbeatSender.java:63-70`).

Ids are STRINGS end-to-end, mirroring the reference's
``String.valueOf(status.getId())`` (`TwitterStreamJob.java:241,311`).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Core shapes
# ---------------------------------------------------------------------------

COORDINATES = T.StructType(
    [
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lng", T.DoubleType(), True),
    ]
)

TWITTER_USER = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("screenName", T.StringType(), True),
        T.StructField("profileImageUrl", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("coordinates", COORDINATES, True),
    ]
)

TWITTER_STATUS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("retweet", T.BooleanType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("coordinates", COORDINATES, True),
        T.StructField("user", TWITTER_USER, True),
    ]
)

ENTITY_POSITION = T.StructType(
    [
        T.StructField("start", T.IntegerType(), True),
        T.StructField("end", T.IntegerType(), True),
    ]
)

RESOURCE = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("tag", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("shortDesc", T.StringType(), True),
        T.StructField("thumb", T.StringType(), True),
        T.StructField("thumbLarger", T.StringType(), True),
        T.StructField("coordinates", T.StringType(), True),
    ]
)

LINKED_ENTITY = T.StructType(
    [
        T.StructField("position", ENTITY_POSITION, True),
        T.StructField("value", T.StringType(), True),
        T.StructField("link", T.StringType(), True),
        T.StructField("isNil", T.BooleanType(), True),
        T.StructField("nilCluster", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("resource", RESOURCE, True),
    ]
)

DECODED_LOCATION = T.StructType(
    [
        T.StructField("address", T.StringType(), True),
        T.StructField("coordinates", COORDINATES, True),
        T.StructField("tag", T.StringType(), True),
    ]
)

NEEL_PROCESSED_TWEET = T.StructType(
    [
        T.StructField("status", TWITTER_STATUS, False),
        T.StructField("entities", T.ArrayType(LINKED_ENTITY), True),
    ]
)

# ---------------------------------------------------------------------------
# Fan-in fragment stream: one normalized wide schema replacing the reference's
# Tuple3<String, Object, StreamType> heterogeneous union
# (`TwitterStreamJob.java:309-346`, tag enum `StreamType.java:5-7`).
# ---------------------------------------------------------------------------

STREAM_TYPES = ("status", "linkedTweet", "resource", "decodedLocation")

FRAGMENT = T.StructType(
    [
        T.StructField("tag", T.StringType(), False),
        T.StructField("stream_type", T.StringType(), False),
        T.StructField("status", TWITTER_STATUS, True),
        T.StructField("entities", T.ArrayType(LINKED_ENTITY), True),
        T.StructField("resources", T.ArrayType(RESOURCE), True),
        T.StructField("decoded_location", DECODED_LOCATION, True),
    ]
)

# ---------------------------------------------------------------------------
# Kafka request/response envelopes (§2.10)
# ---------------------------------------------------------------------------

REQUEST_ENVELOPE = T.StructType(
    [
        T.StructField("requestId", T.StringType(), False),
        T.StructField("outputTopic", T.StringType(), False),
        T.StructField("expiration", T.LongType(), True),
        T.StructField("recognizer", T.StringType(), True),
        T.StructField("linker", T.StringType(), True),
        T.StructField("decoder", T.StringType(), True),
        T.StructField("texts", T.ArrayType(T.StringType()), True),
        T.StructField("payload", T.StringType(), True),
    ]
)

ANALYSIS_RESULT_EVENT = T.StructType(
    [
        T.StructField("analysisId", T.StringType(), False),
        T.StructField("processDate", T.TimestampType(), False),
        T.StructField("payload", NEEL_PROCESSED_TWEET, False),
    ]
)

JOB_HEARTBEAT = T.StructType(
    [
        T.StructField("jobId", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("progress", T.DoubleType(), True),
        T.StructField("last", T.BooleanType(), True),
        T.StructField("failed", T.BooleanType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Dataset-input row (TSV with `__` nesting convention,
# `TwitterNeelInputRow.java:6-13`, `MapToJsonSerializer.java:21-49`)
# ---------------------------------------------------------------------------

DATASET_INPUT = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("user__id", T.StringType(), True),
        T.StructField("user__name", T.StringType(), True),
        T.StructField("user__screen_name", T.StringType(), True),
        T.StructField("user__location", T.StringType(), True),
    ]
)
