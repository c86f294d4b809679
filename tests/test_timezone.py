"""UTC-precondition hardening (r6, closing the r5 ADVICE items).

The NTZ->TIMESTAMP cast shifts values under a non-UTC session timezone, so:
`load_events` must PIN the timezone itself (callers hand it arbitrary
sessions — the external driver uses a bare SparkSession), and
`interval_join_bucketed` must refuse NTZ inputs under a non-UTC session
instead of silently producing shifted cells.
"""

import contextlib

import pytest
import pyspark.sql.functions as F

from bigtwine_streamprocessor_spark.operators.joins import interval_join_bucketed
from bigtwine_streamprocessor_spark.session import load_events


@contextlib.contextmanager
def _session_tz(spark, tz):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_load_events_pins_utc_under_foreign_timezone(spark, sf_dir):
    baseline = [
        r.ts for r in load_events(spark, sf_dir).orderBy("event_id").limit(20).collect()
    ]
    with _session_tz(spark, "America/New_York"):
        shifted_session = [
            r.ts
            for r in load_events(spark, sf_dir).orderBy("event_id").limit(20).collect()
        ]
        # load_events must have re-pinned UTC itself
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert shifted_session == baseline


def test_interval_join_rejects_ntz_under_foreign_timezone(spark, sf_dir):
    ev = load_events(spark, sf_dir).limit(50)
    pts = ev.select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    iv = ev.select(
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("start"),
        F.expr("ts + INTERVAL 1 HOUR").cast("timestamp_ntz").alias("end"),
    )
    with _session_tz(spark, "America/New_York"):
        with pytest.raises(ValueError, match="timeZone"):
            interval_join_bucketed(pts, iv, "user_id", "ts", "start", "end", 3600)
    # under UTC the same NTZ inputs are accepted and every point matches
    # its own interval start
    out = interval_join_bucketed(pts, iv, "user_id", "ts", "start", "end", 3600)
    assert out.filter(F.col("ts") == F.col("start")).count() >= 50


def test_interval_join_timestamp_inputs_ignore_timezone(spark, sf_dir):
    """Plain TIMESTAMP inputs are instants — the guard must NOT fire."""
    ev = load_events(spark, sf_dir).limit(20)
    pts = ev.select("user_id", "ts")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("start"),
        F.expr("ts + INTERVAL 1 HOUR").alias("end"),
    )
    with _session_tz(spark, "America/New_York"):
        n = (
            interval_join_bucketed(pts, iv, "user_id", "ts", "start", "end", 3600)
            .count()
        )
    assert n >= 20
