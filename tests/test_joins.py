"""As-of join operator semantics: inclusive vs strict tie handling, LEFT
nulls before the first right row, per-key isolation."""

from datetime import datetime

from bigtwine_streamprocessor_spark.operators.joins import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_inclusive_strict_and_left_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "before-any"),
            (1, _ts("2024-01-01T01:00:00"), "tie-with-r1"),
            (1, _ts("2024-01-01T02:30:00"), "after-r1"),
            (1, _ts("2024-01-01T04:00:00"), "after-r2"),
            (2, _ts("2024-01-01T05:00:00"), "other-key-no-rights"),
        ],
        "k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T01:00:00"), "r1"),
            (1, _ts("2024-01-01T03:00:00"), "r2"),
        ],
        "k bigint, ts timestamp, v string",
    )

    incl = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
    }
    assert incl == {
        "before-any": None,
        "tie-with-r1": "r1",  # inclusive: right row at equal ts is visible
        "after-r1": "r1",
        "after-r2": "r2",
        "other-key-no-rights": None,  # keys never bleed into each other
    }

    strict = {
        r["tag"]: r["v"]
        for r in asof_join(
            left, right, "k", "ts", "ts", ["v"], strict=True
        ).collect()
    }
    assert strict["tie-with-r1"] is None  # strict: equal ts not visible
    assert strict["after-r1"] == "r1" and strict["after-r2"] == "r2"


def test_asof_null_right_values_not_backfilled(spark):
    """A matched right row's legitimate NULL value must surface as NULL (not
    the previous right row's value), and multiple value columns must all come
    from the SAME matched row — DuckDB native-ASOF parity."""
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T01:30:00"), "after-r1"),
            (1, _ts("2024-01-01T02:30:00"), "after-r2"),
            (1, _ts("2024-01-01T03:30:00"), "after-r3"),
        ],
        "k bigint, ts timestamp, tag string",
    )
    # r2 has a NULL v (but a b); r3 has a NULL b (but a v) — independent
    # per-column filling would synthesize composites (v from r1/r3, b from r2)
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T01:00:00"), "v1", "b1"),
            (1, _ts("2024-01-01T02:00:00"), None, "b2"),
            (1, _ts("2024-01-01T03:00:00"), "v3", None),
        ],
        "k bigint, ts timestamp, v string, b string",
    )
    got = {
        r["tag"]: (r["v"], r["b"])
        for r in asof_join(left, right, "k", "ts", "ts", ["v", "b"]).collect()
    }
    assert got == {
        "after-r1": ("v1", "b1"),
        "after-r2": (None, "b2"),  # r2's own NULL, not r1's v1
        "after-r3": ("v3", None),  # r3's own NULL, not r2's b2
    }


def test_interval_join_bucketed_cell_boundaries(spark):
    """Containment must be exact across cell boundaries: candidates from the
    coarse bucket join are refined by the true bounds, and intervals spanning
    multiple cells still match points in every covered cell exactly once."""
    from bigtwine_streamprocessor_spark.operators.joins import (
        interval_join_bucketed,
    )

    points = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:04:59")),   # inside, same cell as start
            (1, 11, _ts("2024-01-01T00:15:00")),   # inside, later cell
            (1, 12, _ts("2024-01-01T00:20:01")),   # 1s past end -> out
            (1, 13, _ts("2023-12-31T23:59:59")),   # 1s before start -> out
            (2, 14, _ts("2024-01-01T00:10:00")),   # wrong key -> out
        ],
        "k bigint, pid bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, 77, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:20:00"))],
        "k bigint, iid bigint, s timestamp, e timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join_bucketed(
            points, intervals, "k", "ts", "s", "e", granularity_s=300
        ).collect()
    )
    assert got == [(10, 77), (11, 77)]
