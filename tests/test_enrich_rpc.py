"""§2.10 RPC pattern round-trip: chunk -> envelope -> simulated service ->
response parse -> per-tag regroup, plus chunking and backfill properties."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigtwine_streamprocessor_spark.operators import enrich


def test_rpc_round_trip(spark):
    # 40 locations across 3 tweets-worth of tags
    rows = [(f"tag{i % 3}", f"city_{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "tag string, address string")

    chunks = enrich.chunk_items(df, "address", max_items=15)
    assert chunks.count() == 3  # ceil(40/15)
    sizes = sorted(r["n"] for r in chunks.select(F.size("items").alias("n")).collect())
    assert sizes == [10, 15, 15]

    envelopes = enrich.request_envelopes(
        chunks, "geodecoder", "analysis-x", timeout_s=15
    ).collect()
    assert len(envelopes) == 3

    # simulated external service: parse each request, decode every address
    responses = []
    for r in envelopes:
        req = json.loads(r["request_json"])
        assert req["outputTopic"] == "geodecoder-responses.analysis-x"
        assert req["requestId"] and req["expiration"] > 0
        items = [
            {"tag": a, "address": a, "lat": float(len(a)), "lng": -1.0}
            for a in req["items"]
        ]
        responses.append((json.dumps({"requestId": req["requestId"], "items": items}),))

    resp_df = spark.createDataFrame(responses, "response_json string")
    item_schema = T.StructType(
        [
            T.StructField("tag", T.StringType()),
            T.StructField("address", T.StringType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("lng", T.DoubleType()),
        ]
    )
    items = enrich.parse_response_items(resp_df, item_schema)
    assert items.count() == 40  # every request item came back

    regrouped = enrich.regroup_by_tag(items)
    assert regrouped.count() == 40  # tag here is the address-level tag

    # malformed response envelopes drop silently (reference swallows errors)
    bad = spark.createDataFrame([("{not json",), (None,)], "response_json string")
    assert enrich.parse_response_items(bad, item_schema).count() == 0


@given(
    n_items=st.integers(min_value=0, max_value=100),
    max_items=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=10, deadline=None)
def test_chunking_property(n_items, max_items):
    """Every chunk <= max_items; all chunks except possibly the last are full;
    items conserved. (Computed via the same floor(rn/k) arithmetic.)"""
    import math

    chunks = [
        min(max_items, n_items - i * max_items)
        for i in range(math.ceil(n_items / max_items))
    ]
    assert sum(chunks) == n_items
    assert all(c <= max_items for c in chunks)
    assert all(c == max_items for c in chunks[:-1])


def test_value_backfill_out_of_bounds(spark):
    """`NeelProcessedTweetWindowFunction.java:85-95`: OOB -> null, not error."""
    from bigtwine_streamprocessor_spark.streaming import fanin
    from bigtwine_streamprocessor_spark.fragments import finalize_results

    ent = {
        "position": {"start": 50, "end": 99},
        "value": None,
        "link": None,
        "isNil": True,
        "nilCluster": "nil-1",
        "confidence": 0.5,
        "category": "concept",
        "resource": None,
    }
    frags = spark.createDataFrame(
        [
            ("1", "status", json.dumps({"id": "1", "text": "short"})),
            ("1", "linkedTweet", json.dumps([ent])),
            ("1", "resource", json.dumps([])),
            ("1", "decodedLocation", json.dumps({"tag": "1"})),
        ],
        schema=fanin.FRAGMENT_IN,
    )
    out = finalize_results(fanin.fanin_batch(frags)).collect()
    assert len(out) == 1
    e = out[0]["payload"]["entities"][0]
    assert e["value"] is None  # swallowed, row kept
    assert e["position"]["start"] == 50
