"""End-to-end async RPC topology: 6 streaming queries + 4 service simulators
over file topics, golden-compared against the in-process batch pipeline."""

import json
import time

import pytest
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark import corpus, fragments
from bigtwine_streamprocessor_spark.operators.parse import parse_tweets
from bigtwine_streamprocessor_spark.streaming import fanin, topology

N_TWEETS = 30


def test_topology_source_has_no_driver_collects():
    """Scale guard: every hop (including the Q2-Q5 response parsers) must
    shape messages on executors — no collect()/toPandas()/toLocalIterator of
    item-bearing data anywhere in the topology module."""
    import inspect

    from bigtwine_streamprocessor_spark.streaming import topology as topo_mod

    src = inspect.getsource(topo_mod)
    for banned in (".collect(", ".toPandas(", ".toLocalIterator("):
        assert banned not in src, f"driver-side drain found: {banned}"


@pytest.mark.slow
def test_async_topology_matches_batch(spark, sf_dir, tmp_path):
    parsed_batch = parse_tweets(
        corpus.tweets_df(spark, sf_dir), skip_retweets=True
    ).orderBy("id").limit(N_TWEETS).cache()
    n = parsed_batch.count()

    # feed the tweet stream as one json-lines file
    indir = tmp_path / "tweets_in"
    indir.mkdir()
    rows = parsed_batch.collect()
    with open(indir / "batch0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")
    stream = (
        spark.readStream.schema(parsed_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )

    queries, sims, topics = topology.start_topology(
        spark, str(tmp_path / "topics"), stream, "a-topo", timeout_ms=20_000
    )
    try:
        deadline = time.time() + 120
        results = []
        while time.time() < deadline:
            results = topics["results"].read_all()
            if len(results) >= n:
                break
            time.sleep(1.0)
    finally:
        for q in queries:
            q.stop()
        for s in sims:
            s.stop()

    assert len(results) == n, f"expected {n} assembled tweets, got {len(results)}"
    got = {json.loads(r)["payload"]["status"]["id"]: json.loads(r) for r in results}
    assert not any(v["is_partial"] for v in got.values()), "all should complete"

    # golden-compare against the in-process batch pipeline on the same tweets
    want_df = fragments.finalize_results(
        fanin.fanin_batch(fragments.build_fragments(parsed_batch))
    )
    want = {
        r["tag"]: json.loads(r["value"])
        for r in want_df.select(
            F.col("tag"), F.to_json(F.struct(F.col("payload"))).alias("value")
        ).collect()
    }
    assert set(got) == set(want)
    for tag in want:
        g = json.dumps(got[tag]["payload"], sort_keys=True)
        w = json.dumps(want[tag]["payload"], sort_keys=True)
        assert g == w, f"payload mismatch for tweet {tag}:\n  async={g}\n  batch={w}"
