"""Kafka transport seam: the producer path (executor-side foreachPartition
closures, process-local producer cache, envelope chunking) exercised with an
injected fake producer; the real-broker topology run skips without one."""

import json
import os

import pytest

from bigtwine_streamprocessor_spark.streaming import kafka_transport as kt


class CountingFactory:
    calls = 0

    def __call__(self, bootstrap):
        CountingFactory.calls += 1
        return kt.SpoolProducer("/tmp/unused-spool")


def _spool_lines(spool, topic):
    d = os.path.join(spool, topic)
    out = []
    if not os.path.isdir(d):
        return out
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                out += [ln for ln in f.read().splitlines() if ln.strip()]
    return out


def test_producer_cache_reuses_per_process(tmp_path):
    CountingFactory.calls = 0
    factory = CountingFactory()
    kt._PRODUCER_CACHE.clear()
    kt.kafka_append("b:9092", "t", ["a"], factory)
    kt.kafka_append("b:9092", "t", ["b"], factory)
    assert CountingFactory.calls == 1, "same process must reuse the producer"


def test_producer_cache_stable_across_unpickled_factories(tmp_path):
    """Each foreachPartition task unpickles a FRESH factory instance; the
    cache key must survive that (repr()/id() would miss every time and leak a
    producer per partition-task), while factories with different configs must
    NOT share a producer."""
    import pickle

    kt._PRODUCER_CACHE.clear()
    f1 = kt.SpoolProducerFactory(str(tmp_path / "s1"))
    f1_copy = pickle.loads(pickle.dumps(f1))  # what an executor task sees
    f2 = kt.SpoolProducerFactory(str(tmp_path / "s2"))
    p1 = kt._producer_for("b:9092", f1)
    assert kt._producer_for("b:9092", f1_copy) is p1, "same config -> same slot"
    assert kt._producer_for("b:9092", f2) is not p1, "configs must not collide"
    assert len(kt._PRODUCER_CACHE) == 2


def test_producer_cache_bounded(tmp_path):
    kt._PRODUCER_CACHE.clear()
    for i in range(kt._PRODUCER_CACHE_MAX + 8):
        kt._producer_for("b:9092", kt.SpoolProducerFactory(str(tmp_path / f"s{i}")))
    assert len(kt._PRODUCER_CACHE) <= kt._PRODUCER_CACHE_MAX


def test_producer_cache_evicts_lru_and_flushes(tmp_path):
    """Eviction under key churn must drop the LEAST-recently-used producer
    (a recently-hit hot producer survives), and evicted producers are
    flushed before close so buffered async sends are not lost."""

    events = []

    class Probe:
        def __init__(self, name):
            self.name = name

        def flush(self):
            events.append(("flush", self.name))

        def close(self):
            events.append(("close", self.name))

    class ProbeFactory:
        def __init__(self, name):
            self.name = name

        def cache_key(self):
            return self.name

        def __call__(self, bootstrap):
            return Probe(self.name)

    kt._PRODUCER_CACHE.clear()
    factories = [ProbeFactory(f"p{i}") for i in range(kt._PRODUCER_CACHE_MAX)]
    for f in factories:
        kt._producer_for("b:9092", f)
    # touch p0 — it becomes most-recently-used, so the next eviction must
    # take p1 (the oldest untouched), NOT p0
    kt._producer_for("b:9092", factories[0])
    kt._producer_for("b:9092", ProbeFactory("overflow"))
    assert events == [("flush", "p1"), ("close", "p1")]
    live = {v.name for v in kt._PRODUCER_CACHE.values()}
    assert "p0" in live and "p1" not in live
    kt._PRODUCER_CACHE.clear()


def test_line_writer_through_foreachpartition(spark, tmp_path):
    spool = str(tmp_path / "spool")
    topic = kt.KafkaTopic("b:9092", "results", kt.SpoolProducerFactory(spool))
    df = spark.range(50).selectExpr("concat('line-', id) AS value")
    df.foreachPartition(topic.line_writer())
    lines = _spool_lines(spool, "results")
    assert sorted(lines) == sorted(f"line-{i}" for i in range(50))


def test_envelope_writer_chunks_and_wraps(spark, tmp_path):
    spool = str(tmp_path / "spool")
    topic = kt.KafkaTopic("b:9092", "geo-req", kt.SpoolProducerFactory(spool))
    df = (
        spark.range(7)
        .coalesce(1)
        .selectExpr("to_json(struct(cast(id AS string) AS tag)) AS item")
    )
    df.foreachPartition(topic.envelope_writer("geo-resp.a1", chunk=3))
    envs = [json.loads(ln) for ln in _spool_lines(spool, "geo-req")]
    assert len(envs) == 3  # 3 + 3 + 1
    assert all(e["outputTopic"] == "geo-resp.a1" for e in envs)
    assert all("requestId" in e and "expiration" in e for e in envs)
    tags = sorted(it["tag"] for e in envs for it in e["items"])
    assert tags == sorted(str(i) for i in range(7))
    assert max(len(e["items"]) for e in envs) <= 3


def test_append_lines_driver_side(tmp_path):
    spool = str(tmp_path / "spool")
    kt._PRODUCER_CACHE.clear()
    topic = kt.KafkaTopic("b:9092", "frag", kt.SpoolProducerFactory(spool))
    topic.append_lines(["x", "y"])
    assert sorted(_spool_lines(spool, "frag")) == ["x", "y"]


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="no Kafka broker in this environment (set KAFKA_BOOTSTRAP to run)",
)
def test_topology_runs_on_kafka(spark, sf_dir, tmp_path):
    """Config-switch check against a real broker: same dataflow, Kafka topics."""
    from bigtwine_streamprocessor_spark import corpus
    from bigtwine_streamprocessor_spark.operators.parse import parse_tweets
    from bigtwine_streamprocessor_spark.streaming import topology

    bootstrap = os.environ["KAFKA_BOOTSTRAP"]
    topics = kt.make_kafka_topics(bootstrap, topology.TOPIC_NAMES)
    parsed = parse_tweets(corpus.tweets_df(spark, sf_dir)).limit(5)
    stream = (
        spark.readStream.schema(parsed.schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    queries, sims, topics = topology.start_topology(
        spark, str(tmp_path / "chk"), stream, "a-kafka", topics=topics
    )
    for q in queries:
        q.stop()
    for s in sims:
        s.stop()


def test_epoch_discipline_degradation_warns_once(tmp_path):
    """KafkaTopic accepts the epoch lifecycle as no-ops and must SAY so:
    requesting an epoch-disciplined writer (fname_prefix) warns once per
    process that broker replays are at-least-once (r8-advisor item)."""
    import warnings

    kt._WARNED_AT_LEAST_ONCE = False
    spool = kt.SpoolProducerFactory(str(tmp_path / "spool"))
    topic = kt.KafkaTopic("fake:9092", "t", producer_factory=spool)
    # lifecycle no-ops: never committed, begin/commit accepted
    assert topic.exactly_once_replay is False
    assert topic.epoch_committed("q1-e0") is False
    topic.begin_epoch("q1-e0")
    topic.commit_epoch("q1-e0")
    assert topic.epoch_committed("q1-e0") is False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        topic.line_writer(fname_prefix="q1-e0")
        topic.envelope_writer("reply", fname_prefix="q1-e0")  # no 2nd warn
        topic.line_writer()  # no prefix -> no warning either
    at_least_once = [x for x in w if "AT-LEAST-ONCE" in str(x.message)]
    assert len(at_least_once) == 1
