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


# ---------------------------------------------------------------------------
# Idempotent epoch-replay publish (transport-level exactly-once)
# ---------------------------------------------------------------------------

def test_named_publish_is_idempotent(tmp_path):
    """A replayed micro-batch must land exactly once — the file-transport
    analog of a transactional Kafka producer. The reference restarts its
    Flink job from checkpoints and relies on broker-side semantics
    (`TwitterStreamJob.java:227-229`); here the unit of commitment is the
    EPOCH: writes stage (invisible to readers) until commit_epoch promotes
    them atomically, a committed epoch's replay is skipped wholesale, and a
    retried task within one attempt collapses onto its partition name."""
    import os

    from bigtwine_streamprocessor_spark.streaming import transport

    topic = transport.FileTopic(str(tmp_path), "requests")
    writer = topic.line_writer(fname_prefix="q1-e7")
    rows = [{"value": "a"}, {"value": "b"}]
    writer(iter(rows))          # original attempt (staged)
    writer(iter(rows))          # task retry within the attempt: same name
    assert topic.read_all() == []  # staged = invisible until commit
    topic.commit_epoch("q1-e7")
    assert topic.read_all() == ["a", "b"]
    # committed epoch: the whole replay is skipped by the driver guard...
    assert topic.epoch_committed("q1-e7")
    # ...and even a stray late write cannot disturb the committed files
    topic.begin_epoch("q1-e7")
    writer(iter([{"value": "DIFFERENT"}]))
    topic.commit_epoch("q1-e7")  # no-op: already committed
    assert topic.read_all() == ["a", "b"]
    files = [f for f in os.listdir(os.path.join(topic.dir, "q1-e7"))]
    assert files == ["p0.json"]


def test_replayed_epoch_with_different_partitioning_is_exact(tmp_path):
    """The r8-advisor hole: a crash mid-epoch followed by a restart that
    REPARTITIONS the batch (different parallelism) must neither lose rows
    nor duplicate them. Partition-name dedup alone fails both ways; the
    stage-discard-rerun discipline recovers exactly the replay's rows."""
    from bigtwine_streamprocessor_spark.streaming import transport

    topic = transport.FileTopic(str(tmp_path), "t")
    # attempt 1: two partitions, crash before commit (p1 never ran)
    transport.append_lines_to_dir(
        topic.dir, ["a"], fname=f"{transport.STAGING}/q1-e3/p0"
    )
    assert topic.read_all() == []  # nothing visible
    # restart: the SAME epoch arrives repacked as ONE partition with a
    # different row order; the driver guard discards the stale staging
    assert not topic.epoch_committed("q1-e3")
    topic.begin_epoch("q1-e3")
    transport.append_lines_to_dir(
        topic.dir, ["b", "a"], fname=f"{transport.STAGING}/q1-e3/p0"
    )
    topic.commit_epoch("q1-e3")
    assert topic.read_all() == ["b", "a"]  # replay's rows, exactly once


def test_empty_epoch_commits_a_skip_marker(tmp_path):
    from bigtwine_streamprocessor_spark.streaming import transport

    topic = transport.FileTopic(str(tmp_path), "t")
    topic.begin_epoch("q2-e0")
    topic.commit_epoch("q2-e0")  # no partition published anything
    assert topic.epoch_committed("q2-e0")
    assert topic.read_all() == []


def test_unnamed_publish_stays_at_least_once(tmp_path):
    """Without a name the legacy uuid path appends every call (the shape
    service simulators rely on)."""
    from bigtwine_streamprocessor_spark.streaming import transport

    topic = transport.FileTopic(str(tmp_path), "t")
    topic.append_lines(["x"])
    topic.append_lines(["x"])
    assert topic.read_all() == ["x", "x"]


def test_distinct_epochs_and_partitions_do_not_collide(tmp_path):
    from bigtwine_streamprocessor_spark.streaming import transport

    topic = transport.FileTopic(str(tmp_path), "t")
    st = transport.STAGING
    transport.append_lines_to_dir(topic.dir, ["e0"], fname=f"{st}/q3-e0/p0")
    transport.append_lines_to_dir(topic.dir, ["e1"], fname=f"{st}/q3-e1/p0")
    transport.append_lines_to_dir(topic.dir, ["p1"], fname=f"{st}/q3-e1/p1")
    topic.commit_epoch("q3-e0")
    topic.commit_epoch("q3-e1")
    assert sorted(topic.read_all()) == ["e0", "e1", "p1"]


def test_envelope_writer_replay_single_shot(tmp_path):
    """Envelopes mint a fresh requestId per attempt, so name-level dedup is
    what keeps a replayed request batch single-shot."""
    import json as _json

    from bigtwine_streamprocessor_spark.streaming import transport

    topic = transport.FileTopic(str(tmp_path), "reqs")
    writer = topic.envelope_writer("reply.topic", fname_prefix="q2-e3")
    rows = [{"item": _json.dumps({"tag": "t1", "text": "hi"})}]
    writer(iter(rows))
    writer(iter(rows))  # task retry: new requestId inside, same staged name
    topic.commit_epoch("q2-e3")
    lines = topic.read_all()
    assert len(lines) == 1
    env = _json.loads(lines[0])
    assert env["outputTopic"] == "reply.topic"


@pytest.mark.slow
def test_topology_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Hard-stop the live topology mid-stream, restart it from the same
    checkpoints/topics, and require the final result set to be EXACTLY the
    batch golden — no lost tweets, no duplicates, no concat-doubled
    entities. This is the integration proof of the three recovery pieces:
    idempotent epoch-replay publish names (writers), durable service
    "consumer offsets" (simulators), and checkpointed fan-in state
    (`test_fanin_state_survives_checkpoint_restart` covers the unit). The
    reference gets the analogous guarantee from Flink checkpoints plus
    broker semantics (`TwitterStreamJob.java:227-229`)."""
    parsed_batch = parse_tweets(
        corpus.tweets_df(spark, sf_dir), skip_retweets=True
    ).orderBy("id").limit(N_TWEETS).cache()
    n = parsed_batch.count()

    # several input files so the stop lands between epochs with work in
    # flight (maxFilesPerTrigger=1 -> one epoch per file)
    indir = tmp_path / "tweets_in"
    indir.mkdir()
    rows = parsed_batch.collect()
    per_file = max(1, n // 6)
    for i in range(0, n, per_file):
        with open(indir / f"batch{i:04d}.json", "w") as f:
            for r in rows[i : i + per_file]:
                f.write(json.dumps(r.asDict()) + "\n")

    def make_stream():
        return (
            spark.readStream.schema(parsed_batch.schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(indir))
        )

    root = str(tmp_path / "topics")

    # ---- first life: run until SOME results exist, then hard-stop --------
    queries, sims, topics = topology.start_topology(
        spark, root, make_stream(), "a-topo", timeout_ms=60_000
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if len(topics["results"].read_all()) >= 1:
                break
            time.sleep(0.5)
        assert topics["results"].read_all(), "no results before the stop"
    finally:
        for q in queries:
            q.stop()
        for s in sims:
            s.stop()
    for s in sims:
        s.join(timeout=10)

    mid = len(topics["results"].read_all())
    assert mid < n, "stop landed after completion; nothing left to recover"

    # ---- second life: same root (checkpoints + topics + svc offsets) -----
    queries, sims, topics = topology.start_topology(
        spark, root, make_stream(), "a-topo", timeout_ms=60_000
    )
    try:
        deadline = time.time() + 150
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

    # exactly-once: n results, one per tweet, none partial
    assert len(results) == n, f"expected {n} results, got {len(results)}"
    parsed_results = [json.loads(r) for r in results]
    tags = [r["payload"]["status"]["id"] for r in parsed_results]
    assert len(set(tags)) == n, "duplicate result for some tweet"
    assert not any(r["is_partial"] for r in parsed_results)

    # content equality with the in-process batch pipeline (duplicate
    # fragments would concat-double entities and fail here)
    want_df = fragments.finalize_results(
        fanin.fanin_batch(fragments.build_fragments(parsed_batch))
    )
    want = {
        r["tag"]: json.loads(r["value"])
        for r in want_df.select(
            F.col("tag"), F.to_json(F.struct(F.col("payload"))).alias("value")
        ).collect()
    }
    got = {r["payload"]["status"]["id"]: r for r in parsed_results}
    assert set(got) == set(want)
    for tag in want:
        g = json.dumps(got[tag]["payload"], sort_keys=True)
        w = json.dumps(want[tag]["payload"], sort_keys=True)
        assert g == w, f"payload mismatch for tweet {tag}:\n  async={g}\n  batch={w}"


def test_topic_counter_matches_read_all(tmp_path):
    """Incremental polling counter must agree with a full re-read at every
    point, including across named and unnamed publishes."""
    from bigtwine_streamprocessor_spark.streaming import transport

    topic = transport.FileTopic(str(tmp_path), "t")
    counter = transport.TopicCounter(topic)
    assert counter.count() == 0
    topic.append_lines(["a", "b"])
    assert counter.count() == len(topic.read_all()) == 2
    st = transport.STAGING
    transport.append_lines_to_dir(topic.dir, ["c"], fname=f"{st}/q1-e0/p0")
    assert counter.count() == 2  # staged files are invisible to pollers too
    transport.append_lines_to_dir(
        topic.dir, ["dup"], fname=f"{st}/q1-e0/p0"
    )  # skipped
    topic.commit_epoch("q1-e0")
    assert counter.count() == len(topic.read_all()) == 3
    topic.append_lines(["d", "e", "f"])
    assert counter.count() == len(topic.read_all()) == 6
    assert counter.count() == 6  # idempotent poll
