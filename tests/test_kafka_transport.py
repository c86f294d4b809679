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


def test_spool_producer_concurrent_send_flush_exactly_once(tmp_path):
    """r14 flush-race fix pin (advisor r14): many threads hammering
    send()+flush() on the SHARED producer — the pre-fix iterate/write/clear
    flush double-delivered byte-identical batches — must land every record
    exactly once in the spool."""
    import threading

    spool = str(tmp_path / "spool")
    prod = kt.SpoolProducer(spool)
    n_threads, n_per = 8, 50
    barrier = threading.Barrier(n_threads)

    def worker(tid):
        barrier.wait()
        for i in range(n_per):
            prod.send("reqs", f"t{tid}-r{i}".encode())
            if i % 5 == tid % 5:
                prod.flush()  # interleaved flushes race on the shared buffer
        prod.flush()

    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    prod.flush()
    got = _spool_lines(spool, "reqs")
    want = [f"t{t}-r{i}" for t in range(n_threads) for i in range(n_per)]
    assert sorted(got) == sorted(want), (
        f"{len(got)} delivered vs {len(want)} sent "
        f"(dups={len(got) - len(set(got))})"
    )
    assert not prod._pending and not prod._buf


def test_spool_producer_interrupted_delivery_retries_without_loss_or_dup(
    tmp_path, monkeypatch
):
    """A crash BETWEEN a batch's topic writes (first topic on disk, second
    not) must leave the batch pending; the retry flush re-delivers onto the
    same per-(producer, seq) names so the already-landed topic dedups and
    the missing one lands — exactly-once content per batch."""
    from bigtwine_streamprocessor_spark.streaming import transport

    spool = str(tmp_path / "spool")
    prod = kt.SpoolProducer(spool)
    prod.send("topic-a", b"a1")
    prod.send("topic-b", b"b1")

    real_append = transport.append_lines_to_dir
    calls = {"n": 0}

    def crash_on_second(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash between topic writes")
        return real_append(*args, **kwargs)

    monkeypatch.setattr(transport, "append_lines_to_dir", crash_on_second)
    with pytest.raises(OSError):
        prod.flush()
    assert len(prod._pending) == 1, "interrupted batch must stay pending"
    monkeypatch.setattr(transport, "append_lines_to_dir", real_append)

    prod.flush()  # retry: topic-a dedups on its name, topic-b lands
    assert _spool_lines(spool, "topic-a") == ["a1"]
    assert _spool_lines(spool, "topic-b") == ["b1"]
    assert not prod._pending


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


def _staged_topic(tmp_path, name="t"):
    spool = str(tmp_path / "spool")
    topic = kt.KafkaTopic(
        "fake:9092",
        name,
        producer_factory=kt.SpoolProducerFactory(spool),
        stage_root=str(tmp_path / "stage"),
    )
    return topic, spool


class _Rows:
    """Minimal foreachPartition-shaped iterable of {'value': ...} rows."""

    def __init__(self, values):
        self.values = values

    def __iter__(self):
        return iter({"value": v} for v in self.values)


def test_staged_epoch_through_foreachpartition(spark, tmp_path):
    """The staged writer is executor-side (separate Python worker
    processes in local mode): partitions stage via the shared filesystem,
    the driver's commit_epoch drains them — nothing reaches the producer
    until then, across process boundaries."""
    kt._PRODUCER_CACHE.clear()
    topic, spool = _staged_topic(tmp_path, name="results")
    df = spark.range(40).repartition(4).selectExpr("concat('v-', id) AS value")
    topic.begin_epoch("q1-e0")
    df.foreachPartition(topic.line_writer(fname_prefix="q1-e0"))
    assert _spool_lines(spool, "results") == []
    topic.commit_epoch("q1-e0")
    assert sorted(_spool_lines(spool, "results")) == sorted(
        f"v-{i}" for i in range(40)
    )
    # replayed epoch (repartitioned): epoch_committed short-circuits
    assert topic.epoch_committed("q1-e0") is True
    topic.commit_epoch("q1-e0")
    assert len(_spool_lines(spool, "results")) == 40


def test_staged_epoch_invisible_until_commit(tmp_path):
    """Staged writes produce NOTHING; commit_epoch is the only produce
    (transactional-producer shape, r9 verdict task 4)."""
    kt._PRODUCER_CACHE.clear()
    topic, spool = _staged_topic(tmp_path)
    assert topic.exactly_once_replay is True
    topic.begin_epoch("q1-e0")
    topic.line_writer(fname_prefix="q1-e0")(_Rows(["a", "b"]))
    assert _spool_lines(spool, "t") == [], "staged lines leaked to the broker"
    assert topic.epoch_committed("q1-e0") is False
    topic.commit_epoch("q1-e0")
    assert topic.epoch_committed("q1-e0") is True
    assert sorted(_spool_lines(spool, "t")) == ["a", "b"]


def test_committed_epoch_replay_produces_zero_duplicates(tmp_path):
    """A replayed committed epoch — even one whose rerun repartitions the
    batch — publishes nothing: epoch_committed short-circuits the topology's
    _epoch_publish, and a manual re-commit is a no-op."""
    kt._PRODUCER_CACHE.clear()
    topic, spool = _staged_topic(tmp_path)
    topic.begin_epoch("q1-e7")
    topic.line_writer(fname_prefix="q1-e7")(_Rows(["x", "y", "z"]))
    topic.commit_epoch("q1-e7")
    assert sorted(_spool_lines(spool, "t")) == ["x", "y", "z"]
    # replay: the topology checks epoch_committed first and skips wholesale
    assert topic.epoch_committed("q1-e7") is True
    # even a defensive direct re-commit must not re-produce
    topic.commit_epoch("q1-e7")
    assert sorted(_spool_lines(spool, "t")) == ["x", "y", "z"]


def test_repartitioned_replay_of_uncommitted_epoch_restages(tmp_path):
    """A crash BEFORE commit leaves only invisible staging; the rerun's
    begin_epoch discards it wholesale, so a replay that packs the batch into
    DIFFERENT partitions produces exactly the rerun's content once (the
    repartitioned-replay hole per-name dedup could not close)."""
    kt._PRODUCER_CACHE.clear()
    topic, spool = _staged_topic(tmp_path)
    # first attempt: two partitions' worth staged, then crash (no commit)
    topic.begin_epoch("q2-e3")
    kt.dir_line_writer(topic._topic_stage(), "q2-e3")(_Rows(["a", "b"]))
    assert _spool_lines(spool, "t") == []
    # rerun repartitions: one partition, overlapping-but-different content
    topic.begin_epoch("q2-e3")
    topic.line_writer(fname_prefix="q2-e3")(_Rows(["a", "b", "c"]))
    topic.commit_epoch("q2-e3")
    assert sorted(_spool_lines(spool, "t")) == ["a", "b", "c"]


def test_staged_envelope_writer_and_empty_epoch_marker(tmp_path):
    """Envelope staging rides the same discipline; an epoch that staged
    nothing still commits an empty marker so its replay is skipped."""
    kt._PRODUCER_CACHE.clear()
    topic, spool = _staged_topic(tmp_path, name="geo-req")
    topic.begin_epoch("q3-e0")
    rows = [{"item": json.dumps({"tag": str(i)})} for i in range(5)]
    topic.envelope_writer("geo-resp.a1", chunk=3, fname_prefix="q3-e0")(
        iter(rows)
    )
    assert _spool_lines(spool, "geo-req") == []
    topic.commit_epoch("q3-e0")
    envs = [json.loads(ln) for ln in _spool_lines(spool, "geo-req")]
    assert len(envs) == 2  # 3 + 2
    assert sorted(it["tag"] for e in envs for it in e["items"]) == [
        str(i) for i in range(5)
    ]
    # empty epoch: nothing staged, commit still lands the marker
    topic.begin_epoch("q3-e1")
    topic.commit_epoch("q3-e1")
    assert topic.epoch_committed("q3-e1") is True
    assert len(_spool_lines(spool, "geo-req")) == 2


def test_staged_ops_require_stage_root(tmp_path):
    """No implicit stage_root (advisor r10, high): a stable /tmp default
    keyed by bootstrap let a fresh-checkpoint run (epoch ids restarting at
    q1-e0) meet a previous run's markers and silently publish nothing.
    Staged-epoch operations must fail loudly until a root is bound;
    fire-and-forget paths never need one."""
    spool = str(tmp_path / "spool")
    kt._PRODUCER_CACHE.clear()
    topic = kt.KafkaTopic("b:9092", "t", kt.SpoolProducerFactory(spool))
    with pytest.raises(RuntimeError, match="stage_root"):
        topic.epoch_committed("q1-e0")
    with pytest.raises(RuntimeError, match="stage_root"):
        topic.line_writer(fname_prefix="q1-e0")
    # fire-and-forget still works without any stage state
    topic.append_lines(["ok"])
    assert _spool_lines(spool, "t") == ["ok"]


def test_bind_stage_root_adopts_and_respects_explicit(tmp_path):
    explicit = kt.KafkaTopic(
        "b:9092", "t", kt.SpoolProducerFactory(str(tmp_path / "s")),
        stage_root=str(tmp_path / "mine"),
    )
    explicit.bind_stage_root(str(tmp_path / "theirs"))
    assert explicit.stage_root == str(tmp_path / "mine")
    unset = kt.KafkaTopic(
        "b:9092", "t", kt.SpoolProducerFactory(str(tmp_path / "s"))
    )
    unset.bind_stage_root(str(tmp_path / "theirs"))
    assert unset.stage_root == str(tmp_path / "theirs")


def test_fresh_checkpoint_purges_stale_markers(tmp_path):
    """A dead run's commit markers must not survive into a run whose epoch
    numbering restarts — epoch_committed on a stale marker publishes
    NOTHING for the new epoch (silent loss)."""
    kt._PRODUCER_CACHE.clear()
    topic, spool = _staged_topic(tmp_path, name="results")
    # previous run committed q1-e0
    topic.begin_epoch("q1-e0")
    topic.line_writer(fname_prefix="q1-e0")(_Rows(["old"]))
    topic.commit_epoch("q1-e0")
    assert topic.epoch_committed("q1-e0") is True
    # new run, fresh checkpoint: same stage_root, epoch ids restart
    topic.bind_stage_root(topic.stage_root, fresh_checkpoint=True)
    assert topic.epoch_committed("q1-e0") is False
    topic.begin_epoch("q1-e0")
    topic.line_writer(fname_prefix="q1-e0")(_Rows(["new"]))
    topic.commit_epoch("q1-e0")
    assert "new" in _spool_lines(spool, "results")


def test_bind_stage_roots_namespaces_under_topology_root(tmp_path):
    """start_topology's binding: unset stage roots land under
    <root>/_kafka_stage; an existing checkpoint dir means resume (no
    purge), a missing one means fresh (purge)."""
    from bigtwine_streamprocessor_spark.streaming import topology

    spool = str(tmp_path / "spool")
    root = str(tmp_path / "run")
    topics = kt.make_kafka_topics(
        "b:9092", ["a", "b"], kt.SpoolProducerFactory(spool)
    )
    topology.bind_stage_roots(topics, root)
    for t in topics.values():
        assert t.stage_root == os.path.join(root, "_kafka_stage")
    # resume case: _chk exists -> a committed marker SURVIVES rebinding
    kt._PRODUCER_CACHE.clear()
    topics["a"].begin_epoch("q1-e0")
    topics["a"].commit_epoch("q1-e0")
    os.makedirs(os.path.join(root, "_chk"))
    topology.bind_stage_roots(topics, root)
    assert topics["a"].epoch_committed("q1-e0") is True


def test_epoch_publish_cross_checks_driver_visibility(spark, tmp_path):
    """_epoch_publish compares executor-counted non-empty partitions with
    the staged files the driver sees (advisor r10, medium): a stage dir on
    storage the driver can't read must fail loudly, not commit an empty
    marker that drops the epoch forever."""
    from bigtwine_streamprocessor_spark.streaming import topology

    kt._PRODUCER_CACHE.clear()
    topic, spool = _staged_topic(tmp_path, name="results")
    df = spark.range(20).repartition(4).selectExpr("concat('v-', id) AS value")
    # healthy path: counts agree, epoch commits, lines produced once
    topology._epoch_publish(
        topic, "q9-e0", df, topic.line_writer(fname_prefix="q9-e0")
    )
    assert sorted(_spool_lines(spool, "results")) == sorted(
        f"v-{i}" for i in range(20)
    )

    class BlindTopic(kt.KafkaTopic):
        """Simulates a driver that cannot see executor-staged files."""

        def staged_partition_count(self, prefix):
            return 0

    blind = BlindTopic(
        "fake:9092",
        "results2",
        producer_factory=kt.SpoolProducerFactory(spool),
        stage_root=str(tmp_path / "stage"),
    )
    with pytest.raises(RuntimeError, match="shared storage"):
        topology._epoch_publish(
            blind, "q9-e1", df, blind.line_writer(fname_prefix="q9-e1")
        )
    assert blind.epoch_committed("q9-e1") is False, "must not mark committed"
    assert _spool_lines(spool, "results2") == []


def test_fresh_checkpoint_over_published_file_epochs_refused(tmp_path):
    """FileTopic twin of the stale-marker hazard: committed epoch dirs ARE
    the published data, so they can't be purged — a fresh-checkpoint run
    over them must be refused loudly, not silently skip its epochs."""
    from bigtwine_streamprocessor_spark.streaming import topology
    from bigtwine_streamprocessor_spark.streaming.transport import FileTopic

    root = str(tmp_path / "run")
    t = FileTopic(root, "results")
    t.begin_epoch("q1-e0")
    t.line_writer(fname_prefix="q1-e0")(_Rows(["old"]))
    t.commit_epoch("q1-e0")
    # dead run's data present, no checkpoints -> refuse
    with pytest.raises(RuntimeError, match="fresh run"):
        topology.bind_stage_roots({"results": t}, root)
    # with the checkpoint dir present this is a RESUME: allowed
    os.makedirs(os.path.join(root, "_chk"))
    topology.bind_stage_roots({"results": t}, root)


@pytest.mark.slow
def test_full_topology_over_kafka_producer_path(spark, sf_dir, tmp_path):
    """The broker-less Kafka e2e: the FULL async topology (6 queries + 4
    service simulators) runs with every epoch publish going through the
    KafkaTopic producer path — staged epochs, marker-gated commit_epoch as
    the only produce, process-cached producers — with a SpoolProducer as
    the broker stand-in landing flushes in FileTopic layout for the read
    side. Results must equal the in-process batch golden exactly. This is
    the config-switch parity check the broker-gated test can't run here."""
    import time

    from bigtwine_streamprocessor_spark import corpus, fragments
    from bigtwine_streamprocessor_spark.operators.parse import parse_tweets
    from bigtwine_streamprocessor_spark.streaming import fanin, topology

    import pyspark.sql.functions as F

    kt._PRODUCER_CACHE.clear()
    parsed_batch = (
        parse_tweets(corpus.tweets_df(spark, sf_dir), skip_retweets=True)
        .orderBy("id")
        .limit(25)
        .cache()
    )
    n = parsed_batch.count()
    indir = tmp_path / "tweets_in"
    indir.mkdir()
    with open(indir / "batch0.json", "w") as f:
        for r in parsed_batch.collect():
            f.write(json.dumps(r.asDict()) + "\n")
    stream = (
        spark.readStream.schema(parsed_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    root = str(tmp_path / "run")
    topics = {
        name: kt.SpoolBackedKafkaTopic(os.path.join(root, "spool"), name)
        for name in topology.TOPIC_NAMES
    }
    queries, sims, topics = topology.start_topology(
        spark, root, stream, "a-kspool", timeout_ms=20_000, topics=topics
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
    # stage roots were bound under the topology root (not /tmp ambient)
    assert topics["results"].stage_root == os.path.join(root, "_kafka_stage")
    assert len(results) == n
    got = {
        json.loads(r)["payload"]["status"]["id"]: json.loads(r)
        for r in results
    }
    assert not any(v["is_partial"] for v in got.values())
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
        assert json.dumps(got[tag]["payload"], sort_keys=True) == json.dumps(
            want[tag]["payload"], sort_keys=True
        ), f"payload mismatch for {tag}"


@pytest.mark.slow
def test_topology_restart_over_kafka_path_is_exactly_once(
    spark, sf_dir, tmp_path
):
    """Hard-stop the topology mid-stream and restart it — with every epoch
    publish going through the KafkaTopic staged-epoch path. The second
    life's replayed epochs must find their commit MARKERS (fresh topic
    objects, same stage root bound from the same topology root) and
    publish nothing, while unfinished epochs restage and commit once: the
    advisor-r10 stale-marker scenario exercised through a REAL streaming
    restart rather than unit fakes. Final results must equal the batch
    golden exactly."""
    import time

    from bigtwine_streamprocessor_spark import corpus, fragments
    from bigtwine_streamprocessor_spark.operators.parse import parse_tweets
    from bigtwine_streamprocessor_spark.streaming import fanin, topology

    import pyspark.sql.functions as F

    kt._PRODUCER_CACHE.clear()
    parsed_batch = (
        parse_tweets(corpus.tweets_df(spark, sf_dir), skip_retweets=True)
        .orderBy("id")
        .limit(30)
        .cache()
    )
    n = parsed_batch.count()
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

    root = str(tmp_path / "run")
    spool = os.path.join(root, "spool")

    def make_topics():
        # fresh topic OBJECTS each life — only the on-disk state (spool,
        # stage markers, checkpoints, svc offsets) carries over, exactly
        # like a restarted driver process
        return {
            name: kt.SpoolBackedKafkaTopic(spool, name)
            for name in topology.TOPIC_NAMES
        }

    # ---- first life: run until SOME results exist, then hard-stop --------
    queries, sims, topics = topology.start_topology(
        spark, root, make_stream(), "a-krs", timeout_ms=60_000,
        topics=make_topics(),
    )
    try:
        # generous deadlines: passing runs break out as soon as results
        # land; the budget only matters when the host is contended (the
        # two r12 in-suite flakes both coincided with a concurrent 15 GB
        # replica build), and a load-induced timeout must not read as an
        # exactly-once failure
        deadline = time.time() + 180
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

    # ---- second life: same root; markers must gate the replay -----------
    queries, sims, topics = topology.start_topology(
        spark, root, make_stream(), "a-krs", timeout_ms=60_000,
        topics=make_topics(),
    )
    try:
        deadline = time.time() + 300
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

    assert len(results) == n, f"expected {n} results, got {len(results)}"
    parsed_results = [json.loads(r) for r in results]
    tags = [r["payload"]["status"]["id"] for r in parsed_results]
    assert len(set(tags)) == n, "duplicate result for some tweet"
    assert not any(r["is_partial"] for r in parsed_results)
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
        assert json.dumps(got[tag]["payload"], sort_keys=True) == json.dumps(
            want[tag]["payload"], sort_keys=True
        ), f"payload mismatch for tweet {tag}"


def test_crash_inside_commit_window_replays_one_epoch(tmp_path, monkeypatch):
    """The documented irreducible window (commit_epoch docstring): a crash
    BETWEEN the producer flush and the marker rename re-produces exactly
    that one epoch on replay — at-least-once for the single epoch, never
    lost. (A real broker closes the window with a transaction wrapping the
    drain; downstream, duplicate status fragments are absorbed by the
    fan-in's last-write-wins and entity fragments concat — the reference's
    own duplicate semantics.)"""
    kt._PRODUCER_CACHE.clear()
    topic, spool = _staged_topic(tmp_path, name="results")
    topic.begin_epoch("q1-e5")
    topic.line_writer(fname_prefix="q1-e5")(_Rows(["a", "b"]))

    real_replace = os.replace
    boom = {"armed": True}

    def crashing_replace(src, dst):
        if boom["armed"] and "_committed" in dst:
            boom["armed"] = False
            raise OSError("simulated crash between flush and marker rename")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crashing_replace)
    with pytest.raises(OSError, match="simulated crash"):
        topic.commit_epoch("q1-e5")
    # the produce happened, the marker did not: epoch reads uncommitted
    assert sorted(_spool_lines(spool, "results")) == ["a", "b"]
    assert topic.epoch_committed("q1-e5") is False

    # replay: begin discards stale staging, the rerun restages and commits;
    # the window's cost is exactly one duplicated epoch, nothing lost
    topic.begin_epoch("q1-e5")
    topic.line_writer(fname_prefix="q1-e5")(_Rows(["a", "b"]))
    topic.commit_epoch("q1-e5")
    assert topic.epoch_committed("q1-e5") is True
    assert sorted(_spool_lines(spool, "results")) == ["a", "a", "b", "b"]
    # and a further replay is now a clean no-op
    topic.commit_epoch("q1-e5")
    assert sorted(_spool_lines(spool, "results")) == ["a", "a", "b", "b"]


def test_shared_explicit_stage_root_not_purged_on_fresh_checkpoint(tmp_path):
    """advisor r11: an EXPLICIT stage_root may be shared across topologies
    (stage state is namespaced per topic name only). Topology B's fresh
    start must not rmtree topology A's in-flight staged epochs — with
    surviving commit markers under a shared root, rebinding to a DIFFERENT
    topology root refuses loudly instead of purging or silently keeping."""
    kt._PRODUCER_CACHE.clear()
    shared = str(tmp_path / "shared_stage")
    # topology A: explicit shared root, commits an epoch + leaves staging
    a = kt.KafkaTopic(
        "fake:9092", "results",
        producer_factory=kt.SpoolProducerFactory(str(tmp_path / "spool")),
        stage_root=shared,
    )
    a.begin_epoch("q1-e0")
    a.line_writer(fname_prefix="q1-e0")(_Rows(["a0"]))
    a.commit_epoch("q1-e0")
    a.line_writer(fname_prefix="q1-e1")(_Rows(["a1-inflight"]))
    # topology B: same explicit root + topic name, fresh checkpoint
    b = kt.KafkaTopic(
        "fake:9092", "results",
        producer_factory=kt.SpoolProducerFactory(str(tmp_path / "spool")),
        stage_root=shared,
    )
    with pytest.raises(RuntimeError, match="unique to this topology"):
        b.bind_stage_root(
            str(tmp_path / "rootB" / "_kafka_stage"), fresh_checkpoint=True
        )
    # A's state untouched by the refusal
    assert a.epoch_committed("q1-e0") is True
    assert a.staged_partition_count("q1-e1") == 1
    # a clean shared root (no markers) binds fine — nothing to mistake
    c = kt.KafkaTopic(
        "fake:9092", "other",
        producer_factory=kt.SpoolProducerFactory(str(tmp_path / "spool")),
        stage_root=shared,
    )
    c.bind_stage_root(
        str(tmp_path / "rootC" / "_kafka_stage"), fresh_checkpoint=True
    )
    assert c.stage_root == shared


# ---------------------------------------------------------------------------
# Transactional commit path (r11 verdict task 1): fake broker with Kafka's
# transaction + zombie-fencing semantics, driven through the REAL
# KafkaTopic.commit_epoch.
# ---------------------------------------------------------------------------


class _TxnBroker:
    """In-memory broker exposing exactly the transactional semantics the
    commit path relies on: records sent inside a transaction are invisible
    until commit_transaction; init_transactions bumps the producer epoch
    for a transactional.id, fencing every older instance and discarding
    any in-flight (uncommitted) transaction they left."""

    def __init__(self):
        self.committed: dict[str, list[bytes]] = {}
        self.producer_epochs: dict[str, int] = {}

    def lines(self, topic):
        return sorted(v.decode() for v in self.committed.get(topic, []))


class _FakeTxnProducer:
    def __init__(self, broker, txn_id):
        self.broker, self.txn_id = broker, txn_id
        self.epoch = None
        self.buf: list[tuple[str, bytes]] = []
        self.closed = False

    def init_transactions(self):
        self.epoch = self.broker.producer_epochs.get(self.txn_id, 0) + 1
        self.broker.producer_epochs[self.txn_id] = self.epoch

    def _check_fenced(self):
        if self.broker.producer_epochs.get(self.txn_id) != self.epoch:
            raise kt.ProducerFenced(self.txn_id)

    def begin_transaction(self):
        self._check_fenced()
        self.buf = []

    def send(self, topic, value):
        self._check_fenced()
        self.buf.append((topic, value))

    def commit_transaction(self):
        self._check_fenced()
        for t, v in self.buf:
            self.broker.committed.setdefault(t, []).append(v)
        self.buf = []

    def abort_transaction(self):
        self.buf = []

    def close(self):
        self.closed = True


class _FakeTxnFactory:
    def __init__(self, broker):
        self.broker = broker

    def __call__(self, bootstrap, txn_id):
        return _FakeTxnProducer(self.broker, txn_id)

    def committed_markers(self, bootstrap, marker_topic):
        return [v.decode() for v in self.broker.committed.get(marker_topic, [])]


def _txn_topic(tmp_path, broker, name="results"):
    return kt.KafkaTopic(
        "fake:9092",
        name,
        producer_factory=kt.SpoolProducerFactory(str(tmp_path / "spool")),
        stage_root=str(tmp_path / "stage"),
        transactional_factory=_FakeTxnFactory(broker),
    )


def test_txn_commit_lands_records_and_marker_atomically(tmp_path):
    broker = _TxnBroker()
    topic = _txn_topic(tmp_path, broker)
    topic.begin_epoch("q1-e0")
    topic.line_writer(fname_prefix="q1-e0")(_Rows(["a", "b"]))
    topic.commit_epoch("q1-e0")
    assert broker.lines("results") == ["a", "b"]
    marker = json.loads(broker.committed["results.epoch-markers"][0])
    assert marker == {"epoch": "q1-e0", "lines": 2}
    assert topic.epoch_committed("q1-e0") is True
    # replay is a clean no-op (marker-file cache hit)
    topic.commit_epoch("q1-e0")
    assert broker.lines("results") == ["a", "b"]


def test_txn_crash_before_commit_replays_without_duplicate(tmp_path):
    """(a) A crash between send and commit_transaction leaves the
    transaction uncommitted — its records invisible — so the replay
    re-produces with NO duplicate. This is the window the
    non-transactional path pays with one duplicated epoch."""
    broker = _TxnBroker()
    topic = _txn_topic(tmp_path, broker)
    topic.begin_epoch("q1-e5")
    topic.line_writer(fname_prefix="q1-e5")(_Rows(["a", "b"]))

    crashing = _FakeTxnFactory(broker)
    real_call = _FakeTxnFactory.__call__

    class _CrashingFactory(_FakeTxnFactory):
        def __call__(self, bootstrap, txn_id):
            p = real_call(self, bootstrap, txn_id)
            def boom():
                raise OSError("simulated crash inside commit_transaction")
            p.commit_transaction = boom
            return p

    topic._txn_factory = _CrashingFactory(broker)
    with pytest.raises(OSError, match="simulated crash"):
        topic.commit_epoch("q1-e5")
    # nothing visible: no data records, no marker record, no marker file
    assert broker.lines("results") == []
    assert "results.epoch-markers" not in broker.committed
    assert topic.epoch_committed("q1-e5") is False

    # replay: restage + commit through a healthy producer — exactly once
    topic._txn_factory = crashing  # healthy factory, same broker
    topic.begin_epoch("q1-e5")
    topic.line_writer(fname_prefix="q1-e5")(_Rows(["a", "b"]))
    topic.commit_epoch("q1-e5")
    assert broker.lines("results") == ["a", "b"]
    assert len(broker.committed["results.epoch-markers"]) == 1


def test_txn_fenced_replay_is_noop(tmp_path):
    """(b) Two replays race the same epoch: the one whose producer gets
    fenced must treat its commit as a no-op (no raise, no duplicate) —
    the winner's transaction is the only one visible."""
    broker = _TxnBroker()
    topic = _txn_topic(tmp_path, broker)
    topic.begin_epoch("q1-e0")
    topic.line_writer(fname_prefix="q1-e0")(_Rows(["x"]))

    winner = kt.KafkaTopic(
        "fake:9092", "results",
        producer_factory=kt.SpoolProducerFactory(str(tmp_path / "spool")),
        stage_root=topic.stage_root,
        transactional_factory=_FakeTxnFactory(broker),
    )

    class _InterleavedFactory(_FakeTxnFactory):
        """After the loser stages its sends, the winner replays the whole
        epoch (init_transactions bumps the producer epoch -> loser fenced)."""

        def __call__(self, bootstrap, txn_id):
            p = _FakeTxnProducer(self.broker, txn_id)
            orig_commit = p.commit_transaction

            def commit_with_race():
                winner.commit_epoch("q1-e0")  # fences p before its commit
                orig_commit()

            p.commit_transaction = commit_with_race
            return p

    topic._txn_factory = _InterleavedFactory(broker)
    topic.commit_epoch("q1-e0")  # must NOT raise
    assert broker.lines("results") == ["x"]  # exactly one copy
    assert len(broker.committed["results.epoch-markers"]) == 1
    assert topic.epoch_committed("q1-e0") is True  # winner's marker visible


def test_txn_marker_reader_closes_cache_write_window(tmp_path, monkeypatch):
    """Crash AFTER commit_transaction but BEFORE the marker-file cache
    lands: epoch_committed consults the read-committed marker stream and
    the replay is a no-op — no duplicate even in the last window."""
    broker = _TxnBroker()
    topic = _txn_topic(tmp_path, broker)
    topic.begin_epoch("q1-e0")
    topic.line_writer(fname_prefix="q1-e0")(_Rows(["a"]))

    real_replace = os.replace

    def crashing_replace(src, dst):
        if "_committed" in dst:
            raise OSError("simulated crash before marker cache write")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crashing_replace)
    with pytest.raises(OSError, match="marker cache"):
        topic.commit_epoch("q1-e0")
    monkeypatch.undo()
    # the transaction committed; the local cache did not land
    assert broker.lines("results") == ["a"]
    assert not os.path.exists(topic._marker("q1-e0"))
    # replay consults the marker stream, re-caches, produces nothing
    assert topic.epoch_committed("q1-e0") is True
    assert os.path.exists(topic._marker("q1-e0"))
    topic.begin_epoch("q1-e0")
    topic.line_writer(fname_prefix="q1-e0")(_Rows(["a"]))
    topic.commit_epoch("q1-e0")
    assert broker.lines("results") == ["a"]


@pytest.mark.slow
def test_full_topology_over_transactional_commits(spark, sf_dir, tmp_path):
    """The r12 transactional commit path, end to end: the FULL async
    topology runs with every epoch publish committed through a
    transactional producer (SpoolTxnFactory — atomic drain+marker flush,
    marker-stream recovery reader), and the results equal the in-process
    batch golden exactly. This promotes the manual r12 verification drive
    into a standing regression: a deployment that flips
    transactional_factory on gets the identical dataflow."""
    import time

    from bigtwine_streamprocessor_spark import corpus, fragments
    from bigtwine_streamprocessor_spark.operators.parse import parse_tweets
    from bigtwine_streamprocessor_spark.streaming import fanin, topology

    import pyspark.sql.functions as F

    kt._PRODUCER_CACHE.clear()
    parsed_batch = (
        parse_tweets(corpus.tweets_df(spark, sf_dir), skip_retweets=True)
        .orderBy("id")
        .limit(25)
        .cache()
    )
    n = parsed_batch.count()
    indir = tmp_path / "tweets_in"
    indir.mkdir()
    with open(indir / "batch0.json", "w") as f:
        for r in parsed_batch.collect():
            f.write(json.dumps(r.asDict()) + "\n")
    stream = (
        spark.readStream.schema(parsed_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    root = str(tmp_path / "run")
    topics = {
        name: kt.SpoolBackedKafkaTopic(
            os.path.join(root, "spool"), name, transactional=True
        )
        for name in topology.TOPIC_NAMES
    }
    assert all(t._txn_factory is not None for t in topics.values())
    queries, sims, topics = topology.start_topology(
        spark, root, stream, "a-txn", timeout_ms=20_000, topics=topics
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
    assert len(results) == n
    got = {
        json.loads(r)["payload"]["status"]["id"]: json.loads(r)
        for r in results
    }
    assert not any(v["is_partial"] for v in got.values())
    # every committed epoch also landed its marker RECORD atomically, and
    # epoch_committed resolves from the marker stream even with the
    # local cache wiped (the crash-before-cache-write recovery path)
    markers = topics["results"]._txn_factory.committed_markers(
        topics["results"].bootstrap, topics["results"].marker_topic()
    )
    assert markers, "transactional commits must land marker records"
    committed = {json.loads(m)["epoch"] for m in markers}
    some_epoch = next(iter(committed))
    import shutil

    shutil.rmtree(
        os.path.join(topics["results"]._topic_stage(), "_committed"),
        ignore_errors=True,
    )
    assert topics["results"].epoch_committed(some_epoch) is True
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
        assert json.dumps(got[tag]["payload"], sort_keys=True) == json.dumps(
            want[tag]["payload"], sort_keys=True
        ), f"payload mismatch for {tag}"


def test_spool_txn_commit_lands_data_before_markers(tmp_path, monkeypatch):
    """The spool txn stand-in's one irreducible window (a crash between
    the two per-topic files of a multi-topic commit) must degrade to
    at-least-once, never silent loss: data topics land BEFORE marker
    topics, so a partial commit reads as uncommitted and replays."""
    from bigtwine_streamprocessor_spark.streaming import transport

    landed = []
    real = transport.append_lines_to_dir

    def spy(d, lines):
        landed.append(os.path.basename(d))
        return real(d, lines)

    monkeypatch.setattr(transport, "append_lines_to_dir", spy)
    p = kt.SpoolTxnProducer(str(tmp_path / "spool"))
    p.init_transactions()
    p.begin_transaction()
    # send the marker FIRST to prove ordering comes from commit, not send
    p.send("results.epoch-markers", b'{"epoch":"q1-e0","lines":1}')
    p.send("results", b"row")
    p.commit_transaction()
    assert landed == ["results", "results.epoch-markers"]


def test_spool_txn_read_committed_never_sees_aborted_records(tmp_path):
    """Read-committed contract of the spool stand-in (r12 verdict task 7):
    a consumer reading the spool via the transactional factory must never
    observe records from an aborted or crashed transaction — on either the
    data topic (file reader) or the marker stream (``committed_markers``).
    The data-file-before-marker ordering makes a violation observable: if
    sends landed eagerly (or markers landed first), the abort/crash below
    would leak records or read as committed."""
    from bigtwine_streamprocessor_spark.streaming.transport import FileTopic

    spool = str(tmp_path / "spool")
    factory = kt.SpoolTxnFactory(spool)
    topic = kt.KafkaTopic(
        f"spool:{spool}",
        "results",
        producer_factory=kt.SpoolProducerFactory(spool),
        stage_root=str(tmp_path / "stage"),
        transactional_factory=factory,
    )
    reader = FileTopic(spool, "results")

    # (1) explicit abort: sends to BOTH topics buffered, then discarded
    p = factory(topic.bootstrap, topic._txn_id("q1-e0"))
    p.init_transactions()
    p.begin_transaction()
    p.send("results", b"aborted-row")
    p.send("results.epoch-markers", b'{"epoch":"q1-e0","lines":1}')
    p.abort_transaction()
    assert reader.read_all() == []
    assert factory.committed_markers(topic.bootstrap, topic.marker_topic()) == []
    assert topic.epoch_committed("q1-e0") is False

    # (2) crash before commit: producer dropped mid-transaction
    p = factory(topic.bootstrap, topic._txn_id("q1-e0"))
    p.init_transactions()
    p.begin_transaction()
    p.send("results", b"crashed-row")
    del p  # simulated process death — nothing was ever flushed to disk
    assert reader.read_all() == []
    assert topic.epoch_committed("q1-e0") is False

    # (3) commit_epoch whose commit_transaction raises (non-fenced broker
    # error): the abort path must leave the spool clean, and the healthy
    # replay of the SAME epoch then lands exactly one copy of each record
    topic.begin_epoch("q1-e0")
    topic.line_writer(fname_prefix="q1-e0")(_Rows(["a", "b"]))

    class _FailingCommitProducer(kt.SpoolTxnProducer):
        def commit_transaction(self):
            raise RuntimeError("broker went away mid-commit")

    class _FailingFactory(kt.SpoolTxnFactory):
        def __call__(self, bootstrap, txn_id):
            return _FailingCommitProducer(self.spool)

    topic._txn_factory = _FailingFactory(spool)
    with pytest.raises(RuntimeError, match="mid-commit"):
        topic.commit_epoch("q1-e0")
    assert reader.read_all() == []  # aborted txn invisible to consumers
    assert topic.epoch_committed("q1-e0") is False

    topic._txn_factory = factory  # healthy replay, same epoch
    topic.commit_epoch("q1-e0")
    assert sorted(reader.read_all()) == ["a", "b"]
    assert topic.epoch_committed("q1-e0") is True
