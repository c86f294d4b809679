"""Kafka twin of the FileTopic transport — deployment is a config switch.

The topology touches topics through exactly four methods (``append_lines``,
``line_writer``, ``envelope_writer``, ``read_stream``); this module provides
the Kafka implementation of that contract, mirroring the reference's producer
/consumer wiring (`TwitterStreamJob.java:227-246`, topics `Constants.java:
15-25`). Executor-side writes go through ``foreachPartition`` closures that
hold only (bootstrap, topic, factory) — picklable — and reuse one producer
per executor process via a process-local cache (creating a producer per
partition per micro-batch is the classic throughput killer).

No broker ships in this sandbox, so:

* unit tests inject a fake producer factory (the closures and caching are
  fully exercised);
* ``read_stream`` builds the standard ``format("kafka")`` source
  (construct-only here — needs the spark-sql-kafka package + a broker);
* the end-to-end topology test skips unless ``KAFKA_BOOTSTRAP`` is set.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .transport import chunked, make_envelope


def default_producer_factory(bootstrap: str):
    """kafka-python producer; import-gated (no client lib in this image)."""
    try:
        from kafka import KafkaProducer  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - no client lib in sandbox
        raise ImportError(
            "no Kafka client library available; install kafka-python or pass "
            "a producer_factory"
        ) from e
    return KafkaProducer(bootstrap_servers=bootstrap, acks="all")


# One producer per (factory identity, bootstrap) per PROCESS — executor
# Python workers are long-lived, so foreachPartition reuses instead of
# reconnecting. Bounded: a key-churn bug must never accumulate connections.
_PRODUCER_CACHE: dict = {}
_PRODUCER_CACHE_MAX = 32


def _factory_identity(factory) -> tuple:
    """Stable across task deserializations (each foreachPartition task unpickles
    a FRESH factory object, so id()/repr() would make the cache miss every
    partition and leak one producer per task). Functions identify by qualified
    name; instances by ``cache_key()`` when provided (REQUIRED for factory
    classes whose instances carry different configs), else by their type."""
    ck = getattr(factory, "cache_key", None)
    if callable(ck):
        return ("ck", type(factory).__module__, type(factory).__qualname__, ck())
    return (
        "fn",
        getattr(factory, "__module__", type(factory).__module__),
        getattr(factory, "__qualname__", type(factory).__qualname__),
    )


def _producer_for(bootstrap: str, factory):
    key = (*_factory_identity(factory), bootstrap)
    p = _PRODUCER_CACHE.get(key)
    if p is not None:
        # LRU: move the hit to the insertion-order tail so eviction (which
        # pops the HEAD) always removes the least-recently-used producer,
        # not the hottest one.
        _PRODUCER_CACHE.pop(key)
        _PRODUCER_CACHE[key] = p
        return p
    while len(_PRODUCER_CACHE) >= _PRODUCER_CACHE_MAX:
        oldest = next(iter(_PRODUCER_CACHE))
        old = _PRODUCER_CACHE.pop(oldest)
        # drain buffered async sends before tearing down the connection —
        # close() alone may drop them
        flush = getattr(old, "flush", None)
        if callable(flush):
            flush()
        close = getattr(old, "close", None)
        if callable(close):
            close()
    p = factory(bootstrap)
    _PRODUCER_CACHE[key] = p
    return p


def kafka_append(bootstrap: str, topic: str, lines: list[str], factory) -> None:
    """Produce lines to a topic and flush (one flush per partition-batch)."""
    if not lines:
        return
    producer = _producer_for(bootstrap, factory)
    for ln in lines:
        producer.send(topic, ln.encode("utf-8"))
    producer.flush()


_WARNED_AT_LEAST_ONCE = False


def _warn_at_least_once(fname_prefix: str | None) -> None:
    """One-time runtime notice that the epoch-replay discipline the caller
    asked for (an ``fname_prefix``) cannot be honored over a broker: Kafka
    deployments of the topology run at-least-once across foreachBatch
    replays."""
    global _WARNED_AT_LEAST_ONCE
    if fname_prefix is None or _WARNED_AT_LEAST_ONCE:
        return
    _WARNED_AT_LEAST_ONCE = True
    import warnings

    warnings.warn(
        "KafkaTopic cannot stage/dedup epoch replays (fname_prefix "
        f"{fname_prefix!r} ignored): this transport is AT-LEAST-ONCE across "
        "foreachBatch replays — a restarted epoch may duplicate entity "
        "fragments (which concat downstream). The file transport provides "
        "exactly-once; over Kafka, use a transactional producer keyed by "
        "query+epoch if replays must dedup.",
        RuntimeWarning,
        stacklevel=3,
    )


class KafkaTopic:
    """Same contract as transport.FileTopic, over a Kafka broker.

    ``exactly_once_replay`` is False: the epoch lifecycle methods are
    accepted no-ops (``epoch_committed`` never reports committed, so the
    topology always re-runs a replayed epoch's writes), and the writers
    cannot dedup — see ``line_writer``. The degradation is logged ONCE per
    process when an epoch-disciplined writer is requested, so a Kafka
    deployment knows its replays are at-least-once instead of silently
    assuming the file transport's guarantee (r8-advisor item)."""

    exactly_once_replay = False

    def __init__(self, bootstrap: str, name: str, producer_factory=None):
        self.bootstrap = bootstrap
        self.name = name
        self._factory = producer_factory or default_producer_factory

    def append_lines(self, lines: list[str]) -> None:
        kafka_append(self.bootstrap, self.name, lines, self._factory)

    # epoch lifecycle: no staging over a broker — every call re-publishes
    def epoch_committed(self, prefix: str) -> bool:
        return False

    def begin_epoch(self, prefix: str) -> None:
        pass

    def commit_epoch(self, prefix: str) -> None:
        pass

    def line_writer(self, fname_prefix: str | None = None):
        """Picklable foreachPartition sink: rows with a ``value`` column.

        ``fname_prefix`` is accepted for contract parity with
        ``FileTopic.line_writer`` and ignored — which means the Kafka
        transport is AT-LEAST-ONCE across foreachBatch replays, not
        exactly-once like the file transport. ``enable.idempotence=true``
        does NOT close the gap (producer idempotence dedups broker-level
        retries within one producer session, not a re-executed epoch);
        closing it needs a transactional producer keyed by query+epoch
        committing offsets with the write, which this sandbox's fake
        transport cannot model. Downstream, a replayed epoch's duplicate
        status fragments are absorbed by the fan-in's last-write-wins;
        duplicate ENTITY fragments concat (the reference's own duplicate
        semantics, `NeelProcessedTweetWindowFunction.java:57-61`)."""
        _warn_at_least_once(fname_prefix)
        bootstrap, name, factory = self.bootstrap, self.name, self._factory

        def write(rows) -> None:
            kafka_append(bootstrap, name, [r["value"] for r in rows], factory)

        return write

    def envelope_writer(
        self,
        out_topic: str,
        chunk: int | None = None,
        fname_prefix: str | None = None,
    ):
        """Picklable foreachPartition sink: rows with an ``item`` JSON column
        -> one request envelope per partition (or per ``chunk`` items).
        ``fname_prefix`` accepted for FileTopic parity, ignored (see
        ``line_writer``)."""
        _warn_at_least_once(fname_prefix)
        bootstrap, name, factory = self.bootstrap, self.name, self._factory

        def write(rows) -> None:
            items = [json.loads(r["item"]) for r in rows]
            if not items:
                return
            groups = chunked(items, chunk) if chunk else [items]
            kafka_append(
                bootstrap,
                name,
                [make_envelope(g, out_topic) for g in groups],
                factory,
            )

        return write

    def read_stream(self, spark: SparkSession) -> DataFrame:
        """Structured Streaming Kafka source exposing the same one-column
        (value STRING) frame as FileTopic.read_stream."""
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", self.name)
            .option("startingOffsets", "earliest")
            .load()
            .selectExpr("CAST(value AS STRING) AS value")
        )


class SpoolProducer:
    """Producer writing each flush to ``spool/<topic>/`` as atomic json-line
    files — the broker-less stand-in (degrades KafkaTopic to FileTopic
    behavior for dev and for exercising the producer path in tests)."""

    def __init__(self, spool: str):
        self.spool = spool
        self._buf: list[tuple[str, str]] = []

    def send(self, topic: str, value: bytes) -> None:
        self._buf.append((topic, value.decode("utf-8")))

    def flush(self) -> None:
        import os

        from .transport import append_lines_to_dir

        by_topic: dict[str, list[str]] = {}
        for t, v in self._buf:
            by_topic.setdefault(t, []).append(v)
        for t, lines in by_topic.items():
            d = os.path.join(self.spool, t)
            os.makedirs(d, exist_ok=True)
            append_lines_to_dir(d, lines)
        self._buf = []


class SpoolProducerFactory:
    """Picklable factory for SpoolProducer (executor-side construction)."""

    def __init__(self, spool: str):
        self.spool = spool

    def __call__(self, bootstrap: str) -> SpoolProducer:
        return SpoolProducer(self.spool)

    def cache_key(self) -> tuple:
        """Config-bearing identity so two factories with different spool dirs
        never share a producer, while re-unpickled copies of the SAME factory
        hit the same cache slot."""
        return (self.spool,)


def make_kafka_topics(
    bootstrap: str, names: list[str], producer_factory=None
) -> dict[str, KafkaTopic]:
    return {n: KafkaTopic(bootstrap, n, producer_factory) for n in names}
