"""The full async NEEL topology: N concurrent streaming queries over topics.

Faithful reconstruction of `TwitterStreamJob`'s dataflow graph (SURVEY.md
§2.10, §3.1) with each enrichment hop as its own request/response round-trip:

    Q1 tweets ──────────► status fragments        ─┐
       ├──► ner-requests  ─(NER svc)─► ner-responses ──Q2──► nel-requests
       ├──► geo-requests  ─(GEO svc)─► geo-responses ──Q5──► location frags ─┤
       └──► empty-location synth fragments         ─┤                        │
    Q3 nel-responses ►──► linkedTweet fragments    ─┼─► Q6 fan-in ► results
       ├──► linkresolver-requests ─(RES svc)─► …   ─┤   (completion/timeout)
       └──► empty-resource synth fragments         ─┤
    Q4 resolver-responses ►──► resource fragments  ─┘

NEL requests build from NER *responses* (`TwitterStreamJob.java:248-263`),
the resolver from NEL responses with links (`:279-288`), geo from raw tweets
with a location (`:296-307`); the two empty-synth branches guarantee fan-in
completion (`:327-343`).

Scale contract: EVERY row-proportional message shaping hop — Q1's status
fragments / request items, Q2-Q5's response-envelope parsing (``from_json`` +
``explode(items)``, the Spark form of the reference's parallel flatMap
parsers `NerResponseMessageParser.java:32-40`,
`LinkResolverResponseMessageParser.java:37-56`) and fragment/request shaping,
and Q6's result lines — is DataFrame expressions + ``to_json`` written from
EXECUTORS via ``foreachPartition``. The driver never holds stream-
proportional data: each response envelope's ``items`` array carries one entry
per tweet in the micro-batch, so even "one line per batch" is row-
proportional CONTENT and stays off the driver. Swapping the
``foreachPartition`` file writers for a Kafka producer is a config switch
(see ``kafka_transport``), not a rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..fragments import status_payload_col
from ..operators.parse import has_user_location
from .fanin import FRAGMENT_IN, fanin_stream, parse_assembled
from .transport import FileTopic, ServiceSimulator
from .transport import geo_service, nel_service, ner_service, resolver_service

TOPIC_NAMES = [
    "ner-requests",
    "ner-responses",
    "nel-requests",
    "nel-responses",
    "linkresolver-requests",
    "linkresolver-responses",
    "geodecoder-requests",
    "geodecoder-responses",
    "fragments",
    "results",
]

GEO_CHUNK = 15  # `TwitterStreamJob.java:300`

# Typed response-envelope item schemas (the contract each service's reply
# carries; reference parsers `NerResponseMessageParser.java:32-40`,
# `LinkResolverResponseMessageParser.java:37-56`). Parsing happens on
# EXECUTORS via from_json — malformed lines parse to null and drop, like the
# reference's parsers swallowing bad messages.

_NER_ENTITY = T.StructType(
    [
        T.StructField("token", T.StringType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
    ]
)
NER_RESP_ITEM = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("entities", T.ArrayType(_NER_ENTITY)),
    ]
)
_NEL_ENTITY = T.StructType(
    _NER_ENTITY.fields
    + [
        T.StructField("isNil", T.BooleanType()),
        T.StructField("link", T.StringType()),
        T.StructField("nilCluster", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("category", T.StringType()),
    ]
)
NEL_RESP_ITEM = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("entities", T.ArrayType(_NEL_ENTITY)),
    ]
)
RESOLVER_RESP_ITEM = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField(
            "resources",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("url", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("thumb", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)
GEO_RESP_ITEM = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField(
            "coordinates",
            T.StructType(
                [
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lng", T.DoubleType()),
                ]
            ),
        ),
    ]
)


def _resp_items_df(batch_df: DataFrame, item_schema: T.StructType) -> DataFrame:
    """Response topic lines -> one row per envelope item, parsed on executors
    (from_json returns null for malformed lines — they drop silently)."""
    env_schema = T.StructType(
        [T.StructField("items", T.ArrayType(item_schema))]
    )
    return (
        batch_df.select(F.from_json("value", env_schema).alias("env"))
        .filter(F.col("env.items").isNotNull())
        .select(F.explode("env.items").alias("it"))
    )


def _frag_json(tag: F.Column, stream_type: str, payload_json: F.Column) -> F.Column:
    """Fragment line as a Column (same wire shape FRAGMENT_IN parses back)."""
    return F.to_json(
        F.struct(
            tag.alias("tag"),
            F.lit(stream_type).alias("stream_type"),
            payload_json.alias("payload_json"),
        )
    )


def _entity_payload_struct(e: F.Column) -> F.Column:
    """NEL entity -> the linkedTweet fragment's entity payload shape
    (null value/resource backfilled later by finalize; nulls drop out of
    to_json and from_json restores them downstream)."""
    return F.struct(
        F.struct(e["start"].alias("start"), e["end"].alias("end")).alias(
            "position"
        ),
        F.lit(None).cast("string").alias("value"),
        e["link"].alias("link"),
        e["isNil"].alias("isNil"),
        e["nilCluster"].alias("nilCluster"),
        e["confidence"].alias("confidence"),
        e["category"].alias("category"),
        F.lit(None).cast("string").alias("resource"),
    )


import threading as _threading

# Observability counters for the epoch-publish path (r12 verdict task 1):
# a restarted topology's recovery clock divides into REPLAYED work (epochs
# re-staged because their commit never landed) and FRESH work. These
# counters let a soak report that split directly instead of inferring it.
# Driver-side only (foreachBatch callbacks), guarded for the 6 concurrent
# query threads; reset via reset_publish_stats() at a measurement boundary.
PUBLISH_STATS = {"skipped_committed": 0, "published": 0}
_PUBLISH_STATS_LOCK = _threading.Lock()


def reset_publish_stats() -> dict:
    """Zero the counters and return the pre-reset snapshot."""
    with _PUBLISH_STATS_LOCK:
        snap = dict(PUBLISH_STATS)
        PUBLISH_STATS["skipped_committed"] = 0
        PUBLISH_STATS["published"] = 0
    return snap


def _epoch_publish(topic, prefix: str, df: DataFrame, writer) -> None:
    """Exactly-once epoch publish (r8-advisor fix): per-partition publish
    NAMES alone cannot survive a restart that repartitions the replayed
    batch (file-source packing depends on parallelism config — a replayed
    epoch could skip a p0 with different content, silently losing rows, or
    add extra pN duplicates). So the unit of commitment is the EPOCH:
    skip it wholesale if its committed dir exists, otherwise discard any
    partial staging from a crashed attempt, run the executor-side writes
    into staging, and atomically promote. Both transports honor the full
    contract: FileTopic promotes a staged dir with one rename; KafkaTopic
    stages to a shared spool and produces only from ``commit_epoch``
    (transactional-producer shape, r9 verdict task 4).

    Before committing, the driver cross-checks the staged partition files
    it can SEE against an accumulator of non-empty partitions counted on
    the executors (advisor r10): if the stage dir sits on storage the
    executors and driver don't share (node-local tmp on a cluster), the
    counts diverge and we fail loudly instead of committing an empty
    marker that would drop the epoch's rows forever."""
    if topic.epoch_committed(prefix):
        with _PUBLISH_STATS_LOCK:
            PUBLISH_STATS["skipped_committed"] += 1
        return
    topic.begin_epoch(prefix)
    count_staged = getattr(topic, "staged_partition_count", None)
    if count_staged is None:
        df.foreachPartition(writer)
    else:
        # exactly-once per successful task inside an action, so retries /
        # speculative twins can't inflate the expectation
        acc = df.sparkSession.sparkContext.accumulator(0)

        def counted(rows, _writer=writer, _acc=acc):
            rows = list(rows)
            if rows:
                _acc.add(1)
            _writer(iter(rows))

        df.foreachPartition(counted)
        visible = count_staged(prefix)
        if visible != acc.value:
            raise RuntimeError(
                f"epoch {prefix} on topic {topic.name!r}: executors staged "
                f"{acc.value} non-empty partition(s) but the driver sees "
                f"{visible} — the stage root is not on driver+executor-"
                "shared storage. Refusing to commit (it would silently "
                "drop rows); point the transport's stage at shared storage "
                "(same class as the streaming checkpoint)."
            )
    topic.commit_epoch(prefix)
    # counted only AFTER the commit lands (advisor r13): a publish that
    # raises (staged-count divergence) must not count as fresh work — its
    # replay would double-count in exactly the replayed/fresh split these
    # counters exist to measure
    with _PUBLISH_STATS_LOCK:
        PUBLISH_STATS["published"] += 1


def _epoch_publish_multi(df: DataFrame, specs: list[tuple]) -> None:
    """One Spark action publishing one batch to SEVERAL topics at once.

    ``specs`` is a list of ``(topic, prefix, col, key, writer)``: ``col``
    names a column of ``df`` holding that topic's payload for the row (a
    string, or an array of strings to flatten; NULLs skip), ``key`` is the
    row-dict key the topic's writer expects (``"value"`` for line writers,
    ``"item"`` for envelope writers). Semantics are identical to running
    ``_epoch_publish`` once per topic — same per-topic epoch skip/stage/
    count-check/commit, same PUBLISH_STATS accounting, same staged file
    contents (each writer sees the same per-partition row order the
    separate action would have) — but the batch is computed and scanned
    ONCE instead of once per topic (guide §1.2/§2.6: per-micro-batch fixed
    cost was 3 jobs + a persist for Q1, now 1 job and no cache churn).
    """
    cols = [spec[2] for spec in specs]
    if len(set(cols)) != len(cols):
        # accumulators are keyed by payload column: two specs sharing one
        # would silently share an accumulator and double-count non-empty
        # partitions, tripping the staged-count check spuriously
        raise ValueError(f"_epoch_publish_multi: duplicate payload columns {cols}")
    live: list[tuple] = []
    for topic, prefix, col, key, writer in specs:
        if topic.epoch_committed(prefix):
            with _PUBLISH_STATS_LOCK:
                PUBLISH_STATS["skipped_committed"] += 1
            continue
        topic.begin_epoch(prefix)
        live.append((topic, prefix, col, key, writer))
    if not live:
        return
    sc = df.sparkSession.sparkContext
    checked = [
        spec for spec in live
        if getattr(spec[0], "staged_partition_count", None) is not None
    ]
    accs = {spec[2]: sc.accumulator(0) for spec in checked}
    plan = [
        (col, key, writer, col in accs) for (_t, _p, col, key, writer) in live
    ]

    def write_all(rows, _plan=plan, _accs=accs) -> None:
        rows = list(rows)
        for col, key, writer, counted in _plan:
            vals: list[dict] = []
            for r in rows:
                v = r[col]
                if v is None:
                    continue
                if isinstance(v, (list, tuple)):
                    vals.extend({key: x} for x in v if x is not None)
                else:
                    vals.append({key: v})
            if vals and counted:
                _accs[col].add(1)
            writer(iter(vals))

    df.foreachPartition(write_all)
    for topic, prefix, col, _key, _writer in live:
        if col in accs:
            visible = topic.staged_partition_count(prefix)
            if visible != accs[col].value:
                raise RuntimeError(
                    f"epoch {prefix} on topic {topic.name!r}: executors "
                    f"staged {accs[col].value} non-empty partition(s) but "
                    f"the driver sees {visible} — the stage root is not on "
                    "driver+executor-shared storage. Refusing to commit "
                    "(it would silently drop rows); point the transport's "
                    "stage at shared storage (same class as the streaming "
                    "checkpoint)."
                )
        topic.commit_epoch(prefix)
        with _PUBLISH_STATS_LOCK:
            PUBLISH_STATS["published"] += 1


import re as _re

_EPOCH_DIR_RE = _re.compile(r"^q\d+-e\d+$")


def bind_stage_roots(topics: dict, root: str) -> None:
    """Bind transports that stage epochs externally (KafkaTopic) to a stage
    root UNDER the topology root — same storage class as the checkpoints,
    namespaced per topology so two topologies on one broker never share
    markers. A missing ``<root>/_chk`` means this run's epoch ids restart
    at ``q1-e0``, so any surviving stage/marker state belongs to a DEAD run
    and is purged (else ``epoch_committed`` would hit a stale marker and
    publish NOTHING — the advisor-r10 silent-loss hazard).

    The FileTopic twin of the same hazard cannot be purged: its committed
    epoch DIRS are the published data itself, so a fresh checkpoint over a
    topic dir that already holds ``q<N>-e<M>`` dirs would silently skip the
    new run's epochs 0..M while serving the dead run's records. That state
    (a reused root with its checkpoints deleted) is refused loudly
    instead."""
    fresh_checkpoint = not os.path.isdir(os.path.join(root, "_chk"))
    for t in topics.values():
        bind = getattr(t, "bind_stage_root", None)
        if callable(bind):
            bind(
                os.path.join(root, "_kafka_stage"),
                fresh_checkpoint=fresh_checkpoint,
            )
        elif fresh_checkpoint and isinstance(t, FileTopic):
            stale = sorted(
                fn
                for fn in (
                    os.listdir(t.dir) if os.path.isdir(t.dir) else ()
                )
                if _EPOCH_DIR_RE.match(fn)
            )
            if stale:
                raise RuntimeError(
                    f"topic {t.name!r} already holds committed epoch dirs "
                    f"{stale[:3]}{'...' if len(stale) > 3 else ''} but "
                    f"{root}/_chk does not exist — a fresh run's epoch ids "
                    "restart at 0 and would silently skip publishing into "
                    "them. Use a fresh topology root (or keep the "
                    "checkpoint dir to resume the old run)."
                )


def start_topology(
    spark: SparkSession,
    root: str,
    parsed: DataFrame,
    analysis_id: str,
    timeout_ms: int = 15_000,
    trigger_s: float = 1.0,
    topics: dict | None = None,
):
    """Wire and start every query + service simulator. Returns (queries,
    simulators, topics); caller stops them.

    ``topics`` defaults to FileTopics under ``root``; pass
    ``kafka_transport.make_kafka_topics(bootstrap, TOPIC_NAMES)`` to run the
    identical dataflow over a Kafka broker (checkpoints stay under ``root``).
    The topology itself only uses the four-method topic contract.
    """
    if topics is None:
        topics = {n: FileTopic(root, n) for n in TOPIC_NAMES}
    bind_stage_roots(topics, root)
    # milliseconds so fractional intervals work ("0.25 seconds" is not a
    # portable interval literal); int seconds format identically as before.
    # r15 NOTE: the interval itself was swept (1.0/0.25/0.1 s co-timed,
    # scripts/opt_topo_r15.py) and 1 s stays — batches already overrun it,
    # so shorter intervals only add empty-trigger churn (OPTIMIZATION_r15).
    trig = {"processingTime": f"{int(trigger_s * 1000 + 0.5)} milliseconds"}

    # Durable "consumer offsets" for the service stand-ins: a restarted
    # topology must not get its already-answered requests re-answered, or
    # the duplicate responses arrive as NEW epochs and defeat the writers'
    # idempotent replay names (see transport.ServiceSimulator).
    offsets_dir = os.path.join(root, "_svc_offsets")
    os.makedirs(offsets_dir, exist_ok=True)

    def _sim(req_name: str, resp_name: str, fn) -> ServiceSimulator:
        return ServiceSimulator(
            topics[req_name],
            topics[resp_name],
            fn,
            offsets_path=os.path.join(offsets_dir, f"{req_name}.log"),
        )

    sims = [
        _sim("ner-requests", "ner-responses", ner_service),
        _sim("nel-requests", "nel-responses", nel_service),
        _sim("linkresolver-requests", "linkresolver-responses", resolver_service),
        _sim("geodecoder-requests", "geodecoder-responses", geo_service),
    ]
    for s in sims:
        s.start()

    def reply(name: str) -> str:
        return f"{name}.{analysis_id}"

    # ---- Q1: tweet stream -> status frags + ner/geo requests + synth ------
    # All row-proportional shaping stays on executors: fragment lines are
    # to_json Columns written via foreachPartition; request envelopes are
    # built per-partition from JSON item rows. The driver touches nothing
    # proportional to the stream (`TwitterStreamJob.java:309-343`).
    has_loc = has_user_location()
    frag_struct = lambda st, payload: F.to_json(
        F.struct(
            F.col("id").alias("tag"),
            F.lit(st).alias("stream_type"),
            payload.alias("payload_json"),
        )
    )
    # empty-location synth (`TwitterStreamJob.java:339-343`): null payload
    # fields drop out of to_json; from_json restores them as nulls.
    synth_loc_payload = F.to_json(
        F.struct(
            F.lit(None).cast("string").alias("address"),
            F.lit(None).cast("struct<lat:double,lng:double>").alias("coordinates"),
            F.col("id").alias("tag"),
        )
    )
    q1_frag_lines = F.array_compact(
        F.array(
            frag_struct("status", status_payload_col()),
            F.when(~has_loc, frag_struct("decodedLocation", synth_loc_payload)),
        )
    )

    # all three Q1 outputs are projections of the same batch: publish them
    # in ONE pass (one Spark job per trigger instead of three + a persist);
    # each topic keeps its own epoch stage/commit (see _epoch_publish_multi)
    def q1(batch_df: DataFrame, epoch_id: int) -> None:
        pfx = f"q1-e{epoch_id}"
        combined = batch_df.select(
            q1_frag_lines.alias("_frag"),
            F.to_json(
                F.struct(F.col("id").alias("tag"), F.col("text"))
            ).alias("_ner"),
            F.when(
                has_loc,
                F.to_json(
                    F.struct(
                        F.col("id").alias("tag"),
                        F.col("user__location").alias("address"),
                    )
                ),
            ).alias("_geo"),
        )
        _epoch_publish_multi(
            combined,
            [
                (
                    topics["fragments"],
                    pfx,
                    "_frag",
                    "value",
                    topics["fragments"].line_writer(pfx),
                ),
                (
                    topics["ner-requests"],
                    pfx,
                    "_ner",
                    "item",
                    topics["ner-requests"].envelope_writer(
                        reply("ner-responses"), fname_prefix=pfx
                    ),
                ),
                (
                    topics["geodecoder-requests"],
                    pfx,
                    "_geo",
                    "item",
                    topics["geodecoder-requests"].envelope_writer(
                        reply("geodecoder-responses"),
                        chunk=GEO_CHUNK,
                        fname_prefix=pfx,
                    ),
                ),
            ],
        )

    q1_query = (
        parsed.writeStream.foreachBatch(q1)
        .option("checkpointLocation", f"{root}/_chk/q1")
        .trigger(**trig)
        .start()
    )

    # ---- Q2: NER responses -> NEL requests --------------------------------
    # Executor-side end to end: parse envelopes, forward items as the NEL
    # request body (one envelope per partition, consumers are agnostic).
    def q2(batch_df: DataFrame, epoch_id: int) -> None:
        pfx = f"q2-e{epoch_id}"
        _epoch_publish(
            topics["nel-requests"],
            pfx,
            _resp_items_df(batch_df, NER_RESP_ITEM).select(
                F.to_json("it").alias("item")
            ),
            topics["nel-requests"].envelope_writer(
                reply("nel-responses"), fname_prefix=pfx
            ),
        )

    q2_query = (
        topics["ner-responses"].read_stream(spark)
        .writeStream.foreachBatch(q2)
        .option("checkpointLocation", f"{root}/_chk/q2")
        .trigger(**trig)
        .start()
    )

    # ---- Q3: NEL responses -> linkedTweet frags + resolver reqs + synth ---
    _linked_tokens = F.transform(
        F.filter(F.col("it.entities"), lambda e: e["link"].isNotNull()),
        lambda e: e["token"],
    )

    # both Q3 outputs are projections of the same parsed item rows: one
    # pass, one job per trigger (was two + a persist). linkedTweet fragment
    # always; empty-resource synth fragment when no entity links
    # (`TwitterStreamJob.java:327-331`)
    def q3(batch_df: DataFrame, epoch_id: int) -> None:
        items = _resp_items_df(batch_df, NEL_RESP_ITEM)
        ent_payload = F.to_json(
            F.transform(F.col("it.entities"), _entity_payload_struct)
        )
        pfx = f"q3-e{epoch_id}"
        combined = items.select(
            F.array_compact(
                F.array(
                    _frag_json(F.col("it.tag"), "linkedTweet", ent_payload),
                    F.when(
                        F.size(_linked_tokens) == 0,
                        _frag_json(F.col("it.tag"), "resource", F.lit("[]")),
                    ),
                )
            ).alias("_frag"),
            F.when(
                F.size(_linked_tokens) > 0,
                F.to_json(
                    F.struct(
                        F.col("it.tag").alias("tag"),
                        _linked_tokens.alias("tokens"),
                    )
                ),
            ).alias("_res"),
        )
        _epoch_publish_multi(
            combined,
            [
                (
                    topics["fragments"],
                    pfx,
                    "_frag",
                    "value",
                    topics["fragments"].line_writer(pfx),
                ),
                (
                    topics["linkresolver-requests"],
                    pfx,
                    "_res",
                    "item",
                    topics["linkresolver-requests"].envelope_writer(
                        reply("linkresolver-responses"), fname_prefix=pfx
                    ),
                ),
            ],
        )

    q3_query = (
        topics["nel-responses"].read_stream(spark)
        .writeStream.foreachBatch(q3)
        .option("checkpointLocation", f"{root}/_chk/q3")
        .trigger(**trig)
        .start()
    )

    # ---- Q4: resolver responses -> resource fragments ---------------------
    def q4(batch_df: DataFrame, epoch_id: int) -> None:
        res_payload = F.to_json(
            F.transform(
                F.col("it.resources"),
                lambda r: F.struct(
                    r["url"].alias("url"),
                    F.col("it.tag").alias("tag"),
                    r["name"].alias("name"),
                    F.lit(None).cast("string").alias("shortDesc"),
                    r["thumb"].alias("thumb"),
                    F.lit(None).cast("string").alias("thumbLarger"),
                    F.lit(None).cast("string").alias("coordinates"),
                ),
            )
        )
        pfx = f"q4-e{epoch_id}"
        _epoch_publish(
            topics["fragments"],
            pfx,
            _resp_items_df(batch_df, RESOLVER_RESP_ITEM).select(
                _frag_json(F.col("it.tag"), "resource", res_payload).alias(
                    "value"
                )
            ),
            topics["fragments"].line_writer(pfx),
        )

    q4_query = (
        topics["linkresolver-responses"].read_stream(spark)
        .writeStream.foreachBatch(q4)
        .option("checkpointLocation", f"{root}/_chk/q4")
        .trigger(**trig)
        .start()
    )

    # ---- Q5: geo responses -> decodedLocation fragments -------------------
    def q5(batch_df: DataFrame, epoch_id: int) -> None:
        loc_payload = F.to_json(
            F.struct(
                F.col("it.address").alias("address"),
                F.col("it.coordinates").alias("coordinates"),
                F.col("it.tag").alias("tag"),
            )
        )
        pfx = f"q5-e{epoch_id}"
        _epoch_publish(
            topics["fragments"],
            pfx,
            _resp_items_df(batch_df, GEO_RESP_ITEM).select(
                _frag_json(
                    F.col("it.tag"), "decodedLocation", loc_payload
                ).alias("value")
            ),
            topics["fragments"].line_writer(pfx),
        )

    q5_query = (
        topics["geodecoder-responses"].read_stream(spark)
        .writeStream.foreachBatch(q5)
        .option("checkpointLocation", f"{root}/_chk/q5")
        .trigger(**trig)
        .start()
    )

    # ---- Q6: fragment topic -> stateful fan-in -> results -----------------
    frag_stream = (
        topics["fragments"]
        .read_stream(spark)
        .select(F.from_json("value", FRAGMENT_IN).alias("f"))
        .filter(F.col("f").isNotNull())
        .select("f.tag", "f.stream_type", "f.payload_json")
    )
    assembled = fanin_stream(frag_stream, timeout_ms=timeout_ms)

    from ..fragments import finalize_results

    final = finalize_results(parse_assembled(assembled))

    def q6(batch_df: DataFrame, epoch_id: int) -> None:
        # result lines serialize and write on executors — never the driver
        pfx = f"q6-e{epoch_id}"
        _epoch_publish(
            topics["results"],
            pfx,
            batch_df.select(
                F.to_json(
                    F.struct(F.col("payload"), F.col("is_partial"))
                ).alias("value")
            ),
            topics["results"].line_writer(pfx),
        )

    q6_query = (
        final.writeStream.foreachBatch(q6)
        .option("checkpointLocation", f"{root}/_chk/q6")
        .trigger(**trig)
        .start()
    )

    queries = [q1_query, q2_query, q3_query, q4_query, q5_query, q6_query]
    return queries, sims, topics
