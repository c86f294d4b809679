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

Scale contract: all row-proportional message shaping (Q1's status fragments /
request items, Q6's result lines) is DataFrame expressions + ``to_json``
written from EXECUTORS via ``foreachPartition`` — the driver never holds the
tweet stream. Only Q2–Q5's response-envelope drains collect, and those are
envelope-scale (a handful of lines per micro-batch). Swapping the
``foreachPartition`` file writers for a Kafka producer is a config switch
(see ``kafka_transport``), not a rewrite.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fragments import status_payload_col
from ..operators.parse import has_user_location
from .fanin import FRAGMENT_IN, fanin_stream, parse_assembled
from .transport import FileTopic, ServiceSimulator, make_envelope
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


def _frag_line(tag: str, stream_type: str, payload) -> str:
    return json.dumps(
        {
            "tag": tag,
            "stream_type": stream_type,
            "payload_json": json.dumps(payload) if payload is not None else None,
        }
    )


def _entity_payload(e: dict) -> dict:
    return {
        "position": {"start": e["start"], "end": e["end"]},
        "value": None,
        "link": e["link"],
        "isNil": e["isNil"],
        "nilCluster": e["nilCluster"],
        "confidence": e["confidence"],
        "category": e["category"],
        "resource": None,
    }


def start_topology(
    spark: SparkSession,
    root: str,
    parsed: DataFrame,
    analysis_id: str,
    timeout_ms: int = 15_000,
    trigger_s: int = 1,
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
    trig = {"processingTime": f"{trigger_s} seconds"}

    sims = [
        ServiceSimulator(topics["ner-requests"], topics["ner-responses"], ner_service),
        ServiceSimulator(topics["nel-requests"], topics["nel-responses"], nel_service),
        ServiceSimulator(
            topics["linkresolver-requests"],
            topics["linkresolver-responses"],
            resolver_service,
        ),
        ServiceSimulator(
            topics["geodecoder-requests"], topics["geodecoder-responses"], geo_service
        ),
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

    def q1(batch_df: DataFrame, epoch_id: int) -> None:
        bdf = batch_df.persist()
        try:
            bdf.select(F.explode(q1_frag_lines).alias("value")).foreachPartition(
                topics["fragments"].line_writer()
            )
            bdf.select(
                F.to_json(
                    F.struct(F.col("id").alias("tag"), F.col("text"))
                ).alias("item")
            ).foreachPartition(
                topics["ner-requests"].envelope_writer(reply("ner-responses"))
            )
            bdf.filter(has_loc).select(
                F.to_json(
                    F.struct(
                        F.col("id").alias("tag"),
                        F.col("user__location").alias("address"),
                    )
                ).alias("item")
            ).foreachPartition(
                topics["geodecoder-requests"].envelope_writer(
                    reply("geodecoder-responses"), chunk=GEO_CHUNK
                )
            )
        finally:
            bdf.unpersist()

    q1_query = (
        parsed.writeStream.foreachBatch(q1)
        .option("checkpointLocation", f"{root}/_chk/q1")
        .trigger(**trig)
        .start()
    )

    def _resp_items(batch_df: DataFrame) -> list[dict]:
        items = []
        for r in batch_df.collect():
            if not r["value"].strip():
                continue
            try:
                env = json.loads(r["value"])
            except json.JSONDecodeError:
                continue  # drop malformed, like the reference's parsers
            items.extend(env.get("items", []))
        return items

    # ---- Q2: NER responses -> NEL requests --------------------------------
    def q2(batch_df: DataFrame, epoch_id: int) -> None:
        items = _resp_items(batch_df)
        if items:
            topics["nel-requests"].append_lines(
                [make_envelope(items, reply("nel-responses"))]
            )

    q2_query = (
        topics["ner-responses"].read_stream(spark)
        .writeStream.foreachBatch(q2)
        .option("checkpointLocation", f"{root}/_chk/q2")
        .trigger(**trig)
        .start()
    )

    # ---- Q3: NEL responses -> linkedTweet frags + resolver reqs + synth ---
    def q3(batch_df: DataFrame, epoch_id: int) -> None:
        items = _resp_items(batch_df)
        frag_lines, resolver_items = [], []
        for it in items:
            ents = [_entity_payload(e) for e in it["entities"]]
            frag_lines.append(_frag_line(it["tag"], "linkedTweet", ents))
            linked = [
                e["token"] for e in it["entities"] if e["link"] is not None
            ]
            if linked:
                resolver_items.append({"tag": it["tag"], "tokens": linked})
            else:
                # empty-resource synth (`TwitterStreamJob.java:327-331`)
                frag_lines.append(_frag_line(it["tag"], "resource", []))
        topics["fragments"].append_lines(frag_lines)
        if resolver_items:
            topics["linkresolver-requests"].append_lines(
                [make_envelope(resolver_items, reply("linkresolver-responses"))]
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
        frag_lines = []
        for it in _resp_items(batch_df):
            res = [
                {
                    "url": r_["url"],
                    "tag": it["tag"],
                    "name": r_["name"],
                    "shortDesc": None,
                    "thumb": r_["thumb"],
                    "thumbLarger": None,
                    "coordinates": None,
                }
                for r_ in it["resources"]
            ]
            frag_lines.append(_frag_line(it["tag"], "resource", res))
        topics["fragments"].append_lines(frag_lines)

    q4_query = (
        topics["linkresolver-responses"].read_stream(spark)
        .writeStream.foreachBatch(q4)
        .option("checkpointLocation", f"{root}/_chk/q4")
        .trigger(**trig)
        .start()
    )

    # ---- Q5: geo responses -> decodedLocation fragments -------------------
    def q5(batch_df: DataFrame, epoch_id: int) -> None:
        frag_lines = [
            _frag_line(
                it["tag"],
                "decodedLocation",
                {
                    "address": it["address"],
                    "coordinates": it["coordinates"],
                    "tag": it["tag"],
                },
            )
            for it in _resp_items(batch_df)
        ]
        topics["fragments"].append_lines(frag_lines)

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
        batch_df.select(
            F.to_json(F.struct(F.col("payload"), F.col("is_partial"))).alias(
                "value"
            )
        ).foreachPartition(topics["results"].line_writer())

    q6_query = (
        final.writeStream.foreachBatch(q6)
        .option("checkpointLocation", f"{root}/_chk/q6")
        .trigger(**trig)
        .start()
    )

    queries = [q1_query, q2_query, q3_query, q4_query, q5_query, q6_query]
    return queries, sims, topics
