#!/usr/bin/env python
"""Round-14 optimization experiments: candidate restructures timed CO-TIMED
against the current implementations in one session (alternating reps), with
a full result-equality check (collected, sorted) before any timing is
trusted. Nothing here touches the registry — winners get applied to the
operators and re-proven under the oracle gates.

Usage: python scripts/opt_experiments_r14.py [exp ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.session import get_spark
from bigtwine_streamprocessor_spark.fp import rd as _rd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


# --- candidate: bigram_logprob v2 ------------------------------------------
# v1 joins the OCCURRENCE rows three times (bg -> bfreq, w1 -> uni, w2 ->
# uni) and recomputes the token explode for uni twice plus totals once.
# v2 scores each DISTINCT bigram once on vocabulary-sized frames and joins
# the occurrence rows back through ONE key (guide §2.3 aggregate-before-
# shuffle / §2.4 fewer passes): per-row arithmetic is the identical integer
# expression, so every occurrence carries a bit-identical double into the
# same per-doc avg.
def bigram_v2(docs: DataFrame) -> DataFrame:
    from bigtwine_streamprocessor_spark.operators.textstats import (
        BIGRAM_LAMBDA,
    )

    toks = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, 2), " "),
    )
    # tokens never contain spaces, so a bigram is invalid iff a side is
    # empty <=> it starts or ends with the joining space (v1's rlike +
    # re-split-size form, minus the regex and the extra split)
    bg = docs.select("doc_id", F.explode(bigrams).alias("bg")).filter(
        ~F.col("bg").startswith(" ") & ~F.col("bg").endswith(" ")
    )
    uni = (
        docs.select(F.explode(toks).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    totals = uni.agg(F.sum("cu").alias("n"), F.count(F.lit(1)).alias("v"))
    bfreq = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    w1 = F.substring_index(F.col("bg"), " ", 1)
    w2 = F.substring_index(F.col("bg"), " ", -1)
    scored_bg = (
        bfreq.withColumn("_w1", w1)
        .withColumn("_w2", w2)
        .join(
            uni.select(F.col("term").alias("_w1"), F.col("cu").alias("c1")),
            "_w1",
        )
        .join(
            uni.select(F.col("term").alias("_w2"), F.col("cu").alias("c2")),
            "_w2",
        )
        .join(F.broadcast(totals))
        .select(
            "bg",
            F.log(
                F.lit(BIGRAM_LAMBDA)
                * F.col("cb").cast("double")
                / F.col("c1").cast("double")
                + F.lit(1 - BIGRAM_LAMBDA)
                * (F.col("c2") + 1).cast("double")
                / (F.col("n") + F.col("v")).cast("double")
            ).alias("_lp"),
        )
    )
    return (
        bg.join(scored_bg, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            _rd(F.avg("_lp"), 5).alias("avg_logprob"),
        )
    )


# --- candidate: countmin v2 -------------------------------------------------
# v1 hashes EVERY token occurrence x d into the cell table; the identical
# cell counts follow from hashing the VOCABULARY once and summing exact
# counts (cell_n = sum of exact_n over tokens in the bucket) — integer
# arithmetic, bit-equal, |vocab| x d md5s instead of |occurrences| x d.
def countmin_v2(docs: DataFrame) -> DataFrame:
    from bigtwine_streamprocessor_spark.operators.corpus_prep import (
        CMS_D,
        CMS_TOP,
        _CMS_BUCKET_SPARK,
    )

    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    bucket = F.expr(_CMS_BUCKET_SPARK)
    rows = exact.select(
        "tok",
        "exact_n",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
    ).withColumn("bucket", bucket)
    cells = rows.groupBy("d", "bucket").agg(F.sum("exact_n").alias("cell_n"))
    q = (
        exact.orderBy(F.col("exact_n").desc(), "tok")
        .limit(CMS_TOP)
        .select(
            "tok",
            "exact_n",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
        )
        .withColumn("bucket", bucket)
    )
    return (
        q.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cell_n").alias("cms_est"))
        .select(
            "tok",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overest"),
        )
    )


# --- candidate: build_fragments v2 (single-pass explode) --------------------
def fragments_v2(parsed: DataFrame) -> DataFrame:
    import bigtwine_streamprocessor_spark.fragments as fr

    ents = F.transform(fr._ner_array(), fr._nel_entity)
    status_payload = fr.status_payload_col()
    entity_clean = lambda e: e.dropFields("_token")
    linked_payload = F.to_json(F.transform(ents, entity_clean))
    resource_struct = lambda e: F.struct(
        e["link"].alias("url"),
        F.col("id").alias("tag"),
        F.upper(e["_token"]).alias("name"),
        F.lit(None).cast("string").alias("shortDesc"),
        F.concat(
            F.lit(fr.THUMB_PREFIX), e["_token"], F.lit(".png")
        ).alias("thumb"),
        F.lit(None).cast("string").alias("thumbLarger"),
        F.lit(None).cast("string").alias("coordinates"),
    )
    resolved = F.filter(
        ents, lambda e: e["link"].isNotNull() & (F.length(e["_token"]) % 2 == 0)
    )
    resource_payload = F.to_json(F.transform(resolved, resource_struct))
    from bigtwine_streamprocessor_spark.operators.parse import (
        has_user_location,
    )

    loc_key = F.split(F.col("user__location"), "_").getItem(1).cast("int")
    has_loc = has_user_location()
    location_payload = F.to_json(
        F.struct(
            F.when(has_loc, F.col("user__location")).alias("address"),
            F.when(
                has_loc,
                F.struct(
                    (loc_key.cast("double") * 1.5 - 10.0).alias("lat"),
                    (F.lit(27.0) - loc_key.cast("double") * 0.75).alias("lng"),
                ),
            ).alias("coordinates"),
            F.col("id").alias("tag"),
        )
    )
    frags = F.array(
        *[
            F.struct(
                F.lit(st).alias("stream_type"), p.alias("payload_json")
            )
            for st, p in [
                ("status", status_payload),
                ("linkedTweet", linked_payload),
                ("resource", resource_payload),
                ("decodedLocation", location_payload),
            ]
        ]
    )
    return parsed.select(
        F.col("id").alias("tag"), F.explode(frags).alias("f")
    ).select("tag", "f.stream_type", "f.payload_json")


# --- harness -----------------------------------------------------------------

def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _rows(df: DataFrame) -> list:
    return sorted(
        [tuple(r) for r in df.collect()], key=lambda t: tuple(map(str, t))
    )


def run(name: str, old_fn, new_fn, equality=True) -> None:
    spark = sc[0]
    if equality:
        ro, rn = _rows(old_fn()), _rows(new_fn())
        eq = ro == rn
        print(f"== {name}: equality {'OK' if eq else 'MISMATCH'} "
              f"({len(ro)} vs {len(rn)} rows)", flush=True)
        if not eq:
            for a, b in zip(ro, rn):
                if a != b:
                    print("  first diff:\n   old:", a, "\n   new:", b)
                    break
            return
    olds, news = [], []
    for rep in range(REPS):
        order = [("old", old_fn, olds), ("new", new_fn, news)]
        if rep % 2:
            order.reverse()
        for label, fn, acc in order:
            t0 = time.perf_counter()
            _noop(fn())
            acc.append(round(time.perf_counter() - t0, 3))
    print(f"   {name}: old {olds} min {min(olds)} | new {news} min "
          f"{min(news)}  speedup x{min(olds) / min(news):.2f}", flush=True)


sc = [None]


def main() -> None:
    spark = get_spark(app_name="opt-exp-r14")
    sc[0] = spark
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()

    from bigtwine_streamprocessor_spark.operators import (
        corpus_prep,
        textstats,
    )
    from bigtwine_streamprocessor_spark import fragments, pipeline

    which = set(sys.argv[1:]) or {"bigram", "countmin", "fragments"}

    if "bigram" in which:
        run(
            "bigram_logprob",
            lambda: textstats.bigram_logprob(docs),
            lambda: bigram_v2(docs),
        )
    if "countmin" in which:
        run(
            "countmin_topterms",
            lambda: corpus_prep.countmin_topterms(docs),
            lambda: countmin_v2(docs),
        )
    if "fragments" in which:
        parsed = pipeline.stages(spark, SF_DIR)["parsed"]
        run(
            "build_fragments",
            lambda: fragments.build_fragments(parsed),
            lambda: fragments_v2(parsed),
        )
        # and the downstream gate shape (fanin_batch over the fragments)
        from bigtwine_streamprocessor_spark.streaming import fanin

        run(
            "fanin_batch_over_fragments",
            lambda: fanin.fanin_batch(fragments.build_fragments(parsed)),
            lambda: fanin.fanin_batch(fragments_v2(parsed)),
            equality=False,  # typed structs collect poorly; gate tests cover
        )
    spark.stop()


if __name__ == "__main__":
    main()
