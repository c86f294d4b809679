"""Behavioral tests for the training-data curation layer
(operators/curation.py) beyond the registry oracle gates: semantic
invariants the hash compare can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.operators import curation
from bigtwine_streamprocessor_spark.operators.joins import bloom_semi_filter


def test_bloom_semi_filter_is_superset_and_join_exact(spark, sf_dir):
    """The bloom filter may pass false positives but NEVER drops a matching
    row — the exact join after it must equal the plain join."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    pruned = bloom_semi_filter(li, o, "o_orderkey", "l_orderkey")
    # superset of true matches
    true_matches = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    pruned_matches = pruned.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert pruned_matches == true_matches
    # and it actually prunes (selective build side at this SF)
    assert pruned.count() < li.count()


def test_decontaminate_finds_exactly_leaked_sources(spark, sf_dir):
    """With the benchmark = verbatim copies of every 50th doc, the scan must
    flag exactly those source docs (full-gram overlap), nothing random."""
    from bigtwine_streamprocessor_spark.operators.dedup import (
        DUP_SEED_MOD,
        DUP_SEED_OFFSET,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % DUP_SEED_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(DUP_SEED_OFFSET)
    )
    flagged = curation.decontaminate(docs, bench)
    expected = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % DUP_SEED_MOD == 0)
        .select("doc_id")
        .collect()
    }
    got = {r.doc_id for r in flagged.collect()}
    assert expected <= got  # every leaked source flagged
    # a verbatim copy shares ALL its grams: the flagged count for a source
    # doc equals its distinct-gram count
    one = min(expected)
    n_grams = (
        docs.filter(F.col("doc_id") == one)
        .select(
            F.size(
                F.array_distinct(curation._grams(curation.DECONTAM_NGRAM))
            ).alias("n")
        )
        .collect()[0]
        .n
    )
    n_shared = flagged.filter(F.col("doc_id") == one).collect()[0].n_shared_grams
    assert n_shared == n_grams


def test_gopher_rules_exercises_both_branches(spark, sf_dir):
    out = curation.gopher_rules(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    n_pass = out.filter("passes").count()
    n_fail = out.filter("NOT passes").count()
    assert n_pass > 0 and n_fail > 0


def test_pack_sequences_blocks_are_contiguous(spark, sf_dir):
    """Within each source, block ids start at 0, never skip, and every
    block_offset is < window."""
    out = curation.pack_sequences(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    assert out.filter(F.col("block_offset") >= curation.PACK_WINDOW).count() == 0
    per_src = (
        out.groupBy("source")
        .agg(
            F.min("block_id").alias("lo"),
            F.max("block_id").alias("hi"),
            F.countDistinct("block_id").alias("n"),
        )
        .collect()
    )
    for r in per_src:
        assert r.lo == 0
        assert r.n == r.hi + 1  # no gaps


def test_global_shuffle_is_permutation_and_differs_from_id_order(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curation.global_shuffle(docs)
    n = docs.count()
    rows = out.collect()
    assert sorted(r.shuffle_pos for r in rows) == list(range(1, n + 1))
    by_pos = [r.doc_id for r in sorted(rows, key=lambda r: r.shuffle_pos)]
    assert by_pos != sorted(by_pos)  # actually shuffled


def test_redact_pii_roundtrip(spark, sf_dir):
    docs = curation.with_synthetic_pii(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    out = curation.redact_pii(docs)
    injected = out.filter(F.col("doc_id") % curation.PII_MOD == 0)
    assert injected.filter(F.col("n_redactions") == 0).count() == 0
    assert out.filter(F.col("text_clean").rlike(curation.EMAIL_RE)).count() == 0
    assert (
        injected.filter(~F.col("text_clean").contains("<EMAIL>")).count() == 0
    )


def test_semantic_keep_removes_only_cluster_members(spark, sf_dir):
    from bigtwine_streamprocessor_spark.operators import dedup, similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    edges = similarity.embedding_neardup_pairs(emb, 0.2, n_bits=8).select(
        "doc_a", "doc_b"
    )
    cc = dedup.connected_components(edges)
    kept = (
        emb.join(cc, emb["vec_id"] == cc["doc_id"], "left")
        .filter(
            F.col("cluster_id").isNull()
            | (F.col("cluster_id") == F.col("vec_id"))
        )
        .select("vec_id")
    )
    n_emb, n_kept = emb.count(), kept.count()
    n_clustered = cc.count()
    n_clusters = cc.select("cluster_id").distinct().count()
    # kept = unclustered + one representative per cluster
    assert n_kept == n_emb - n_clustered + n_clusters


# ---------------------------------------------------------------------------
# Property tests (hypothesis drives the data, Spark checks the invariant)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=80,
        unique=True,
    ),
    extra=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=80,
        unique=True,
    ),
)
def test_bloom_never_false_negative(spark, keys, extra):
    """Every probe row whose key IS in the build set must survive the bloom
    filter, for arbitrary key sets (false positives allowed, negatives
    never)."""
    from bigtwine_streamprocessor_spark.operators.joins import bloom_semi_filter

    build = spark.createDataFrame([(k,) for k in keys], "k bigint")
    probe = spark.createDataFrame(
        [(k,) for k in set(keys) | set(extra)], "p bigint"
    )
    kept = {
        r.p
        for r in bloom_semi_filter(probe, build, "k", "p", m=1 << 12).collect()
    }
    assert set(keys) <= kept


@settings(max_examples=5, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=60)
)
def test_pack_offsets_always_bounded(spark, toks):
    """block_offset < window and block ids are non-decreasing in doc order,
    even when single docs exceed the window size."""
    from pyspark.sql import functions as F

    from bigtwine_streamprocessor_spark.operators import curation

    rows = [(i, "s0", " ".join(["w"] * n)) for i, n in enumerate(toks)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = curation.pack_sequences(docs).collect()
    by_id = sorted(out, key=lambda r: r.doc_id)
    assert all(0 <= r.block_offset < curation.PACK_WINDOW for r in by_id)
    blocks = [r.block_id for r in by_id]
    assert blocks == sorted(blocks)
    assert blocks[0] == 0


def test_inverted_index_segments_bounded_and_df_exact(spark, sf_dir):
    """Posting lists are capped at seg_size per output row (no single-group
    OOM at scale), segments of a term partition its postings in sorted order
    without overlap, and df is the EXACT global per-term document
    frequency."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seg_size = 4  # small cap so the test corpus actually produces overflow
    rows = curation.inverted_index(docs, seg_size=seg_size).collect()
    assert any(r.segment > 0 for r in rows)  # sharding actually engaged
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r.term, []).append(r)
    exact_df = {
        r.term: r.n
        for r in docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.length("term") > 0)
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for term, segs in by_term.items():
        segs.sort(key=lambda r: r.segment)
        assert [s.segment for s in segs] == list(range(len(segs)))
        postings = [
            [int(x) for x in s.postings.split(",")] for s in segs
        ]
        for p in postings:
            assert 0 < len(p) <= seg_size
            assert p == sorted(p)
        flat = [x for p in postings for x in p]
        # contiguous sorted run across segments, no overlap, exact df
        assert flat == sorted(set(flat))
        assert {s.df for s in segs} == {exact_df[term]}
        assert len(flat) == exact_df[term]


def test_bloom_never_false_negative_across_key_widths(spark):
    """xxhash64 is type-sensitive; the filter must still honor its
    never-false-negative contract when the build key is int and the probe
    key is bigint (both sides hash a string render)."""
    build = spark.createDataFrame([(k,) for k in range(0, 50, 5)], "k int")
    probe = spark.createDataFrame([(k,) for k in range(50)], "p bigint")
    kept = {
        r.p
        for r in bloom_semi_filter(probe, build, "k", "p", m=1 << 12).collect()
    }
    assert set(range(0, 50, 5)) <= kept
