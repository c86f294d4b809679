"""Behavioral tests for operators/textstats.py beyond the registry oracle
gates: hapax-count semantics at the boundaries, the long-document probe
proving the hapax path is no longer quadratic per row, and the
single-token-doc bigram pin (r14 verdict item 1)."""

from __future__ import annotations

import time

import duckdb
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.operators import textstats
from tests.conftest import assert_frames_match


def test_lexical_diversity_hand_checked(spark):
    """Sorted-neighbor-diff hapax counting matches the definition on docs
    engineered to stress the boundaries: repeated first/last sorted tokens,
    all-duplicate docs, all-unique docs, single-token docs."""
    rows = [
        (0, "a a b c c d"),  # hapax: b, d (first+last sorted runs repeated)
        (1, "z z z"),  # no hapax
        (2, "q w e r t y"),  # all hapax
        (3, "solo"),  # single token -> hapax
        (4, "b a b a c"),  # hapax: c only
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.hapax_frac)
        for r in textstats.lexical_diversity(docs).collect()
    }
    assert got[0] == (6, 4, round(2 / 6, 5))
    assert got[1] == (3, 1, 0.0)
    assert got[2] == (6, 6, 1.0)
    assert got[3] == (1, 1, 1.0)
    assert got[4] == (5, 3, round(1 / 5, 5))


def test_lexical_diversity_long_document_probe(spark):
    """The 100-TB cliff probe: 64 docs x 10k tokens. The old nested-filter
    hapax was O(n^2) per row (~100M comparisons/doc here — minutes); the
    sorted-neighbor-diff path is O(n log n) and must clear the corpus in
    seconds. Also cross-checks the hapax count against an exact
    explode+groupBy computation on the same data."""
    n_docs, n_toks = 64, 10_000
    # half the vocabulary appears twice (never hapax), half once (hapax)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_toks - 1)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.when(
                        i < n_toks // 2, (i / 2).cast("int").cast("string")
                    ).otherwise((i - n_toks // 4).cast("string")),
                ),
            ),
        ).alias("text"),
    )
    t0 = time.perf_counter()
    out = textstats.lexical_diversity(docs).collect()
    wall = time.perf_counter() - t0
    assert len(out) == n_docs
    assert wall < 60.0, f"hapax path took {wall:.1f}s on 10k-token docs"

    exact = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("doc_id", "term")
        .count()
        .filter(F.col("count") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hapax"))
        .collect()
    )
    exact_by_id = {r.doc_id: r.n_hapax for r in exact}
    for r in out:
        assert r.hapax_frac == round(
            exact_by_id.get(r.doc_id, 0) / r.n_tokens, 5
        )


def test_bigram_logprob_single_token_and_empty_docs(spark, tmp_path):
    """r14 verdict item 1 pin: a single-token document's forced
    ``slice(toks, 1, 2)`` degenerates to the bare token (no joining space).
    The oracle's ``len(string_split(bg,' ')) = 2`` excludes that doc from
    the output entirely; the Spark filter must too (the r14 rewrite's
    space-edge checks alone let it through latently — sf0.1 happens to
    contain zero single-token docs). Fixture covers: single-token doc,
    empty-text doc, normal docs, and an empty-token edge (double space)."""
    rows = [
        (0, "the cat sat"),
        (1, "solo"),  # single token: must be ABSENT from the output
        (2, ""),  # empty text: split -> [""], degenerate bg "" — absent
        (3, "the cat"),
        (4, "a  b"),  # double space: both slices touch the empty token
        (5, "the cat sat down"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textstats.bigram_logprob(docs).collect()}
    assert set(out) == {0, 3, 5}, sorted(out)
    assert out[0].n_bigrams == 2 and out[3].n_bigrams == 1
    assert out[5].n_bigrams == 3

    # full driver-style compare against the unchanged DuckDB oracle twin
    # on the SAME fixture (the corpus LM counts shift with every doc, so
    # this proves equivalence of the whole query, not just presence)
    p = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
        assert_frames_match(
            textstats.bigram_logprob(docs),
            con,
            textstats.bigram_logprob_sql("documents"),
        )
    finally:
        con.close()
