"""Tokenizer seam: column tokenizers stay JVM-side, kernels swap in
without changing operator shape, real-BPE paths are import-gated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.operators import curation, tokenize
from bigtwine_streamprocessor_spark.operators.corpus_prep import (
    curriculum_token_budget,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "web", "alpha beta gamma"),
            (2, "web", "one two"),
            (3, "books", "x " * 9 + "end"),
            (4, "books", None),
        ],
        "doc_id bigint, source string, text string",
    )


def test_whitespace_counts_and_stays_jvm_side(spark):
    df = tokenize.with_n_tokens(_docs(spark), "whitespace")
    got = {r["doc_id"]: r["n_tokens"] for r in df.collect()}
    assert got[1] == 3 and got[2] == 2 and got[3] == 10
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "BatchEvalPython" not in plan


def test_regex_tokenizer_matches_textstats_pattern(spark):
    df = tokenize.with_n_tokens(_docs(spark), "regex")
    got = {r["doc_id"]: r["n_tokens"] for r in df.collect()}
    assert got[1] == 3 and got[2] == 2


def test_registered_kernel_runs_via_arrow_batches(spark):
    # deterministic fake BPE: ceil(len/4) per text — proves the mapInPandas
    # plumbing (schema append, batch shape, null handling) without the lib
    tokenize.register_tokenizer(
        "fake-bpe", lambda: (lambda texts: [(len(t) + 3) // 4 for t in texts])
    )
    df = tokenize.with_n_tokens(_docs(spark), "fake-bpe")
    assert df.schema["n_tokens"].dataType.simpleString() == "bigint"
    got = {r["doc_id"]: r["n_tokens"] for r in df.collect()}
    assert got[1] == (len("alpha beta gamma") + 3) // 4
    assert got[4] == 0  # null text -> ""
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" in plan  # Arrow batch path, not row-at-a-time Python


def test_pack_sequences_accepts_kernel_tokenizer(spark):
    tokenize.register_tokenizer(
        "fake-bpe", lambda: (lambda texts: [(len(t) + 3) // 4 for t in texts])
    )
    default = curation.pack_sequences(_docs(spark), window=8)
    bpe = curation.pack_sequences(_docs(spark), window=8, tokenizer="fake-bpe")
    assert default.columns == bpe.columns
    # whitespace default is unchanged in behavior
    d = {r["doc_id"]: r["n_tokens"] for r in default.collect()}
    assert d[1] == 3
    b = {r["doc_id"]: r["n_tokens"] for r in bpe.collect()}
    assert b[1] == 4  # 16 chars -> 4 fake-BPE tokens
    # packing invariant holds under any tokenizer: offsets stay in-window
    assert all(0 <= r["block_offset"] < 8 for r in bpe.collect())


def test_curriculum_accepts_kernel_tokenizer(spark):
    tokenize.register_tokenizer(
        "fake-bpe", lambda: (lambda texts: [(len(t) + 3) // 4 for t in texts])
    )
    docs = _docs(spark).filter(F.col("text").isNotNull())
    out = curriculum_token_budget(docs, budget=10_000, tokenizer="fake-bpe")
    rows = out.collect()
    assert rows  # selection still produces rows
    assert {c for c in out.columns} == {
        "doc_id", "score", "n_tokens", "cum_tokens"
    }
    # cum_tokens is the running sum of the KERNEL counts
    total = sum(r["n_tokens"] for r in rows)
    assert max(r["cum_tokens"] for r in rows) == total


def test_unknown_tokenizer_fails_loudly(spark):
    with pytest.raises(ValueError, match="unknown tokenizer"):
        tokenize.with_n_tokens(_docs(spark), "nope")


def test_tiktoken_kernel(spark):
    """Always-run both-branch contract (r13 env-pin): with tiktoken
    installed the kernel produces BPE subword counts; without it the gate
    reports unavailable and selecting the kernel fails loudly. Suite pass
    count is identical in both environments."""
    if tokenize.available("tiktoken"):
        df = tokenize.with_n_tokens(_docs(spark), "tiktoken")
        got = {r["doc_id"]: r["n_tokens"] for r in df.collect()}
        assert got[1] >= 3  # subword count of a 3-word text
    else:
        with pytest.raises(Exception):
            tokenize.with_n_tokens(_docs(spark), "tiktoken").collect()
