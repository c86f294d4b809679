"""Property tests for the corpus-preparation layer (operators/corpus_prep.py).

Oracle equality is covered per-query in tests/test_registry.py; these pin the
semantic invariants the oracle compare can't express (error bounds, quota
arithmetic, batch shapes) plus the zero-exchange plan contract for the
map-only operators.
"""

from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.operators import corpus_prep

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmv_error_bound(spark):
    out = corpus_prep.kmv_distinct_by_source(_docs(spark)).collect()
    assert len(out) > 0
    for r in out:
        # KMV k=128 has ~1/sqrt(k-2) ≈ 9% std error; 3 sigma bound
        assert r.rel_err <= 0.27, (r.source, r.rel_err)
        # a sketch that saw fewer than k distinct values IS exact
        if r.exact_distinct < corpus_prep.KMV_K:
            assert r.kmv_est == float(r.exact_distinct)


def test_paragraph_dedup_invariants(spark):
    docs = _docs(spark)
    out = corpus_prep.paragraph_dedup(docs)
    agg = out.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_chunks").alias("chunks")
    ).collect()[0]
    # every doc survives with between 0 and all of its chunks
    assert out.filter(
        (F.col("n_kept") < 0) | (F.col("n_kept") > F.col("n_chunks"))
    ).count() == 0
    assert out.count() == docs.count()
    # total kept == number of distinct chunks in the corpus (first-occurrence
    # semantics keep exactly one copy of each)
    toks = F.split(F.col("text"), " ")
    nch = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(corpus_prep.CHUNK_WORDS))).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(1), nch),
        lambda i: F.array_join(
            F.slice(toks, (i - 1) * corpus_prep.CHUNK_WORDS + 1,
                    corpus_prep.CHUNK_WORDS),
            " ",
        ),
    )
    distinct_chunks = (
        docs.select(F.explode(chunks).alias("c")).distinct().count()
    )
    assert agg.kept == distinct_chunks
    assert agg.chunks >= agg.kept


def test_mix_quota_counts(spark):
    docs = _docs(spark)
    out = corpus_prep.mix_weighted_quota(docs)
    per = {r.source: r.n for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # quotas are proportional to 1 + id%3 and never exceed the source size
    sizes = {r.source: r.n for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    weights = {s: 1 + int("".join(ch for ch in s if ch.isdigit()) or 0) % 3
               for s in sizes}
    tw = sum(weights.values())
    for s, n in per.items():
        expect = max(int(corpus_prep.MIX_TOTAL * weights[s] / tw), 1)
        assert n == min(expect, sizes[s]), (s, n, expect)
    # ranks within a source are dense from 1
    mx = out.groupBy("source").agg(
        F.max("mix_rank").alias("mx"), F.count("*").alias("n")
    )
    assert mx.filter(F.col("mx") != F.col("n")).count() == 0


def test_bucket_batch_shape(spark):
    out = corpus_prep.bucket_by_length(_docs(spark))
    # every doc fits its bucket, and no smaller bucket would do
    bad = out.filter(F.col("n_tokens") > F.col("bucket")).count()
    assert bad == 0
    assert out.filter(
        (F.col("pos_in_batch") < 0)
        | (F.col("pos_in_batch") >= corpus_prep.BATCH_DOCS)
    ).count() == 0
    # all but the final batch of each bucket are full
    sizes = out.groupBy("bucket", "batch_id").agg(F.count("*").alias("n"))
    last = out.groupBy("bucket").agg(F.max("batch_id").alias("last_batch"))
    partial = (
        sizes.join(last, "bucket")
        .filter(
            (F.col("n") < corpus_prep.BATCH_DOCS)
            & (F.col("batch_id") != F.col("last_batch"))
        )
        .count()
    )
    assert partial == 0


def test_url_audit_rows(spark):
    out = corpus_prep.url_domain_audit(_docs(spark))
    rows = out.collect()
    assert all(r.doc_id % corpus_prep.URL_MOD == 0 for r in rows)
    assert all(r.domain.endswith(".example.com") for r in rows)
    for r in rows:
        site = int(r.domain.split(".")[0].removeprefix("site"))
        assert r.blocked == (site in corpus_prep.BLOCKED_SITES)


def test_projection_shape_and_determinism(spark):
    out = corpus_prep.embedding_random_projection(_emb(spark))
    a = {r.vec_id: r.proj for r in out.collect()}
    b = {r.vec_id: r.proj for r in
         corpus_prep.embedding_random_projection(_emb(spark)).collect()}
    assert a == b
    assert all(len(v.split(",")) == corpus_prep.PROJ_OUT for v in a.values())


def test_map_only_plans(spark):
    """url_domain_audit stays a pinned zero-exchange map-only scan;
    embedding_random_projection's 1024-term fold may additionally carry the
    r15 conditional small-scan spread (ONE round-robin exchange, a no-op at
    real scale — corpus.spread_small_scan; 0.75x co-timed at sf0.1). The
    literal projection matrix itself must never introduce a hash/broadcast
    shuffle or Python eval."""
    plan = (
        corpus_prep.url_domain_audit(_docs(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan

    plan = (
        corpus_prep.embedding_random_projection(_emb(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # AQE prints node + reference
    assert "BatchEvalPython" not in plan, plan


def test_incremental_dedup_matches_oracle(spark, ddb, sf_dir):
    """The on-the-fly incremental scan (DF-capped shingle Jaccard) keeps its
    cross-engine gate here after the r9 registry entry moved to the
    materialized-index scan_delta shape (r8 verdict task 4) — same pairing
    the registry carried through r8."""
    from tests.conftest import assert_frames_match

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = corpus_prep.incremental_dedup(
        corpus_prep.with_seeded_incremental(docs)
    )
    assert_frames_match(got, ddb, corpus_prep.incremental_dedup_sql())


def test_incremental_dedup_finds_seeded_copies(spark):
    corpus = corpus_prep.with_seeded_incremental(_docs(spark))
    out = corpus_prep.incremental_dedup(corpus).collect()
    by_id = {r.doc_id: r for r in out}
    base_ids = [r.doc_id for r in _docs(spark).select("doc_id").collect()]
    # every seeded exact copy is flagged 'exact' pointing at its original
    for d in base_ids:
        if d % corpus_prep.INC_EXACT_MOD == 0:
            r = by_id[d + corpus_prep.INC_EXACT_OFFSET]
            assert r.dup_kind == "exact" and r.match_id == d and r.score == 1.0
    # every seeded near copy is flagged (near) at high Jaccard against its
    # original — unless its original is so short the appended suffix
    # dominates; the synthetic corpus has no such docs at this SF
    for d in base_ids:
        if d % corpus_prep.INC_NEAR_MOD == 0:
            r = by_id.get(d + corpus_prep.INC_NEAR_OFFSET)
            assert r is not None and r.dup_kind == "near"
            assert r.match_id == d and r.score >= corpus_prep.INC_JACCARD_MIN
    # nothing else is flagged: word-salad originals don't collide
    flagged = set(by_id)
    seeded = {
        d + corpus_prep.INC_EXACT_OFFSET
        for d in base_ids if d % corpus_prep.INC_EXACT_MOD == 0
    } | {
        d + corpus_prep.INC_NEAR_OFFSET
        for d in base_ids if d % corpus_prep.INC_NEAR_MOD == 0
    }
    assert flagged <= seeded


def test_quality_sigmoid_bounds(spark):
    out = corpus_prep.quality_sigmoid_score(_docs(spark))
    assert out.filter("score < 0.0 OR score > 1.0").count() == 0
    n_pass = out.filter("passes").count()
    assert 0 < n_pass < out.count()  # the weights split the corpus


# ---------------------------------------------------------------------------
# Property tests: hypothesis drives tiny random corpora, a brute-force Python
# reference checks the distributed answers exactly
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "y"])
_text = st.lists(_word, min_size=1, max_size=40).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=20))
def test_paragraph_dedup_matches_bruteforce(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.text_kept)
        for r in corpus_prep.paragraph_dedup(docs, chunk_words=4).collect()
    }
    # brute force: first global occurrence of each 4-word chunk survives
    seen: set[str] = set()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        chunks = [
            " ".join(toks[j: j + 4]) for j in range(0, max(len(toks), 1), 4)
        ]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        want = (len(chunks), len(kept), " ".join(kept))
        assert got[i] == want, (i, got[i], want)


@settings(max_examples=5, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=50), min_size=1,
                   max_size=12)
)
def test_bucket_by_length_matches_bruteforce(spark, sizes):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.bucket, r.batch_id, r.pos_in_batch)
        for r in corpus_prep.bucket_by_length(docs).collect()
    }
    buckets: dict[int, list[int]] = {}
    for i, n in enumerate(sizes):
        b = next(
            (bb for bb in corpus_prep.LEN_BOUNDS if n <= bb),
            corpus_prep.LEN_OVERFLOW,
        )
        buckets.setdefault(b, []).append(i)
    for b, ids in buckets.items():
        for rank, i in enumerate(sorted(ids)):
            want = (b, rank // corpus_prep.BATCH_DOCS,
                    rank % corpus_prep.BATCH_DOCS)
            assert got[i] == want, (i, got[i], want)


def test_countmin_overestimate_invariant(spark):
    out = corpus_prep.countmin_topterms(_docs(spark)).collect()
    assert len(out) == corpus_prep.CMS_TOP
    for r in out:
        assert r.cms_est >= r.exact_n  # CMS never underestimates
        assert r.overest == r.cms_est - r.exact_n


def test_curriculum_budget_and_order(spark):
    out = corpus_prep.curriculum_token_budget(_docs(spark)).collect()
    assert out, "budget selects something"
    assert max(r.cum_tokens for r in out) <= corpus_prep.CURR_BUDGET
    # cum_tokens is the running sum in (score desc, doc_id) order
    ordered = sorted(out, key=lambda r: (-r.score, r.doc_id))
    run = 0
    for r in ordered:
        run += r.n_tokens
        assert r.cum_tokens == run
    # nothing selectable was skipped: every unselected doc would overflow
    scored = corpus_prep.quality_sigmoid_score(_docs(spark)).collect()
    sel = {r.doc_id for r in out}
    # the selection is a prefix of the global quality order
    boundary = max((-r.score, r.doc_id) for r in ordered)
    for s in scored:
        if (-s.score, s.doc_id) < boundary:
            assert s.doc_id in sel


def test_streaming_quality_sigmoid_matches_batch(spark, tmp_path):
    """quality_sigmoid_score is map-only, so it runs unchanged on a
    streaming DataFrame; the streamed result equals the batch result."""
    docs = _docs(spark)
    d = str(tmp_path / "docs")
    docs.write.parquet(d)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(d)
    )
    out = corpus_prep.quality_sigmoid_score(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("qs_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.score, r.passes)
        for r in spark.sql("SELECT * FROM qs_stream").collect()
    }
    want = {
        (r.doc_id, r.score, r.passes)
        for r in corpus_prep.quality_sigmoid_score(docs).collect()
    }
    assert got == want


def test_streaming_incremental_exact_dedup(spark, tmp_path):
    """The exact pass of incremental dedup as a STREAM-STATIC join: a stream
    of incoming docs joins the static corpus digest table and flags the
    seeded duplicates — the shape an ingestion pipeline actually runs
    (static side broadcast-refreshed per batch, stream side append-only)."""
    from pyspark.sql import functions as F

    docs = _docs(spark)
    corpus = corpus_prep.with_seeded_incremental(docs)
    incoming = corpus.filter(
        F.col("doc_id") >= corpus_prep.INC_EXACT_OFFSET
    )
    d = str(tmp_path / "incoming")
    incoming.write.parquet(d)

    existing_digests = (
        corpus.filter(F.col("doc_id") < corpus_prep.INC_EXACT_OFFSET)
        .select(F.col("doc_id").alias("ex_id"), F.md5("text").alias("h"))
    )
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(d)
    )
    flagged = (
        stream.withColumn("h", F.md5("text"))
        .join(existing_digests, "h")
        .select("doc_id", "ex_id")
    )
    q = (
        flagged.writeStream.format("memory")
        .queryName("inc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.ex_id)
        for r in spark.sql("SELECT * FROM inc_stream").collect()
    }
    want = {
        (d + corpus_prep.INC_EXACT_OFFSET, d)
        for (d,) in docs.select("doc_id").collect()
        if d % corpus_prep.INC_EXACT_MOD == 0
    }
    assert got == want


def test_kmv_matches_hashlib_bruteforce(spark):
    """The KMV estimate equals a pure-Python hashlib reference exactly —
    pinning the conv()-based hash prefix and estimator arithmetic against a
    third independent implementation (Spark, DuckDB, and hashlib must all
    agree bit-for-bit)."""
    import hashlib

    docs = _docs(spark)
    rows = docs.select("source", "text").collect()
    by_source: dict[str, set] = {}
    for r in rows:
        by_source.setdefault(r.source, set()).update(r.text.split(" "))
    k, space = corpus_prep.KMV_K, 16**corpus_prep.KMV_HEX
    want = {}
    for s, toks in by_source.items():
        hs = sorted(
            int(hashlib.md5(t.encode()).hexdigest()[: corpus_prep.KMV_HEX], 16)
            for t in toks
        )
        if len(hs) < k:
            est = float(len(hs))
        else:
            hk = float(hs[k - 1])
            est = round((k - 1) * float(space) / hk, 2)
        want[s] = (est, len(hs))
    got = {
        r.source: (r.kmv_est, r.exact_distinct)
        for r in corpus_prep.kmv_distinct_by_source(docs).collect()
    }
    assert got == want


def test_countmin_matches_hashlib_bruteforce(spark):
    """Count-Min cells and estimates equal a pure-Python reference using the
    same single-md5 disjoint-substring row hashes."""
    import hashlib
    from collections import Counter

    docs = _docs(spark)
    toks = []
    for r in docs.select("text").collect():
        toks.extend(r.text.split(" "))
    exact = Counter(toks)
    d_rows, w = corpus_prep.CMS_D, corpus_prep.CMS_W
    cells: dict[tuple, int] = {}
    buckets: dict[tuple, int] = {}
    for t, n in exact.items():
        h = hashlib.md5(t.encode()).hexdigest()
        for d in range(d_rows):
            b = int(h[6 * d : 6 * d + 6], 16) % w
            buckets[(t, d)] = b
            cells[(d, b)] = cells.get((d, b), 0) + n
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: corpus_prep.CMS_TOP]
    want = {
        t: (n, min(cells[(d, buckets[(t, d)])] for d in range(d_rows)))
        for t, n in top
    }
    got = {
        r.tok: (r.exact_n, r.cms_est)
        for r in corpus_prep.countmin_topterms(docs).collect()
    }
    assert got == want


def test_projection_preserves_similarity_structure(spark):
    """Johnson-Lindenstrauss sanity for the 64->16 sign projection: cosine
    is preserved in EXPECTATION (mean over the LSH near-dup pairs within
    0.05 of the original mean) and pairwise cosines correlate positively
    over random pairs. Individual pairs scatter ~1/sqrt(16) — that's
    inherent to 16 dims, not a defect. Deterministic: fixed matrix, fixed
    rng seed."""
    import numpy as np

    from bigtwine_streamprocessor_spark.operators import similarity

    emb = _emb(spark)
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    proj = {r.vec_id: np.array([float(x) for x in r.proj.split(",")])
            for r in corpus_prep.embedding_random_projection(emb).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    pairs = [(r.doc_a, r.doc_b)
             for r in similarity.embedding_neardup_pairs(emb, 0.2, n_bits=8)
             .collect()]
    orig = [cos(vecs[a], vecs[b]) for a, b in pairs]
    pj = [cos(proj[a], proj[b]) for a, b in pairs]
    assert abs(sum(orig) / len(orig) - sum(pj) / len(pj)) < 0.05

    rng = np.random.default_rng(0)
    ids = list(vecs)
    rand = [(ids[i], ids[j])
            for i, j in rng.integers(0, len(ids), (300, 2)) if i != j]
    ro = np.array([cos(vecs[a], vecs[b]) for a, b in rand])
    rp = np.array([cos(proj[a], proj[b]) for a, b in rand])
    assert float(np.corrcoef(ro, rp)[0, 1]) > 0.3


def test_chunker_linear_on_long_docs(spark):
    """A 10k-token document chunks in linear time with the expected count —
    no quadratic cliff in the sliding-window explode (bounded fan-out
    ceil((n-W)/S)+1)."""
    import time


    long_doc = spark.createDataFrame(
        [(1, " ".join(f"w{i % 97}" for i in range(10_000)))],
        "doc_id long, text string",
    )
    t0 = time.perf_counter()
    from bigtwine_streamprocessor_spark.registry import CHUNK_S, CHUNK_W
    toks = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - CHUNK_W) / F.lit(float(CHUNK_S))).cast("bigint")
        + 1,
        F.lit(1).cast("bigint"),
    )
    got = long_doc.select(n_chunks.alias("n")).collect()[0].n
    import math
    assert got == math.ceil((10_000 - CHUNK_W) / CHUNK_S) + 1
    # paragraph dedup on the same doc stays fast (linear chunking)
    out = corpus_prep.paragraph_dedup(
        long_doc.withColumn("text", F.col("text"))
    ).collect()
    assert out[0].n_chunks == math.ceil(10_000 / corpus_prep.CHUNK_WORDS)
    assert time.perf_counter() - t0 < 30


def test_event_analytics_invariants(spark):
    """Invariants the oracle compare can't express for the event-analytics
    closers: funnel counts are monotone non-increasing, SCD2 intervals are
    well-ordered and non-overlapping per user, transition probabilities sum
    to ~1 per source state, and retention week-0 counts every cohort
    member."""
    from bigtwine_streamprocessor_spark import registry

    sf = SF
    funnel = {
        r.step: r.users
        for r in registry.QUERIES["agg_funnel_steps"](spark, sf).collect()
    }
    assert funnel["view"] >= funnel["view>click"] >= funnel["view>click>purchase"]
    assert funnel["view>click>purchase"] >= 0

    hist = registry.QUERIES["scd2_user_history"](spark, sf).collect()
    by_user: dict = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append((r.valid_from, r.valid_to))
    for user, iv in by_user.items():
        iv.sort()
        opens = [a for a, b in iv if b is None]
        assert len(opens) == 1, f"user {user}: exactly one current row"
        for (a1, b1), (a2, _) in zip(iv, iv[1:]):
            assert b1 is not None, f"user {user}: open interval not last"
            assert a1 <= b1 and b1 == a2  # contiguous, non-overlapping

    trans = registry.QUERIES["agg_event_transitions"](spark, sf).collect()
    from collections import defaultdict
    psum = defaultdict(float)
    for r in trans:
        assert 0.0 <= r.p <= 1.0
        psum[r.from_type] += r.p
    for ft, s in psum.items():
        assert abs(s - 1.0) < 1e-4, (ft, s)

    ret = registry.QUERIES["agg_retention_cohorts"](spark, sf).collect()
    week0 = {r.cohort_week: r.active_users for r in ret if r.week_n == 0}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sum(week0.values()) == n_users  # every user is in their cohort's week 0
