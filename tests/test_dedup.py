"""Dedup operator gates beyond the DuckDB oracles: banded SimHash must find
near-dup pairs at Hamming distance 1-3 (the round-1 whole-signature collision
join only ever found distance 0)."""

from bigtwine_streamprocessor_spark.operators import dedup


def _ham(bands_a, bands_b):
    return sum(bin(x ^ y).count("1") for x, y in zip(bands_a, bands_b))


def test_simhash_banded_finds_hamming_1_to_3(spark):
    # 10 (base, near-dup) pairs: the near-dup appends one token, perturbing a
    # few majority votes -> small nonzero Hamming distance. All deterministic
    # (md5), so the fixture's distances are fixed.
    rows = []
    for i in range(10):
        toks = [f"w{i}_{t}" for t in range(100)]
        rows.append((2 * i, " ".join(toks)))
        rows.append((2 * i + 1, " ".join(toks + ["extra"])))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    sb = {r["doc_id"]: list(r["bands"]) for r in dedup.simhash_bands(docs).collect()}
    target = {
        (2 * i, 2 * i + 1): _ham(sb[2 * i], sb[2 * i + 1])
        for i in range(10)
        if 1 <= _ham(sb[2 * i], sb[2 * i + 1]) <= 3
    }
    assert len(target) >= 2, f"fixture should yield Hamming 1-3 pairs, got {target}"

    found = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs(docs).collect()
    }
    for pair, d in target.items():
        assert found.get(pair) == d, f"pair {pair} at Hamming {d} missed: {found}"


def test_simhash_pairs_complete_within_radius(spark):
    """Every pair with true 64-bit Hamming <= 3 must appear (pigeonhole over
    the 4 bands); pairs beyond the radius must be filtered out."""
    rows = []
    for i in range(6):
        toks = [f"v{i}_{t}" for t in range(60)]
        rows.append((3 * i, " ".join(toks)))
        rows.append((3 * i + 1, " ".join(toks + ["x"])))
        rows.append((3 * i + 2, " ".join(toks[30:] + [f"q{t}" for t in range(30)])))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    sb = {r["doc_id"]: list(r["bands"]) for r in dedup.simhash_bands(docs).collect()}
    ids = sorted(sb)
    truth = {
        (a, b): _ham(sb[a], sb[b])
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if _ham(sb[a], sb[b]) <= dedup.SIMHASH_HAMMING_T
    }
    found = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs(docs).collect()
    }
    assert found == truth


def test_lsh_sigs_seam_matches_default_path(spark, sf_dir):
    """The 100 TB reuse seam (`lsh_candidate_pairs(sigs=...)`): a caller
    that materializes the MinHash signatures once and passes them in must
    get EXACTLY the default path's candidate set (r10 verdict task 4 — the
    seam was shipped untested)."""
    from bigtwine_streamprocessor_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    default = {tuple(r) for r in dedup.lsh_candidate_pairs(docs).collect()}
    sigs = dedup.minhash_signatures(docs).persist()
    try:
        sigs.count()  # materialize before probing, the cluster-caller shape
        via_seam = {
            tuple(r)
            for r in dedup.lsh_candidate_pairs(docs, sigs=sigs).collect()
        }
    finally:
        sigs.unpersist()
    assert via_seam == default
    assert len(default) > 0, "fixture produced no candidate pairs"


def test_ngram_jaccard_cands_seam_matches_default_path(spark, sf_dir):
    """`ngram_jaccard_pairs(cands=...)` — same reuse contract: a persisted
    candidate frame yields byte-identical scored pairs."""
    from bigtwine_streamprocessor_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    default = {tuple(r) for r in dedup.ngram_jaccard_pairs(docs, 0.5).collect()}
    cands = dedup.lsh_candidate_pairs(docs).persist()
    try:
        cands.count()
        via_seam = {
            tuple(r)
            for r in dedup.ngram_jaccard_pairs(docs, 0.5, cands=cands).collect()
        }
    finally:
        cands.unpersist()
    assert via_seam == default


def test_minhash_estimate_seams_match_default_path(spark, sf_dir):
    """`minhash_estimate_pairs(sigs=..., cands=...)` — the composed reuse
    shape (one persisted signature frame feeding every consumer) must be
    value-identical to the default recompute-per-consumer path."""
    from bigtwine_streamprocessor_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    default = {tuple(r) for r in dedup.minhash_estimate_pairs(docs).collect()}
    sigs = dedup.minhash_signatures(docs).persist()
    cands = dedup.lsh_candidate_pairs(docs, sigs=sigs).persist()
    try:
        sigs.count(), cands.count()
        via_seam = {
            tuple(r)
            for r in dedup.minhash_estimate_pairs(
                docs, sigs=sigs, cands=cands
            ).collect()
        }
    finally:
        cands.unpersist()
        sigs.unpersist()
    assert via_seam == default
    assert len(default) > 0
