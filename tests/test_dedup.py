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
