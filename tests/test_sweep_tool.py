"""The sweep script's union-find scale oracle must agree with the registered
recursive-CTE oracle.

`scripts/oracle_sweep.py` substitutes an algorithmically independent oracle
(DuckDB pair list + Python union-find) for the two embedding-cluster queries
at scale, because the registered single-statement transitive closure has an
O(component_size^2) working table (intractable against the sf1 giant
component; see PERF.md "FULL-registry sf1 oracle sweep"). This pins the two
oracles to the same answer where both are tractable, so a future edit to
either side can't silently fork the contract. DuckDB-only — no Spark.
"""

import importlib.util
import os

import duckdb

from bigtwine_streamprocessor_spark import registry

_SWEEP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "oracle_sweep.py",
)


def _load_sweep():
    spec = importlib.util.spec_from_file_location("oracle_sweep", _SWEEP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    return con


def test_scale_oracle_matches_recursive_oracle(sf_dir):
    sweep = _load_sweep()
    con = _con(sf_dir)
    cols, rows = sweep.SCALE_ORACLES["dedup_embedding_clusters"](con)
    cur = con.execute(registry.ORACLES["dedup_embedding_clusters"])
    ref_cols = [d[0] for d in cur.description]
    ref_rows = sorted(cur.fetchall())
    assert cols == ref_cols
    assert sorted(rows) == ref_rows
    assert len(rows) > 0  # the seeded corpus must actually produce clusters


def test_semantic_keep_scale_oracle_matches(sf_dir):
    sweep = _load_sweep()
    con = _con(sf_dir)
    cols, rows = sweep.SCALE_ORACLES["dedup_semantic_keep"](con)
    cur = con.execute(registry.ORACLES["dedup_semantic_keep"])
    ref_cols = [d[0] for d in cur.description]
    ref_rows = sorted(cur.fetchall())
    assert cols == ref_cols
    assert sorted(rows) == ref_rows


def test_text_clusters_scale_oracle_matches(sf_dir):
    """dedup_clusters' union-find twin == the recursive-CTE oracle where
    the recursion is tractable (gate scale)."""
    sweep = _load_sweep()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    cols, rows = sweep.SCALE_ORACLES["dedup_clusters"](con)
    cur = con.execute(registry.ORACLES["dedup_clusters"])
    ref_cols = [d[0] for d in cur.description]
    ref_rows = sorted(cur.fetchall())
    assert cols == ref_cols
    assert sorted(rows) == ref_rows
    assert len(rows) > 0


def test_duck_hex60_equals_python_hex_parse():
    """The generated strpos polynomial must parse 60-bit md5 prefixes
    exactly like Python's int(hex, 16) — the Spark side uses conv()."""
    sweep = _load_sweep()
    con = duckdb.connect()
    rows = con.execute(
        "SELECT s, " + sweep._duck_hex60("md5(s)") + ", md5(s) "
        "FROM (SELECT CAST(range AS VARCHAR) AS s FROM range(200))"
    ).fetchall()
    for s, got, h in rows:
        assert int(got) == int(h[:15], 16), s


def test_canon_expr_cross_engine_string_parity():
    """Each type class canonicalizes to the IDENTICAL string on both
    engines for representative values incl. NULL/NaN/inf and negatives."""
    sweep = _load_sweep()
    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE t AS SELECT * FROM (VALUES
          (1::BIGINT, 1.25::DOUBLE, TRUE,  'a',
           TIMESTAMP '2020-01-02 03:04:05.123456'),
          (-7, -0.0000005, FALSE, NULL, NULL),
          (NULL, CAST('nan' AS DOUBLE), NULL, 'x y', NULL),
          (0, CAST('inf' AS DOUBLE), TRUE, '', NULL),
          (42, CAST('-inf' AS DOUBLE), FALSE, 'z', NULL)
        ) v(i, d, b, s, ts)
        """
    )
    duck_exprs = {
        "i": sweep._canon_expr("i", "int", "duck"),
        "d": sweep._canon_expr("d", "float", "duck"),
        "b": sweep._canon_expr("b", "bool", "duck"),
        "s": sweep._canon_expr("s", "str", "duck"),
        "ts": sweep._canon_expr("ts", "ts", "duck"),
    }
    duck = con.execute(
        "SELECT " + ", ".join(duck_exprs.values()) + " FROM t"
    ).fetchall()
    # expected canonical strings, hand-derived from the contract
    NULL = sweep._NULL
    assert duck[0] == ("1", "1250000", "1", "a", "1577934245123456")
    # -5e-7 * 1e6 = -0.5; +0.5 -> 0.0; floor -> 0 (half-toward-+inf, the
    # repo-wide fp.rd convention — same expression on the Spark side)
    assert duck[1] == ("-7", "0", "0", NULL, NULL)
    assert duck[2] == (NULL, "NaN", NULL, "x y", NULL)
    assert duck[3] == ("0", "Inf", "1", "", NULL)
    assert duck[4] == ("42", "-Inf", "0", "z", NULL)


def test_canon_py_matches_canon_expr_strings():
    """_canon_py (callable scale-oracle rows) must emit byte-identical
    strings to the _canon_expr SQL for every type class — the r7 ADVICE
    gap where callable oracles canonicalized everything as str(int(v))."""
    from datetime import datetime, timezone

    sweep = _load_sweep()
    NULL = sweep._NULL
    ts = datetime(2020, 1, 2, 3, 4, 5, 123456, tzinfo=timezone.utc)
    cases = [
        # (value, class, expected — mirrors the duck rows in the test above)
        (1, "int", "1"),
        (-7, "int", "-7"),
        (None, "int", NULL),
        (1.25, "float", "1250000"),
        (-0.0000005, "float", "0"),
        (float("nan"), "float", "NaN"),
        (float("inf"), "float", "Inf"),
        (float("-inf"), "float", "-Inf"),
        (True, "bool", "1"),
        (False, "bool", "0"),
        (None, "bool", NULL),
        ("a", "str", "a"),
        ("x y", "str", "x y"),
        ("", "str", ""),
        (None, "str", NULL),
        (ts, "ts", "1577934245123456"),
        (ts.replace(tzinfo=None), "ts", "1577934245123456"),  # naive = UTC
        (None, "ts", NULL),
    ]
    for v, cls, want in cases:
        assert sweep._canon_py(v, cls) == want, (v, cls)


def test_py_duck_type_inference():
    sweep = _load_sweep()
    rows = [(None, None, None), (True, 3, None), (False, 7, 1.5)]
    assert sweep._py_duck_type(rows, 0, "BIGINT") == "BOOLEAN"  # bool not int
    assert sweep._py_duck_type(rows, 1, "BIGINT") == "BIGINT"
    assert sweep._py_duck_type(rows, 2, "BIGINT") == "DOUBLE"
    assert sweep._py_duck_type(rows, 2, "VARCHAR") != "VARCHAR"  # found a value
    assert sweep._py_duck_type([(None,)], 0, "VARCHAR") == "VARCHAR"  # all-None


def test_build_slice_is_deterministic_and_symlinks_rest(sf_dir):
    """--sample-mod materializes doc_id/vec_id % M slices of the corpus
    tables and symlinks everything else, so both engines read the identical
    slice through their normal paths (the sf10 sampled-oracle mode)."""
    sweep = _load_sweep()
    con = duckdb.connect()
    out = sweep.build_slice(con, sf_dir, 2)
    assert os.path.basename(out).startswith("sweep_slice_m2_")
    n_full = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    sliced = con.execute(
        f"SELECT count(*), count(*) FILTER (doc_id % 2 != 0) "
        f"FROM '{out}/documents.parquet'"
    ).fetchone()
    want = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id % 2 = 0"
    ).fetchone()[0]
    assert sliced == (want, 0) and 0 < want < n_full
    # embeddings: %mod rows PLUS the full fixed query window vec_id <
    # N_QUERIES — a bare %64 slice left similarity_ivf_topk checking 1 of
    # 20 query vectors at 640x (r11 thin-out caveat)
    from bigtwine_streamprocessor_spark.operators import similarity

    nq = similarity.N_QUERIES
    off_mod, window = con.execute(
        f"SELECT count(*) FILTER (vec_id % 2 != 0 AND vec_id >= {nq}), "
        f"count(*) FILTER (vec_id < {nq}) "
        f"FROM '{out}/embeddings.parquet'"
    ).fetchone()
    assert off_mod == 0 and window == nq
    # non-corpus tables are symlinks to the source (no copy at sf10)
    assert os.path.islink(f"{out}/lineitem.parquet")
    assert (
        con.execute(f"SELECT count(*) FROM '{out}/region.parquet'").fetchone()
        == con.execute(f"SELECT count(*) FROM '{sf_dir}/region.parquet'").fetchone()
    )
    # per-process scratch: a second build never collides with the first
    # (fixed /tmp names were pre-creatable and raced concurrent sweeps)
    out2 = sweep.build_slice(con, sf_dir, 2)
    assert out2 != out
    assert (
        con.execute(f"SELECT count(*) FROM '{out2}/documents.parquet'").fetchone()
        == con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()
    )


# --- r13: auto-sized oracle memory + chunk-decomposed gap-fill oracle -------


def test_resolve_ddb_memory_override_wins(tmp_path):
    sweep = _load_sweep()
    assert sweep.resolve_ddb_memory("90GB", meminfo_path="/nonexistent") == "90GB"


def test_resolve_ddb_memory_from_meminfo(tmp_path):
    sweep = _load_sweep()
    mi = tmp_path / "meminfo"
    # 128 GiB total, 120 GiB available (values in kB, /proc/meminfo format)
    mi.write_text(
        "MemTotal:       134217728 kB\n"
        "MemFree:        100000000 kB\n"
        "MemAvailable:   125829120 kB\n"
    )
    # 120 - 1.3*48 - 6 = 51.6 -> 51GB
    got = sweep.resolve_ddb_memory(None, meminfo_path=str(mi), jvm_heap="48g")
    assert got == "51GB"
    # default 8g heap: 120 - 10.4 - 6 = 103.6 -> 103GB
    got = sweep.resolve_ddb_memory(None, meminfo_path=str(mi), jvm_heap="8g")
    assert got == "103GB"


def test_resolve_ddb_memory_floors_and_falls_back(tmp_path):
    sweep = _load_sweep()
    mi = tmp_path / "meminfo"
    mi.write_text("MemTotal: 16777216 kB\nMemAvailable: 8388608 kB\n")
    # 8 - 1.3*8 - 6 < 0 -> floor at 8GB (spill to disk, never refuse)
    assert sweep.resolve_ddb_memory(None, str(mi), "8g") == "8GB"
    # unreadable meminfo -> the old constant
    assert sweep.resolve_ddb_memory(None, "/nonexistent/meminfo") == "24GB"
    # MemAvailable absent -> MemTotal
    mi.write_text("MemTotal: 134217728 kB\n")
    assert sweep.resolve_ddb_memory(None, str(mi), "8g") == "111GB"


def test_parse_size_gb_units():
    sweep = _load_sweep()
    assert sweep._parse_size_gb("48g") == 48.0
    assert sweep._parse_size_gb("90GB") == 90.0
    assert sweep._parse_size_gb("512m") == 0.5
    assert sweep._parse_size_gb(str(2**30)) == 1.0


def _events_con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return con


def test_chunked_gap_fill_oracle_equals_single_shot(sf_dir):
    """The chunk decomposition must be value-identical to the registered
    single-shot statement — rows (full-compare path) AND the summed
    (count, commutative-hash) scalars (hash-compare path)."""
    sweep = _load_sweep()
    oracle = sweep.SCALE_ORACLES["events_gap_fill"]
    assert isinstance(oracle, sweep.ChunkedOracle)
    oracle._src_dir = sf_dir
    oracle.bytes_per_chunk = 1  # force the 64-chunk ceiling on tiny input
    n = oracle.n_chunks()
    assert n > 1

    con = _events_con(sf_dir)
    cur = con.execute(registry.ORACLES["events_gap_fill"])
    ref_cols = [d[0] for d in cur.description]
    ref_rows = sorted(cur.fetchall())

    cols, rows = oracle(con)
    assert cols == ref_cols
    assert sorted(rows) == ref_rows
    assert len(rows) > 0

    # hash-path equivalence: chunk scalars sum to the single-shot scalars
    d_types = {
        r[0]: r[1]
        for r in con.execute(
            "DESCRIBE SELECT * FROM ("
            + registry.ORACLES["events_gap_fill"] + ")"
        ).fetchall()
    }
    classes = {c: sweep._type_class(d_types[c], d_types[c]) for c in ref_cols}
    single = sweep._duck_hash_scalars(
        con, registry.ORACLES["events_gap_fill"], ref_cols, classes
    )
    total_n = total_h = 0
    for i in range(n):
        cn, ch = sweep._duck_hash_scalars(
            con, oracle.chunk_sql(i, n), ref_cols, classes
        )
        total_n += cn
        total_h += ch
    assert (total_n, total_h) == single


def test_chunked_oracle_requires_table_reference():
    sweep = _load_sweep()
    import pytest

    with pytest.raises(ValueError, match="never reads"):
        sweep.ChunkedOracle("SELECT 1", "events", "user_id")


def test_chunked_oracle_rejects_aliased_and_prefix_tables():
    """The slice rewrite adds its own alias, so an aliased reference
    ('FROM events e' -> double alias) must be rejected at construction,
    and a name that merely extends the token ('events_x') must neither
    satisfy nor be mangled by the rewrite (advisor r13)."""
    sweep = _load_sweep()
    import pytest

    with pytest.raises(ValueError, match="aliases"):
        sweep.ChunkedOracle(
            "SELECT e.user_id FROM events e", "events", "user_id"
        )
    with pytest.raises(ValueError, match="aliases"):
        sweep.ChunkedOracle(
            "SELECT x.user_id FROM events AS x", "events", "user_id"
        )
    # a prefix-extending table name is NOT a reference to `events`
    with pytest.raises(ValueError, match="never reads"):
        sweep.ChunkedOracle(
            "SELECT user_id FROM events_x", "events", "user_id"
        )
    # keywords after the table are fine, and the rewrite is word-bounded:
    # the events_x reference survives untouched
    oracle = sweep.ChunkedOracle(
        "SELECT user_id FROM events WHERE user_id IN "
        "(SELECT user_id FROM events_x) GROUP BY user_id",
        "events",
        "user_id",
    )
    sliced = oracle.chunk_sql(1, 4)
    assert "FROM events_x)" in sliced
    assert "WHERE user_id % 4 = 1) events" in sliced
