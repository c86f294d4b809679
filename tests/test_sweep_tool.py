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
