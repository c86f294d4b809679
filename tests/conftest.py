"""Shared pytest fixtures: one SparkSession per test run, a DuckDB connection
with the testdata tables registered as views, and a driver-style comparator
(sort columns by name, compare row multisets)."""

from __future__ import annotations

import glob
import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from bigtwine_streamprocessor_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def assert_frames_match(spark_df, ddb_con, sql, check_cols=True):
    """Driver-style compare: column names (sorted), row count, row multiset."""
    oracle = ddb_con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    if check_cols:
        assert sorted(s_cols) == sorted(o_cols), (sorted(s_cols), sorted(o_cols))
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_set = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in s_rows), key=repr
    )
    o_set = sorted(
        (tuple(_norm(r[i]) for i in o_idx) for r in o_rows), key=repr
    )
    assert len(s_set) == len(o_set), f"row count: spark={len(s_set)} oracle={len(o_set)}"
    for a, b in zip(s_set, o_set):
        assert a == b, f"row mismatch:\n spark  ={a}\n oracle ={b}"
