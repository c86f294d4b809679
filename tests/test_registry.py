"""Pre-flight for the driver contract: every registered query runs, and every
query with an oracle matches it under the driver-style compare."""

import pytest

from bigtwine_streamprocessor_spark import registry
from tests.conftest import assert_frames_match

ORACLE_KEYS = sorted(registry.ORACLES)
ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert_frames_match(df, ddb, registry.ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    assert out.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
