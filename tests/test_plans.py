"""Physical-plan audit: every registry query must be free of the two scale
anti-patterns Catalyst can't save you from — unconditioned cartesian products
and row-at-a-time Python UDFs (BatchEvalPython). Arrow-batched Pandas
operators (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas) are the
sanctioned Python escape hatch and stay allowed. Also pins that the parse
filter reaches the parquet scan as a pushed filter."""

import pytest

from bigtwine_streamprocessor_spark import registry

# queries whose plan is expensive to build repeatedly but structurally
# identical to a cheaper sibling already covered
_SKIP = set()


def _plan(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_scale_antipatterns_in_plan(spark, sf_dir, name):
    if name in _SKIP:
        pytest.skip("covered by sibling")
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name}: unconditioned cross join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_parse_filter_pushdown(spark, sf_dir):
    """The tweet-validity scan must push its filters into the parquet reader
    (PushedFilters non-empty) and prune to the referenced columns."""
    from bigtwine_streamprocessor_spark import corpus
    from bigtwine_streamprocessor_spark.operators.parse import parse_tweets

    plan = (
        parse_tweets(corpus.tweets_df(spark, sf_dir), skip_retweets=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan
