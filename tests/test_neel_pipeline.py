"""Stage-by-stage DuckDB-oracle equivalence for the batch NEEL pipeline."""

import pytest

from bigtwine_streamprocessor_spark import pipeline
from tests.conftest import assert_frames_match

STAGES = ["parsed", "ner", "nel", "resources", "geo", "assembled_flat"]


@pytest.fixture(scope="module")
def stages(spark, sf_dir):
    return pipeline.stages(spark, sf_dir)


@pytest.mark.parametrize("stage", STAGES)
def test_stage_matches_oracle(stages, ddb, stage):
    drop = ["lang", "is_retweet"] if stage == "parsed" else []
    df = stages[stage].drop(*drop)
    sel = None
    if drop:
        cols = ", ".join(df.columns)
        sel = f"SELECT {cols} FROM {stage}"
    assert_frames_match(df, ddb, pipeline.oracle(stage, sel))


def test_assembled_nested_counts(stages):
    """Nested fold keeps one row per parsed tweet; entity counts conserved."""
    flat = stages["assembled_flat"].cache()
    nested = stages["assembled_nested"]
    n_tweets = stages["parsed"].count()
    assert nested.count() == n_tweets
    from pyspark.sql import functions as F

    n_entities_flat = flat.filter(F.col("ent_start").isNotNull()).count()
    n_entities_nested = (
        nested.select(F.sum(F.size("entities")).alias("n")).collect()[0]["n"]
    )
    assert n_entities_flat == n_entities_nested
