"""Sampling operators: deterministic portability + wall-clock cap property."""

import time

from bigtwine_streamprocessor_spark.operators import sampling


def test_deterministic_sample_matches_oracle(spark, ddb, sf_dir):
    from tests.conftest import assert_frames_match

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "cast(doc_id as string) as id", "text"
    )
    df = sampling.deterministic_sample(docs, "id", 5)
    assert_frames_match(
        df,
        ddb,
        "SELECT CAST(doc_id AS VARCHAR) AS id, text FROM documents "
        "WHERE " + sampling.sample_sql("CAST(doc_id AS VARCHAR)", 5),
    )


def test_rate_limit_caps_throughput(spark):
    df = spark.range(0, 100_000, 1, 1).selectExpr("id", "cast(id as string) s")
    t0 = time.monotonic()
    out = sampling.rate_limit_per_partition(df, max_rows_per_second=200.0)
    n = out.count()
    elapsed = max(time.monotonic() - t0, 0.05)
    # single partition: emitted rows may never exceed rate * elapsed (+1 burst)
    assert n <= 200.0 * elapsed + 32
    assert n >= 1
