"""Oracle gates for the four registry entries trimmed in r6.

The r6 twin-trim (see COVERAGE.md "Gate rotation arithmetic") removed four
driver-gated queries whose values are recomputed and re-gated by a surviving
twin (`dedup_lsh_pairs`, `dedup_simhash_pairs`, `text_fingerprint_overlap`,
`decontaminate_benchmark`). This module keeps each trimmed surface under the
SAME driver-style DuckDB compare it had as a registry entry, so the trim
changes gate arithmetic, not coverage.
"""

import pyspark.sql.functions as F

from bigtwine_streamprocessor_spark import registry
from bigtwine_streamprocessor_spark.operators import curation, dedup, textstats
from tests.conftest import assert_frames_match


def test_minhash_signatures_match_oracle(spark, ddb, sf_dir):
    """Trimmed twin of `dedup_lsh_pairs`: the signature stage alone."""
    df = dedup.minhash_signatures(registry._docs(spark, sf_dir)).select(
        "doc_id", F.array_join("sig", ",").alias("sig")
    )
    sql = (
        "WITH " + dedup.minhash_sql().strip()
        + "\nSELECT doc_id, array_to_string(sig, ',') AS sig FROM signatures"
    )
    assert_frames_match(df, ddb, sql)


def test_simhash_signatures_match_oracle(spark, ddb, sf_dir):
    """Trimmed twin of `dedup_simhash_pairs`: the signature stage alone."""
    df = dedup.simhash_signatures(registry._docs(spark, sf_dir))
    sql = (
        "WITH " + dedup.simhash_sql().strip()
        + "\nSELECT doc_id, simhash FROM simhash"
    )
    assert_frames_match(df, ddb, sql)


def test_fingerprints_match_oracle(spark, ddb, sf_dir):
    """Trimmed twin of `text_fingerprint_overlap`: the fingerprint set."""
    df = textstats.fingerprints(registry._docs(spark, sf_dir))
    assert_frames_match(df, ddb, textstats.FINGERPRINTS_SQL)


def test_decontaminate_keep_matches_oracle(spark, ddb, sf_dir):
    """Trimmed complement of `decontaminate_benchmark`: the clean corpus via
    left-anti join — the ACTION path a training run actually reads."""
    docs = registry._docs(spark, sf_dir)
    flagged = curation.decontaminate(docs, registry._benchmark_docs(spark, sf_dir))
    df = docs.join(flagged, "doc_id", "left_anti").select("doc_id")
    sql = """
    WITH flagged AS (
        {}
    )
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = d.doc_id)
    """.format(
        curation.decontaminate_sql("documents", registry._BENCHMARK_SQL).strip()
    )
    assert_frames_match(df, ddb, sql)
