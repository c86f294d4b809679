"""Materialized dedup signature index: at 100 TB the per-batch dedup scan
must be O(delta), so corpus signatures are ingest-time state. Pins:
(1) append == full rebuild for every index table; (2) appends under a
missing/mismatched sketch-parameter sidecar fail loudly; (3) the scan's
exact matches equal the oracle-gated ``incremental_dedup``'s exact rows;
(4) band candidates equal the oracle-gated ``lsh_candidate_pairs``
restricted to cross (existing, delta) pairs; (5) the full scan matches a
from-scratch DuckDB twin; (6) compaction shrinks files without changing
scan results."""

import json

import pytest
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.operators import (
    corpus_prep,
    dedup,
    dedup_index,
)
from tests.conftest import assert_frames_match

OFFSET = corpus_prep.INC_EXACT_OFFSET

# the seeded incoming batch, as SQL over the documents view (mirrors
# corpus_prep.with_seeded_incremental's >= OFFSET half)
DELTA_SQL = f"""(
SELECT doc_id + {corpus_prep.INC_EXACT_OFFSET} AS doc_id, text
FROM documents WHERE doc_id % {corpus_prep.INC_EXACT_MOD} = 0
UNION ALL
SELECT doc_id + {corpus_prep.INC_NEAR_OFFSET} AS doc_id,
       text || '{corpus_prep.INC_NEAR_SUFFIX}' AS text
FROM documents WHERE doc_id % {corpus_prep.INC_NEAR_MOD} = 0
)"""


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )


@pytest.fixture(scope="module")
def delta(docs):
    return (
        corpus_prep.with_seeded_incremental(docs)
        .filter(F.col("doc_id") >= OFFSET)
        .cache()
    )


def _rows(df):
    return sorted(
        (tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in df.collect()),
        key=repr,
    )


def test_append_equals_rebuild(spark, docs, delta, tmp_path):
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    dedup_index.build_dedup_index(half, inc)
    dedup_index.append_dedup_index(rest, inc)
    dedup_index.build_dedup_index(docs, full)
    got = dedup_index.read_dedup_index(spark, inc)
    want = dedup_index.read_dedup_index(spark, full)
    for name in ("digests", "sigs", "bands"):
        assert _rows(got[name]) == _rows(want[name]), name
    # the sidecar survives the append
    meta = dedup_index.read_index_meta(spark, inc)
    assert meta == dedup_index._index_meta_dict()


def test_append_guards(spark, docs, tmp_path):
    bare = str(tmp_path / "bare")
    with pytest.raises(ValueError, match="no _index_meta"):
        dedup_index.append_dedup_index(docs, bare)
    built = str(tmp_path / "built")
    dedup_index.build_dedup_index(docs.limit(10), built)
    dedup_index._write_index_meta(
        spark, built, {**dedup_index._index_meta_dict(), "k": 99}
    )
    with pytest.raises(ValueError, match="sketch parameters"):
        dedup_index.append_dedup_index(docs, built)


@pytest.fixture(scope="module")
def index_path(docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dedup_idx") / "idx")
    dedup_index.build_dedup_index(docs, path)
    return path


def test_scan_exact_matches_incremental(spark, docs, delta, index_path):
    got = {
        (r["doc_id"], r["match_id"])
        for r in dedup_index.scan_delta(delta, index_path)
        .filter(F.col("dup_kind") == "exact")
        .collect()
    }
    want = {
        (r["doc_id"], r["match_id"])
        for r in corpus_prep.incremental_dedup(
            corpus_prep.with_seeded_incremental(docs)
        )
        .filter(F.col("dup_kind") == "exact")
        .collect()
    }
    assert got == want and got


def test_candidates_match_lsh_pairs(spark, docs, delta, index_path):
    idx = dedup_index.read_dedup_index(spark, index_path)
    d_bands = dedup.signature_bands(dedup.minhash_signatures(delta))
    got = {
        (r["ex_id"], r["doc_id"])
        for r in dedup_index._delta_candidates(idx["bands"], d_bands).collect()
    }
    seeded = docs.unionByName(delta)
    pairs = dedup.lsh_candidate_pairs(seeded)
    # cross pairs only: existing ids all sit below the delta offset, so
    # doc_a (the smaller) is the existing side whenever the pair crosses
    want = {
        (r["doc_a"], r["doc_b"])
        for r in pairs.filter(
            (F.col("doc_a") < OFFSET) & (F.col("doc_b") >= OFFSET)
        ).collect()
    }
    assert got == want and got


def test_scan_matches_oracle(delta, index_path, ddb):
    got = dedup_index.scan_delta(delta, index_path)
    assert_frames_match(
        got, ddb, dedup_index.scan_delta_sql("documents", DELTA_SQL)
    )


def test_stats_and_compact_preserve_scan(spark, docs, delta, tmp_path):
    path = str(tmp_path / "idx")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    dedup_index.build_dedup_index(half, path, n_files=4)
    dedup_index.append_dedup_index(rest, path)
    stats = dedup_index.dedup_index_stats(spark, path)
    assert stats["n_docs"] == docs.count()
    assert stats["n_band_rows"] == docs.count() * dedup.LSH_BANDS
    assert stats["max_bucket"] >= 1 and stats["skew"] >= 1.0
    before = _rows(dedup_index.scan_delta(delta, path))
    report = dedup_index.compact_dedup_index(spark, path, n_files=2)
    assert report["files_after"] < report["files_before"]
    assert _rows(dedup_index.scan_delta(delta, path)) == before


def test_job_cli_roundtrip(spark, docs, delta, tmp_path, sf_dir, capsys):
    from bigtwine_streamprocessor_spark.jobs import build_dedup_index_job

    idx = str(tmp_path / "idx")
    delta_pq = str(tmp_path / "delta.parquet")
    delta.write.parquet(delta_pq)

    build_dedup_index_job.run(
        ["--documents-path", f"{sf_dir}/documents.parquet",
         "--output-path", idx]
    )
    build = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert build["n_docs"] == docs.count()

    scan = build_dedup_index_job.run(
        ["--op", "scan", "--documents-path", delta_pq, "--output-path", idx]
    )
    assert scan["exact"] > 0 and scan["delta_docs"] == delta.count()

    append = build_dedup_index_job.run(
        ["--op", "append", "--documents-path", delta_pq, "--output-path", idx]
    )
    assert append["appended"] == delta.count()
    stats = build_dedup_index_job.run(["--op", "stats", "--output-path", idx])
    assert stats["n_docs"] == docs.count() + delta.count()
