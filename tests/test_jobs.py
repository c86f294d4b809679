"""End-to-end job CLI tests (subprocess — the real surface)."""

import glob
import json
import subprocess
import sys

import pytest

REPO = "/root/repo"


def _make_fixture(spark, tmp_path, n=40):
    from bigtwine_streamprocessor_spark import corpus

    tw = corpus.tweets_df(spark, "/root/testdata/sf0.001").limit(n)
    (
        tw.select(
            "id", "text", "user__id", "user__name", "user__screen_name",
            "user__location",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("sep", "\t")
        .csv(str(tmp_path / "dataset"))
    )
    return str(tmp_path / "dataset")


def _run(mod, *args):
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


@pytest.mark.slow
def test_batch_job_and_exports(spark, tmp_path):
    ds = _make_fixture(spark, tmp_path)
    results = str(tmp_path / "results")
    r = _run(
        "bigtwine_streamprocessor_spark.jobs.twitter_stream_job",
        "--job-id", "t1", "--analysis-id", "a-test",
        "--dataset-path", ds, "--output-path", results, "--mode", "batch",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = []
    for f in glob.glob(f"{results}/part-*"):
        lines += [json.loads(x) for x in open(f) if x.strip()]
    assert len(lines) > 0
    assert all(d["analysisId"] == "a-test" for d in lines)

    out = str(tmp_path / "exp")
    r = _run(
        "bigtwine_streamprocessor_spark.jobs.export_results_job",
        "--job-id", "e1", "--analysis-id", "a-test",
        "--input-path", results, "--output-path", out,
        "--format", "twitter-neel-challenge",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    (csv_file,) = glob.glob(f"{out}/part-*.csv")
    rows = open(csv_file).read().splitlines()
    assert len(rows) > 0
    assert all(len(x.split("\t")) == 6 for x in rows)


def test_input_selector_validation():
    r = _run(
        "bigtwine_streamprocessor_spark.jobs.twitter_stream_job",
        "--job-id", "t2", "--analysis-id", "a", "--output-path", "/tmp/x",
    )
    assert r.returncode == 2
    assert "exactly one" in r.stderr
