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

    # K4 terminal hop: the job uploads through the GridFS seam (fake bucket
    # injected in a subprocess — pymongo isn't in this image) with the
    # reference's metadata/filename/header/progress contract.
    out2 = str(tmp_path / "exp2")
    code = f"""
import json, sys
sys.path.insert(0, {REPO!r})
from bigtwine_streamprocessor_spark.jobs import export_results_job as j

class FakeStream:
    def __init__(self, store):
        self.store = store
        self.buf = b""
    def write(self, b):
        self.buf += b
    def close(self):
        self.store["content"] = self.buf.decode()

class FakeBucket:
    def __init__(self, store):
        self.store = store
    def open_upload_stream_with_id(self, fid, fname, metadata=None):
        self.store.update(file_id=str(fid), filename=fname, metadata=metadata)
        return FakeStream(self.store)

store, progress = {{}}, []
j.run(
    ["--job-id", "e2", "--analysis-id", "a-test",
     "--input-path", {results!r}, "--output-path", {out2!r},
     "--format", "tsv", "--document-id", "doc-42"],
    bucket_factory=lambda: FakeBucket(store),
    progress_cb=lambda p, done: progress.append((p, done)),
)
print("GRIDFS_RESULT " + json.dumps(dict(
    filename=store["filename"], metadata=store["metadata"],
    file_id=store["file_id"], header=store["content"].splitlines()[0],
    n_lines=len(store["content"].splitlines()), final=progress[-1],
)))
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    (res_line,) = [
        ln for ln in r.stdout.splitlines() if ln.startswith("GRIDFS_RESULT ")
    ]
    got = json.loads(res_line.removeprefix("GRIDFS_RESULT "))
    assert got["filename"] == "output-a-test.tsv"
    assert got["metadata"] == {
        "analysisid": "a-test", "doctype": "results-export", "format": "tsv",
    }
    assert got["file_id"] == "doc-42"
    assert got["header"].startswith("status__id")  # header line first
    (csv2,) = glob.glob(f"{out2}/part-*.csv")
    assert got["n_lines"] == len(open(csv2).read().splitlines())
    assert got["final"] == [1.0, True]


def test_input_selector_validation():
    r = _run(
        "bigtwine_streamprocessor_spark.jobs.twitter_stream_job",
        "--job-id", "t2", "--analysis-id", "a", "--output-path", "/tmp/x",
    )
    assert r.returncode == 2
    assert "exactly one" in r.stderr
