"""GridFS upload sink — the K4 terminal hop from local file to Mongo.

The engine assembles the single ordered export file with Spark
(``export.write_single_file``); this thin layer streams that file into Mongo
GridFS with the exact contract of `GridFSOutputFormat.java:169-183`:

* metadata ``{analysisid, doctype: "results-export", format}`` (`:170-173`);
* filename ``output-<analysisId>.<extension>`` (`:179-181`);
* upload stream keyed by the job's documentId (`:178`);
* records stream with a trailing EOL each, header first (`:185-195`);
* a progress callback per record, final call flagged complete (`:199-205`,
  ``HeartbeatSender`` semantics).

pymongo ships no client in this image, so the bucket is an injected
dependency: ``make_pymongo_bucket_factory`` import-gates the real client and
tests drive the identical code path with an in-memory fake. The upload is a
driver-side stream of ONE already-assembled file — the parallel work (sort,
format, single-file assembly) happened in Spark before this point.
"""

from __future__ import annotations

import glob
import os

# extension per export format (`ExportResultsJob.java:140-158` file naming)
EXTENSIONS = {
    "twitter-neel-challenge": "tsv",
    "tsv": "tsv",
    "json": "json",
    "twitter-neel-dataset": "tsv",
}


def make_pymongo_bucket_factory(uri: str, db: str):
    """Import-gated real GridFS bucket (absent client lib -> clear error)."""

    def factory():
        try:
            from gridfs import GridFSBucket  # type: ignore[import-not-found]
            from pymongo import MongoClient  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - no pymongo in sandbox
            raise ImportError(
                "pymongo is not available; inject a bucket factory"
            ) from e
        return GridFSBucket(MongoClient(uri)[db])

    return factory


def upload_lines(
    bucket,
    lines,
    analysis_id: str,
    document_id,
    fmt: str,
    progress_cb=None,
    total: int | None = None,
) -> int:
    """Stream lines into a GridFS upload stream under the reference's
    metadata/filename contract. Returns the record count written."""
    metadata = {
        "analysisid": analysis_id,
        "doctype": "results-export",
        "format": fmt,
    }
    filename = f"output-{analysis_id}.{EXTENSIONS.get(fmt, 'txt')}"
    stream = bucket.open_upload_stream_with_id(
        document_id, filename, metadata=metadata
    )
    written = 0
    try:
        for ln in lines:
            stream.write(ln.encode("utf-8"))
            stream.write(b"\n")
            written += 1
            if progress_cb is not None and total:
                progress_cb(written / total, written == total)
    finally:
        stream.close()
    return written


def upload_export_dir(
    bucket,
    out_dir: str,
    analysis_id: str,
    document_id,
    fmt: str,
    progress_cb=None,
) -> int:
    """Upload the single part file produced by write_single_file /
    write_single_text_file (header already first in the file)."""
    parts = sorted(
        glob.glob(os.path.join(out_dir, "part-*.csv"))
        + glob.glob(os.path.join(out_dir, "part-*.txt"))
    )
    if len(parts) != 1:
        raise FileNotFoundError(
            f"expected exactly one part file in {out_dir}, found {parts}"
        )
    with open(parts[0]) as f:
        lines = [ln for ln in f.read().splitlines()]
    return upload_lines(
        bucket,
        lines,
        analysis_id,
        document_id,
        fmt,
        progress_cb=progress_cb,
        total=len(lines),
    )
