"""Export format oracle tests + single-file write contract."""

import glob

from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark import pipeline
from bigtwine_streamprocessor_spark.operators import export
from tests.conftest import assert_frames_match

PD = "2026-01-01T00:00:00Z"


def test_challenge_rows(spark, ddb, sf_dir):
    flat = pipeline.stages(spark, sf_dir)["assembled_flat"]
    df = export.challenge_rows(flat)
    sql = (
        pipeline.with_clause("assembled_flat")
        + ",\n"
        + export.CHALLENGE_SQL.strip().rstrip(",")
        + "\nSELECT * FROM challenge"
    )
    assert_frames_match(df, ddb, sql)


def test_extended_rows(spark, ddb, sf_dir):
    flat = pipeline.stages(spark, sf_dir)["assembled_flat"]
    df = export.extended_rows(flat, PD)
    sql = (
        pipeline.with_clause("assembled_flat")
        + ",\n"
        + export.extended_sql(PD).strip().rstrip(",")
        + "\nSELECT * FROM extended"
    )
    assert_frames_match(df, ddb, sql)


def test_dataset_rows(spark, ddb, sf_dir):
    flat = pipeline.stages(spark, sf_dir)["assembled_flat"]
    df = export.dataset_rows(flat)
    sql = (
        pipeline.with_clause("assembled_flat")
        + ",\n"
        + export.DATASET_SQL.strip().rstrip(",")
        + "\nSELECT * FROM dataset"
    )
    assert_frames_match(df, ddb, sql)


def test_json_rows_parse_back(spark, sf_dir):
    st = pipeline.stages(spark, sf_dir)
    js = export.json_rows(st["assembled_nested"], "analysis-1", PD)
    n = js.count()
    assert n == st["parsed"].count()
    parsed_back = spark.read.json(js.rdd.map(lambda r: r["json"]))
    assert parsed_back.filter(F.col("analysisId") != "analysis-1").count() == 0
    assert "payload" in parsed_back.columns


def test_json_string_escaping_parity(spark, ddb):
    """Control chars (< 0x20), quotes and backslashes must escape to VALID
    single-line JSON, byte-identically on the Spark and DuckDB sides (the
    hash gate compares bytes; a raw newline would also split the line)."""
    import json

    nasty = [
        "line\nbreak",
        "tab\there and cr\rthere",
        'quote"back\\slash',
        "ctrl\x01\x08\x0c\x1fend",
        "plain",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in nasty], "s string")
    got = [
        r["j"]
        for r in df.coalesce(1)
        .select(export._j_str(F.col("s")).alias("j"))
        .collect()
    ]
    for s, j in zip(nasty, got):
        assert "\n" not in j and "\r" not in j, "must stay one physical line"
        assert json.loads(j) == s, "escape must round-trip the exact value"
    oracle = [
        ddb.execute(
            f"SELECT {export._j_str_sql('s')} AS j FROM (SELECT ?::VARCHAR AS s)",
            [s],
        ).fetchone()[0]
        for s in nasty
    ]
    assert got == oracle


def test_single_file_write(spark, sf_dir, tmp_path):
    flat = pipeline.stages(spark, sf_dir)["assembled_flat"]
    df = export.challenge_rows(flat)
    out = str(tmp_path / "challenge")
    export.write_single_file(df, out, order_by=["tweet_id", "pos_start"])
    files = glob.glob(f"{out}/part-*.csv")
    assert len(files) == 1, "single ordered file expected"
    with open(files[0]) as f:
        lines = f.read().splitlines()
    assert lines[0].split("\t")[0] == "tweet_id"  # header first
    assert len(lines) == df.count() + 1


def test_json_canonical_matches_production_tojson(spark, sf_dir):
    """The oracle-gated canonical JSON lines and the production to_json path
    must parse to identical objects (after stripping the nulls that to_json
    omits by default)."""
    import json

    st = pipeline.stages(spark, sf_dir)
    prod = {
        json.loads(r["json"])["payload"]["status"]["id"]: json.loads(r["json"])
        for r in export.json_rows(st["assembled_nested"], "a-1", PD).collect()
    }
    canon = {
        json.loads(r["json"])["payload"]["status"]["id"]: json.loads(r["json"])
        for r in export.json_rows_canonical(st["assembled_flat"], "a-1", PD).collect()
    }

    def strip_nulls(o):
        if isinstance(o, dict):
            return {k: strip_nulls(v) for k, v in o.items() if v is not None}
        if isinstance(o, list):
            return [strip_nulls(v) for v in o]
        return o

    assert set(prod) == set(canon)
    for tid in prod:
        assert strip_nulls(prod[tid]) == strip_nulls(canon[tid]), f"tweet {tid}"


def test_tsv_writer_header_row_order_and_null_pin(spark, tmp_path):
    """P12 (`ResultRowToCsvMapper.java:14-60`, `ExportResultsJob.java:132-139`):
    byte-level pin of the TSV surface — caller's column order, nulls print
    empty, header first, data rows in order_by order, single file."""
    from bigtwine_streamprocessor_spark.operators import export

    df = spark.createDataFrame(
        [(3, None, 2.5), (1, "a", None), (2, "b", 0.125)],
        "id INT, v STRING, x DOUBLE",
    )
    # to_tsv_lines: column order is the caller's, nulls -> empty string
    lines = sorted(
        r["line"] for r in export.to_tsv_lines(df, ["x", "id", "v"]).collect()
    )
    assert lines == ["\t1\ta", "0.125\t2\tb", "2.5\t3\t"]

    out = str(tmp_path / "pin")
    export.write_single_file(df, out, order_by=["id"])
    files = glob.glob(f"{out}/part-*.csv")
    assert len(files) == 1
    with open(files[0]) as f:
        got = f.read().splitlines()
    assert got == [
        "id\tv\tx",
        "1\ta\t",
        "2\tb\t0.125",
        "3\t\t2.5",
    ]
