"""Tweet dump utility (lifecycle `TwitterStreamDump.main`, SURVEY.md §3.3).

Replay tweet-JSON -> parse -> project (id, newline-stripped text, user id,
user screenName) (P13, `TwitterStreamDump.java:50-66`) -> single TSV file
(K5, `:68-70`).
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from ..operators import export
from ..operators.parse import parse_tweet_json
from ..session import get_spark


def run(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="stream-dump-job")
    p.add_argument("--tweet-json-path", required=True)
    p.add_argument("--output-path", required=True)
    p.add_argument("--terms", default=None, help="comma-separated track terms")
    p.add_argument("--lang", default=None)
    args = p.parse_args(argv)

    spark = get_spark(app_name="stream-dump")
    parsed = parse_tweet_json(
        spark.read.schema("value STRING").text(args.tweet_json_path)
    )
    if args.terms:
        from ..sources.streams import term_filter

        parsed = parsed.filter(term_filter(args.terms.split(","), "status.text"))
    if args.lang:
        parsed = parsed.filter(F.col("status.lang").isin(args.lang.split(",")))

    dump = parsed.select(
        F.col("status.id").alias("id"),
        F.regexp_replace(F.col("status.text"), "[\\n\\r]", "").alias("text"),
        F.col("status.user.id").alias("user__id"),
        F.col("status.user.screenName").alias("user__screen_name"),
    )
    export.write_single_file(dump, args.output_path, ["id"])
    print(f"dumped={spark.read.option('header', True).option('sep', chr(9)).csv(args.output_path).count()}")
    spark.stop()


if __name__ == "__main__":
    run()
