"""P1 tweet parse + validity filtering, and the small predicate library.

Reference semantics (SURVEY.md §2.3 P1, §2.4 F1-F7):

* drop unparseable tweets, ``id <= 0``, empty text, and retweets when
  ``twitter-skip-retweets`` is set — `TwitterStreamJob.java:211-225`;
* language filtering is server-side on the Twitter endpoint
  (`FilterableTwitterEndpointInitializer.java:38-54`) — here a client-side
  ``filter`` with identical semantics;
* ``statusHasUserLocation``: user location non-null, trimmed length >= 2 —
  `TwitterNeelUtils.java:23-28`;
* ``linkedTweetHasLinks``: any entity with a non-null link —
  `TwitterNeelUtils.java:9-21`.

All of these are pure Column predicates: Catalyst pushes them into the parquet
scan (verify with ``.explain`` -> PushedFilters), so at 100 TB the invalid rows
are dropped before they ever reach the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import TWITTER_STATUS


def is_valid_tweet(
    id_col: str = "id",
    text_col: str = "text",
    retweet_col: str = "is_retweet",
    skip_retweets: bool = False,
) -> Column:
    """F1: parse-validity predicate (`TwitterStreamJob.java:215-218`)."""
    # try_cast: non-numeric ids are *dropped*, not errors — the reference
    # swallows the parse exception and skips the record
    # (`TwitterStreamJob.java:211-214`); plain cast would throw under ANSI.
    pred = (
        F.col(id_col).isNotNull()
        & (F.col(id_col).try_cast("long") > 0)
        & F.col(text_col).isNotNull()
        & (F.col(text_col) != "")
    )
    if skip_retweets:
        pred = pred & ~F.coalesce(F.col(retweet_col), F.lit(False))
    return pred


def parse_tweets(
    df: DataFrame,
    skip_retweets: bool = False,
    languages: Sequence[str] | None = None,
) -> DataFrame:
    """P1: validity filter + optional language filter on a tweet-shaped frame.

    Note: tweet id 0 is dropped (``id <= 0`` rule) exactly like the reference.
    """
    out = df.filter(is_valid_tweet(skip_retweets=skip_retweets))
    if languages:
        out = out.filter(F.col("lang").isin(list(languages)))
    return out


def parse_tweet_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """P1 for raw JSON input: ``from_json`` + drop unparseable (null) rows.

    The reference catches the twitter4j parse exception and drops the record
    (`TwitterStreamJob.java:211-214`); ``from_json`` returns null for
    malformed input, so the filter reproduces drop-malformed semantics.
    """
    parsed = df.select(F.from_json(F.col(json_col), TWITTER_STATUS).alias("status"))
    return parsed.filter(
        F.col("status").isNotNull()
        & (F.col("status.id").try_cast("long") > 0)
        & (F.col("status.text") != "")
    )


def has_user_location(location_col: str = "user__location") -> Column:
    """F5 `statusHasUserLocation` (`TwitterNeelUtils.java:23-28`)."""
    c = F.col(location_col)
    return c.isNotNull() & (F.length(F.trim(c)) >= 2)


def linked_tweet_has_links(entities_col: str = "entities") -> Column:
    """F3 `linkedTweetHasLinks` (`TwitterNeelUtils.java:9-17`)."""
    return F.exists(F.col(entities_col), lambda e: e["link"].isNotNull())


# SQL twins (DuckDB) for the oracle — same constants, same semantics.
PARSE_FILTER_SQL = (
    "id IS NOT NULL AND TRY_CAST(id AS BIGINT) > 0 "
    "AND text IS NOT NULL AND text <> '' AND NOT is_retweet"
)
HAS_LOCATION_SQL = "user__location IS NOT NULL AND length(trim(user__location)) >= 2"
