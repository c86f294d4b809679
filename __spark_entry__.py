"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship NEEL assembly at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions) for the driver's
DuckDB-oracle correctness harness. Implementations live in
``bigtwine_streamprocessor_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigtwine_streamprocessor_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full batch NEEL assembly on /root/testdata/sf0.001."""
    return registry.QUERIES["neel_assembled"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
