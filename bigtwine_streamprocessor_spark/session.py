"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` in one JVM; the configs below are chosen so the
same logical plans scale to a real cluster: AQE on (runtime coalesce + skew-join
handling), shuffle partitions sized to cores locally (override via
``spark.sql.shuffle.partitions`` on a cluster), Arrow enabled for every
pandas-UDF hop, and UTC session time so results are comparable against the
DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bigtwine-streamprocessor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool = False,
    rocksdb_changelog: bool = False,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` (default 32) sizes local parallelism; on a real
    cluster pass ``master=None`` and let spark-submit decide.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 default, pinned EXPLICITLY: the LSH plane dots index a
        # literal sign array with element_at and rely on ANSI to fail loudly
        # on out-of-range dims; with ANSI off, element_at returns NULL and
        # every vector silently collapses into bucket 0 (O(n^2) candidate
        # blowup + silent engine/oracle divergence). similarity._bucketed
        # carries its own config-proof width guard for sessions built
        # outside this factory (e.g. the external driver's).
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) which Spark rejects
        # by default; read as long and convert in load_events().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        # Cap plan EXPLAIN strings: AQE re-renders the plan string on every
        # runtime re-plan, and operators with wide unrolled expression trees
        # (64-dim LSH hyperplanes, 12-perm minhash) can make that string
        # large enough to dominate driver heap. 8 MB keeps plans debuggable
        # while bounding the cost. (Execution is unaffected — only toString.)
        .config("spark.sql.maxPlanStringLength", str(8 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if rocksdb_state:
        # RocksDB state store: keeps fan-in state off-heap and spillable so
        # per-key streaming state scales past executor memory (SURVEY.md §4.2
        # rebuild consequence). In-memory provider (default) is fine for tests.
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        if rocksdb_changelog:
            # Changelog checkpointing: per-batch deltas to the checkpoint
            # instead of full SST snapshots — the restart-recovery knob the
            # r11 ~455-470 s/M-keys SLO was measured WITHOUT (r11 verdict
            # task 5 measures the delta; see PERF.md recovery curve).
            builder = builder.config(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                "true",
            )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_events(spark: SparkSession, sf_dir: str):
    """events.parquet with its timestamp normalized to TimestampType.

    Generations of the testdata have stored ``ts`` as TIMESTAMP(NANOS) (which
    ``nanosAsLong`` surfaces as nanos-since-epoch bigint) or as un-annotated
    micros (which Spark reads as TIMESTAMP_NTZ). Both normalize to plain
    TimestampType here. The NTZ->TIMESTAMP cast is value-stable ONLY under a
    UTC session timezone, and this function may be called with an arbitrary
    caller-provided session (outside get_spark's pinning), so the timezone is
    pinned here too rather than assumed.
    """
    from pyspark.sql import functions as F

    # pin (don't assume) UTC: a non-UTC JVM default would silently shift
    # every event timestamp during the NTZ cast below
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver-generated parquet tables as a dict of DataFrames."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {
        n: (load_events(spark, sf_dir) if n == "events"
            else spark.read.parquet(f"{sf_dir}/{n}.parquet"))
        for n in names
    }
