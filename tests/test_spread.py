"""corpus.spread_small_scan: the scale-adaptive parallelism floor applied
inside the per-row-expensive chains (r15). The contract that makes it safe
at every scale: a frame already at or above the cluster's parallelism (the
real-deployment case) passes through UNTOUCHED; a single-partition frame
(the local single-row-group scan) spreads to defaultParallelism; rows are
preserved exactly; streaming frames are never touched (repartition of a
micro-batch source would be wrong and is unnecessary)."""

from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.corpus import spread_small_scan


def test_spread_noop_when_already_parallel(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(10_000).repartition(target)
    out = spread_small_scan(df)
    assert out is df, "already-parallel frames must pass through untouched"


def test_spread_single_partition_frame(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(5_000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread_small_scan(df)
    assert out.rdd.getNumPartitions() == target
    # rows preserved exactly (round-robin moves rows, never drops/dups)
    assert out.count() == 5_000
    assert out.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]


def test_spread_leaves_streaming_frames_alone(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "a.json").write_text('{"v": 1}\n')
    stream = spark.readStream.schema("v long").json(str(indir))
    assert spread_small_scan(stream) is stream
