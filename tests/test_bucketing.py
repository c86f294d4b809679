"""Bucketed co-located joins: writing both fact tables bucketed on the join
key lets the sort-merge join read them shuffle-free — the storage-layout
lever for repeated 100 TB joins (vs paying an exchange per query)."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.slow
def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # warehouse.dir is a static conf on a shared session; give the database
    # its own location under tmp instead
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS buckets LOCATION '{tmp_path / 'wh'}'"
    )
    try:
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("buckets.orders_b")
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("buckets.lineitem_b")
        )
        ob = spark.table("buckets.orders_b")
        lb = spark.table("buckets.lineitem_b")

        # at test scale the projected side fits under the broadcast
        # threshold; disable it so the plan exercises the bucketed
        # sort-merge path a 100 TB fact-fact join would take
        prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
                "o_orderpriority"
            ).agg(F.count(F.lit(1)).alias("n"))

            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        assert "SortMergeJoin" in plan
        # the join itself must not exchange either bucketed side: the only
        # allowed exchange is the post-join aggregation's
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, (
            "bucketed join should read both sides co-located:\n" + plan
        )

        # and it must still be correct
        want = {
            r["o_orderpriority"]: r["n"]
            for r in orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
        assert got == want
    finally:
        spark.sql("DROP DATABASE IF EXISTS buckets CASCADE")
