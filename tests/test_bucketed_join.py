"""Bucketed co-located join: pre-bucketed tables join without a shuffle."""

import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.sinks import write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bkt_a", "k", n_buckets=8, sort_col="k")
    write_bucketed(b, "bkt_b", "k", n_buckets=8, sort_col="k")
    # force the sort-merge path (tiny test tables would otherwise broadcast,
    # which disables bucketed scans entirely)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta = spark.table("bkt_a")
        tb = spark.table("bkt_b")
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: no shuffle on either side
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_unbucketed_join_needs_exchange(spark):
    # control: the same join without bucketing shuffles both sides
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = a.join(b, "k")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
