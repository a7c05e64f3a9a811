"""Scale-join utilities: salted skew join correctness, bucketed-table
exchange elimination."""

import pyspark.sql.functions as F
import pytest

from bigdatalog_spark.operators.joins import salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # 90% of left rows share one hot key — the salted join must still
    # produce exactly the plain join's result
    left = spark.range(1000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    want = sorted(tuple(r) for r in left.join(right, "k").collect())
    got = sorted(
        tuple(r) for r in salted_join(left, right, "k", salt=8).collect()
    )
    assert got == want


def test_salted_join_left_outer(spark):
    left = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("lv"))
    right = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("rv"))
    want = sorted(tuple(r) for r in left.join(right, "k", "left").collect())
    got = sorted(
        tuple(r) for r in salted_join(left, right, "k", salt=4, how="left").collect()
    )
    assert got == want


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("a"))
    b = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 5).alias("b"))
    try:
        write_bucketed(a, "bucketed_a", ["k"], num_buckets=8)
        write_bucketed(b, "bucketed_b", ["k"], num_buckets=8)
        joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed scan-to-scan join: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 10_000
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")
