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


# ------------------------------------------------------------- as-of join


def test_asof_join_backward(spark):
    from bigdatalog_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 5, "c"), (2, 50, "d")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 60, 300.0)],
        "k long, t long, v double",
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="t")
    got = {tuple(r) for r in out.collect()}
    # a@10 -> right@10 (inclusive); b@25 -> right@20; c@5 -> none; d@50 -> none
    assert got == {
        (1, 10, "a", 10, 100.0),
        (1, 25, "b", 20, 200.0),
        (1, 5, "c", None, None),
        (2, 50, "d", None, None),
    }


def test_asof_join_forward(spark):
    from bigdatalog_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 21, "b")], "k long, t long, name string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0)], "k long, t long, v double"
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t", direction="forward"
    )
    got = {tuple(r) for r in out.collect()}
    # a@10 -> right@10 (inclusive, nearest ahead); b@21 -> none
    assert got == {(1, 10, "a", 10, 100.0), (1, 21, "b", None, None)}


def test_asof_join_matches_naive(spark):
    """Randomized: window formulation == naive per-row max-≤ subquery."""
    from bigdatalog_spark.operators.joins import asof_join

    left = spark.range(200).select(
        (F.col("id") % 7).alias("k"),
        ((F.col("id") * 37) % 101).alias("t"),
        F.col("id").alias("lid"),
    )
    right = spark.range(60).select(
        (F.col("id") % 7).alias("k"),
        ((F.col("id") * 13) % 97).alias("t"),
        (F.col("id") * 1.5).alias("v"),
    ).groupBy("k", "t").agg(F.max("v").alias("v"))  # unique (k,t)
    got = sorted(
        tuple(r)
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t"
        ).collect()
    )
    # naive: join all right with rt <= lt, keep the max rt per left row
    from pyspark.sql import Window

    j = left.join(
        right.select(
            F.col("k").alias("rk"), F.col("t").alias("rt"), F.col("v")
        ),
        on=[F.col("k") == F.col("rk"), F.col("t") >= F.col("rt")],
        how="left",
    )
    w = Window.partitionBy("k", "t", "lid").orderBy(F.col("rt").desc())
    want = sorted(
        tuple(r)
        for r in j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("k", "t", "lid", F.col("rt").alias("t_right"), "v")
        .collect()
    )
    assert got == want


# ------------------------------------------------------------- range join


def test_range_join_matches_naive(spark):
    from bigdatalog_spark.operators.joins import range_join

    points = spark.range(300).select(
        F.col("id").alias("pid"), ((F.col("id") * 17) % 250 - 50).alias("x")
    )
    intervals = spark.range(40).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 11) % 200 - 30).alias("lo"),
    ).withColumn("hi", F.col("lo") + (F.col("iid") % 25))
    got = sorted(
        tuple(r)
        for r in range_join(
            points, intervals, "x", "lo", "hi", bucket_width=16.0
        ).select("pid", "iid").collect()
    )
    want = sorted(
        tuple(r)
        for r in points.crossJoin(intervals)
        .where((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .select("pid", "iid")
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_range_join_with_keys(spark):
    from bigdatalog_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(1, 5.0), (1, 15.0), (2, 5.0)], "g long, x double"
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 10.0, 20.0)], "g long, lo double, hi double"
    )
    out = range_join(points, intervals, "x", "lo", "hi", 8.0, on="g")
    got = {tuple(r) for r in out.select("g", "x").collect()}
    assert got == {(1, 5.0)}
