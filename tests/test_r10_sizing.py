"""Pins for the round-10 continuation optimizations.

Covers the operator internals those optimizations changed:
* the null side store is a PERSISTED filter over the live sealed segment
  (no own checkpoint) — the fixpoint result must stay readable after the
  loop's exit-time release pass, and the store's cache entries must not
  accumulate across queries (the CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
  failure mode found while building the change);
* local-tier fan-out is sized to the seed, not the session width
  (`_seed_sized_partitions`, slice-count formulas, pandas-lift coalesce).
"""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from bigdatalog_spark import BigDatalogContext
from bigdatalog_spark.datalog.context import EngineConfig


def _forced_distributed_ctx(spark):
    return BigDatalogContext(
        spark,
        EngineConfig(
            decomposable_local=False, driver_local=False, local_seed_max_rows=0
        ),
    )


def _null_label_program(ctx, spark, n=64):
    ctx.load_program(
        "database({arc(S:long, D:long), lab(Y:long, W:long)})."
        "p(X, W) <- lab(X, W)."
        "p(Y, W) <- p(X, W), arc(X, Y)."
    )
    arc = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "s long, d long"
    )
    lab = spark.createDataFrame(
        [(i, None if i % 4 == 0 else i % 10) for i in range(1, n + 1)],
        "y long, w long",
    ).select(F.col("y"), F.col("w").cast("long"))
    ctx.register("arc", arc)
    ctx.register("lab", lab)


def test_null_mode_result_readable_after_release(spark):
    """The persisted null store is a view over LIVE segments; the exit
    release pass must free only its cache entries, never the segments'
    checkpoint blocks (collecting AFTER query() exercises exactly that)."""
    ctx = _forced_distributed_ctx(spark)
    _null_label_program(ctx, spark, n=48)
    df = ctx.query("p(A,B).")
    rows = df.collect()  # after release_all_retired ran inside query()
    # node 48's label set includes NULL (propagated from ancestors 4,8,...)
    labs_48 = {r[1] for r in rows if r[0] == 48}
    assert None in labs_48
    # null-safe set semantics: each (node, label) exactly once
    assert len(rows) == len({(r[0], r[1]) for r in rows})
    # second full action over the same frame re-reads the checkpoint blocks
    assert df.count() == len(rows)


def test_null_store_blocks_do_not_accumulate(spark):
    """Repeated null-mode fixpoints on one session must not strand the
    null store's persisted blocks (explicit unpersist on compaction/exit)."""
    jsc = spark.sparkContext._jsc
    before = len(jsc.getPersistentRDDs())
    for _ in range(3):
        ctx = _forced_distributed_ctx(spark)
        _null_label_program(ctx, spark, n=32)
        ctx.query("p(A,B).").count()
        ctx.reset()
    after = len(jsc.getPersistentRDDs())
    # allowance for the engine's own bounded caches (statics, memo)
    assert after - before <= 8


def test_seed_sized_partitions_narrow_and_capped(spark):
    from bigdatalog_spark.datalog.local_eval import _seed_sized_partitions

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # stats-bearing source (Range reports exact bytes): tiny -> 1 task
    tiny = spark.range(50).select(F.col("id").alias("a"), F.col("id").alias("b"))
    assert _seed_sized_partitions(spark, tiny) == 1
    # big stats-bearing seed hits the session cap (production posture)
    big = spark.range(1_000_000).select(
        F.col("id").alias("a"), F.col("id").alias("b")
    )
    assert _seed_sized_partitions(spark, big) == cap
    # RDD-backed, no stats, no tag -> session cap
    rddish = spark.createDataFrame(
        spark.sparkContext.parallelize([(1, 2)]), "a: long, b: long"
    )
    assert _seed_sized_partitions(spark, rddish) == cap
    # known-rows tag on a stats-free frame is honored: tiny tag narrows
    rddish._bdlog_known_rows = 10
    assert _seed_sized_partitions(spark, rddish) == 1


def test_driver_result_lift_coalesces_small(spark):
    from bigdatalog_spark.datalog.local_eval import _driver_result_df

    pdf = pd.DataFrame({"a": range(63)})
    df = _driver_result_df(spark, pdf, "a bigint")
    assert df.rdd.getNumPartitions() == 1
    assert df._bdlog_known_rows == 63
    assert df.count() == 63


def test_graph_lift_coalesces_small(spark):
    from bigdatalog_spark.operators.graph import connected_components_fast

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 200, 2)], "src long, dst long"
    )
    labels = connected_components_fast(e)
    assert labels.rdd.getNumPartitions() <= 2
    assert labels.count() == 200
