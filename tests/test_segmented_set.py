"""Segmented (co-partitioned, SetRDD-style) accumulated-set fixpoint.

Pins (1) result parity between the segmented and legacy union-based PSN
paths, (2) the scale property the design exists for: after segments are
sealed, `candidates − S` plans exactly one Exchange and one Sort — both on
the candidate side — regardless of how many segments S holds (reference
parity: SetRDD.scala:111-126 diffs partition-locally without reshuffling S).
"""

import pyspark.sql.functions as F
import pytest

from bigdatalog_spark.datalog.fixpoint import (
    FixpointConfig,
    _aqe_off,
    _SegmentedSet,
    fixpoint_seminaive,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a: bigint, b: bigint")


def _tc(spark, pairs, cfg):
    e = _edges(spark, pairs)

    def step(all_dfs, delta_dfs):
        d = delta_dfs["tc"]
        return {
            "tc": d.alias("d").join(
                e.alias("e"), F.col("d.b") == F.col("e.a")
            ).select(F.col("d.a").alias("a"), F.col("e.b").alias("b"))
        }

    return {
        tuple(r) for r in fixpoint_seminaive({"tc": e}, step, cfg)["tc"].collect()
    }


CYCLE = [(i, (i + 1) % 6) for i in range(6)]
CHAIN = [(i, i + 1) for i in range(25)]
DIAMOND = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]


@pytest.mark.parametrize("pairs", [CYCLE, CHAIN, DIAMOND])
def test_segmented_matches_legacy(spark, pairs):
    seg = _tc(spark, pairs, FixpointConfig(copartitioned_set=True, max_segments=3))
    legacy = _tc(spark, pairs, FixpointConfig(copartitioned_set=False))
    assert seg == legacy and len(seg) > 0


def test_compaction_triggers_and_preserves(spark):
    # 25-edge chain → 25 iterations → several compactions at max_segments=2
    seg = _tc(spark, CHAIN, FixpointConfig(copartitioned_set=True, max_segments=2))
    want = {(i, j) for i in range(26) for j in range(i + 1, 26)}
    assert seg == want


def test_anti_join_plans_without_reshuffling_segments(spark):
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with _aqe_off(spark):
            base = spark.range(0, 2000).select(
                (F.col("id") % 97).alias("a"), (F.col("id") % 89).alias("b")
            )
            cfg = FixpointConfig(max_segments=8)
            sset = _SegmentedSet(base, cfg)
            seg, n = sset.seal_and_count(base.distinct())
            assert n > 0
            sset.append(seg)
            for shift in (1, 2, 3):
                cand = base.select((F.col("a") + shift).alias("a"), "b")
                delta, n = sset.seal_and_count(sset.anti(cand.distinct()))
                assert n > 0
                sset.append(delta)
            # 4 segments in S; the next anti-join must shuffle/sort only cand
            probe = base.select((F.col("a") + 50).alias("a"), "b")
            plan = (
                sset.anti(probe.distinct())
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert plan.count("Exchange") == 1, plan
            assert plan.count("Sort [") == 1, plan
            assert plan.count("SortMergeJoin") == len(sset.segments) == 4, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_aqe_restored_after_fixpoint(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    _tc(spark, DIAMOND, FixpointConfig())
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
