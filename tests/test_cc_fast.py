"""Star-contraction connected components (connected_components_fast).

Parity with min-label propagation `connected_components` on assorted
topologies, plus the property the operator exists for: round count is
logarithmic in component size, not proportional to diameter, so a long path
graph (diameter 200) converges in far fewer than 200 rounds.
"""

import random

import pytest
from pyspark.sql import functions as F

from bigdatalog_spark.operators.graph import (
    connected_components,
    connected_components_fast,
)


def _cc_sets(df):
    """Normalize a (vertex, component) frame to frozensets of members."""
    rows = df.collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["component"], set()).add(r["vertex"])
    return {frozenset(v) for v in groups.values()}


PATH_200 = [(i, i + 1) for i in range(200)]
TWO_CLIQUES = (
    [(i, j) for i in range(5) for j in range(i + 1, 5)]
    + [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
)
STAR = [(0, i) for i in range(1, 30)]
SELF_LOOPS = [(1, 1), (2, 3), (3, 2), (4, 4)]


@pytest.mark.parametrize(
    "pairs", [PATH_200, TWO_CLIQUES, STAR, SELF_LOOPS],
    ids=["path200", "two-cliques", "star", "self-loops"],
)
def test_fast_cc_matches_label_propagation(spark, pairs):
    e = spark.createDataFrame(pairs, "src: bigint, dst: bigint")
    fast = connected_components_fast(e)
    slow = connected_components(e)
    assert _cc_sets(fast) == _cc_sets(slow)


def test_fast_cc_random_graph(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
    pairs = [p for p in pairs if p[0] != p[1]]
    e = spark.createDataFrame(pairs, "src: bigint, dst: bigint")
    assert _cc_sets(connected_components_fast(e)) == _cc_sets(
        connected_components(e)
    )


def test_fast_cc_component_label_is_min_member(spark):
    e = spark.createDataFrame(TWO_CLIQUES, "src: bigint, dst: bigint")
    out = connected_components_fast(e)
    bad = out.groupBy("component").agg(F.min("vertex").alias("mn")).where(
        F.col("component") != F.col("mn")
    )
    assert bad.count() == 0


def test_fast_cc_round_count_beats_diameter(spark):
    # a 200-edge path has diameter 200; star contraction must converge in
    # far fewer rounds — max_rounds=16 would fail on any diameter-bound scheme
    e = spark.createDataFrame(PATH_200, "src: bigint, dst: bigint")
    out = connected_components_fast(e, max_rounds=16)
    assert out.select("component").distinct().count() == 1
    assert out.count() == 201


def test_fast_cc_string_vertex_ids(spark):
    """Local union-find path must handle non-integer ids (it factorizes
    rather than int()-coercing): component = lexicographic-min member."""
    pairs = [("b", "a"), ("a", "c"), ("x", "y"), ("z", "z")]
    e = spark.createDataFrame(pairs, "src: string, dst: string")
    out = {r["vertex"]: r["component"]
           for r in connected_components_fast(e).collect()}
    assert out == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "z": "z"}


def test_fast_cc_fractional_float_ids(spark):
    """Fractional float ids must stay distinct (int() truncation used to
    merge 1.1 and 1.9 into vertex 1)."""
    pairs = [(1.1, 1.9), (2.5, 3.5)]
    e = spark.createDataFrame(pairs, "src: double, dst: double")
    sets = _cc_sets(connected_components_fast(e))
    assert sets == {frozenset({1.1, 1.9}), frozenset({2.5, 3.5})}
