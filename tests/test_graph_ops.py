"""DataFrame-level graph operator tests (operators/graph.py) against the
same goldens as the Datalog programs."""

from bigdatalog_spark.operators.graph import (
    connected_components,
    reach,
    same_generation,
    sssp,
    transitive_closure,
    triangle_count,
)

from .golden import TC_ANSWERS1


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_transitive_closure(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 6), (6, 7),
                       (7, 8), (8, 9), (9, 10)])
    got = {(r["src"], r["dst"]) for r in transitive_closure(e).collect()}
    assert got == set(TC_ANSWERS1)


def test_reach(spark):
    e = _edges(spark, [(1, 0), (1, 2), (2, 3), (3, 1), (3, 4), (3, 5), (5, 8),
                       (6, 5), (6, 7), (6, 0)])
    got = {r["vertex"] for r in reach(e, 1).collect()}
    assert got == {0, 1, 2, 3, 4, 5, 8}


def test_sssp(spark):
    e = spark.createDataFrame(
        [(0, 1, 10), (0, 1, 9), (0, 1, 8), (0, 1, 7), (0, 2, 1), (2, 1, 1),
         (2, 1, 2)],
        ["src", "dst", "weight"],
    )
    got = {(r["vertex"], r["distance"]) for r in sssp(e, 0).collect()}
    assert got == {(0, 0), (1, 2), (2, 1)}


def test_connected_components(spark):
    e = _edges(spark, [(0, 1), (1, 2), (5, 6), (7, 7)])
    got = {(r["vertex"], r["component"]) for r in connected_components(e).collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (5, 5), (6, 5), (7, 7)}


def test_triangle_count(spark):
    e = _edges(spark, [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)])
    assert triangle_count(e).first()["triangles"] == 1


def test_same_generation(spark):
    pc = spark.createDataFrame(
        [(4, 9), (4, 8), (6, 7), (5, 6), (3, 5), (3, 4), (2, 3), (1, 2)],
        ["parent", "child"],
    )
    got = {(r["x"], r["y"]) for r in same_generation(pc).collect()}
    assert got == {(8, 9), (9, 6), (6, 9), (9, 8), (8, 6), (5, 4), (4, 5), (6, 8)}


def test_pagerank_matches_numpy_power_iteration(spark):
    from bigdatalog_spark.operators.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=12).collect()}

    # reference power iteration (same simplified variant: dangling mass
    # dropped, teleport (1-d)/N)
    import collections
    n = 4
    deg = collections.Counter(s for s, _ in edges)
    rank = {v: 1.0 / n for v in range(n)}
    for _ in range(12):
        contrib = collections.defaultdict(float)
        for s, d in edges:
            contrib[d] += rank[s] / deg[s]
        rank = {v: 0.15 / n + 0.85 * contrib.get(v, 0.0) for v in range(n)}

    assert set(got) == set(range(n))
    for v in range(n):
        assert abs(got[v] - rank[v]) < 1e-12, (v, got[v], rank[v])
    # the hub (2) outranks the dangling-only contributor (3)
    assert got[2] > got[3]
