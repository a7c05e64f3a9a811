"""k-core decomposition: local fast path vs forced-distributed rounds vs a
brute-force reference peeling, on trees (empty 2-core), cliques, and
tree+chord graphs."""

import pytest
from pyspark.sql import functions as F

from bigdatalog_spark.operators.graph import k_core


def _brute_kcore(edges, k):
    """Reference peeling over a python adjacency map."""
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if len(nb) >= k}


def _tree_plus_chords(n):
    e = [(i, 2 * i) for i in range(1, n + 1) if 2 * i <= n]
    e += [(i, 2 * i + 1) for i in range(1, n + 1) if 2 * i + 1 <= n]
    e += [(i, (i * 31 + 7) % n + 1) for i in range(1, n + 1)]
    return [(u, v) for u, v in e if u != v]


@pytest.mark.parametrize("force_distributed", [False, True])
def test_kcore_matches_brute_force(spark, force_distributed):
    raw = _tree_plus_chords(200)
    df = spark.createDataFrame(raw, ["src", "dst"])
    got = {
        r["vertex"]: r["degree"]
        for r in k_core(
            df, k=2, local_max_edges=0 if force_distributed else 1 << 20
        ).collect()
    }
    assert got == _brute_kcore(raw, 2)


def test_kcore_tree_is_empty(spark):
    # a tree has no 2-core: every leaf peels until nothing remains
    e = [(i, 2 * i) for i in range(1, 64) if 2 * i <= 127]
    e += [(i, 2 * i + 1) for i in range(1, 64) if 2 * i + 1 <= 127]
    df = spark.createDataFrame(e, ["src", "dst"])
    assert k_core(df, k=2).count() == 0


def test_kcore_clique_survives_whole(spark):
    n = 6
    e = [(i, j) for i in range(n) for j in range(i + 1, n)]
    df = spark.createDataFrame(e, ["src", "dst"])
    got = {r["vertex"]: r["degree"] for r in k_core(df, k=3).collect()}
    assert got == {i: n - 1 for i in range(n)}


def test_kcore_k3_strips_cycle_but_keeps_dense_block(spark):
    # a 4-clique joined to a long cycle: k=3 keeps only the clique
    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    cycle = [(10 + i, 10 + (i + 1) % 8) for i in range(8)] + [(0, 10)]
    raw = clique + cycle
    df = spark.createDataFrame(raw, ["src", "dst"])
    got = {r["vertex"]: r["degree"] for r in k_core(df, k=3).collect()}
    assert got == _brute_kcore(raw, 3) == {i: 3 for i in range(4)}


def test_kcore_dedups_and_ignores_direction_and_self_loops(spark):
    raw = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (7, 7)]
    df = spark.createDataFrame(raw, ["src", "dst"])
    got = {r["vertex"]: r["degree"] for r in k_core(df, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_long_path_deep_peel_stays_flat(spark):
    """A path graph peels two ends per round, so 80 nodes force ~39
    distributed rounds — the regression canary for per-round driver cost.
    With per-round localCheckpoint this runs in well under a minute; the
    round-6 persist-generation-queue experiment went exponential in the
    round count (22 s/round by round 14) and TIMED OUT here, which is how
    it was caught. A path has no 2-core; the attached 4-cycle survives
    with degree 2 everywhere."""
    path = [(i, i + 1) for i in range(80)]
    cyc = [(100, 101), (101, 102), (102, 103), (103, 100), (80, 100)]
    df = spark.createDataFrame(path + cyc, ["src", "dst"])
    got = {
        r["vertex"]: r["degree"]
        for r in k_core(df, k=2, local_max_edges=0).collect()
    }
    assert got == {100: 2, 101: 2, 102: 2, 103: 2}
