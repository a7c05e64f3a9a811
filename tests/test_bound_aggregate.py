"""Demand pushdown for bound goals on MONOTONIC / MIXED aggregate cliques
(context._bound_aggregate_df) — the last demand hole: before r09 a goal
like ``apsp(c,Y,D)`` paid the full all-pairs monotonic fixpoint + filter.

Reference anchor: the DeALS front end performs adorned rewriting for ALL
bound query forms before evaluation-type selection
(BigDatalogContext.scala:124-138, SURVEY.md §3 step 3), so a bound
monotonic goal there evaluates only the demanded slice.
"""

import heapq

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from bigdatalog_spark import BigDatalogContext
from bigdatalog_spark.datalog import context as C
from bigdatalog_spark.datalog.context import EngineConfig

APSP = (
    "database({arc(S:integer, D:integer, W:integer)})."
    "apsp(X, Y, mmin<D>) <- arc(X, Y, D)."
    "apsp(X, Y, mmin<D>) <- apsp(X, Z, D1), arc(Z, Y, W), D = D1 + W."
)
EDGES = [(0, 1, 2), (1, 2, 3), (0, 2, 9), (2, 3, 1), (4, 0, 1), (3, 1, 4)]


def _sssp(edges, src):
    """Shortest distances over paths of length >= 1 — what the apsp program
    derives: apsp(s,s) exists exactly when a real cycle returns to s."""

    def dij(s):
        dist = {s: 0}
        h = [(0, s)]
        while h:
            d, u = heapq.heappop(h)
            if d > dist.get(u, 1 << 60):
                continue
            for a, b, w in edges:
                if a == u and d + w < dist.get(b, 1 << 60):
                    dist[b] = d + w
                    heapq.heappush(h, (d + w, b))
        return dist

    best = {}
    for a, b, w in edges:
        if a != src:
            continue
        for t, d in dij(b).items():
            if w + d < best.get(t, 1 << 60):
                best[t] = w + d
    return sorted(best.items())


def _apsp_ctx(spark, edges, config=None):
    ctx = BigDatalogContext(spark, config or EngineConfig())
    ctx.load_program(APSP)
    ctx.register_data("arc", [f"{s},{d},{w}" for s, d, w in edges])
    return ctx


def _agg_spy(monkeypatch):
    """Record whether _bound_aggregate_df served each bound goal."""
    calls = []
    orig = C.BigDatalogContext._bound_aggregate_df

    def spy(self, goal, clique, bound):
        out = orig(self, goal, clique, bound)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(C.BigDatalogContext, "_bound_aggregate_df", spy)
    return calls


def test_bound_monotonic_stable_key_engages_and_matches(spark, monkeypatch):
    """apsp(0,Y,D): position 0 is a stable group key, so the seed-filtered
    single-source fixpoint must serve it — and match dijkstra."""
    calls = _agg_spy(monkeypatch)
    ctx = _apsp_ctx(spark, EDGES)
    got = sorted((r[1], r[2]) for r in ctx.query("apsp(0, Y, D).").collect())
    assert got == _sssp(EDGES, 0)
    assert calls == [True]


@pytest.mark.parametrize(
    "config",
    [
        EngineConfig(),  # local tiers (pivot / seed-broadcast)
        EngineConfig(decomposable_local=False),  # distributed fixpoint_monotonic
        EngineConfig(driver_local=False),  # no pandas exit evaluation
    ],
    ids=["local", "distributed", "no-driver"],
)
def test_bound_monotonic_three_way_tier_parity(spark, monkeypatch, config):
    """Every execution tier must see only the RESTRICTED seed and agree."""
    calls = _agg_spy(monkeypatch)
    ctx = _apsp_ctx(spark, EDGES, config)
    got = sorted((r[1], r[2]) for r in ctx.query("apsp(4, Y, D).").collect())
    assert got == _sssp(EDGES, 4)
    assert calls == [True]


def test_bound_monotonic_nonstable_position_declines(spark, monkeypatch):
    """apsp(X,3,D): position 1 changes through the recursion — the pushdown
    must DECLINE (restricting exits to Y=3 would lose multi-hop paths) and
    the full fixpoint + filter must still answer correctly."""
    calls = _agg_spy(monkeypatch)
    ctx = _apsp_ctx(spark, EDGES)
    got = sorted((r[0], r[2]) for r in ctx.query("apsp(X, 3, D).").collect())
    want = sorted(
        (s, dict(_sssp(EDGES, s))[3])
        for s in {e[0] for e in EDGES} | {e[1] for e in EDGES}
        if 3 in dict(_sssp(EDGES, s))
    )
    assert got == want
    assert calls == [False]


def test_bound_monotonic_agg_position_declines(spark, monkeypatch):
    """Binding the AGGREGATED value position (apsp(X,Y,6)) is a filter on
    the result, never a seed restriction — must decline and post-filter."""
    calls = _agg_spy(monkeypatch)
    ctx = _apsp_ctx(spark, EDGES)
    got = sorted((r[0], r[1]) for r in ctx.query("apsp(X, Y, 6).").collect())
    want = sorted(
        (s, t)
        for s in {e[0] for e in EDGES}
        for t, d in _sssp(EDGES, s)
        if d == 6
    )
    assert got == want
    assert calls == [False]


def test_bound_monotonic_cached_result_reused(spark, monkeypatch):
    """After an unbound query materialized the full closure, a bound goal
    must reuse the cache (no second fixpoint, no pushdown call)."""
    calls = _agg_spy(monkeypatch)
    ctx = _apsp_ctx(spark, EDGES)
    ctx.query("apsp(X, Y, D).").collect()
    got = sorted((r[1], r[2]) for r in ctx.query("apsp(0, Y, D).").collect())
    assert got == _sssp(EDGES, 0)
    assert calls == []


def test_bound_mixed_stable_key_engages_and_matches(spark, monkeypatch):
    """Single-pred MIXED clique (mcount) with a stable group key: the bound
    goal must take the seed-filtered path and match the full closure's
    slice computed on a fresh context."""
    prog = (
        "database({arc(S:integer, D:integer, T:integer)})."
        "m(X, Y, mcount<Z>) <- arc(X, Y, Z)."
        "m(X, Y2, mcount<Z>) <- m(X, Y, N), arc(Y, Y2, Z), N >= 1."
    )
    arcs = ["0,1,7", "0,1,8", "1,2,9", "2,3,7", "5,1,7"]
    full_ctx = BigDatalogContext(spark)
    full_ctx.load_program(prog)
    full_ctx.register_data("arc", arcs)
    want = sorted(
        (r[1], r[2])
        for r in full_ctx.query("m(X, Y, N).").collect()
        if r[0] == 0
    )
    calls = _agg_spy(monkeypatch)
    ctx = BigDatalogContext(spark)
    ctx.load_program(prog)
    ctx.register_data("arc", arcs)
    got = sorted((r[1], r[2]) for r in ctx.query("m(0, Y, N).").collect())
    assert got == want and got
    assert calls == [True]


def test_bound_mixed_nonstable_key_declines(spark, monkeypatch):
    """The attend shape (att(Y,...) <- att(X,N), org(X,Y)): the group key
    hops, so the pushdown must decline and full + filter still answers."""
    prog = (
        "database({org(A:integer, B:integer)})."
        "att(X, mcount<X>) <- org(X, _)."
        "att(Y, mcount<X>) <- att(X, N), org(X, Y), N >= 2."
    )
    orgs = ["1,2", "1,3", "2,4", "3,4"]
    full_ctx = BigDatalogContext(spark)
    full_ctx.load_program(prog)
    full_ctx.register_data("org", orgs)
    want = sorted(
        tuple(r) for r in full_ctx.query("att(X, N).").collect() if r[0] == 1
    )
    calls = _agg_spy(monkeypatch)
    ctx = BigDatalogContext(spark)
    ctx.load_program(prog)
    ctx.register_data("org", orgs)
    got = sorted(tuple(r) for r in ctx.query("att(1, N).").collect())
    assert got == want
    assert calls == [False]


def test_restricted_seed_reaches_the_fixpoint(spark, monkeypatch):
    """The PIN: the monotonic fixpoint must receive a seed filtered to the
    bound key — not the full contribution stream. Captured at the
    _compute_monotonic_clique boundary, then verified on the frame."""
    seen = {}
    orig = C.BigDatalogContext._compute_monotonic_clique

    def spy(self, clique, seed_filter=None):
        seen["seed_filter"] = seed_filter
        return orig(self, clique, seed_filter=seed_filter)

    monkeypatch.setattr(C.BigDatalogContext, "_compute_monotonic_clique", spy)
    ctx = _apsp_ctx(spark, EDGES)
    ctx.query("apsp(0, Y, D).").collect()
    assert seen["seed_filter"] == [(0, 0)]


CPROP = settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

W_EDGES = st.lists(
    st.tuples(
        st.integers(0, 5), st.integers(0, 5), st.integers(1, 9)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=14,
    unique_by=lambda e: (e[0], e[1]),
)


@CPROP
@given(edges=W_EDGES, src=st.integers(0, 5))
def test_bound_apsp_matches_dijkstra(spark, edges, src):
    """Property: bound apsp over random small weighted digraphs (cycles
    included) equals driver-side dijkstra from the bound source."""
    ctx = _apsp_ctx(spark, edges)
    got = sorted(
        (r[1], r[2]) for r in ctx.query(f"apsp({src}, Y, D).").collect()
    )
    assert got == _sssp(edges, src)
