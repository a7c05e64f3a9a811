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


def test_bound_monotonic_nonstable_position_served_by_chain_tier(
    spark, monkeypatch
):
    """apsp(X,3,D): position 1 changes through the recursion, so a plain
    seed FILTER would lose multi-hop paths — but the r09b chain tier
    (reverse-reach restriction) serves it, and the answer matches the full
    fixpoint's slice."""
    calls = _agg_spy(monkeypatch)
    ctx = _apsp_ctx(spark, EDGES)
    got = sorted((r[0], r[2]) for r in ctx.query("apsp(X, 3, D).").collect())
    want = sorted(
        (s, dict(_sssp(EDGES, s))[3])
        for s in {e[0] for e in EDGES} | {e[1] for e in EDGES}
        if 3 in dict(_sssp(EDGES, s))
    )
    assert got == want
    assert calls == [True]


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


# ----------------------------------------------------- r09b: chain tier for
# NON-stable bound key positions on monotonic cliques
# (context._bound_monotonic_chain_df): apsp(X,c,D) = "every source's
# distance TO c" runs a reverse-reach-restricted fixpoint, not all-pairs.

def _chain_mono_spy(monkeypatch):
    calls = []
    orig = C.BigDatalogContext._bound_monotonic_chain_df

    def spy(self, goal, clique, bound):
        out = orig(self, goal, clique, bound)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(
        C.BigDatalogContext, "_bound_monotonic_chain_df", spy
    )
    return calls


def _dij_to(edges, target):
    """min distance X -> target over paths of length >= 1, per source."""
    return sorted(
        (s, dict(_sssp(edges, s))[target])
        for s in {e[0] for e in edges} | {e[1] for e in edges}
        if target in dict(_sssp(edges, s))
    )


CHAIN_EDGES = [
    (0, 1, 2), (1, 2, 3), (0, 2, 9), (2, 3, 1), (4, 0, 1), (3, 1, 4),
    (5, 6, 2),  # disconnected from 3: must be pruned by the reach
]


@pytest.mark.parametrize(
    "config",
    [
        EngineConfig(),
        EngineConfig(decomposable_local=False),
        EngineConfig(chain_fetch_max_rows=0),  # distributed reach branch
    ],
    ids=["local", "distributed", "reach-gate0"],
)
def test_bound_dest_monotonic_chain_engages_and_matches(
    spark, monkeypatch, config
):
    """apsp(X,3,D) across tiers: the chain tier must serve it and match
    driver-side dijkstra-to-target."""
    calls = _chain_mono_spy(monkeypatch)
    ctx = _apsp_ctx(spark, CHAIN_EDGES, config)
    got = sorted((r[0], r[2]) for r in ctx.query("apsp(X, 3, D).").collect())
    assert got == _dij_to(CHAIN_EDGES, 3)
    assert calls == [True]


def test_bound_dest_demand_is_reverse_reach(spark, monkeypatch):
    """The PIN: the restricted fixpoint receives exactly the reverse-reach
    demand set of the bound vertex (3 and everything that reaches it; the
    disconnected 5-6 component excluded)."""
    seen = {}
    orig = C.BigDatalogContext._compute_monotonic_clique

    def spy(self, clique, seed_filter=None, exit_restrict=None):
        if exit_restrict is not None:
            seen["restrict"] = exit_restrict
        return orig(
            self, clique, seed_filter=seed_filter, exit_restrict=exit_restrict
        )

    monkeypatch.setattr(C.BigDatalogContext, "_compute_monotonic_clique", spy)
    ctx = _apsp_ctx(spark, CHAIN_EDGES)
    ctx.query("apsp(X, 3, D).").collect()
    (pos, demand), = seen["restrict"]
    assert pos == 1
    got = sorted(r[0] for r in demand.collect())
    # vertices that reach 3 (plus 3 itself via the cycle 3->1->2->3)
    assert got == [0, 1, 2, 3, 4]


def test_bound_start_nonstable_monotonic_chain(spark, monkeypatch):
    """Left-linear accumulation (head key-A hops via the static): bound at
    the WALK START — forward-reach restriction."""
    prog = (
        "database({arc(S:integer, D:integer, W:integer)})."
        "up(X, Y, mmin<D>) <- arc(X, Y, D)."
        "up(X, Y, mmin<D>) <- arc(X, Z, W), up(Z, Y, D1), D = W + D1."
    )
    calls = _chain_mono_spy(monkeypatch)
    full = BigDatalogContext(spark)
    full.load_program(prog)
    full.register_data(
        "arc", [f"{s},{d},{w}" for s, d, w in CHAIN_EDGES]
    )
    want = sorted(
        (r[1], r[2]) for r in full.query("up(X, Y, D).").collect()
        if r[0] == 4
    )
    ctx = BigDatalogContext(spark)
    ctx.load_program(prog)
    ctx.register_data("arc", [f"{s},{d},{w}" for s, d, w in CHAIN_EDGES])
    got = sorted((r[1], r[2]) for r in ctx.query("up(4, Y, D).").collect())
    assert got == want and got
    # pos 0 IS stable for this left-linear shape? No: head X comes from
    # arc, not from the clique occurrence -> non-stable -> chain tier.
    assert calls == [True]


def test_bound_monotonic_off_chain_clique_atom_declines(spark, monkeypatch):
    """A clique atom hanging OFF the key chain makes the restriction
    unsound — the tier must decline and the full fixpoint still answer."""
    prog = (
        "database({arc(S:integer, D:integer, W:integer)})."
        "t(X, Y, mmin<D>) <- arc(X, Y, D)."
        "t(X, Y, mmin<D>) <- t(X, Z, D1), t(Z, Y, D2), t(0, Z, D3),"
        " D = D1 + D2."
    )
    calls = _chain_mono_spy(monkeypatch)
    ctx = BigDatalogContext(spark)
    ctx.load_program(prog)
    ctx.register_data("arc", ["0,1,1", "1,2,1", "2,3,1"])
    got = sorted((r[0], r[2]) for r in ctx.query("t(X, 3, D).").collect())
    assert got  # full + filter still answers
    assert calls == [False]


@CPROP
@given(edges=W_EDGES, dst=st.integers(0, 5))
def test_bound_dest_apsp_matches_dijkstra(spark, edges, dst):
    """Property: bound-DEST apsp over random weighted digraphs equals
    driver-side shortest-to-target (>=1 edge)."""
    ctx = _apsp_ctx(spark, edges)
    got = sorted(
        (r[0], r[2]) for r in ctx.query(f"apsp(X, {dst}, D).").collect()
    )
    want = sorted(
        (s, dict(_sssp(edges, s))[dst])
        for s in {e[0] for e in edges} | {e[1] for e in edges}
        if dst in dict(_sssp(edges, s))
    )
    assert got == want


def test_driver_row_apsp_bound_rev_takes_chain_tier(spark, monkeypatch):
    """The dl_apsp_bound_rev DRIVER row (bound destination on monotonic
    apsp) must be served by the chain-restricted monotonic tier — there is
    no stable-position seed path for it."""
    import __spark_entry__ as entry

    calls = _chain_mono_spy(monkeypatch)
    df = entry.queries()["dl_apsp_bound_rev"](spark, "/root/testdata/sf0.001")
    rows = {r[0]: r[1] for r in df.collect()}
    assert calls == [True]
    from __spark_entry__ import _part_max

    mx = _part_max(spark, "/root/testdata/sf0.001")
    mid = mx // 2 + 1
    # ancestors of mid in the binary tree, with w = 1 + child % 3
    want, v, d = {}, mid, 0
    while v > 1:
        d += 1 + v % 3
        v //= 2
        want[v] = d
    assert rows == want


def test_driver_row_apsp_bound_takes_stable_seed_path(spark, monkeypatch):
    """The dl_apsp_bound DRIVER row (bound source, stable key) must be
    served by the seed-filter path, NOT the chain tier."""
    import __spark_entry__ as entry

    agg_calls = _agg_spy(monkeypatch)
    chain_calls = _chain_mono_spy(monkeypatch)
    df = entry.queries()["dl_apsp_bound"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
    assert agg_calls == [True]
    assert chain_calls == []


MIXED_CHAIN_PROG = (
    "database({arc(S:integer, D:integer, T:integer)})."
    "m(X, Y, mcount<Z>) <- arc(X, Y, Z)."
    "m(X, Y2, mcount<Z>) <- m(X, Y, N), arc(Y, Y2, Z), N >= 1."
)
MIXED_ARCS = ["0,1,7", "0,1,8", "1,2,9", "2,3,7", "5,6,7"]


@pytest.mark.parametrize(
    "config",
    [EngineConfig(), EngineConfig(decomposable_local=False)],
    ids=["local", "distributed"],
)
def test_bound_dest_mixed_chain_engages_and_matches(
    spark, monkeypatch, config
):
    """MIXED (mcount) clique, bound DESTINATION: the chain tier must serve
    it (support sets of R-keyed groups preserved exactly — thresholds
    still fire) and match the full closure's slice."""
    full = BigDatalogContext(spark)
    full.load_program(MIXED_CHAIN_PROG)
    full.register_data("arc", MIXED_ARCS)
    want = sorted(
        (r[0], r[2])
        for r in full.query("m(X, Y, N).").collect()
        if r[1] == 3
    )
    calls = _chain_mono_spy(monkeypatch)
    ctx = BigDatalogContext(spark, config)
    ctx.load_program(MIXED_CHAIN_PROG)
    ctx.register_data("arc", MIXED_ARCS)
    got = sorted((r[0], r[2]) for r in ctx.query("m(X, 3, N).").collect())
    assert got == want and got
    assert calls == [True]


def test_bound_mixed_one_key_declines(spark, monkeypatch):
    """A 1-key mixed clique has no A→B chain — the tier must decline and
    full + filter still answer (incl. the msum value)."""
    prog = (
        "database({src(X:integer, V:integer), hop(S:integer, D:integer)})."
        "t(X, msum<V>) <- src(X, V)."
        "t(Y, msum<V>) <- t(X, V), hop(X, Y)."
    )
    calls = _chain_mono_spy(monkeypatch)
    ctx = BigDatalogContext(spark)
    ctx.load_program(prog)
    ctx.register("src", spark.createDataFrame([(0, 3), (1, 4)], "x int, v int"))
    ctx.register("hop", spark.createDataFrame([(0, 1), (1, 2)], "s int, d int"))
    got = sorted(tuple(r) for r in ctx.query("t(2, V).").collect())
    assert got == [(2, 11)]  # 3+4 propagated along 0->1->2 (+4 at 1)
    assert calls == [False]


def test_repeated_bound_goal_memoized(spark, monkeypatch):
    """A repeated identical bound query on a long-lived context must reuse
    the goal-specific result (one demand fixpoint, not two); a DIFFERENT
    bound constant computes fresh."""
    calls = _agg_spy(monkeypatch)
    ctx = _apsp_ctx(spark, EDGES)
    a1 = sorted(tuple(r) for r in ctx.query("apsp(0, Y, D).").collect())
    a2 = sorted(tuple(r) for r in ctx.query("apsp(0, Y, D).").collect())
    b1 = sorted(tuple(r) for r in ctx.query("apsp(4, Y, D).").collect())
    assert a1 == a2
    assert calls == [True, True]  # second apsp(0,..) hit the memo
    assert b1 != a1
    # load_program invalidates the memo
    ctx.load_program("extra(X) <- arc(X, _, _).")
    ctx.query("apsp(0, Y, D).").collect()
    assert calls == [True, True, True]


def test_partially_bound_goal_pushes_stable_subset(spark, monkeypatch):
    """apsp(3,5,D): source stable, dest not — the stable subset is pushed
    into the seed (single-source fixpoint) and _apply_goal post-filters
    the dest; never the all-pairs closure, never the chain tier."""
    calls = _agg_spy(monkeypatch)
    chain_calls = _chain_mono_spy(monkeypatch)
    seen = {}
    orig = C.BigDatalogContext._compute_monotonic_clique

    def spy(self, clique, seed_filter=None, exit_restrict=None):
        seen["seed_filter"] = seed_filter
        return orig(
            self, clique, seed_filter=seed_filter, exit_restrict=exit_restrict
        )

    monkeypatch.setattr(C.BigDatalogContext, "_compute_monotonic_clique", spy)
    ctx = _apsp_ctx(spark, EDGES)
    got = sorted(tuple(r) for r in ctx.query("apsp(0, 3, D).").collect())
    assert got == [(0, 3, 6)]
    assert calls == [True]
    assert chain_calls == []
    assert seen["seed_filter"] == [(0, 0)]  # only the stable position


# ------------------------------------------------- r10: decline-surface pins
# (the two documented narrowings vs DeALS adorned rewriting,
# BigDatalogContext.scala:124-138 — see PLANS.md "Bound-aggregate decline
# surface") + deterministic block release on bound-memo eviction.


def _parity_dists(edges, src):
    """Doubled-graph dijkstra: min cost src->v over paths of length >= 1,
    per path-length parity (1 = odd, 0 = even)."""
    import heapq

    dist = {}
    h = []
    for a, b, w in edges:
        if a == src and w < dist.get((b, 1), 1 << 60):
            dist[(b, 1)] = w
            heapq.heappush(h, (w, b, 1))
    while h:
        d, u, p = heapq.heappop(h)
        if d > dist.get((u, p), 1 << 60):
            continue
        for a, b, w in edges:
            if a == u and d + w < dist.get((b, 1 - p), 1 << 60):
                dist[(b, 1 - p)] = d + w
                heapq.heappush(h, (d + w, b, 1 - p))
    return dist


MUTUAL_AGG_PROG = (
    "database({arc(S:integer, D:integer, W:integer)})."
    "pa(X, Y, mmin<D>) <- arc(X, Y, D)."
    "pa(X, Y, mmin<D>) <- pb(X, Z, D1), arc(Z, Y, W), D = D1 + W."
    "pb(X, Y, mmin<D>) <- pa(X, Z, D1), arc(Z, Y, W), D = D1 + W."
)


def test_bound_multi_pred_aggregate_clique_declines(spark, monkeypatch):
    """Narrowing #1 pin (context._bound_aggregate_df: len(clique.preds)
    != 1): a bound goal on a MUTUAL aggregate clique (pa/pb = odd/even
    path-parity shortest distances) declines every demand tier and is
    answered by the full mixed fixpoint + goal filter — correct, unpruned.
    Values checked against a driver-side doubled-graph dijkstra."""
    calls = _agg_spy(monkeypatch)
    chain_calls = _chain_mono_spy(monkeypatch)
    ctx = BigDatalogContext(spark)
    ctx.load_program(MUTUAL_AGG_PROG)
    ctx.register_data("arc", [f"{s},{d},{w}" for s, d, w in EDGES])
    got = sorted(tuple(r) for r in ctx.query("pa(0, Y, D).").collect())
    want = sorted(
        (0, v, d) for (v, p), d in _parity_dists(EDGES, 0).items() if p == 1
    )
    assert got == want and got
    assert calls == [False]  # multi-pred: the aggregate tier declined
    assert chain_calls == []  # ...before ever reaching the chain tier


THREE_KEY_PROG = (
    "database({arc(S:integer, D:integer, L:integer, W:integer)})."
    "t3(X, Y, L, mmin<D>) <- arc(X, Y, L, D)."
    "t3(X, Y, L, mmin<D>) <- t3(X, Z, L, D1), arc(Z, Y, _, W), D = D1 + W."
)
THREE_KEY_ARCS = ["0,1,10,2", "1,2,20,3", "0,2,30,9", "2,3,40,1"]


def test_bound_three_key_monotonic_chain_declines(spark, monkeypatch):
    """Narrowing #2 pin (context._bound_monotonic_chain_df:
    len(key_idx) != 2): t3(X,Y,L,mmin<D>) = min cost X->Y over paths whose
    FIRST edge has label L is a 3-group-key monotonic head; binding the
    non-stable Y reaches the chain tier, which declines (no 2-key chain),
    and the full fixpoint + filter answers exactly."""
    calls = _agg_spy(monkeypatch)
    chain_calls = _chain_mono_spy(monkeypatch)
    ctx = BigDatalogContext(spark)
    ctx.load_program(THREE_KEY_PROG)
    ctx.register_data("arc", THREE_KEY_ARCS)
    got = sorted(tuple(r) for r in ctx.query("t3(X, 2, L, D).").collect())
    # first-edge-labeled shortest paths into 2: 0-(10)->1->2 = 5,
    # 0-(30)->2 = 9, 1-(20)->2 = 3
    assert got == [(0, 2, 10, 5), (0, 2, 30, 9), (1, 2, 20, 3)]
    assert calls == [False]
    assert chain_calls == [False]  # reached, declined on the 3-key head


def test_bound_memo_eviction_releases_blocks(spark):
    """The FIFO memo cap must bound STORAGE, not just the dict: evicting
    an entry releases its checkpoint blocks deterministically (leaf-walk —
    memoized frames wrap their checkpointed RDDs in Project/Union nodes),
    even while the caller still holds the returned DataFrame."""
    ctx = _apsp_ctx(spark, EDGES, EngineConfig(decomposable_local=False))
    held = ctx.query("apsp(0, Y, D).")
    held.count()
    memo_df = next(iter(ctx._bound_memo.values()))
    plan = memo_df._jdf.queryExecution().analyzed()
    leaves = plan.collectLeaves()
    rdd_ids = set()
    for i in range(leaves.size()):
        try:
            rdd_ids.add(leaves.apply(i).rdd().id())
        except Exception:
            pass
    assert rdd_ids, "distributed bound result should be checkpoint-backed"
    jsc = spark.sparkContext._jsc
    assert rdd_ids & set(jsc.getPersistentRDDs().keys())
    # fill the memo to the 64-entry cap with sentinels, then trigger one
    # real insert -> the apsp frame (FIFO head) is evicted and released
    for i in range(63):
        ctx._bound_memo[("__sentinel", i)] = object()
    ctx.query("apsp(4, Y, D).").count()
    assert ("apsp", ((0, 0),)) not in ctx._bound_memo
    assert not (rdd_ids & set(jsc.getPersistentRDDs().keys()))


def test_bound_memo_storage_bounded_over_many_goals(spark):
    """VERDICT r09 #5 'done' pin: a stream of 80 distinct bound goals on
    one long-lived context (all result frames HELD, so GC cannot reclaim
    anything) keeps the persisted-RDD count flat once the 64-entry memo
    cap is reached — storage is bounded by the cap, not by goal count."""
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "btc(A,B) <- arc(A,B)."
        "btc(A,B) <- btc(A,C), arc(C,B)."
    )
    ctx.register_data("arc", [f"{i},{100 + i}" for i in range(80)])
    jsc = spark.sparkContext._jsc
    held, at_cap = [], None
    for i in range(80):
        held.append(ctx.query(f"btc({i},B)."))
        held[-1].count()
        if i == 63:
            at_cap = len(jsc.getPersistentRDDs())
    after = len(jsc.getPersistentRDDs())
    assert len(ctx._bound_memo) == 64
    assert after - at_cap <= 1, (at_cap, after)


def test_demand_known_rows_tag_reaches_broadcast_decision(spark, monkeypatch):
    """ADVICE r09 pin: the driver-BFS demand frame's exact-count tag must
    survive the __demand select, so the exit_restrict broadcast decision
    takes the known-rows fast path instead of paying a stats/count probe."""
    seen = []
    orig = C.BigDatalogContext._estimated_bytes

    def spy(self, df, limit):
        if df.columns == ["__demand"]:
            seen.append(getattr(df, "_bdlog_known_rows", None))
        return orig(self, df, limit)

    monkeypatch.setattr(C.BigDatalogContext, "_estimated_bytes", spy)
    ctx = _apsp_ctx(spark, CHAIN_EDGES)
    ctx.query("apsp(X, 3, D).").collect()
    # the demand set is {0,1,2,3,4} (reverse reach of 3) -> tag = 5
    assert seen and seen[0] == 5
