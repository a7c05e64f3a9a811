"""Magic-sets / demand transformation for bound goals on non-stable
positions (context._magic_bound_df) — the same-generation `sg(a,Y)` shape
the stable-position seed rewrite can't handle.

Reference anchor: the DeALS front end performs adorned/magic rewriting for
bound query forms (SURVEY.md §3 step 3); its observable behavior is the
bound-goal tests RecursiveQuerySuites.scala:81-94.
"""

import pytest

from bigdatalog_spark import BigDatalogContext
from bigdatalog_spark.datalog import context as C

SG_PROGRAM = (
    "database({up(A:integer, B:integer), flat(A:integer, B:integer),"
    " down(A:integer, B:integer)})."
    "sg(X,Y) <- flat(X,Y)."
    "sg(X,Y) <- up(X,X1), sg(X1,Y1), down(Y1,Y)."
)
UP = ["1,10", "2,10", "10,100", "11,100", "3,20", "4,20", "20,200"]
FLAT = ["100,200", "10,20"]
DOWN = ["200,20", "20,3", "20,4", "200,21", "21,5", "100,10", "10,1", "10,2"]


def _sg_ctx(spark):
    ctx = BigDatalogContext(spark)
    ctx.load_program(SG_PROGRAM)
    ctx.register_data("up", UP)
    ctx.register_data("flat", FLAT)
    ctx.register_data("down", DOWN)
    return ctx


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def magic_spy(monkeypatch):
    calls = {"applied": 0, "fallback": 0}
    orig = C.BigDatalogContext._magic_bound_df

    def spy(self, goal, clique, bound):
        out = orig(self, goal, clique, bound)
        calls["applied" if out is not None else "fallback"] += 1
        return out

    monkeypatch.setattr(C.BigDatalogContext, "_magic_bound_df", spy)
    return calls


def test_bound_sg_matches_full_filter(spark, magic_spy):
    full = _rows(_sg_ctx(spark).query("sg(X,Y)."))
    want = sorted((a, b) for a, b in full if a == 1)
    assert want  # non-trivial
    got = _rows(_sg_ctx(spark).query("sg(1,Y)."))
    assert [(1, y) for _, y in got] == got  # bound col kept as constant
    assert got == want
    assert magic_spy["applied"] == 1


def test_bound_sg_empty_demand(spark, magic_spy):
    # node 9 has no up edge: demand = {9} only, answer comes from flat alone
    got = _rows(_sg_ctx(spark).query("sg(9,Y)."))
    assert got == []
    assert magic_spy["applied"] == 1


def test_second_position_bound(spark, magic_spy):
    # Y is also non-stable; demand flows through `down` read backwards
    full = _rows(_sg_ctx(spark).query("sg(X,Y)."))
    want = sorted((a, b) for a, b in full if b == 4)
    got = _rows(_sg_ctx(spark).query("sg(X,4)."))
    assert got == want and want
    assert magic_spy["applied"] == 1


def test_nonlinear_rule_falls_back(spark, magic_spy):
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(A:integer, B:integer)})."
        "tc(X,Y) <- arc(X,Y)."
        "tc(X,Y) <- tc(X,Z), tc(Z,Y)."
    )
    ctx.register_data("arc", ["1,2", "2,3", "3,4"])
    # bound position 0 IS stable in NL-TC, so the seed rewrite handles it
    # before magic is consulted; bind position 1 (non-stable) instead
    got = _rows(ctx.query("tc(X,4)."))
    assert got == [(1, 4), (2, 4), (3, 4)]
    assert magic_spy["applied"] == 0  # non-linear: magic must decline


def test_magic_results_not_cached(spark):
    ctx = _sg_ctx(spark)
    assert _rows(ctx.query("sg(1,Y).")) != []
    # a later unbound query on the same context must see the FULL relation
    full = _rows(ctx.query("sg(X,Y)."))
    assert (10, 20) in full and (11, 21) in full


def test_demand_actually_restricts(spark):
    """The guarded fixpoint under a bound goal must not materialize facts
    whose first argument is outside the demand set (ancestors of the bound
    node) — that bounded exploration is the whole point of the rewrite.
    The transformed predicates memoize in the context cache under
    goal-specific names, so the explored sets are directly inspectable."""
    ctx = _sg_ctx(spark)
    got = _rows(ctx.query("sg(1,Y)."))
    assert got == [(1, 3), (1, 4), (1, 5)]
    magic = {k: v for k, v in ctx._cache.items() if k.startswith("__magic_sg_")}
    guarded = {k: v for k, v in ctx._cache.items() if k.startswith("__bound_sg_")}
    assert len(magic) == 1 and len(guarded) == 1
    demand = sorted(r[0] for r in next(iter(magic.values())).collect())
    assert demand == [1, 10, 100]  # the up-chain from node 1
    sg_facts = sorted(tuple(r) for r in next(iter(guarded.values())).collect())
    assert sg_facts and all(x in (1, 10, 100) for x, _ in sg_facts)


def test_repeated_bound_goal_memoizes(spark):
    ctx = _sg_ctx(spark)
    a = _rows(ctx.query("sg(1,Y)."))
    n_cached = len(ctx._cache)
    b = _rows(ctx.query("sg(1,Y)."))
    assert a == b
    assert len(ctx._cache) == n_cached  # second run hit the cache


# ------------------- generalized demand (_magic_bound_general) edge cases


def _q(spark, prog, data, goal):
    ctx = BigDatalogContext(spark)
    ctx.load_program(prog)
    for name, rows in data.items():
        ctx.register_data(name, rows)
    out = sorted(tuple(r) for r in ctx.query(goal).collect())
    return out, ctx


NL_TC = (
    "database({arc(S:integer, D:integer)})."
    "tc(A,B) <- arc(A,B)."
    "tc(A,B) <- tc(A,C), tc(C,B)."
)


def test_general_demand_with_negation_declines_to_fallback(spark):
    """Negation in the original exit rule lands inside a RECURSIVE rule
    of the transformed mutual clique (the magic guard makes it
    recursive), which the in-task local path rejects — so the
    evaluation-cost gate must decline the rewrite (the distributed
    mutual magic ⇄ guarded loop measures 27× slower than the unbound
    closure) and the full-fixpoint + filter fallback stays correct."""
    prog = (
        "database({arc(S:integer, D:integer),"
        " blocked(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B), ~blocked(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B)."
    )
    data = {"arc": ["0,1", "1,2", "2,3", "0,9"], "blocked": ["0,9"]}
    got, ctx = _q(spark, prog, data, "tc(0,B).")
    assert not any(k.startswith("__magic_tc") for k in ctx._cache)
    want, _ = _q(spark, prog, data, "tc(A,B).")
    assert got == sorted(t for t in want if t[0] == 0)
    assert got == [(0, 1), (0, 2), (0, 3)]  # the blocked 0→9 edge is out


def test_general_demand_gated_when_statics_exceed_local_budget(spark):
    """The mutual magic ⇄ guarded clique (non-linear bound goals) is only
    evaluated when the local path can serve it: with the statics byte
    gate closed the rewrite must decline — the distributed form of that
    clique has no stable pivot and measured 27× SLOWER than the unbound
    closure it replaces (sf0.1 forced-distributed: 400 s vs 15 s) — and
    the fallback must answer correctly."""
    from bigdatalog_spark.datalog.context import EngineConfig

    ctx = BigDatalogContext(spark, EngineConfig(broadcast_max_bytes=0))
    ctx.load_program(NL_TC)
    ctx.register_data("arc", ["0,1", "1,2", "2,3", "5,6"])
    got = sorted(r[1] for r in ctx.query("tc(0,B).").collect())
    assert got == [1, 2, 3]
    assert not any(k.startswith("__magic") for k in ctx._cache)


def test_general_demand_fully_bound_goal(spark):
    """Both positions bound on non-linear TC: the worklist adorns the
    later occurrence with BOTH positions (its own finer magic predicate)
    and the answer is the membership singleton."""
    got, ctx = _q(
        spark, NL_TC, {"arc": ["0,1", "1,2", "2,3", "5,6"]}, "tc(0,3)."
    )
    assert got == [(0, 3)]
    assert any(k.startswith("__magic_tc") for k in ctx._cache)


def test_general_demand_declines_arithmetic_chain(spark):
    """Forward arithmetic recursion (`Y = X + 1`) binds forward only —
    the SIP cannot restrict the clique occurrence from the bound head, so
    the rewrite declines and the full-fixpoint + filter fallback answers."""
    prog = (
        "database({start(V:integer)})."
        "n(X) <- start(X)."
        "n(Y) <- n(X), Y=X+1, Y<=10."
    )
    got, ctx = _q(spark, prog, {"start": ["3"]}, "n(5).")
    assert got == [(5,)]
    assert not any(k.startswith("__magic") for k in ctx._cache)


def test_constant_in_clique_occurrence_stable_seed_path(spark):
    """A clique occurrence holding a constant (`p(X,1)`) keeps position 0
    stable, so the cheaper stable-position seed rewrite answers before
    magic is consulted — pinned so a future transformation change doesn't
    silently reroute (and slow) this shape."""
    prog = (
        "database({arc(S:integer, D:integer)})."
        "p(X,Y) <- arc(X,Y)."
        "p(X,Y) <- p(X,1), arc(1,Y)."
    )
    data = {"arc": ["0,1", "1,2", "1,3", "4,5"]}
    got, ctx = _q(spark, prog, data, "p(0,Y).")
    assert not any(k.startswith("__magic") for k in ctx._cache)
    want, _ = _q(spark, prog, data, "p(X,Y).")
    assert got == sorted(t for t in want if t[0] == 0)
    assert got == [(0, 1), (0, 2), (0, 3)]


def test_general_demand_declines_reversed_arithmetic_binding(spark):
    """`X + 1 = Y` with Y bound must NOT mark X bound: neither evaluator
    can invert arithmetic (assignment needs a bare unbound Var on one
    side), so propagating through the Arith side emitted magic rules
    that crashed compilation (DatalogCompileError) instead of answering.
    The occurrence's adornment comes up empty, the rewrite declines, and
    the fallback answers. Pinned both bound-hit and bound-miss."""
    prog = (
        "database({start(V:integer)})."
        "n(X) <- start(X)."
        "n(Y) <- X + 1 = Y, n(X), Y <= 10."
    )
    got, ctx = _q(spark, prog, {"start": ["3"]}, "n(5).")
    assert got == [(5,)]
    assert not any(k.startswith("__magic") for k in ctx._cache)
    got_miss, _ = _q(spark, prog, {"start": ["3"]}, "n(99).")
    assert got_miss == []


def test_general_demand_growth_abort_declines_to_unbound_fallback(
    spark, monkeypatch
):
    """The upfront gate can pass (shape + statics OK) and the driver loop
    STILL abort when the demanded slice outgrows the growth budget
    (dl_tc_nl_bound at sf10: ~10M guarded pairs). The engine must then
    decline the transformation — answering via the unbound closure +
    filter — and NEVER run the distributed transformed clique, the shape
    measured 27× worse than that fallback. Pinned by spying the
    distributed fixpoint entry: no magic predicate may reach it."""
    from bigdatalog_spark.datalog import context as ctx_mod
    from bigdatalog_spark.datalog.context import EngineConfig

    dist_cliques = []
    orig = ctx_mod.fixpoint_seminaive

    def spy(exit_dfs, step, cfg, **kw):
        dist_cliques.append(tuple(exit_dfs))
        return orig(exit_dfs, step, cfg, **kw)

    monkeypatch.setattr(ctx_mod, "fixpoint_seminaive", spy)

    # growth budget the demanded closure must exceed -> driver loop aborts
    ctx = BigDatalogContext(
        spark, EngineConfig(local_growth_factor=1, local_growth_floor=2)
    )
    ctx.load_program(NL_TC)
    chain = [f"{i},{i + 1}" for i in range(12)]
    ctx.register_data("arc", chain)
    got = sorted(r[1] for r in ctx.query("tc(0,B).").collect())
    assert got == list(range(1, 13))
    assert not any(
        any(p.startswith("__magic_") for p in preds) for preds in dist_cliques
    ), f"transformed clique reached the distributed loop: {dist_cliques}"


# --------------------------------------------- chain-restricted fallback
# (round 8) The tier between the local demand transformation and the full
# unbound closure: linear-reachability demand over-approximation + exit
# semi-join, for chain-composition cliques (context._demand_chain_fallback).

from hypothesis import HealthCheck, given, settings, strategies as st

_TINY_GROWTH = dict(local_growth_factor=1, local_growth_floor=2)

CPROP = settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
C_EDGES = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)),
    min_size=1, max_size=14, unique=True,
)


def _nl_closure(edges):
    t = set(edges)
    while True:
        new = {(a, d) for (a, b) in t for (c, d) in t if b == c} - t
        if not new:
            return t
        t |= new


def _chain_spy(monkeypatch):
    calls = []
    orig = C.BigDatalogContext._demand_chain_fallback

    def spy(self, goal, clique, bound):
        out = orig(self, goal, clique, bound)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(C.BigDatalogContext, "_demand_chain_fallback", spy)
    return calls


@CPROP
@given(edges=C_EDGES, src=st.integers(0, 6))
def test_chain_fallback_matches_python_closure(spark, edges, src, monkeypatch):
    """Forced decline of the local demand tier (tiny growth budget): the
    chain-restricted fallback must engage and match the python non-linear
    closure filtered to the bound vertex — first AND second position."""
    from bigdatalog_spark.datalog.context import EngineConfig

    calls = _chain_spy(monkeypatch)
    ctx = BigDatalogContext(spark, EngineConfig(**_TINY_GROWTH))
    ctx.load_program(NL_TC)
    ctx.register_data("arc", [f"{s},{d}" for s, d in edges])
    full = _nl_closure(edges)

    got0 = sorted(r[1] for r in ctx.query(f"tc({src},B).").collect())
    assert got0 == sorted(b for (a, b) in full if a == src)
    got1 = sorted(r[0] for r in ctx.query(f"tc(A,{src}).").collect())
    assert got1 == sorted(a for (a, b) in full if b == src)
    assert calls and all(calls)


def test_chain_fallback_static_mid_atom(spark, monkeypatch):
    """Chain with a STATIC middle atom: t(A,B) <- t(A,C), mid(C,D), t(D,B).
    E* must include the mid pairs or demand dies at the static hop."""
    from bigdatalog_spark.datalog.context import EngineConfig

    calls = _chain_spy(monkeypatch)
    ctx = BigDatalogContext(spark, EngineConfig(**_TINY_GROWTH))
    ctx.load_program(
        "database({e(S:integer, D:integer), mid(S:integer, D:integer)})."
        "t(A,B) <- e(A,B)."
        "t(A,B) <- t(A,C), mid(C,D), t(D,B)."
    )
    ctx.register_data("e", ["0,1", "2,3", "3,4", "20,21"])
    ctx.register_data("mid", ["1,2", "4,20"])
    got = sorted(tuple(r) for r in ctx.query("t(0,B).").collect())

    E, M = [(0, 1), (2, 3), (3, 4), (20, 21)], [(1, 2), (4, 20)]
    t = set(E)
    while True:
        new = {
            (a, b2)
            for (a, c) in t
            for (c2, d) in M
            if c == c2
            for (d2, b2) in t
            if d == d2
        } - t
        if not new:
            break
        t |= new
    assert got == sorted((a, b) for (a, b) in t if a == 0)
    assert calls == [True]


def test_chain_fallback_declines_off_chain_clique_atom(spark, monkeypatch):
    """A clique atom hanging OFF the chain makes the restriction unsound
    (its demand is unconstrained) — the fallback must decline and the
    unbound closure must still answer."""
    from bigdatalog_spark.datalog.context import EngineConfig

    calls = _chain_spy(monkeypatch)
    ctx = BigDatalogContext(spark, EngineConfig(**_TINY_GROWTH))
    # t(D,C) binds nothing on the A->B chain: off-chain clique occurrence
    ctx.load_program(
        "database({e(S:integer, D:integer)})."
        "t(A,B) <- e(A,B)."
        "t(A,B) <- t(A,C), t(C,B), t(9,C)."
    )
    ctx.register_data("e", ["0,1", "1,2", "9,1", "9,2"])
    got = sorted(tuple(r) for r in ctx.query("t(0,B).").collect())
    # python model: t grows with rule t(a,b) <- t(a,c),t(c,b),t(9,c)
    t = {(0, 1), (1, 2), (9, 1), (9, 2)}
    while True:
        new = {
            (a, b)
            for (a, c) in t
            for (c2, b) in t
            if c == c2 and (9, c) in t
        } - t
        if not new:
            break
        t |= new
    assert got == sorted((a, b) for (a, b) in t if a == 0)
    assert calls == [False]


def test_driver_row_rev_bound_takes_chain_tier(spark, monkeypatch):
    """The dl_tc_nl_bound_rev DRIVER row (bound second position on
    non-linear TC) must be served by the chain-restricted tier — there
    is no left-to-right adornment for it, so without the tier it pays
    the full unbound closure."""
    import __spark_entry__ as entry

    calls = _chain_spy(monkeypatch)
    df = entry.queries()["dl_tc_nl_bound_rev"](spark, "/root/testdata/sf0.001")
    rows = sorted(r[0] for r in df.collect())
    assert calls == [True]
    assert rows  # the ancestor chain of the mid vertex
    # ancestors of mid in the binary tree: mid>>1, mid>>2, ..., 1 —
    # derive mid the same way the query does
    from __spark_entry__ import _part_max

    mx = _part_max(spark, "/root/testdata/sf0.001")
    want = []
    v = mx // 2 + 1
    while v > 1:
        v //= 2
        want.append(v)
    assert rows == sorted(want)


def test_chain_fallback_mutual_clique(spark, monkeypatch):
    """Chain fallback over a MUTUAL clique (p/q alternate down edges).
    The magic transformation serves mutual chains itself (stratified
    magic — linear reachability — even when the guarded clique runs
    distributed), so the fallback is reached only when the transform
    declines: force that decline to pin the tier's mutual-clique
    soundness (the restriction must keep BOTH predicates' exit seeds
    demand-correct)."""
    calls = _chain_spy(monkeypatch)
    monkeypatch.setattr(
        C.BigDatalogContext,
        "_magic_bound_general",
        lambda self, goal, clique, bound: None,
    )
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "p(X,Y) <- arc(X,Y)."
        "p(X,Y) <- arc(X,Z), q(Z,Y)."
        "q(X,Y) <- arc(X,Z), p(Z,Y)."
    )
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (7, 8)]
    ctx.register_data("arc", [f"{s},{d}" for s, d in edges])
    got = sorted(r[1] for r in ctx.query("p(0,Y).").collect())
    # p(0,Y): odd path-lengths from 0 -> 1, 3, 5
    assert got == [1, 3, 5]
    assert calls == [True]


def _nl_tc_closure(edges):
    t = set(edges)
    while True:
        new = {(a, d) for (a, b) in t for (c, d) in t if b == c} - t
        if not new:
            break
        t |= new
    return t


def test_chain_fallback_distributed_reach_parity(spark, monkeypatch):
    """chain_fetch_max_rows=0 forces the DISTRIBUTED reach loop — the
    beyond-gate branch that had never executed before r09 — which must
    answer identically to the default driver-BFS path and the python
    closure (the test_null_store_beyond_broadcast_gate pattern)."""
    from bigdatalog_spark.datalog.context import EngineConfig

    calls = _chain_spy(monkeypatch)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)]
    prog = (
        "database({e(S:integer, D:integer)})."
        "t(A,B) <- e(A,B)."
        "t(A,B) <- t(A,C), t(C,B)."
    )
    want = sorted(b for (a, b) in _nl_tc_closure(edges) if a == 0)
    for cfg in (
        EngineConfig(**_TINY_GROWTH),
        EngineConfig(chain_fetch_max_rows=0, **_TINY_GROWTH),
    ):
        ctx = BigDatalogContext(spark, cfg)
        ctx.load_program(prog)
        ctx.register_data("e", [f"{s},{d}" for s, d in edges])
        got = sorted(r[1] for r in ctx.query("t(0,B).").collect())
        assert got == want
    assert calls == [True, True]


def test_chain_fallback_honors_driver_local_off(spark, monkeypatch):
    """EngineConfig.driver_local=False must skip the driver fetch entirely
    (zero __s/__d toPandas calls — ADVICE r08) and serve the goal through
    the distributed reach loop."""
    from bigdatalog_spark.datalog.context import EngineConfig

    calls = _chain_spy(monkeypatch)
    df_cls = type(spark.range(1))
    orig = df_cls.toPandas
    fetches = []

    def spy_fetch(self):
        if list(self.columns) == ["__s", "__d"]:
            fetches.append(len(self.columns))
        return orig(self)

    monkeypatch.setattr(df_cls, "toPandas", spy_fetch)
    edges = [(0, 1), (1, 2), (2, 3), (7, 8)]
    ctx = BigDatalogContext(
        spark, EngineConfig(driver_local=False, **_TINY_GROWTH)
    )
    ctx.load_program(
        "database({e(S:integer, D:integer)})."
        "t(A,B) <- e(A,B)."
        "t(A,B) <- t(A,C), t(C,B)."
    )
    ctx.register_data("e", [f"{s},{d}" for s, d in edges])
    got = sorted(r[1] for r in ctx.query("t(0,B).").collect())
    assert got == sorted(b for (a, b) in _nl_tc_closure(edges) if a == 0)
    assert calls == [True]
    assert fetches == []


def test_chain_fallback_stats_fastpath_skips_fetch(spark, monkeypatch, tmp_path):
    """A parquet-backed edge set whose FINITE Catalyst stats sit >=16x over
    the (tiny, forced) gate skips the driver fetch outright — zero __s/__d
    toPandas — and still answers via the distributed reach loop. In-memory
    relations (Long.MaxValue stats = unknown) keep the fused fetch."""
    from bigdatalog_spark.datalog.context import EngineConfig

    calls = _chain_spy(monkeypatch)
    path = str(tmp_path / "edges.parquet")
    n = 512
    spark.createDataFrame(
        [(i, i + 1) for i in range(n)] + [(n + 5, n + 6)], ["s", "d"]
    ).coalesce(1).write.mode("overwrite").parquet(path)

    df_cls = type(spark.range(1))
    orig = df_cls.toPandas
    fetches = []

    def spy_fetch(self):
        if list(self.columns) == ["__s", "__d"]:
            fetches.append(len(self.columns))
        return orig(self)

    monkeypatch.setattr(df_cls, "toPandas", spy_fetch)
    ctx = BigDatalogContext(
        spark, EngineConfig(chain_fetch_max_rows=4, **_TINY_GROWTH)
    )
    ctx.load_program(
        "database({e(S:integer, D:integer)})."
        "t(A,B) <- e(A,B)."
        "t(A,B) <- t(A,C), t(C,B)."
    )
    ctx.register("e", spark.read.parquet(path))
    got = sorted(r[1] for r in ctx.query(f"t({n - 3},B).").collect())
    assert got == [n - 2, n - 1, n]
    assert calls == [True]
    assert fetches == []
