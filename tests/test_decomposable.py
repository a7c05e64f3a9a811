"""Decomposable-program (GPS) local fixpoint — equivalence vs the
distributed loop, and eligibility/fallback conditions.

The reference plans recursion partitioning with the Generalized Pivot Set
solver (GeneralizedPivotSetInfo.scala:30-170); our equivalent runs eligible
cliques entirely inside one mapInPandas job (datalog/local_eval.py). These
tests pin that both engines agree, and that every ineligible shape falls
back to the distributed loop rather than computing wrong answers."""

import random

import pytest

from bigdatalog_spark import BigDatalogContext
from bigdatalog_spark.datalog.context import EngineConfig
from bigdatalog_spark.datalog.semantics import analyze

TC = (
    "database({arc(From:integer, To:integer)})."
    "tc(A,B) <- arc(A,B)."
    "tc(A,B) <- tc(A,C), arc(C,B)."
)


def _ctx(spark, program, data, **cfg):
    ctx = BigDatalogContext(spark, EngineConfig(**cfg))
    ctx.load_program(program)
    for name, lines in data.items():
        ctx.register_data(name, lines)
    return ctx


def _rows(ctx, goal):
    return sorted(tuple(r) for r in ctx.query(goal).collect())


def _info(ctx, pred):
    clique = analyze(ctx.program).clique_of[pred]
    return ctx._decomposable_info(clique)


def _random_arcs(seed, n_nodes=40, n_edges=90):
    rng = random.Random(seed)
    edges = {
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    }
    return [f"{a},{b}" for a, b in edges]


# ------------------------------------------------------------- equivalence
@pytest.mark.parametrize("seed", [1, 2])
def test_tc_local_matches_distributed(spark, seed):
    arcs = _random_arcs(seed)
    local = _rows(_ctx(spark, TC, {"arc": arcs}), "tc(A,B).")
    dist = _rows(
        _ctx(spark, TC, {"arc": arcs}, decomposable_local=False), "tc(A,B)."
    )
    assert local == dist and len(local) > 0


def test_right_linear_tc_local_matches_distributed(spark):
    prog = (
        "database({arc(From:integer, To:integer)})."
        "rtc(A,B) <- arc(A,B)."
        "rtc(A,B) <- arc(A,C), rtc(C,B)."
    )
    arcs = _random_arcs(7)
    local = _rows(_ctx(spark, prog, {"arc": arcs}), "rtc(A,B).")
    dist = _rows(
        _ctx(spark, prog, {"arc": arcs}, decomposable_local=False), "rtc(A,B)."
    )
    assert local == dist


def test_bound_goal_uses_local_path(spark):
    arcs = [f"{i},{i + 1}" for i in range(50)]
    local = _rows(_ctx(spark, TC, {"arc": arcs}), "tc(0,B).")
    dist = _rows(
        _ctx(spark, TC, {"arc": arcs}, decomposable_local=False), "tc(0,B)."
    )
    assert local == dist == [(0, i) for i in range(1, 51)]


def test_monotonic_apsp_local_matches_distributed(spark):
    prog = (
        "database({edge(From:integer, To:integer, W:integer)})."
        "apsp(X,Y,mmin<D>) <- edge(X,Y,D)."
        "apsp(X,Y,mmin<D>) <- apsp(X,Z,D1), edge(Z,Y,W), D = D1 + W."
    )
    rng = random.Random(3)
    edges = [
        f"{a},{b},{rng.randrange(1, 10)}"
        for a, b in {(rng.randrange(25), rng.randrange(25)) for _ in range(60)}
    ]
    ctx = _ctx(spark, prog, {"edge": edges})
    assert _info(ctx, "apsp") is not None  # pivot = source column
    local = _rows(ctx, "apsp(X,Y,D).")
    dist = _rows(
        _ctx(spark, prog, {"edge": edges}, decomposable_local=False),
        "apsp(X,Y,D).",
    )
    assert local == dist and len(local) > 0


def test_comparison_and_arith_in_recursive_rule(spark):
    # bounded counting: values derived via arithmetic + filter inside the loop
    prog = (
        "database({start(X:integer)})."
        "cnt(X,N) <- start(X), N = 0."
        "cnt(X,N) <- cnt(X,M), N = M + 1, N <= 5."
    )
    data = {"start": ["10", "20"]}
    ctx = _ctx(spark, prog, data)
    assert _info(ctx, "cnt") is not None
    local = _rows(ctx, "cnt(X,N).")
    dist = _rows(_ctx(spark, prog, data, decomposable_local=False), "cnt(X,N).")
    assert local == dist
    assert local == sorted((x, n) for x in (10, 20) for n in range(6))


# ------------------------------------------------------------- eligibility
def test_nonlinear_not_decomposable(spark):
    prog = (
        "database({arc(From:integer, To:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B)."
    )
    ctx = _ctx(spark, prog, {"arc": ["0,1"]})
    assert _info(ctx, "tc") is None


def test_unstable_pivot_not_decomposable(spark):
    # reach's head var comes from the static side — no position is preserved
    prog = (
        "database({arc(From:integer, To:integer)})."
        "reach(B) <- B = 0."
        "reach(B) <- reach(A), arc(A,B)."
    )
    ctx = _ctx(spark, prog, {"arc": ["0,1"]})
    assert _info(ctx, "reach") is None


def test_mutual_recursion_not_decomposable(spark):
    prog = (
        "database({arc(From:integer, To:integer)})."
        "ev(X) <- X = 0."
        "od(Y) <- ev(X), arc(X,Y)."
        "ev(Y) <- od(X), arc(X,Y)."
    )
    ctx = _ctx(spark, prog, {"arc": ["0,1", "1,2"]})
    assert _info(ctx, "ev") is None


def test_oversized_statics_fall_back(spark):
    arcs = [f"{i},{i + 1}" for i in range(30)]
    ctx = _ctx(spark, TC, {"arc": arcs}, broadcast_max_bytes=64)
    clique = analyze(ctx.program).clique_of["tc"]
    assert ctx._decomposable_info(clique) is not None  # shape eligible
    assert ctx._local_statics(["arc"]) is None  # but over the byte gate
    # and the query still answers correctly via the distributed loop
    assert len(_rows(ctx, "tc(A,B).")) == 30 * 31 // 2


# ------------------------------------------------------- seed-broadcast mode
def test_single_source_reach_seed_broadcast(spark):
    prog = (
        "database({arc(From:integer, To:integer)})."
        "reach(B) <- B = 0."
        "reach(B) <- reach(A), arc(A,B)."
    )
    arcs = _random_arcs(11, n_nodes=30, n_edges=70) + ["0,1"]
    ctx = _ctx(spark, prog, {"arc": arcs})
    assert _info(ctx, "reach") is None  # no stable pivot → seed-broadcast
    local = _rows(ctx, "reach(B).")
    dist = _rows(
        _ctx(spark, prog, {"arc": arcs}, decomposable_local=False), "reach(B)."
    )
    assert local == dist and len(local) > 1


def test_mutual_clique_seed_broadcast_both_preds(spark):
    prog = (
        "database({arc(From:integer, To:integer)})."
        "ev(X) <- X = 0."
        "od(Y) <- ev(X), arc(X,Y)."
        "ev(Y) <- od(X), arc(X,Y)."
    )
    arcs = [f"{i},{i + 1}" for i in range(40)] + ["20,3", "39,0"]
    for goal in ("ev(X).", "od(X)."):
        local = _rows(_ctx(spark, prog, {"arc": arcs}), goal)
        dist = _rows(
            _ctx(spark, prog, {"arc": arcs}, decomposable_local=False), goal
        )
        assert local == dist and len(local) > 0


def test_single_source_sssp_seed_broadcast(spark):
    prog = (
        "database({edge(F:integer, T:integer, W:integer)})."
        "sp(Y, mmin<D>) <- Y = 0, D = 0."
        "sp(Y, mmin<D>) <- sp(X, D1), edge(X, Y, W), D = D1 + W."
    )
    rng = random.Random(5)
    edges = [
        f"{a},{b},{rng.randrange(1, 8)}"
        for a, b in {(rng.randrange(20), rng.randrange(20)) for _ in range(50)}
    ] + ["19,0,1"]
    local = _rows(_ctx(spark, prog, {"edge": edges}), "sp(Y,D).")
    dist = _rows(
        _ctx(spark, prog, {"edge": edges}, decomposable_local=False), "sp(Y,D)."
    )
    assert local == dist and len(local) > 0


def test_large_seed_falls_back_to_distributed(spark):
    # cc-style: every node seeds the monotonic table; with a tiny row gate
    # the local path must decline and the distributed loop still answers
    prog = (
        "database({arc(From:integer, To:integer)})."
        "cc3(X, mmin<X>) <- arc(X, _)."
        "cc3(Y, mmin<V>) <- cc3(X, V), arc(X, Y)."
    )
    arcs = [f"{i},{i + 1}" for i in range(30)]
    small = _rows(
        _ctx(spark, prog, {"arc": arcs}, local_seed_max_rows=5), "cc3(X,V)."
    )
    dist = _rows(
        _ctx(spark, prog, {"arc": arcs}, decomposable_local=False), "cc3(X,V)."
    )
    assert small == dist and len(small) == 31


def test_row_probe_gates_in_memory_relations(spark):
    # register_data relations have no Catalyst stats; the bounded row probe
    # must still admit small ones
    ctx = _ctx(spark, TC, {"arc": ["0,1", "1,2"]})
    est = ctx._estimated_bytes(ctx._pred_df("arc"), 1 << 20)
    assert est is not None and 0 < est < (1 << 20)
