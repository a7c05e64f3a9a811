"""Port of RecursiveQuerySuite (RecursiveQuerySuites.scala:20-201):
TC left/right/non-linear, bound TC, Reach, mutual recursion,
same-generation, MLM (recursion + stratified aggregation + arithmetic),
3-ary TC."""

import pytest

from .conftest import run_case
from .golden import (
    GRAPH1,
    GRAPH2,
    GRAPH7,
    MLM_SALES,
    MLM_SCHEDULE,
    MLM_SPONSORS,
    PARENT_CHILD,
    PARENT_CHILD2,
    TC_ANSWERS1,
    TC_ANSWERS2,
)

ARC_DB = "database({arc(From:integer, To:integer)})."

LL_TC = ARC_DB + (
    "leftLinearPaths(A,B) <- arc(A,B)."
    "leftLinearPaths(A,B) <- leftLinearPaths(A,C), arc(C,B)."
)


def test_tc_left_linear_graph1(spark):
    run_case(spark, LL_TC, "leftLinearPaths(A,B).", {"arc": GRAPH1}, TC_ANSWERS1)


def test_tc_left_linear_graph2_cyclic(spark):
    run_case(spark, LL_TC, "leftLinearPaths(A,B).", {"arc": GRAPH2}, TC_ANSWERS2)


def test_tc_left_linear_self_seed(spark):
    program = ARC_DB + (
        "leftLinearPaths(A,A) <- arc(A,_)."
        "leftLinearPaths(A,B) <- leftLinearPaths(A,C), arc(C,B)."
    )
    answers1 = TC_ANSWERS1 + [
        (4, 4), (9, 9), (1, 1), (6, 6), (8, 8), (3, 3), (0, 0), (7, 7), (2, 2)
    ]
    answers2 = TC_ANSWERS2 + [(6, 6), (5, 5)]
    run_case(spark, program, "leftLinearPaths(A,B).", {"arc": GRAPH1}, answers1)
    run_case(spark, program, "leftLinearPaths(A,B).", {"arc": GRAPH2}, answers2)


def test_tc_right_linear(spark):
    program = ARC_DB + (
        "rightLinearPaths(A,B) <- arc(A,B)."
        "rightLinearPaths(A,B) <- arc(A,C), rightLinearPaths(C,B)."
    )
    run_case(spark, program, "rightLinearPaths(A,B).", {"arc": GRAPH1}, TC_ANSWERS1)
    run_case(spark, program, "rightLinearPaths(A,B).", {"arc": GRAPH2}, TC_ANSWERS2)


def test_tc_non_linear(spark):
    program = ARC_DB + (
        "nonLinearPaths(A,B) <- arc(A,B)."
        "nonLinearPaths(A,B) <- nonLinearPaths(A,C), nonLinearPaths(C,B)."
    )
    run_case(spark, program, "nonLinearPaths(A,B).", {"arc": GRAPH1}, TC_ANSWERS1)
    run_case(spark, program, "nonLinearPaths(A,B).", {"arc": GRAPH2}, TC_ANSWERS2)


def test_tc_bound_first_argument(spark):
    answers1 = [(0, 1), (0, 6), (0, 2), (0, 7), (0, 3), (0, 8), (0, 4), (0, 9),
                (0, 5), (0, 10)]
    answers2 = [(3, 1), (3, 4), (3, 5), (3, 0), (3, 2), (3, 8), (3, 3)]
    run_case(spark, LL_TC, "leftLinearPaths(0,B).", {"arc": GRAPH1}, answers1)
    run_case(spark, LL_TC, "leftLinearPaths(3,B).", {"arc": GRAPH2}, answers2)


def test_reach(spark):
    def program(start):
        return ARC_DB + (
            f"reach(A) <- A={start}."
            "reach(A) <- reach(B), arc(B,A)."
        )

    run_case(spark, program(0), "reach(A).", {"arc": GRAPH1},
             [(i,) for i in range(11)])
    run_case(spark, program(1), "reach(A).", {"arc": GRAPH2},
             [(0,), (1,), (2,), (3,), (4,), (5,), (8,)])


def test_mutual_recursion(spark):
    program = ARC_DB + (
        "three(A,B,C) <- arc(A,B), arc(B,C)."
        "three(A,B,D) <- three2(A,B,C), arc(C,D)."
        "three2(A,B,D) <- three(A,B,C), arc(C,D)."
    )
    answers1 = [
        (0, 1, 2), (1, 2, 3), (2, 3, 4), (3, 4, 5), (0, 6, 7), (6, 7, 8),
        (7, 8, 9), (8, 9, 10), (0, 1, 4), (1, 2, 5), (0, 6, 9), (6, 7, 10),
    ]
    answers2 = [
        (1, 2, 3), (2, 3, 1), (2, 3, 4), (2, 3, 5), (3, 1, 0), (3, 1, 2),
        (3, 5, 8), (6, 5, 8), (1, 2, 0), (1, 2, 2), (1, 2, 8), (2, 3, 3),
        (3, 1, 1), (3, 1, 4), (3, 1, 5), (1, 2, 1), (1, 2, 4), (1, 2, 5),
        (2, 3, 0), (2, 3, 2), (2, 3, 8), (3, 1, 3), (3, 1, 8),
    ]
    run_case(spark, program, "three(A,B,C).", {"arc": GRAPH1}, answers1)
    run_case(spark, program, "three(A,B,C).", {"arc": GRAPH2}, answers2)


def test_same_generation(spark):
    database = "database({parent_child(Parent:integer, Child:integer)})."
    program = database + (
        "same_generation(X,Y) <- parent_child(Parent,X), parent_child(Parent,Y), X ~= Y."
        "same_generation(X,Y) <- parent_child(A,X), same_generation(A,B), parent_child(B,Y)."
    )
    answers1 = [(8, 9), (9, 6), (6, 9), (9, 8), (8, 6), (5, 4), (4, 5), (6, 8)]
    answers2 = [(-1, 1), (1, -1), (-2, 2), (2, -2), (-3, 3), (3, -3), (-4, 4),
                (4, -4), (-5, 5), (5, -5)]
    run_case(spark, program, "same_generation(A,B)",
             {"parent_child": PARENT_CHILD}, answers1)
    run_case(spark, program, "same_generation(A,B)",
             {"parent_child": PARENT_CHILD2}, answers2)


MLM_DATABASE = (
    "database({"
    "sponsor(M:integer, NM:integer), "
    "sales(M:integer, S:float, P:float), "
    "schedule(LS:float, RS:float, BP:float)})."
)
MLM_PROGRAM = MLM_DATABASE + (
    "member_sales(M, sum<S>) <- sales(M, S, _)."
    "network_tc(M, M) <- sponsor(M, _)."
    "network_tc(M, M) <- sponsor(_, M)."
    "network_tc(M, M2) <- network_tc(M, M1), sponsor(M1, M2)."
    "member_total_sales(M, sum<S>) <- network_tc(M, NM), member_sales(NM, S)."
    "member_bonus_self(M, B) <- member_sales(M, ST), member_total_sales(M, S), "
    "schedule(LS, RS, BP), S >= LS, S < RS, B = ST * BP."
    "member_bonus_frontline(M, sum<B>) <- sponsor(M, NM), member_total_sales(NM, S), "
    "schedule(LS, RS, BP), S >= LS, S < RS, B = S * BP."
    "bonus(sum<B>) <- member_bonus_self(M,B1), member_bonus_frontline(M,B2), B=B1+B2."
    "gross_profit(sum<P>) <- sales(_, _, P)."
    "net_profit(NP) <- gross_profit(P), bonus(B), NP = P - B."
)
MLM_DATA = {"sponsor": MLM_SPONSORS, "sales": MLM_SALES, "schedule": MLM_SCHEDULE}


@pytest.mark.parametrize(
    "query,expected",
    [
        ("network_tc(A,B)", [(1, 1), (2, 2), (3, 3), (4, 4), (1, 2), (1, 3), (2, 4), (1, 4)]),
        ("member_sales(A,B)", [(1, 179.0), (2, 39.0), (3, 19.0), (4, 94.0), (5, 117.0)]),
        ("member_total_sales(A,B)", [(1, 331.0), (2, 133.0), (3, 19.0), (4, 94.0)]),
        ("member_bonus_self(A,B)", [(1, 10.739999759942293), (2, 1.169999973848462)]),
        ("member_bonus_frontline(A,B)", [(1, 3.9899999108165503)]),
        ("gross_profit(A)", [(110.0,)]),
        # DEVIATION from the reference goldens (RecursiveQuerySuites.scala:169-173):
        # the reference expects bonus=19.8899... / net_profit=90.1100..., which is
        # only derivable by CROSS-joining member_bonus_self x member_bonus_frontline
        # (2 self rows x 1 frontline row, double-counting B2) — i.e. the DeALS jar
        # did not unify the shared variable M across the two subgoals. Standard
        # Datalog semantics (shared var => equi-join on M) yields:
        #   bonus = 10.7399997599 + 3.9899999108 = 14.7299996707
        #   net_profit = 110.0 - bonus = 95.2700003292
        ("bonus(A)", [(14.729999670758843,)]),
        ("net_profit(A)", [(95.27000032924116,)]),
    ],
)
def test_multi_level_marketing(spark, query, expected):
    run_case(spark, MLM_PROGRAM, query, MLM_DATA, expected)


def test_tc_three_ary(spark):
    program = ARC_DB + (
        "leftLinearPaths(A,B,B) <- arc(A,B)."
        "leftLinearPaths(B,C,D) <- leftLinearPaths(A,B,C), arc(C,D)."
    )
    answers = [
        (0, 1, 1), (0, 2, 2), (2, 1, 1), (1, 3, 3), (3, 1, 1), (1, 0, 0),
        (1, 1, 3), (1, 1, 0), (2, 2, 1), (3, 3, 1), (0, 0, 1), (0, 0, 2),
        (1, 3, 1), (1, 0, 1), (1, 0, 2), (2, 1, 3), (2, 1, 0), (3, 1, 3),
        (3, 1, 0), (0, 1, 3), (0, 1, 0), (0, 2, 1),
    ]
    run_case(spark, program, "leftLinearPaths(A,B,C).", {"arc": GRAPH7}, answers)


def test_oversized_static_side_falls_back_to_persist(spark):
    """A static join side above broadcast_max_bytes must not be broadcast
    (at 100 TB a forced hint would OOM); the persist fallback keeps the
    fixpoint correct."""
    from bigdatalog_spark.datalog.context import BigDatalogContext, EngineConfig

    ctx = BigDatalogContext(spark, EngineConfig(broadcast_max_bytes=1))
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), arc(C,B)."
    )
    ctx.register_data("arc", ["0,1", "1,2", "2,3"])
    got = sorted((r[0], r[1]) for r in ctx.query("tc(A,B).").collect())
    assert got == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def test_bound_goal_pushes_into_fixpoint_seed(spark):
    """tc(0,B) on left-linear TC must equal full-closure-then-filter, and the
    bound rewrite must not pollute the unbound query's cache."""
    from bigdatalog_spark.datalog.context import BigDatalogContext

    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), arc(C,B)."
    )
    ctx.register_data("arc", ["0,1", "1,2", "2,3", "4,5", "5,0"])
    bound = sorted(r[1] for r in ctx.query("tc(0,B).").collect())
    assert bound == [1, 2, 3]
    # unbound afterwards: full closure, unaffected by the bound run
    full = ctx.query("tc(A,B).").count()
    assert full == 5 + 4 + 3 + 2 + 1  # closure of the 6-node chain 4→5→0→1→2→3

def test_bound_goal_right_linear_second_position(spark):
    """Right-linear TC: only the second argument is stable; tc(A,3) bound."""
    from bigdatalog_spark.datalog.context import BigDatalogContext

    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- arc(A,C), tc(C,B)."
    )
    ctx.register_data("arc", ["0,1", "1,2", "2,3", "7,2"])
    got = sorted(r[0] for r in ctx.query("tc(A,3).").collect())
    assert got == [0, 1, 2, 7]

def test_bound_goal_nonlinear_takes_demand_path(spark):
    """Non-linear TC bound on the FIRST argument takes the generalized
    adorned magic-sets path (context._magic_bound_general): the left
    occurrence inherits the head's demand and the right occurrence's
    demand flows through the left's guarded results — the transformed
    program is mutually recursive (magic ⇄ guarded). Verified both by
    the answer and by the demand predicates landing in the cache; the
    unreachable component (5→6→7) must never be explored."""
    from bigdatalog_spark.datalog.context import BigDatalogContext

    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B)."
    )
    ctx.register_data("arc", ["0,1", "1,2", "2,3", "5,6", "6,7"])
    got = sorted(r[1] for r in ctx.query("tc(0,B).").collect())
    assert got == [1, 2, 3]
    magic = [k for k in ctx._cache if k.startswith("__magic_tc")]
    guarded = [k for k in ctx._cache if k.startswith("__bound_tc")]
    assert magic and guarded, sorted(ctx._cache)
    # the demand set is exactly the 0-reachable vertices (0 plus the
    # closure targets); the 5→6→7 component is never demanded
    demand = sorted(r[0] for r in ctx._cache[magic[0]].collect())
    assert demand == [0, 1, 2, 3], demand


def test_bound_goal_nonlinear_second_position_falls_back(spark):
    """Non-linear TC bound on the SECOND argument: left-to-right SIP
    cannot restrict the first occurrence (both its arguments are free at
    that point), so the rewrite must decline and the full fixpoint +
    filter fallback stays correct."""
    from bigdatalog_spark.datalog.context import BigDatalogContext

    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B)."
    )
    ctx.register_data("arc", ["0,1", "1,2", "2,3"])
    got = sorted(r[0] for r in ctx.query("tc(A,3).").collect())
    assert got == [0, 1, 2]
    assert not [k for k in ctx._cache if k.startswith("__magic")]


def test_bound_goal_mutual_clique_takes_demand_path(spark):
    """Bound goal on a MUTUAL recursive clique: each clique predicate
    gets its own adorned magic/guarded pair and the whole transformed
    program evaluates as one mutually recursive clique. The disconnected
    8/9 component must stay out of the demand set."""
    from bigdatalog_spark.datalog.context import BigDatalogContext

    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({a(S:integer, D:integer), b(S:integer, D:integer)})."
        "p(X,Y) <- a(X,Y)."
        "p(X,Y) <- a(X,Z), q(Z,Y)."
        "q(X,Y) <- b(X,Z), p(Z,Y)."
    )
    ctx.register_data("a", ["0,1", "1,2", "2,4", "8,9"])
    ctx.register_data("b", ["2,0", "4,1", "9,8"])
    got = sorted(tuple(r) for r in ctx.query("p(0,Y).").collect())
    # full fixpoint cross-check computed by hand is brittle here; compare
    # against the engine's own unbound query + filter
    ctx2 = BigDatalogContext(spark)
    ctx2.load_program(
        "database({a(S:integer, D:integer), b(S:integer, D:integer)})."
        "p(X,Y) <- a(X,Y)."
        "p(X,Y) <- a(X,Z), q(Z,Y)."
        "q(X,Y) <- b(X,Z), p(Z,Y)."
    )
    ctx2.register_data("a", ["0,1", "1,2", "2,4", "8,9"])
    ctx2.register_data("b", ["2,0", "4,1", "9,8"])
    want = sorted(
        tuple(r) for r in ctx2.query("p(X,Y).").filter("X = 0").collect()
    )
    assert got == want and got, got
    for q in ("p", "q"):
        assert [k for k in ctx._cache if k.startswith(f"__magic_{q}")]
    # demand for p never reaches the disconnected component
    mp = [k for k in ctx._cache if k.startswith("__magic_p")][0]
    assert 8 not in {r[0] for r in ctx._cache[mp].collect()}
