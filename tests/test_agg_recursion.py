"""Port of AggregatesOverRecursionQuerySuite (RecursiveQuerySuites.scala:204-258)
and AggregatesInRecursionQuerySuite (AggregatesInRecursionQuerySuite.scala):
stratified min over a path fixpoint; mmin shortest paths (LL/NL), SSSP from a
literal seed, connected components via mmin fixpoint → min → countd."""

import os

import pytest

from bigdatalog_spark import BigDatalogContext

from .conftest import run_case
from .golden import (
    GRAPH1B,
    GRAPH1B_WEIGHTED,
    GRAPH3_WEIGHTED,
    GRAPH4_WEIGHTED,
    GRAPH5_WEIGHTED,
    SHORTEST_PATHS1,
    SHORTEST_PATHS2,
    SHORTEST_PATHS3,
    SHORTEST_PATHS4,
    TREE11_PATH,
)

WARC_DB = "database({arc(From:integer, To:integer, D:integer)})."


# ---------------------------------------------------- stratified min over fixpoint

LL_PATH = WARC_DB + (
    "path(X,Y,C) <- arc(X,Y,C)."
    "path(X,Y,C) <- path(X,Z,C1), arc(Z,Y,C2), C=C1+C2."
    "stratified_shortest_path(X,Y,min<C>) <- path(X,Y,C)."
)


def test_min_over_ll_path_fixpoint(spark):
    run_case(spark, LL_PATH, "stratified_shortest_path(A,B,C)",
             {"arc": GRAPH1B_WEIGHTED}, SHORTEST_PATHS1)
    run_case(spark, LL_PATH, "stratified_shortest_path(A,B,C)",
             {"arc": GRAPH3_WEIGHTED}, SHORTEST_PATHS2)


def test_min_over_nl_path_fixpoint(spark):
    program = WARC_DB + (
        "path(X,Y,C) <- arc(X,Y,C)."
        "path(X,Y,C) <- path(X,Z,C1), path(Z,Y,C2), C=C1+C2."
        "stratified_shortest_path(X,Y,min<C>) <- path(X,Y,C)."
    )
    run_case(spark, program, "stratified_shortest_path(A,B,C)",
             {"arc": GRAPH1B_WEIGHTED}, SHORTEST_PATHS1)
    run_case(spark, program, "stratified_shortest_path(A,B,C)",
             {"arc": GRAPH3_WEIGHTED}, SHORTEST_PATHS2)


def test_min_over_rl_path_fixpoint(spark):
    program = WARC_DB + (
        "path(X,Y,C) <- arc(X,Y,C)."
        "path(X,Y,C) <- arc(X,Z,C1), path(Z,Y,C2), C=C1+C2."
        "stratified_shortest_path(X,Y,min<C>) <- path(X,Y,C)."
    )
    run_case(spark, program, "stratified_shortest_path(A,B,C)",
             {"arc": GRAPH1B_WEIGHTED}, SHORTEST_PATHS1)


def test_min_over_path_bound_goal(spark):
    answers1 = [(0, 1, 1), (0, 6, 1), (0, 2, 2), (0, 7, 2), (0, 3, 3),
                (0, 8, 3), (0, 4, 4), (0, 9, 4), (0, 5, 5), (0, 10, 5)]
    answers2 = [(2, 5, 1), (2, 6, 1), (2, 11, 2), (2, 12, 2), (2, 13, 2), (2, 14, 2)]
    run_case(spark, LL_PATH, "stratified_shortest_path(0,B,C)",
             {"arc": GRAPH1B_WEIGHTED}, answers1)
    run_case(spark, LL_PATH, "stratified_shortest_path(2,B,C)",
             {"arc": GRAPH3_WEIGHTED}, answers2)


# ---------------------------------------------------- mmin inside recursion

MMIN_LL = WARC_DB + (
    "mminpath(X,Y,mmin<D>) <- arc(X, Y, D)."
    "mminpath(X,Z,mmin<D>) <- mminpath(X, Y, D1), arc(Y, Z, D2), D = D1 + D2."
    "shortestpaths(X, Z, min<D>) <- mminpath(X, Z, D)."
)

MMIN_NL = WARC_DB + (
    "mminpath(X,Y,mmin<D>) <- arc(X, Y, D)."
    "mminpath(X,Z,mmin<D>) <- mminpath(X, Y, D1), mminpath(Y, Z, D2), D = D1 + D2."
    "shortestpaths(X, Z, min<D>) <- mminpath(X, Z, D)."
)


@pytest.mark.parametrize(
    "arc,expected",
    [
        (GRAPH1B_WEIGHTED, SHORTEST_PATHS1),
        (GRAPH3_WEIGHTED, SHORTEST_PATHS2),
        (GRAPH4_WEIGHTED, SHORTEST_PATHS3),
        (GRAPH5_WEIGHTED, SHORTEST_PATHS4),
    ],
)
def test_mmin_shortest_paths_ll(spark, arc, expected):
    run_case(spark, MMIN_LL, "shortestpaths(A,B,C)", {"arc": arc}, expected)


@pytest.mark.parametrize(
    "arc,expected",
    [
        (GRAPH1B_WEIGHTED, SHORTEST_PATHS1),
        (GRAPH3_WEIGHTED, SHORTEST_PATHS2),
        (GRAPH4_WEIGHTED, SHORTEST_PATHS3),
        (GRAPH5_WEIGHTED, SHORTEST_PATHS4),
    ],
)
def test_mmin_shortest_paths_nl(spark, arc, expected):
    run_case(spark, MMIN_NL, "shortestpaths(A,B,C)", {"arc": arc}, expected)


def test_sssp_from_literal_seed(spark):
    def program(start):
        return WARC_DB + (
            f"mminpath(X,mmin<D>) <- X={start},D=0."
            "mminpath(Z,mmin<D>) <- mminpath(X, D1), arc(X, Z, D2), D = D1 + D2."
            "sssp(X,min<D>) <- mminpath(X,D)."
        )

    run_case(spark, program(0), "sssp(A,B)", {"arc": GRAPH1B_WEIGHTED},
             [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 1), (7, 2),
              (8, 3), (9, 4), (10, 5)])
    run_case(spark, program(1), "sssp(A,B)", {"arc": GRAPH3_WEIGHTED},
             [(1, 0), (3, 1), (4, 1), (7, 2), (8, 2), (9, 2), (10, 2)])
    run_case(spark, program(0), "sssp(A,B)", {"arc": GRAPH4_WEIGHTED},
             [(0, 0), (1, 2), (2, 1)])


CC_PROGRAM = "database({arc(X:integer, Y:integer)})." + (
    "cc3(X,mmin<X>) <- arc(X,_)."
    "cc3(Y,mmin<V>) <- cc3(X,V), arc(X,Y)."
    "cc2(X,min<Y>) <- cc3(X,Y)."
    "cc(countd<X>) <- cc2(_,X)."
)


def test_connected_components_small(spark):
    run_case(spark, CC_PROGRAM, "cc(A)", {"arc": GRAPH1B}, [(1,)])


@pytest.mark.slow
def test_connected_components_tree11(spark):
    """CC on the reference's 71,390-edge tree11 graph = 1320 components
    (AggregatesInRecursionQuerySuite.scala:94)."""
    if not os.path.exists(TREE11_PATH):
        pytest.skip("reference tree11.csv not available")
    ctx = BigDatalogContext(spark)
    ctx.load_program(CC_PROGRAM)
    ctx.register_file("arc", TREE11_PATH)
    rows = ctx.query("cc(A)").collect()
    assert [tuple(r) for r in rows] == [(1320,)]
