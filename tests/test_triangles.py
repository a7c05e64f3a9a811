"""Port of TriangleQuerySuite (NonRecursiveQuerySuites.scala:275-319):
triangle counting, triangle closing with negation + count, PYMK with
sort((Z,desc)) + limit(10)."""

from .conftest import run_case
from .golden import (
    PAGES,
    TRIANGLES_GRAPH1,
    TRIANGLES_GRAPH2,
    TRIANGLES_GRAPH3,
    TRIANGLES_GRAPH4,
    TRIANGLES_GRAPH5,
)

DATABASE = "database({arc(X:integer, Y:integer)})."

TRIANGLE_PROGRAM = DATABASE + (
    "triangles(X,Y,Z) <- arc(X,Y),X < Y, arc(Y,Z), Y < Z, arc(Z,X)."
    "triangle_count(count<_>) <- triangles(X,Y,Z)."
)

CLOSING_PROGRAM = DATABASE + (
    "uarc(X, Y) <- arc(X, Y)."
    "uarc(Y, X) <- arc(X, Y)."
    "triangle_closing(Y, Z, count<X>) <- uarc(X,Y), uarc(X,Z), Y ~= Z, ~uarc(Y,Z)."
)


def test_triangle_count_zero(spark):
    run_case(spark, TRIANGLE_PROGRAM, "triangle_count(A)",
             {"arc": TRIANGLES_GRAPH1}, [(0,)])


def test_triangle_count_one(spark):
    run_case(spark, TRIANGLE_PROGRAM, "triangle_count(A)",
             {"arc": TRIANGLES_GRAPH2}, [(1,)])


def test_triangle_count_four(spark):
    run_case(spark, TRIANGLE_PROGRAM, "triangle_count(A)",
             {"arc": TRIANGLES_GRAPH3}, [(4,)])


def test_triangle_closing(spark):
    run_case(spark, CLOSING_PROGRAM, "triangle_closing(A,B,C)",
             {"arc": TRIANGLES_GRAPH1}, [(0, 2, 1), (2, 0, 1)])


def test_triangle_closing_empty(spark):
    run_case(spark, CLOSING_PROGRAM, "triangle_closing(A,B,C)",
             {"arc": TRIANGLES_GRAPH2}, [])


def test_triangle_closing_graph4(spark):
    run_case(spark, CLOSING_PROGRAM, "triangle_closing(A,B,C)",
             {"arc": TRIANGLES_GRAPH4},
             [(1, 2, 2), (2, 1, 2), (0, 3, 2), (3, 0, 2)])


def test_pymk_sort_limit(spark):
    database = (
        "database({"
        "arc(X:integer, Y:integer),"
        "pages(W1:integer, W2:integer, W3:integer, W4:integer, W5:integer, "
        "W6:integer, W7:integer, W8:integer, W9:integer)})."
    )
    program = database + (
        "uarc(X, Y) <- arc(X, Y)."
        "uarc(Y, X) <- arc(X, Y)."
        "triangle_closing(Y, Z, count<X>) <- uarc(X,Y), uarc(X,Z), Y ~= Z, ~uarc(Y,Z)."
        "pymk(X, W9) <- triangle_closing(X, 0, Z),"
        "pages(X, W2, W3, W4, W5, W6, W7, W8, W9), sort((Z, desc)), limit(10)."
    )
    run_case(spark, program, "pymk(A,B)",
             {"arc": TRIANGLES_GRAPH5, "pages": PAGES}, [(4, 4), (3, 3)])
