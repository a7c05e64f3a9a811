"""Port of NonMonotonicAggregateQuerySuite (NonRecursiveQuerySuites.scala:113-216):
min/max/avg/count/sum/countd, grouped & global, multi-aggregate heads,
aggregate-over-aggregate, arithmetic over aggregate results."""

from .conftest import run_case
from .golden import GRAPH1, PRICES

DATABASE = "database({price(Price:integer, ItemName:string, ItemGroup:string)})."
DATA = {"price": PRICES}


def test_global_max(spark):
    run_case(spark, DATABASE + "max_price(max<Price>) <- price(Price, _, _).",
             "max_price(M).", DATA, [(10,)])


def test_grouped_max(spark):
    run_case(spark, DATABASE + "max_price(ItemGroup, max<Price>) <- price(Price, _, ItemGroup).",
             "max_price(ItemGroup, M).", DATA,
             [("a", 10), ("b", 5), ("c", 5), ("d", 10)])


def test_two_key_max(spark):
    expected = [
        ("gamma", "a", 8), ("gamma", "d", 8), ("beta", "a", 9), ("beta", "d", 9),
        ("alpha", "a", 10), ("alpha", "d", 10), ("zeta", "b", 5), ("zeta", "c", 5),
        ("kappa", "b", 1), ("kappa", "c", 1), ("eta", "b", 4), ("eta", "c", 4),
        ("theta", "b", 3), ("theta", "c", 3), ("iota", "b", 2), ("iota", "c", 2),
        ("delta", "a", 7), ("delta", "d", 7), ("epsilon", "a", 6), ("epsilon", "d", 6),
    ]
    run_case(
        spark,
        DATABASE + "max_price(ItemName, ItemGroup, max<Price>) <- price(Price, ItemName, ItemGroup).",
        "max_price(ItemName, ItemGroup, M).", DATA, expected)


def test_global_min(spark):
    run_case(spark, DATABASE + "min_price(min<Price>) <- price(Price, _, _).",
             "min_price(M).", DATA, [(1,)])


def test_grouped_min(spark):
    run_case(spark, DATABASE + "min_price(ItemGroup, min<Price>) <- price(Price, _, ItemGroup).",
             "min_price(ItemGroup, M).", DATA,
             [("d", 6), ("c", 1), ("a", 6), ("b", 1)])


def test_global_avg(spark):
    run_case(spark, DATABASE + "avg_price(avg<Price>) <- price(Price, _, _).",
             "avg_price(A).", DATA, [(5.5,)])


def test_grouped_avg(spark):
    run_case(spark, DATABASE + "avg_price(ItemGroup, avg<Price>) <- price(Price, _, ItemGroup).",
             "avg_price(ItemGroup, A).", DATA,
             [("d", 8.0), ("c", 3.0), ("a", 8.0), ("b", 3.0)])


def test_aggregate_then_filter_constant(spark):
    program = DATABASE + (
        "avg_price_a(A) <- avg_price(a,A)."
        "avg_price(ItemGroup, avg<Price>) <- price(Price, _, ItemGroup)."
    )
    run_case(spark, program, "avg_price_a(A).", DATA, [(8.0,)])


def test_global_count(spark):
    run_case(spark, DATABASE + "count_price(count<Price>) <- price(Price, _, _).",
             "count_price(C).", DATA, [(20,)])


def test_grouped_count(spark):
    run_case(spark, DATABASE + "count_price(ItemGroup, count<Price>) <- price(Price, _, ItemGroup).",
             "count_price(ItemGroup, C).", DATA,
             [("d", 5), ("c", 5), ("a", 5), ("b", 5)])


def test_global_sum(spark):
    run_case(spark, DATABASE + "sum_price(sum<Price>) <- price(Price, _, _).",
             "sum_price(S).", DATA, [(110,)])


def test_grouped_sum(spark):
    run_case(spark, DATABASE + "sum_price(ItemGroup, sum<Price>) <- price(Price, _, ItemGroup).",
             "sum_price(ItemGroup, S).", DATA,
             [("d", 40), ("c", 15), ("a", 40), ("b", 15)])


def test_multi_aggregate_global(spark):
    run_case(
        spark,
        DATABASE + "sumcountavg_price(sum<Price>, count<Price>, avg<Price>) <- price(Price, _, _).",
        "sumcountavg_price(S, C, A).", DATA, [(110, 20, 5.5)])


def test_multi_aggregate_grouped(spark):
    run_case(
        spark,
        DATABASE + "sumcountavg_price(ItemGroup, sum<Price>, count<Price>, avg<Price>) <- price(Price, _, ItemGroup).",
        "sumcountavg_price(ItemGroup, S, C, A).", DATA,
        [("d", 40, 5, 8.0), ("c", 15, 5, 3.0), ("a", 40, 5, 8.0), ("b", 15, 5, 3.0)])


def test_arithmetic_over_aggregates(spark):
    program = DATABASE + (
        "avg_price_a_b_combined(N) <- avg_price(a,A), avg_price(b,B), N = A + B."
        "avg_price(ItemGroup, avg<Price>) <- price(Price, _, ItemGroup)."
    )
    run_case(spark, program, "avg_price_a_b_combined(N).", DATA, [(11.0,)])


def test_countd_over_union(spark):
    database = "database({arc(From:integer, To:integer)})."
    program = database + (
        "node(A) <- arc(A,_)."
        "node(A) <- arc(_,A)."
        "nodeCount(countd<A>) <- node(A)."
    )
    run_case(spark, program, "nodeCount(A)", {"arc": GRAPH1}, [(11,)])
