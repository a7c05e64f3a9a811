"""Typed error paths of the Datalog front end (the reference's DeALS jar
raised compile errors for these; our engine must raise typed Python
exceptions, never Py4J stack traces)."""

import pytest

from bigdatalog_spark import BigDatalogContext
from bigdatalog_spark.datalog.parser import DatalogParseError
from bigdatalog_spark.datalog.semantics import DatalogSemanticError

ARC = "database({arc(A:integer, B:integer)})."


def test_garbage_program_raises_parse_error(spark):
    with pytest.raises(DatalogParseError, match="unexpected character"):
        BigDatalogContext(spark).load_program("this is @@ not datalog")


def test_unknown_type_raises_parse_error(spark):
    with pytest.raises(DatalogParseError, match="unknown type 'wat'"):
        BigDatalogContext(spark).load_program("database({arc(A:wat)}).")


def test_query_without_registered_data(spark):
    ctx = BigDatalogContext(spark)
    ctx.load_program(ARC + " p(X) <- arc(X,_).")
    with pytest.raises(DatalogSemanticError, match="no data registered"):
        ctx.query("p(X).")


def test_negation_inside_own_clique_unstratifiable(spark):
    ctx = BigDatalogContext(spark)
    ctx.load_program(ARC + " p(X) <- arc(X,Y), ~p(Y).")
    ctx.register_data("arc", ["1,2"])
    with pytest.raises(DatalogSemanticError, match="unstratifiable"):
        ctx.query("p(X).")


def test_goal_arity_mismatch(spark):
    ctx = BigDatalogContext(spark)
    ctx.load_program(ARC + " p(X) <- arc(X,_).")
    ctx.register_data("arc", ["1,2"])
    with pytest.raises(DatalogSemanticError, match="arity"):
        ctx.query("p(X,Y).")


def test_unknown_goal_predicate(spark):
    ctx = BigDatalogContext(spark)
    ctx.load_program(ARC)
    ctx.register_data("arc", ["1,2"])
    with pytest.raises(DatalogSemanticError, match="unknown predicate"):
        ctx.query("nosuch(X).")


def test_register_width_mismatch(spark):
    ctx = BigDatalogContext(spark)
    ctx.load_program(ARC)
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    with pytest.raises(DatalogSemanticError, match="width"):
        ctx.register("arc", df)


def test_register_data_undeclared_relation(spark):
    ctx = BigDatalogContext(spark)
    ctx.load_program(ARC)
    with pytest.raises(DatalogSemanticError, match="not declared"):
        ctx.register_data("ghost", ["1"])


def test_create_view_composes_with_sql(spark):
    """Datalog results registered as temp views join with plain SQL."""
    from bigdatalog_spark import BigDatalogContext

    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(From:integer, To:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), arc(C,B)."
    )
    ctx.register_data("arc", ["0,1", "1,2", "2,3"])
    ctx.create_view("tc_view", "tc(A,B).")
    got = spark.sql(
        "SELECT A, count(*) AS n FROM tc_view GROUP BY A ORDER BY A"
    ).collect()
    assert [(r["A"], r["n"]) for r in got] == [(0, 3), (1, 2), (2, 1)]
