"""Parity on the reference's file-backed graph goldens — the largest
correctness fixtures the reference ships (datalog/src/test/resources/).

Connected components over tree11 (71,390 edges) must produce exactly 1,320
components (AggregatesInRecursionQuerySuite.scala:87-94). This exercises
the monotonic fixpoint at real graph size: ~12 iterations, 100k-row deltas,
the scale shape the SetRDD machinery was built for in the reference.
"""

import os

import pytest

from bigdatalog_spark.datalog.context import BigDatalogContext

TREE11 = "/root/reference/datalog/src/test/resources/tree11.csv"

CC_PROGRAM = (
    "database({arc(From:integer, To:integer)})."
    "cc3(X, mmin<X>) <- arc(X, _)."
    "cc3(Y, mmin<V>) <- cc3(X, V), arc(X, Y)."
    "cc2(X, min<Y>) <- cc3(X, Y)."
    "cc(countd<X>) <- cc2(_, X)."
)


@pytest.mark.skipif(not os.path.exists(TREE11), reason="reference data absent")
def test_tree11_connected_components(spark):
    ctx = BigDatalogContext(spark)
    ctx.load_program(CC_PROGRAM)
    ctx.register_file("arc", TREE11)
    rows = ctx.query("cc(A).").collect()
    # golden: AggregatesInRecursionQuerySuite.scala:94 — Seq("[1320]")
    assert [r[0] for r in rows] == [1320]
