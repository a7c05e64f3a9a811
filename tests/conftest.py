import math

import pytest

from bigdatalog_spark import BigDatalogContext, build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="bigdatalog-tests", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def ctx(spark):
    return BigDatalogContext(spark)


def _normalize(row):
    out = []
    for v in row:
        if isinstance(v, float):
            out.append(round(v, 6))
        else:
            out.append(v)
    return tuple(out)


def run_case(spark, program, query, data, expected=None, expected_size=None):
    """Port of the reference golden-test harness (QuerySuite.scala:44-109):
    order-insensitive set comparison, float tolerance, or cardinality-only."""
    ctx = BigDatalogContext(spark)
    ctx.load_program(program)
    for name, lines in data.items():
        ctx.register_data(name, lines)
    df = ctx.query(query)
    rows = [tuple(r) for r in df.collect()]
    if expected is None:
        assert len(rows) == expected_size, f"got {len(rows)} rows, want {expected_size}"
        return
    got = {_normalize(r) for r in rows}
    want = {_normalize(tuple(e)) for e in expected}
    assert len(rows) == len(expected), (
        f"cardinality {len(rows)} != {len(expected)}\n"
        f"unexpected: {sorted(got - want, key=repr)[:10]}\n"
        f"missing: {sorted(want - got, key=repr)[:10]}"
    )
    assert got == want, (
        f"unexpected: {sorted(got - want, key=repr)[:10]}\n"
        f"missing: {sorted(want - got, key=repr)[:10]}"
    )
