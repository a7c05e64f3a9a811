"""Ordered-step funnel analysis tests."""

import datetime as dt

from pyspark.sql import functions as F

from bigdatalog_spark.operators.funnel import funnel


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, base + dt.timedelta(minutes=m), t) for u, m, t in rows],
        ["user_id", "ts", "event_type"],
    )


def test_funnel_orders_steps(spark):
    e = _ev(spark, [
        # user 1 completes in order
        (1, 0, "view"), (1, 5, "click"), (1, 10, "purchase"),
        # user 2 clicks BEFORE viewing, never clicks after -> stuck at 1
        (2, 0, "click"), (2, 5, "view"), (2, 7, "purchase"),
        # user 3 views only
        (3, 0, "view"),
        # user 4 never views -> absent
        (4, 0, "click"),
    ])
    out = {r["user_id"]: r["reached"]
           for r in funnel(e, ["view", "click", "purchase"]).collect()}
    assert out == {1: 3, 2: 1, 3: 1}


def test_funnel_within_horizon(spark):
    e = _ev(spark, [
        (1, 0, "view"), (1, 30, "click"),
        (2, 0, "view"), (2, 120, "click"),   # beyond 1 hour of t_1
    ])
    out = {r["user_id"]: (r["reached"], r["t_2"] is not None)
           for r in funnel(e, ["view", "click"], within="1 hour").collect()}
    assert out == {1: (2, True), 2: (1, False)}


def test_funnel_earliest_qualifying_times(spark):
    e = _ev(spark, [
        (1, 0, "view"), (1, 2, "view"),
        (1, 1, "click"),                     # after first view: qualifies
        (1, 9, "click"),
    ])
    r = funnel(e, ["view", "click"]).first()
    assert r["t_1"].minute == 0 and r["t_2"].minute == 1


def test_funnel_rejects_single_step(spark):
    import pytest

    e = _ev(spark, [(1, 0, "view")])
    with pytest.raises(ValueError):
        funnel(e, ["view"])
