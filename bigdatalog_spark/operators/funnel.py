"""Ordered-step funnel analysis over event streams.

The event-analytics counterpart of the sessionization ops in
streaming/ops.py: given an ordered list of step event types, compute per
user the earliest time each step can be reached *respecting order*
(t₁ = first step-1 event; tᵢ = first step-i event at or after tᵢ₋₁), and
how deep into the funnel the user got.

Everything is plain DataFrame ops: one filtered pre-aggregate per step
joined on the user key — k steps cost k shuffles keyed on the (uniform)
user id, each over an already step-filtered slice of the events. No
windows, no UDFs, no per-user sort; at 100 TB each step's input is pruned
at the parquet scan by the pushed event-type filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within=None,
) -> DataFrame:
    """Per-user funnel: returns (user_col, t_1..t_k, reached).

    t_i is the earliest timestamp of step i at or after t_{i-1} (NULL when
    the user never reaches the step); ``reached`` counts completed steps.
    ``within`` (a Column-compatible interval string like '1 hour', or
    None) additionally requires EVERY step i >= 2 to fall within that
    horizon of t_1 — a step beyond the horizon is NULLed out, so all
    later steps (which must come at or after it) go unreached too.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    u = F.col(user_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == step).select(
            u.alias("__u"), F.col(ts_col).alias("__ts")
        )
        cond = (cur[user_col] == nxt["__u"]) & (
            F.col("__ts") >= F.col(f"t_{i - 1}")
        )
        if within is not None:
            cond = cond & (
                F.col("__ts") <= F.col("t_1") + F.expr(f"INTERVAL {within}")
            )
        # ordering/horizon predicates live IN the left join condition so a
        # user whose step-i events all disqualify still survives with a
        # NULL t_i (a post-join filter would drop the user entirely)
        cur = (
            cur.join(nxt, on=cond, how="left")
            .groupBy(*[user_col] + [f"t_{j}" for j in range(1, i)])
            .agg(F.min("__ts").alias(f"t_{i}"))
        )
    reached = None
    for i in range(1, len(steps) + 1):
        term = F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
        reached = term if reached is None else reached + term
    return cur.select(
        user_col,
        *[f"t_{i}" for i in range(1, len(steps) + 1)],
        reached.alias("reached"),
    )
