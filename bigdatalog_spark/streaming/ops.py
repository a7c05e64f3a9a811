"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.9); these extend the
engine for the events-stream shape in the driver testdata: watermarked
tumbling/sliding window aggregation and stateful sessionization, expressed
with the standard readStream → transform → writeStream contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + value sums per event
    type. Works on both batch and streaming DataFrames (same code path —
    the Structured Streaming contract)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        df.groupBy(win.alias("win"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            F.col(type_col),
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based), via the built-in session_window
    — Spark's native stateful operator, no custom state store needed."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def running_user_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (event count, value total) maintained across micro-batches.

    This is the escape hatch for stateful logic the built-in windowed/session
    aggregations can't express (e.g. decaying counters, per-key ML state).
    State is one fixed-width row per user — at scale the state store
    shards by the groupBy key, so state volume is O(distinct users), not
    O(events)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ])

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval equi-join: rows pair when keys
    match and ``right_ts ∈ [left_ts − lower, left_ts + upper]``.

    On streams, both sides are watermarked so the state store can evict
    rows once no future match is possible — state is bounded by
    (watermark + interval) × arrival rate, the standard stream-stream join
    contract. The right timestamp is exposed as ``<right_ts>_r``.

    ``how='inner'`` (default) emits a pair as soon as both rows have
    arrived. ``how='left_outer'`` additionally emits unmatched left rows
    (right columns null) — but only once the watermark passes the point
    where a match could still arrive, so on a BOUNDED stream the last
    rows' null results are withheld until a later event advances the
    watermark (same drain contract as append-mode aggregation; see
    write_file_sink's docstring). Spark requires the time-range condition
    plus watermarks for outer stream-stream joins — this function always
    supplies both. Right/full outer are rejected: the unmatched-RIGHT
    side would need the mirrored interval bound, which callers should
    express by swapping the inputs instead of silently running a
    different window."""
    if how not in ("inner", "left_outer", "leftouter", "left"):
        raise ValueError(
            f"interval_join supports how='inner'/'left_outer' only, got {how!r}"
        )
    l = left.alias("l")
    r = right.select(
        F.col(on).alias("__rk"),
        F.col(right_ts).alias(f"{right_ts}_r"),
        *[c for c in right.columns if c not in (on, right_ts)],
    ).alias("r")
    if left.isStreaming:
        l = left.withWatermark(left_ts, watermark).alias("l")
    if right.isStreaming:
        r = r.withWatermark(f"{right_ts}_r", watermark)
    rts, lts = F.col(f"{right_ts}_r"), F.col(f"l.{left_ts}")
    cond = (
        (F.col(f"l.{on}") == F.col("__rk"))
        & (rts >= lts - F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, on=cond, how=how).drop("__rk")


def stream_dedup(
    events: DataFrame,
    keys: list,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication on key columns.

    Uses dropDuplicatesWithinWatermark so the state store holds each key
    only until the watermark passes it — bounded state, unlike a plain
    dropDuplicates over an unbounded stream. The batch path is plain
    dropDuplicates (same semantics when all data is present). This is the
    streaming face of the exact-dedup pipeline operator
    (operators/dedup.py exact_dedup)."""
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def stream_events_from_files(
    spark, path: str, schema, max_files_per_trigger: int | None = None,
    glob_filter: str | None = None,
) -> DataFrame:
    """File-source stream over a directory of parquet/json drops.

    ``max_files_per_trigger=1`` processes one file per micro-batch in
    modification-time order — the deterministic way to replay an ordered
    sequence of drops (e.g. to observe watermark advancement between
    batches in tests). ``glob_filter`` selects a subset of files in the
    directory (the file source requires a directory path, so streaming a
    single table file out of a shared dir needs ``pathGlobFilter``)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    if glob_filter is not None:
        r = r.option("pathGlobFilter", glob_filter)
    return r.parquet(path)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the canonical streaming dimension
    lookup (click stream × user table, event stream × device registry).

    Stateless: stream-static equi-joins need no watermark or state store
    (each micro-batch joins against the CURRENT static relation, so dim
    updates between batches are picked up — Structured Streaming's
    documented stream-static semantics). ``broadcast_dim`` ships the dim
    to every executor so the unbounded stream side never shuffles — at
    100 TB/day the stream must not repartition for a lookup table; for
    dims too large to broadcast, pass False and pre-bucket both sides.
    ``how`` is restricted to inner/left — the right/outer families would
    need the stream side fully materialized (Spark rejects them on a
    streaming frame; we reject up front so a batch frame passed in tests
    can't silently run a different join than production would)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"enrich_stream supports how='inner'/'left' only, got {how!r}"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)


def write_memory_sink(df: DataFrame, name: str, output_mode: str = "append"):
    """Run a streaming query into an in-memory table (testing sink).

    SCALE WARNING: the memory sink materializes the whole result on the
    driver — it exists for tests and bounded bench streams only (e.g.
    ``q_stream_sessionize`` uses complete mode to drain a bounded
    session stream into a driver-checked table). A production unbounded
    stream must use ``write_file_sink`` (append mode, exactly-once via
    checkpoint) or an equivalent table sink instead."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def write_file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    fmt: str = "parquet",
):
    """Run a streaming query into a file sink — the production shape for
    unbounded streams: append mode, exactly-once recovery from the
    checkpoint, output partitioned across executors (never collected on
    the driver).

    For watermarked aggregations (windowed / session_window) append mode
    only emits a group once the watermark passes its window end, so a
    BOUNDED stream withholds the final windows: the watermark stops at
    ``max(event time) - delay``. To drain a bounded stream completely
    through the append path, advance the watermark past the last window
    end with a later sentinel file (see
    tests/test_streaming.py::test_session_append_file_sink_parity)."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
