"""Structured Streaming operator tests: windowed aggregation and
sessionization, batch/stream parity via file source + memory sink."""

import tempfile

from pyspark.sql import functions as F

from bigdatalog_spark.sources.tables import load_table
from bigdatalog_spark.streaming.ops import (
    running_user_totals,
    sessionize,
    stream_events_from_files,
    windowed_event_counts,
    write_memory_sink,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF, "events")


def test_windowed_counts_batch(spark):
    ev = _events(spark)
    out = windowed_event_counts(ev, "1 hour")
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()
    # window boundaries are hour-aligned
    row = out.first()
    assert row["window_start"].minute == 0 and row["window_start"].second == 0


def test_sessionize_batch(spark):
    ev = _events(spark)
    out = sessionize(ev, gap="30 minutes")
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()
    # sessions per user never overlap
    rows = out.orderBy("user_id", "session_start").collect()
    last_end = {}
    for r in rows:
        u = r["user_id"]
        if u in last_end:
            assert r["session_start"] >= last_end[u]
        last_end[u] = r["session_end"]


def test_stream_matches_batch(spark):
    ev = _events(spark)
    batch = windowed_event_counts(ev, "1 hour")
    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(f"{d}/in")
        stream = stream_events_from_files(spark, f"{d}/in", ev.schema)
        assert stream.isStreaming
        # complete mode: append would withhold windows the watermark hasn't
        # passed at end-of-stream
        q = write_memory_sink(
            windowed_event_counts(stream, "1 hour"), "win_test", "complete"
        )
        q.awaitTermination(120)
        got = {
            tuple(r)
            for r in spark.table("win_test").collect()
        }
        want = {tuple(r) for r in batch.collect()}
        assert got == want


def test_stateful_running_totals(spark):
    """applyInPandasWithState custom stateful op: final per-user state after
    the whole stream equals the batch groupBy totals."""
    ev = _events(spark)
    want = {
        (r["user_id"], r["n"], round(r["t"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(f"{d}/in")
        stream = stream_events_from_files(spark, f"{d}/in", ev.schema)
        q = write_memory_sink(running_user_totals(stream), "state_test", "update")
        q.awaitTermination(120)
        # update mode may emit a row per micro-batch; keep the last per user
        rows = spark.table("state_test").collect()
        final = {}
        for r in rows:
            prev = final.get(r["user_id"])
            if prev is None or r["n_events"] > prev[0]:
                final[r["user_id"]] = (r["n_events"], r["total_value"])
        got = {(u, n, round(t, 6)) for u, (n, t) in final.items()}
        assert got == want


def test_interval_join_stream(spark):
    """Stream-stream interval join: purchases pair with clicks of the same
    user within [click, click+1h]; stream result equals the batch join."""
    from bigdatalog_spark.streaming.ops import interval_join

    ev = _events(spark)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    batch = interval_join(
        clicks, purchases, on="user_id", upper="1 hour"
    ).select("user_id", "ts", "ts_r")
    with tempfile.TemporaryDirectory() as d:
        clicks.write.mode("overwrite").parquet(f"{d}/c")
        purchases.write.mode("overwrite").parquet(f"{d}/p")
        sc = stream_events_from_files(spark, f"{d}/c", clicks.schema)
        sp = stream_events_from_files(spark, f"{d}/p", purchases.schema)
        j = interval_join(sc, sp, on="user_id", upper="1 hour").select(
            "user_id", "ts", "ts_r"
        )
        assert j.isStreaming
        q = write_memory_sink(j, "ij_test", "append")
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.table("ij_test").collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_dedup_within_watermark(spark):
    """Streaming dedup drops key repeats; survivors = distinct keys."""
    from bigdatalog_spark.streaming.ops import stream_dedup

    ev = _events(spark).select("user_id", "event_type", "ts")
    with tempfile.TemporaryDirectory() as d:
        # duplicate every row so the stream definitely contains repeats
        ev.union(ev).write.mode("overwrite").parquet(f"{d}/in")
        s = stream_events_from_files(spark, f"{d}/in", ev.schema)
        out = stream_dedup(s, ["user_id", "event_type"], watermark="10 minutes")
        q = write_memory_sink(out, "dedup_test", "append")
        q.awaitTermination(120)
        got = spark.table("dedup_test").select("user_id", "event_type")
    n_got = got.count()
    assert n_got == got.distinct().count()
    assert n_got == ev.select("user_id", "event_type").distinct().count()
