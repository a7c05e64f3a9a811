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


def test_interval_join_left_outer_stream(spark):
    """Outer stream-stream join semantics: matched pairs emit on arrival;
    an UNMATCHED left row emits (right columns null) only once the global
    watermark proves no match can still arrive — i.e. passes
    left_ts + upper + watermark on BOTH sides.

    Staging: batch 1 carries u1's click+purchase (a match inside the
    hour) and u2's click (no purchase ever); batch 2 carries far-future
    sentinels on both streams, advancing the watermark past u2's
    match-possible horizon so its null row releases. The sentinels' own
    unmatched rows stay withheld (nothing ever advances past THEM) —
    which is itself the semantics under test."""
    import time as _time
    from datetime import datetime

    from pyspark.sql import types as T

    from bigdatalog_spark.streaming.ops import interval_join

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("event_id", T.LongType(), False),
        ]
    )

    def write(rows, path):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    with tempfile.TemporaryDirectory() as d:
        write([(1, datetime(2024, 1, 1, 10, 0), 100),
               (2, datetime(2024, 1, 1, 10, 5), 101)], f"{d}/c")
        write([(1, datetime(2024, 1, 1, 10, 30), 200)], f"{d}/p")
        _time.sleep(1.2)  # distinct mtimes -> deterministic batch order
        write([(9, datetime(2024, 1, 1, 20, 0), 900)], f"{d}/c")
        write([(8, datetime(2024, 1, 1, 20, 0), 800)], f"{d}/p")

        sc = stream_events_from_files(
            spark, f"{d}/c", schema, max_files_per_trigger=1
        )
        sp = stream_events_from_files(
            spark, f"{d}/p", schema, max_files_per_trigger=1
        )
        j = interval_join(
            sc, sp, on="user_id", upper="1 hour", watermark="1 hour",
            how="left_outer",
        ).select("user_id", F.col("l.event_id").alias("event_id"),
                F.col("r.event_id").alias("event_id_r"))
        assert j.isStreaming
        q = write_memory_sink(j, "ij_outer_test", "append")
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.table("ij_outer_test").collect()}
    assert (1, 100, 200) in got          # the match emitted
    assert (2, 101, None) in got         # the null row released by watermark
    assert (9, 900, None) not in got     # sentinel's horizon never passed

    # batch face: how= flows through to a plain left outer join
    cb = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), 100),
         (2, datetime(2024, 1, 1, 10, 5), 101)], schema
    )
    pb = spark.createDataFrame([(1, datetime(2024, 1, 1, 10, 30), 200)], schema)
    got_b = {
        tuple(r)
        for r in interval_join(
            cb, pb, on="user_id", upper="1 hour", how="left_outer"
        ).select("user_id", F.col("l.event_id").alias("event_id"),
                F.col("r.event_id").alias("event_id_r"))
        .collect()
    }
    assert got_b == {(1, 100, 200), (2, 101, None)}

    # contract: right/full outer rejected up front
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_join(cb, pb, on="user_id", how="right_outer")


def test_rocksdb_state_store_drain(spark):
    """The RocksDB state-store provider (build_session's
    rocksdb_state_store=True / the production large-state choice) runs a
    watermarked dedup drain with identical results to the default
    HDFS-backed store. providerClass is a session conf that binds at
    stream START, so it can be scoped to one query and restored."""
    from bigdatalog_spark.streaming.ops import stream_dedup

    ev = _events(spark)
    want = {
        tuple(r)
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        with tempfile.TemporaryDirectory() as d:
            ev.write.mode("overwrite").parquet(f"{d}/in")
            s = stream_events_from_files(spark, f"{d}/in", ev.schema)
            out = stream_dedup(s, ["user_id", "event_type"]).select(
                "user_id", "event_type"
            )
            q = write_memory_sink(out, "rocks_dedup_test", "append")
            q.awaitTermination(120)
            got = {tuple(r) for r in spark.table("rocks_dedup_test").collect()}
    finally:
        spark.conf.set(key, prev)
    assert got == want and len(want) > 0


def test_watermark_drops_late_rows(spark):
    """Late-data semantics: an event older than the watermark arriving in a
    later micro-batch is DROPPED from its (already finalized) window.

    Three single-file micro-batches (maxFilesPerTrigger=1, mtime order):
    (1) three 10:xx clicks + a 13:00 click; (2) a 14:00 click — the batch
    that APPLIES watermark 12:00, finalizing+emitting the [10:00, 11:00)
    window (eviction happens at the end of the batch that applies the new
    watermark, so the advancing and finalizing events must be separate
    batches); (3) a late 10:45 click — behind watermark 13:00, dropped."""
    import time as _time
    from datetime import datetime

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )

    def rows(*hm):
        return [(datetime(2024, 1, 1, h, m), "click", 1.0) for h, m in hm]

    with tempfile.TemporaryDirectory() as d:
        batches = [
            rows((10, 5), (10, 20), (10, 40), (13, 0)),
            rows((14, 0)),
            rows((10, 45)),  # late: watermark is 13:00 when this arrives
        ]
        for b in batches:
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "append"
            ).parquet(f"{d}/in")
            _time.sleep(1.2)  # distinct mtimes -> deterministic batch order

        s = stream_events_from_files(
            spark, f"{d}/in", schema, max_files_per_trigger=1
        )
        out = windowed_event_counts(s, "1 hour", watermark="1 hour")
        q = write_memory_sink(out, "late_test", "append")
        q.awaitTermination(120)
        got = {
            (r["window_start"].hour, r["n_events"])
            for r in spark.table("late_test").collect()
        }
    # the 10:00 window finalized with exactly 3 events; the late 10:45 row
    # left no trace (no re-opened window, no 4-count). The 13:00/14:00
    # windows are still open at end-of-stream, withheld by append mode.
    assert got == {(10, 3)}


def test_checkpoint_restart_exactly_once(spark):
    """Exactly-once across restarts: a checkpointed file-sink query stopped
    and restarted after new data arrives processes ONLY the new file —
    rows appear exactly once in the output directory."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.DoubleType(), False),
        ]
    )

    def write_batch(lo, hi, d):
        spark.createDataFrame(
            [(i, float(i) * 0.5) for i in range(lo, hi)], schema
        ).coalesce(1).write.mode("append").parquet(f"{d}/in")

    def run_query(d):
        s = spark.readStream.schema(schema).parquet(f"{d}/in")
        q = (
            s.withColumn("doubled", F.col("v") * 2)
            .writeStream.format("parquet")
            .option("path", f"{d}/out")
            .option("checkpointLocation", f"{d}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with tempfile.TemporaryDirectory() as d:
        write_batch(0, 50, d)
        run_query(d)  # first run: rows 0..49
        first = spark.read.parquet(f"{d}/out").count()
        assert first == 50
        write_batch(50, 80, d)
        run_query(d)  # restart from checkpoint: only rows 50..79
        out = spark.read.parquet(f"{d}/out")
        assert out.count() == 80  # no reprocessing of the first file
        ks = sorted(r["k"] for r in out.select("k").collect())
        assert ks == list(range(80))  # each row exactly once
        assert out.where(F.col("doubled") != F.col("v") * 2).count() == 0


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


def test_session_window_exact_gap_boundary_merges(spark):
    """Pin Spark's session_window boundary semantics: an event EXACTLY
    `gap` after the previous one MERGES into the same session (the
    session extends through [last_ts, last_ts + gap], closed at the
    boundary), and only a strictly-greater gap splits. This is why the
    lag-based SQL oracles split on `ts - prev > INTERVAL 30 MINUTE`
    (strict >), NOT >= — verified here so the oracle condition is pinned
    against Spark upgrades."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", t0, 1.0),
        ("u1", t0 + datetime.timedelta(seconds=1800), 1.0),  # == gap: merge
        ("u1", t0 + datetime.timedelta(seconds=3601), 1.0),  # > gap: split
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, ts timestamp, value double"
    )
    out = sessionize(ev, gap="30 minutes").orderBy("session_start").collect()
    assert [r["n_events"] for r in out] == [2, 1]


def test_session_append_file_sink_parity(spark):
    """Append-mode file sink (the production shape) reaches batch parity
    on a bounded stream once a later sentinel file pushes the watermark
    past the last session end. maxFilesPerTrigger=1 makes the sentinel
    land in its own micro-batch (the watermark only advances BETWEEN
    batches)."""
    import datetime

    from bigdatalog_spark.streaming.ops import write_file_sink

    ev = _events(spark)
    batch = {tuple(r) for r in sessionize(ev, gap="30 minutes").collect()}
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel_ts = max_ts + datetime.timedelta(days=30)
    sentinel = ev.limit(1).select(
        F.col("event_id"),
        F.lit(-1).cast(ev.schema["user_id"].dataType).alias("user_id"),
        F.col("event_type"),
        F.lit(sentinel_ts).cast(ev.schema["ts"].dataType).alias("ts"),
        F.col("value"),
        F.col("props"),
    ).select(*ev.columns)
    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(f"{d}/in")
        # second drop, strictly later mtime so it forms the LAST micro-batch
        import time

        time.sleep(1.1)
        sentinel.coalesce(1).write.mode("append").parquet(f"{d}/in")
        stream = stream_events_from_files(
            spark, f"{d}/in", ev.schema, max_files_per_trigger=1
        )
        q = write_file_sink(
            sessionize(stream, gap="30 minutes", watermark="2 hours"),
            path=f"{d}/out",
            checkpoint=f"{d}/ckpt",
        )
        q.awaitTermination(180)
        got = {
            tuple(r)
            for r in spark.read.parquet(f"{d}/out")
            .where(F.col("user_id") != -1)
            .collect()
        }
    assert got == batch


def test_driver_stream_helper_handles_both_parquet_layouts(spark):
    """Pin __spark_entry__._stream_events layout detection: the driver
    testdata stores events as a single events.parquet FILE inside the sf
    dir (needs the pathGlobFilter form — the file source takes a
    directory), while any Spark-written table is an events.parquet
    DIRECTORY of part files (must be streamed directly: the glob form
    matches ZERO files there, silently — the r4 sf10 rehearsal returned 0
    rows because of exactly that)."""
    import __spark_entry__ as entry

    ev = _events(spark)
    want = ev.count()

    # file layout: the real sf dir
    s1 = entry._stream_events(spark, SF, ev.schema)
    q1 = write_memory_sink(
        windowed_event_counts(s1, "1 hour"), "layout_file", "complete"
    )
    q1.awaitTermination(120)
    got_file = spark.table("layout_file").agg(F.sum("n_events")).first()[0]
    assert got_file == want

    # directory layout: Spark-written copy under <dir>/events.parquet/
    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
        s2 = entry._stream_events(spark, d, ev.schema)
        q2 = write_memory_sink(
            windowed_event_counts(s2, "1 hour"), "layout_dir", "complete"
        )
        q2.awaitTermination(120)
        got_dir = spark.table("layout_dir").agg(F.sum("n_events")).first()[0]
    assert got_dir == want


def test_enrich_stream_matches_batch_join(spark):
    """Stream-static enrichment: streaming file source joined against a
    static dim reaches batch parity, statelessly (no watermark, no state
    store rows), with the dim broadcast so the stream side never
    shuffles."""
    from bigdatalog_spark.streaming.ops import enrich_stream

    ev = _events(spark)
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    want = {
        tuple(r)
        for r in ev.join(dim, "user_id", "left")
        .select("event_id", "user_id", "c_mktsegment")
        .collect()
    }
    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(f"{d}/in")
        stream = stream_events_from_files(spark, f"{d}/in", ev.schema)
        out = enrich_stream(stream, dim, on="user_id").select(
            "event_id", "user_id", "c_mktsegment"
        )
        q = write_memory_sink(out, "enrich_test", "append")
        q.awaitTermination(120)
        # stateless: no state-store operators in any batch's progress
        for p in q.recentProgress:
            assert not p.stateOperators, p.stateOperators
        got = {tuple(r) for r in spark.table("enrich_test").collect()}
    assert got == want


def test_enrich_stream_broadcasts_dim(spark):
    """The batch face of the same plan shows a broadcast hash join — the
    stream side must not shuffle for a dimension lookup."""
    from bigdatalog_spark.streaming.ops import enrich_stream

    ev = _events(spark)
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plan = (
        enrich_stream(ev, dim, on="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_enrich_stream_rejects_right_outer_joins(spark):
    """enrich_stream's documented contract (inner/left only) is enforced
    up front — on a BATCH left frame Spark would otherwise happily run a
    right/full join that the production streaming frame would reject."""
    import pytest

    from bigdatalog_spark.streaming.ops import enrich_stream

    ev = _events(spark)
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    for how in ("right", "full", "left_anti", "cross"):
        with pytest.raises(ValueError, match="inner.*left"):
            enrich_stream(ev, dim, on="user_id", how=how)


def test_enrich_stream_nonbroadcast_bucketed_dim_no_dim_exchange(spark):
    """The broadcast_dim=False branch — a dimension too large to ship to
    every executor — joins a BUCKETED dim table with NO exchange on the
    dim side: the stream side pays exactly one hash exchange into the
    dim's bucket layout (the unavoidable co-location cost) and the
    bucketed scan feeds the join directly. Asserted on the batch face of
    the same plan, with auto-broadcast disabled to simulate a dim past
    the broadcast threshold."""
    from bigdatalog_spark.operators.joins import write_bucketed
    from bigdatalog_spark.streaming.ops import enrich_stream

    ev = _events(spark)
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        write_bucketed(dim, "enrich_dim_bucketed", ["user_id"], num_buckets=8)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # AQE re-plans post-hoc and hides the exchange count; assert the
        # static plan (same convention as PLANS.md introspection)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        big_dim = spark.table("enrich_dim_bucketed")
        plan = (
            enrich_stream(ev, big_dim, on="user_id", broadcast_dim=False)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in plan, plan
        # exactly one hash exchange — the stream side entering the
        # bucketed layout; the dim scan must not reshuffle
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql("DROP TABLE IF EXISTS enrich_dim_bucketed")
