"""End-to-end Structured Streaming pipeline over the events table.

Chains the library's streaming operators the way a production event feed
composes them — one readStream fanned into four bounded queries
(Trigger.AvailableNow drains the backlog and stops, the recommended
batch-replay mode; a live deployment would drop the trigger and keep the
same code):

  file-source stream → watermarked exact dedup → hourly windowed counts
                     → gap-based sessionization → append-mode parquet sink
  plus a custom stateful operator (applyInPandasWithState running totals)

Every stage is also driver-verified against a DuckDB batch oracle as a
queries() entry (q_stream_dedup, q_hourly_events, q_stream_sessionize).

Usage:
  python examples/streaming_pipeline.py [sf_dir]        # default sf0.01
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from bigdatalog_spark import build_session
from bigdatalog_spark.sources.tables import load_table
from bigdatalog_spark.streaming.ops import (
    running_user_totals,
    sessionize,
    stream_dedup,
    stream_events_from_files,
    windowed_event_counts,
    write_file_sink,
    write_memory_sink,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    schema = load_table(spark, sf_dir, "events").schema

    def fresh_stream():
        # the file source takes a DIRECTORY; pathGlobFilter selects the
        # events table out of the shared sf dir (see _stream_events in
        # __spark_entry__.py for the dual-layout variant)
        return stream_events_from_files(
            spark, sf_dir, schema, glob_filter="events.parquet"
        )

    # 1. watermarked exact dedup → bounded state (keys evicted past the
    #    watermark), append mode
    dedup = stream_dedup(
        fresh_stream().select("ts", "user_id", "event_type"),
        ["user_id", "event_type"],
        watermark="1 hour",
    ).select("user_id", "event_type")
    write_memory_sink(dedup, "ex_dedup", "append").awaitTermination()
    print(f"distinct (user, event_type) keys: "
          f"{spark.table('ex_dedup').count()}")

    # 2. hourly windowed counts + value sums, complete mode for the report
    hourly = windowed_event_counts(fresh_stream(), "1 hour")
    write_memory_sink(hourly, "ex_hourly", "complete").awaitTermination()
    print(f"hourly (window, type) rows: {spark.table('ex_hourly').count()}")

    # 3. gap-based sessions via the native session_window operator,
    #    drained to an APPEND-MODE PARQUET SINK — the production shape
    #    (exactly-once via checkpoint; watermark evicts closed sessions)
    sess = sessionize(fresh_stream(), gap="30 minutes")
    with tempfile.TemporaryDirectory() as d:
        q = write_file_sink(sess, f"{d}/sessions", f"{d}/ckpt")
        q.awaitTermination()
        n = spark.read.parquet(f"{d}/sessions").count()
        print(f"sessions written to parquet: {n}")

    # 4. custom stateful operator: per-user running event counts/values
    #    (applyInPandasWithState, O(distinct users) fixed-width state)
    totals = running_user_totals(fresh_stream())
    write_memory_sink(totals, "ex_totals", "update").awaitTermination()
    top = (
        spark.table("ex_totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .orderBy(F.desc("n_events"))
        .limit(3)
        .collect()
    )
    print("most active users:", [(r.user_id, r.n_events) for r in top])
    print(f"total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
