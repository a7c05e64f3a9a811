"""Benchmark driver contract: run the headline queries and print ONE JSON line.

Runs every `__spark_entry__.queries()` entry against `$SPARK_GRAFT_SF_DIR`
(default /root/testdata/sf0.1) on `local[$SPARK_GRAFT_CPUS]` (default 32),
timing each query end-to-end (plan + execute, materialized via a noop write
so results never funnel through the driver).

Each query is timed `$SPARK_GRAFT_BENCH_RUNS` times (default 3) and the
per-query MEDIAN is reported: this host shows a moving 10-30 s I/O spike
that lands on a random query per pass, so single-run numbers routinely
misattribute ~20 s to an innocent query. The median of 3 kills the spike
while keeping the bench one JSON line.

Output: {"metric": "total_wall_sec", "value": N, "unit": "sec",
         "queries": {name: median_sec, ...}, "runs": 3, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_from_dir(sf_dir: str) -> float:
    tail = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(tail.removeprefix("sf"))
    except ValueError:
        return -1.0


def _materialize(df) -> None:
    # noop sink: full execution, no driver-side result transfer.
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    import __spark_entry__ as entry
    from bigdatalog_spark import build_session

    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so q1 doesn't pay session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    def _release_blocks() -> None:
        # Fixpoint queries leave persisted statics + localCheckpoint blocks
        # behind; letting them pile up across ~100 queries pushes the later
        # shuffle-heavy ones into eviction churn and inflates their timings
        # by up to ~10x. Isolate queries: drop every cached block between
        # runs (the real engine frees these when contexts are GC'd, but the
        # bench holds one session across all queries).
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist()
        # broadcast variables (local-eval seeds/statics, MBs each) are only
        # reclaimed by ContextCleaner after BOTH python and JVM GCs notice
        # the references are dead — force that, or ~60 queries of leaked
        # broadcasts inflate late-bench fixpoints up to 4x (measured:
        # dl_attend_mcount 4.1 s isolated vs 14.6 s late-bench at sf1).
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    # Untimed FIXED warmup through the real execution path (parquet scan →
    # shuffle → noop sink). The range-sum above warms the JVM but not the
    # parquet reader / shuffle machinery / noop writer, so their one-time
    # cost used to land on whichever query the window rotation put FIRST —
    # manufacturing a phantom ~2x mover every round the order changed
    # (r08: q_running_avg +0.3 s; r07: q17). Fixed and never reported, so
    # per-query medians are order-independent.
    _materialize(
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        .groupBy("n_regionkey")
        .count()
    )
    # ... and one Arrow mapInPandas pass: python-worker spawn (~0.3 s)
    # otherwise lands on the first Arrow-using query in the rotation
    # (r9 first pass: q_cc_fast 0.5 -> 0.8 s, purely positional).
    _materialize(
        spark.range(64).mapInPandas(
            lambda it: it, schema="id long"
        )
    )
    _release_blocks()

    # FIXED alphabetical order, decoupled from the __spark_entry__ dict
    # order (which rotates per-round for the driver's first-50 correctness
    # window). Residual per-position JIT/warmup cost must not migrate
    # between queries when the rotation changes — it manufactured a
    # phantom ~2x "mover" every round the order moved (r7: q17; r8:
    # q_running_avg; r9: q_cc_fast).
    timings: dict[str, float] = {}
    for name, fn in sorted(entry.queries().items()):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _materialize(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            _release_blocks()
        timings[name] = round(statistics.median(samples), 3)

    detail = {
        "metric": "total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf": _sf_from_dir(sf_dir),
    }
    # Stdout carries BOTH bench lines: first the full contract line
    # (with the per-query "queries" dict), then ONE SHORT summary as the
    # FINAL line. At 121 queries the full dict alone exceeds the round
    # driver's stdout-tail capture, which truncated the last line and
    # left BENCH_r09.json unparseable ("parsed": null) — a parser that
    # reads the last stdout line now gets a complete JSON object, and
    # the full contract line + detail file keep every per-query number.
    print(json.dumps(detail))
    results_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_results"
    )
    os.makedirs(results_dir, exist_ok=True)
    detail_path = os.path.join(
        results_dir, f"bench_sf{detail['sf']}_{int(time.time())}.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps({
        "metric": "total_wall_sec",
        "value": detail["value"],
        "unit": "sec",
        "n_queries": len(timings),
        "runs": runs,
        "sf": detail["sf"],
        "detail": "bench_results/" + os.path.basename(detail_path),
    }))


if __name__ == "__main__":
    main()
