"""Isolated per-query timing with bench.py's exact methodology (noop sink,
block release between runs, median of N) plus Spark job/stage counts so
time can be attributed to driver-loop job overhead vs real compute.

Usage: python tools/qtime.py [-n RUNS] QUERY [QUERY ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one line per query: median sec, per-run secs, jobs/run, stages/run.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from bigdatalog_spark import build_session

    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def _release():
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    def _materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # same untimed warmups as bench.py
    _materialize(
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        .groupBy("n_regionkey")
        .count()
    )
    _materialize(spark.range(64).mapInPandas(lambda it: it, schema="id long"))
    _release()

    tracker = spark.sparkContext.statusTracker()
    qs = entry.queries()
    for name in names:
        fn = qs[name]
        samples, jobs, stages = [], [], []
        for _ in range(runs):
            j0 = tracker.getJobIdsForGroup(None)
            nj0 = max([0, *j0]) if j0 else 0
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            _materialize(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            j1 = tracker.getJobIdsForGroup(None)
            nj1 = max([0, *j1]) if j1 else 0
            jobs.append(nj1 - nj0)
            _release()
        print(
            f"{name}: median={statistics.median(samples):.3f}s "
            f"runs={[round(s, 3) for s in samples]} jobs/run={jobs}"
        )


if __name__ == "__main__":
    main()
