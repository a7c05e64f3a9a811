"""Per-job time attribution for one declared query.

Runs QUERY once warm (after an untimed run), then prints every Spark job
with its duration, description and gaps (driver think-time) between jobs
— the tool for deciding whether a query's wall time is task compute,
shuffle, or driver-side job latency.

Usage: python tools/jobprof.py QUERY [QUERY...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from bigdatalog_spark import build_session

    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    _mat = lambda df: df.write.format("noop").mode("overwrite").save()
    _mat(
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        .groupBy("n_regionkey").count()
    )
    _mat(spark.range(64).mapInPandas(lambda it: it, schema="id long"))

    def _release():
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        import gc
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    qs = entry.queries()
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        fn = qs[name]
        _mat(fn(spark, sf_dir))  # warm, untimed
        _release()
        before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        _mat(fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        jobs = sorted(set(tracker.getJobIdsForGroup(None) or []) - before)
        sc = spark.sparkContext._jsc.sc()
        infos = []
        for j in jobs:
            ji = sc.statusTracker().getJobInfo(j)
            if ji.isEmpty():
                continue
            ji = ji.get()
            stages = list(ji.stageIds())
            smin, smax, ntasks = None, None, 0
            for sid in stages:
                si = sc.statusTracker().getStageInfo(sid)
                if si.isEmpty():
                    continue
                si = si.get()
                ntasks += si.numTasks()
            infos.append((j, stages, ntasks))
        print(f"== {name}: wall={wall:.3f}s jobs={len(jobs)}")
        # REST-free approximation: job submission/completion times are not
        # exposed via the pyspark status tracker, so re-run with listener
        from pyspark import SparkContext
        log = []

        class _L:
            pass

        # use the Java listener bridge via the AppStatusStore instead
        store = spark.sparkContext._jsc.sc().statusStore()
        jdata = store.jobsList(None)
        it = jdata.iterator()
        rows = []
        while it.hasNext():
            j = it.next()
            jid = j.jobId()
            if jid not in jobs:
                continue
            sub = j.submissionTime()
            comp = j.completionTime()
            if sub.isEmpty() or comp.isEmpty():
                continue
            s = sub.get().getTime() / 1000.0
            e = comp.get().getTime() / 1000.0
            desc = j.description()
            d = desc.get() if desc.isDefined() else j.name()
            rows.append((s, e, jid, str(d)[:90], j.numTasks()))
        rows.sort()
        prev_end = None
        total_gap = 0.0
        for s, e, jid, d, nt in rows:
            gap = (s - prev_end) if prev_end is not None else 0.0
            total_gap += max(0.0, gap)
            print(
                f"  job {jid:5d} dur={e - s:6.3f}s gap_before={gap:6.3f}s "
                f"tasks={nt:4d} {d}"
            )
            prev_end = e
        print(f"  sum job dur={sum(e - s for s, e, *_ in rows):.3f}s "
              f"inter-job gaps={total_gap:.3f}s")
        _release()


if __name__ == "__main__":
    main()
