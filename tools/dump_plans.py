"""Dump .explain("formatted") for declared queries to plans/r10/.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name becomes plans/r10/<q>_<suffix>.txt)
  query:  optional subset; default = every queries() entry.

Fixpoint queries execute driver-side loops while building their result
frame, so this tool runs real jobs; the captured plan is the plan of the
RETURNED frame (what the bench's noop write executes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from bigdatalog_spark import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r10",
    )
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in sorted(entry.queries().items()):
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"dump_plans:{name}")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; record the failure
            plan = f"ERROR building plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt")
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()


if __name__ == "__main__":
    main()
