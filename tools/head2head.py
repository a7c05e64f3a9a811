"""Head-to-head timing of selected queries() entries between two repo
checkouts (e.g. round-N vs round-M code) on the same SF dir — the
adjudication tool for cross-round bench drift (VERDICT r07 "What's wrong
#2": did the dedup family regress, or was it host band?).

Usage: python tools/head2head.py REPO_DIR SF_DIR QUERY [QUERY...]
Prints one JSON line {query: [per-invocation seconds]}. Run it once per
checkout, serially, on a quiet machine; compare medians.
"""

import json
import sys
import time

repo, sf_dir, queries = sys.argv[1], sys.argv[2], sys.argv[3:]
sys.path.insert(0, repo)

import __spark_entry__ as entry  # noqa: E402
from bigdatalog_spark.session import build_session  # noqa: E402

spark = build_session(app_name="head2head", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

qs = entry.queries()
out = {}
for name in queries:
    fn = qs[name]
    fn(spark, sf_dir).count()  # warm: file listing, code paths
    times = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        times.append(round(time.monotonic() - t0, 3))
    out[name] = times
print("H2H " + json.dumps({"repo": repo, "sf": sf_dir, "times": out}))
