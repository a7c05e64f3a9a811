"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (Datalog transitive closure) on sf0.001.
queries()      — one entry per implemented operator family (SURVEY.md §2 +
                 the pipeline operators): each callable (spark, sf_dir) → DF.
oracle_sql()   — DuckDB-equivalent SQL per query (column names/aliases match
                 the Spark output exactly). Every query has one.
                 q_value_percentiles_approx is sketch-based, so its Spark
                 output is per-group booleans asserting the sketch lands
                 between the exact q±0.005 quantiles; the oracle pins the
                 booleans TRUE (a hash match proves the tolerance holds).

Derived graph convention (used identically in Spark and SQL): a binary tree
over part keys — edges src=k → dst=2k and 2k+1 for k ≥ 1, dst ≤ max key;
weights w = 1 + dst % 3; "forest" drops edges whose dst % 97 == 0.
"""

from __future__ import annotations

import contextlib
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalog_spark import BigDatalogContext
from bigdatalog_spark.functions.text import text_profile
from bigdatalog_spark.operators.dedup import (
    embedding_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from bigdatalog_spark.operators.similarity import brute_force_topk
from bigdatalog_spark.sources.tables import load_table
from bigdatalog_spark.streaming.ops import sessionize, windowed_event_counts

# one-shot flag: log the sentinel-staging fallback reason only once
_SENTINEL_FALLBACK_LOGGED = False

SF_SMALL = "/root/testdata/sf0.001"


# ----------------------------------------------------------- derived graphs

@contextlib.contextmanager
def _stream_state_partitions(spark: SparkSession, parts: int = 8):
    """Scope the state-partition count for a stateful streaming drain.

    Stateful streaming operators keep 1 (aggregation/dedup) to 4
    (stream-stream join) state store instances PER shuffle partition,
    each paying snapshot/commit I/O every micro-batch, and the count
    binds at stream START from spark.sql.shuffle.partitions. The session
    default (32, sized for batch shuffles) gives a bounded bench drain
    32-128 stores doing fixed I/O that dominates wall time (sf0.1
    measured: interval join 17.7 → 3.2 s end-to-end, 8.5 → 2.8 s in the
    warm in-session profile; sessionize-append 5.9 → 3.9 s).
    Production sizes this to state volume ÷ per-store budget — the same
    knob, same reasoning, documented in README's cluster-tuning table.
    Restored on exit; batch queries planned inside are unaffected
    because every batch driver query re-reads the session value at
    action time."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _stream_events(spark: SparkSession, sf_dir: str, schema):
    """File-source stream over the events table, robust to BOTH parquet
    layouts: a single ``events.parquet`` FILE inside the sf dir (the
    generated testdata — the file source needs a directory, so stream the
    sf dir with a pathGlobFilter) and an ``events.parquet/`` DIRECTORY of
    part files (any Spark-written table — the production layout; stream
    the directory itself, no filter). The glob form silently matches ZERO
    files on the directory layout, which is how the sf10 rehearsal caught
    this."""
    import os

    from bigdatalog_spark.streaming.ops import stream_events_from_files

    table = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(table):
        return stream_events_from_files(spark, table, schema)
    return stream_events_from_files(
        spark, sf_dir, schema, glob_filter="events.parquet"
    )


def _parquet_col_max(sf_dir: str, table: str, col: str):
    """max(col) from the parquet ROW-GROUP STATISTICS of the input files —
    a driver-side footer read, no Spark job. The value is exactly the
    aggregate the files' writer recorded for the query's own input; every
    caller keeps a Spark-aggregate fallback for stats-free files. Worth
    having because _tree_edges (the derived graph behind ~30 dl_* rows)
    needs max(p_partkey) per query, which otherwise costs a scan job
    before the fixpoint even starts."""
    import glob as _glob

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, f"{table}.parquet")
    files = (
        sorted(_glob.glob(os.path.join(src, "*.parquet")))
        if os.path.isdir(src) else [src]
    )
    mx = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.schema.column(i).name == col
        )
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            if grp.num_rows == 0:
                continue
            st = grp.column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"{table}.{col}: row-group stats missing")
            if mx is None or st.max > mx:
                mx = st.max
    return mx


def _part_max(spark: SparkSession, sf_dir: str) -> int:
    try:
        mx = _parquet_col_max(sf_dir, "part", "p_partkey")
        if mx is not None:
            return mx
    except Exception:
        pass
    return load_table(spark, sf_dir, "part").agg(F.max("p_partkey")).first()[0]


def _tree_edges(spark: SparkSession, sf_dir: str, mx: int | None = None) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    if mx is None:
        mx = _part_max(spark, sf_dir)
    base = part.where(F.col("p_partkey") >= 1).select(
        F.col("p_partkey").alias("src")
    )
    left = base.select("src", (F.col("src") * 2).alias("dst"))
    right = base.select("src", (F.col("src") * 2 + 1).alias("dst"))
    return left.union(right).where(F.col("dst") <= mx)


_EDGES_SQL = """
  SELECT p_partkey AS src, p_partkey*2 AS dst FROM part
  WHERE p_partkey >= 1 AND p_partkey*2 <= (SELECT max(p_partkey) FROM part)
  UNION ALL
  SELECT p_partkey, p_partkey*2+1 FROM part
  WHERE p_partkey >= 1 AND p_partkey*2+1 <= (SELECT max(p_partkey) FROM part)
"""


_MLM_CTES = """
  sponsor AS (SELECT src, dst FROM edges WHERE dst <= 63),
  sales AS (
    SELECT CAST(p_partkey AS INTEGER) AS m,
           CAST(p_partkey % 50 + 0.5 AS DOUBLE) AS s,
           CAST(p_partkey % 20 + 0.25 AS DOUBLE) AS p
    FROM part WHERE p_partkey BETWEEN 1 AND 63),
  sched AS (SELECT CAST(ls AS DOUBLE) AS ls, CAST(rs AS DOUBLE) AS rs,
                   CAST(bp AS DOUBLE) AS bp
            FROM (VALUES (0.0, 100.0, 0.05), (100.0, 500.0, 0.08),
                         (500.0, 1000000000.0, 0.1)) t(ls, rs, bp)),
  member_sales AS (SELECT m, sum(s) AS st FROM sales GROUP BY m),
  members AS (SELECT src AS m FROM sponsor UNION SELECT dst FROM sponsor),
  ntc(m, m2) AS (
    SELECT m, m FROM members
    UNION
    SELECT ntc.m, sp.dst FROM ntc JOIN sponsor sp ON sp.src = ntc.m2),
  mts AS (
    SELECT ntc.m, sum(ms.st) AS s
    FROM ntc JOIN member_sales ms ON ms.m = ntc.m2 GROUP BY ntc.m)
"""


def _kcore_sql(k: int = 2) -> str:
    """Exact-fixpoint peeling SQL for the k-core oracle, with NO unroll
    knob: DuckDB recursive CTEs have standard working-table semantics
    (the recursive reference sees only the previous iteration's rows —
    verified, including with aggregates and multiple references in the
    recursive term), so each iteration recomputes degrees over the
    previous round's edge set and keeps edges whose endpoints both have
    degree >= k — exactly one simultaneous peel round. The recursion
    stops itself: the recursive term only emits rows while some vertex
    still has degree < k, so the peel runs to convergence at ANY sf and
    under-peeling is impossible by construction (this replaces the old
    fixed-24-round unroll and its error() convergence guard). The
    max-rnd rows get one final degree filter, which covers the
    all-edges-dropped-at-once stop (filter of the last round = the empty
    fixpoint) and is a no-op at a converged stop. e0 stays MATERIALIZED:
    DuckDB inlines plain CTEs and e0 embeds the part-table chord scan."""
    deg = (
        "SELECT x, count(*) AS d FROM "
        "(SELECT u AS x FROM peel UNION ALL SELECT v FROM peel) GROUP BY x"
    )
    return f"""
            WITH RECURSIVE e0 AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM (
        SELECT * FROM ({_EDGES_SQL})
        UNION ALL
        SELECT p_partkey AS src,
               (p_partkey*31 + 7) % (SELECT max(p_partkey) FROM part) + 1 AS dst
        FROM part WHERE p_partkey >= 1)
      WHERE src <> dst),
    peel(rnd, u, v) AS (
      SELECT 0, u, v FROM e0
      UNION ALL
      SELECT e.rnd + 1, e.u, e.v
      FROM peel e
      JOIN ({deg}) a ON a.x = e.u
      JOIN ({deg}) b ON b.x = e.v
      WHERE a.d >= {k} AND b.d >= {k}
        AND EXISTS (SELECT 1 FROM ({deg}) q WHERE q.d < {k})),
    lastround AS MATERIALIZED (
      SELECT u, v FROM peel WHERE rnd = (SELECT max(rnd) FROM peel)),
    lastdeg AS MATERIALIZED (
      SELECT x, count(*) AS d
      FROM (SELECT u AS x FROM lastround UNION ALL SELECT v FROM lastround)
      GROUP BY x),
    fixpoint AS MATERIALIZED (
      SELECT e.u, e.v FROM lastround e
      JOIN lastdeg a ON a.x = e.u JOIN lastdeg b ON b.x = e.v
      WHERE a.d >= {k} AND b.d >= {k})
            SELECT x AS vertex, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT u AS x FROM fixpoint UNION ALL SELECT v FROM fixpoint)
            GROUP BY x
        """


def _pagerank_sql(iters: int = 8) -> str:
    """Unrolled power-iteration SQL mirroring operators/graph.py pagerank
    term for term (same IEEE double literals and op order; contribution
    sums have ≤ 2 terms on this graph, so addition order can't diverge)."""
    ctes = [
        f"""e0 AS ({_EDGES_SQL}),
    cross0 AS (
      SELECT p_partkey AS src,
             (p_partkey*31 + 7) % (SELECT max(p_partkey) FROM part) + 1 AS dst
      FROM part WHERE p_partkey >= 1),
    edges AS (
      SELECT DISTINCT src, dst
      FROM (SELECT * FROM e0 UNION ALL SELECT * FROM cross0)
      WHERE src <> dst),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT node
              FROM (SELECT src AS node FROM edges
                    UNION ALL SELECT dst FROM edges)),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM nodes),
    pr0 AS (SELECT node, 1.0 / (SELECT c FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pr{i} AS (
      SELECT n.node,
             (1.0 - 0.85) / (SELECT c FROM nn)
               + 0.85 * coalesce(t.s, 0.0) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / d.deg) AS s
        FROM edges e JOIN pr{i - 1} r ON r.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst) t ON t.node = n.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, round(rank, 8) AS rank FROM pr{iters}"
    )


def _datalog(spark: SparkSession, program: str, data: dict, goal: str) -> DataFrame:
    ctx = BigDatalogContext(spark)
    ctx.load_program(program)
    for name, df in data.items():
        ctx.register(name, df)
    return ctx.query(goal)


# ----------------------------------------------------------- datalog: relational

def dl_inmemory_csv(spark, sf_dir):
    """In-memory CSV dataset loading (register_data — the reference's
    registerAndLoadTable(Seq[String]) path, Utilities.scala:116-137):
    string→typed conversion for every DeAL type family (long, string,
    double, datetime), plus a filter+join over the loaded rows. The data
    is literal, so the oracle is a VALUES list."""
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({item(Id:long, Name:string, Price:double, Since:datetime),"
        "tag(Id:long, Tag:string)})."
        "pricy(Id, Name, Price, T) <- item(Id, Name, Price, S), "
        "tag(Id, T), Price > 10.5, S > '2020-06-15'."
    )
    ctx.register_data(
        "item",
        [
            "1, widget, 12.75, 2021-01-05",
            "2, gadget, 9.99, 2022-03-01",
            "3, gizmo, 200.0, 2019-12-31",
            "4, doohickey, 10.5, 2023-07-04",
            "5, whatsit, 10.51, 2020-06-16",
        ],
    )
    ctx.register_data("tag", ["1, tools", "3, retro", "5, misc", "9, unused"])
    df = ctx.query("pricy(Id, Name, Price, T).")
    return df.select(
        F.col("Id").alias("id"),
        F.col("Name").alias("name"),
        F.col("Price").alias("price"),
        F.col("T").alias("tag"),
    )


def dl_filter_project(spark, sf_dir):
    """Scan + comparison filter + projection (RelationalQuerySuite shapes)."""
    orders = load_table(spark, sf_dir, "orders")
    df = _datalog(
        spark,
        "database({orders(OK:long, CK:long, St:string, TP:double, OD:datetime, OP:string)})."
        "big_orders(OK, CK, TP) <- orders(OK, CK, _, TP, _, _), TP > 450000.",
        {"orders": orders},
        "big_orders(OK, CK, TP).",
    )
    return df.select(
        F.col("OK").alias("o_orderkey"),
        F.col("CK").alias("o_custkey"),
        F.col("TP").alias("o_totalprice"),
    )


def dl_join_3way(spark, sf_dir):
    """3-way join with a constant filter pushed through (BASE_RELATION +
    JOIN + constant, LogicalPlanGenerator.scala:172-248)."""
    df = _datalog(
        spark,
        "database({customer(CK:long, CN:string, NK:integer, AB:double, MS:string),"
        "nation(NK:integer, NN:string, RK:integer),"
        "region(RK:integer, RN:string)})."
        "cust_nation(CN, NN) <- customer(_, CN, NK, _, _), nation(NK, NN, RK), "
        "region(RK, 'ASIA').",
        {
            "customer": load_table(spark, sf_dir, "customer"),
            "nation": load_table(spark, sf_dir, "nation"),
            "region": load_table(spark, sf_dir, "region"),
        },
        "cust_nation(CN, NN).",
    )
    return df.select(F.col("CN").alias("c_name"), F.col("NN").alias("n_name"))


def dl_negation(spark, sf_dir):
    """Anti-join negation (NegationQuerySuite semantics)."""
    df = _datalog(
        spark,
        "database({customer(CK:long, CN:string, NK:integer, AB:double, MS:string),"
        "orders(OK:long, CK:long, St:string, TP:double, OD:datetime, OP:string)})."
        "no_orders(CK) <- customer(CK, _, _, _, _), ~orders(_, CK, 'P', _, _, _).",
        {
            "customer": load_table(spark, sf_dir, "customer"),
            "orders": load_table(spark, sf_dir, "orders"),
        },
        "no_orders(CK).",
    )
    return df.select(F.col("CK").alias("c_custkey"))


def dl_union_distinct(spark, sf_dir):
    """Multi-rule union with set semantics (UNION, §2.6)."""
    df = _datalog(
        spark,
        "database({customer(CK:long, CN:string, NK:integer, AB:double, MS:string)})."
        "interesting(CK) <- customer(CK, _, _, AB, _), AB > 7000."
        "interesting(CK) <- customer(CK, _, _, _, 'MACHINERY').",
        {"customer": load_table(spark, sf_dir, "customer")},
        "interesting(CK).",
    )
    return df.select(F.col("CK").alias("c_custkey"))


def dl_agg_multi(spark, sf_dir):
    """Grouped multi-aggregate head (count + sum + avg, §2.4)."""
    df = _datalog(
        spark,
        "database({customer(CK:long, CN:string, NK:integer, AB:double, MS:string)})."
        "seg_stats(MS, count<CK>, avg<AB>) <- customer(CK, _, _, AB, MS).",
        {"customer": load_table(spark, sf_dir, "customer")},
        "seg_stats(MS, N, A).",
    )
    return df.select(
        F.col("MS").alias("c_mktsegment"),
        F.col("N").alias("n_customers"),
        F.round(F.col("A"), 4).alias("avg_balance"),
    )


def dl_countd(spark, sf_dir):
    """count-distinct aggregate (countd, §2.4)."""
    df = _datalog(
        spark,
        "database({lineitem(OK:long, PK:long, SK:long, LN:integer, Q:double,"
        "EP:double, D:double, T:double, RF:string, LS:string, SD:datetime)})."
        "supp_parts(SK, countd<PK>) <- lineitem(_, PK, SK, _, _, _, _, _, _, _, _).",
        {"lineitem": load_table(spark, sf_dir, "lineitem")},
        "supp_parts(SK, NP).",
    )
    return df.select(F.col("SK").alias("l_suppkey"), F.col("NP").alias("n_parts"))


def dl_sort_limit(spark, sf_dir):
    """sort((RP,desc),(PK,asc)) + limit(10) pseudo-predicates (§2.5).
    PK tiebreak keeps the limit deterministic — retail prices repeat at
    larger scale factors, and an untiebroken top-10 is engine-dependent."""
    df = _datalog(
        spark,
        "database({part(PK:long, PN:string, PB:string, PT:string, PS:integer, RP:double)})."
        "top_parts(PK, RP) <- part(PK, _, _, _, _, RP), sort((RP, desc), (PK, asc)), limit(10).",
        {"part": load_table(spark, sf_dir, "part")},
        "top_parts(PK, RP).",
    )
    return df.select(F.col("PK").alias("p_partkey"), F.col("RP").alias("p_retailprice"))


def dl_arith(spark, sf_dir):
    """Arithmetic binding in rule body (D = E*(1-d), §2.2)."""
    df = _datalog(
        spark,
        "database({lineitem(OK:long, PK:long, SK:long, LN:integer, Q:double,"
        "EP:double, D:double, T:double, RF:string, LS:string, SD:datetime)})."
        "revenue(OK, LN, R) <- lineitem(OK, _, _, LN, _, EP, D, _, _, _, _), "
        "R = EP * (1 - D).",
        {"lineitem": load_table(spark, sf_dir, "lineitem")},
        "revenue(OK, LN, R).",
    )
    return df.select(
        F.col("OK").alias("l_orderkey"),
        F.col("LN").alias("l_linenumber"),
        F.col("R").alias("revenue"),
    )


def dl_date_filter(spark, sf_dir):
    """Datetime comparison filters (RelationalQuerySuite date test shape)."""
    df = _datalog(
        spark,
        "database({orders(OK:long, CK:long, St:string, TP:double, OD:datetime, OP:string)})."
        "o99(OK, OD) <- orders(OK, _, _, _, OD, _), OD >= '1999-01-01', OD < '2000-01-01'.",
        {"orders": load_table(spark, sf_dir, "orders")},
        "o99(OK, OD).",
    )
    return df.select(F.col("OK").alias("o_orderkey"), F.col("OD").alias("o_orderdate"))


# ----------------------------------------------------------- datalog: recursion

def dl_tc(spark, sf_dir):
    """Transitive closure — the reference's flagship recursion
    (RecursiveQuerySuites TC-LL) on the derived binary-tree graph."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), arc(C,B).",
        {"arc": _tree_edges(spark, sf_dir)},
        "tc(A,B).",
    )
    return df.select(F.col("A").alias("src"), F.col("B").alias("dst"))


def dl_tc_rl(spark, sf_dir):
    """Right-linear TC (RecursiveQuerySuites TC-RL): the recursive atom
    is LAST in the body, so the delta joins arc on its FIRST column — the
    compilation path is different from dl_tc even though the closure is
    identical (and so is the oracle)."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- arc(A,C), tc(C,B).",
        {"arc": _tree_edges(spark, sf_dir)},
        "tc(A,B).",
    )
    return df.select(F.col("A").alias("src"), F.col("B").alias("dst"))


def dl_tc_distributed(spark, sf_dir):
    """Transitive closure FORCED onto the distributed segmented fixpoint
    (decomposable_local=False — the path a cluster takes when the seed
    outgrows the local gate): exercises the pivot-partitioned
    exchange-free loop (tests/test_pivot_partitioning.py) on the driver
    surface. Same closure, same oracle as dl_tc."""
    from bigdatalog_spark.datalog.context import EngineConfig

    ctx = BigDatalogContext(spark, EngineConfig(decomposable_local=False))
    ctx.load_program(
        "database({arc(S:long, D:long)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), arc(C,B)."
    )
    ctx.register("arc", _tree_edges(spark, sf_dir))
    df = ctx.query("tc(A,B).")
    return df.select(F.col("A").alias("src"), F.col("B").alias("dst"))


def _null_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, label) over the tree nodes where every 4th label is NULL —
    the nullable-static input that drives dl_tc_null_labels."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("y"),
        F.when(F.col("p_partkey") % 4 == 0, F.lit(None))
        .otherwise(F.col("p_partkey") % 100)
        .cast("long")
        .alias("w"),
    )


def dl_tc_null_labels(spark, sf_dir):
    """Label propagation with NULL-bearing tuples through the FORCED
    distributed fixpoint: seed = every tree node's label (every 4th is
    NULL), step propagates labels down tree edges. The same (node, NULL)
    tuple is re-derived from every %4==0 ancestor, so without the
    null-safe anti (datalog/fixpoint.py:174-204 detection riding the
    count job; eqNullSafe split anti) set semantics break — duplicate
    rows and a delta that never drains. The DuckDB oracle's recursive
    UNION dedups null-safely, so it enforces exactly this semantics.
    NULLs are outside the reference's own data model (its loader cannot
    produce them, SURVEY §1.2) — this row pins the EXTENSION contract
    for register()'d nullable frames."""
    from bigdatalog_spark.datalog.context import EngineConfig

    ctx = BigDatalogContext(
        spark,
        EngineConfig(
            decomposable_local=False, driver_local=False, local_seed_max_rows=0
        ),
    )
    ctx.load_program(
        "database({arc(S:long, D:long), lab(Y:long, W:long)})."
        "p(X, W) <- lab(X, W)."
        "p(Y, W) <- p(X, W), arc(X, Y)."
    )
    ctx.register("arc", _tree_edges(spark, sf_dir))
    ctx.register("lab", _null_labels(spark, sf_dir))
    df = ctx.query("p(A,B).")
    return df.select(F.col("A").alias("node"), F.col("B").alias("lab"))


def q_stream_sessionize(spark, sf_dir):
    """Gap-based session windows through the REAL streaming path:
    file-source readStream → watermarked ``session_window`` aggregation
    (Spark's native stateful session operator) → ``Trigger.AvailableNow``
    → memory sink in complete mode (session-window streams support
    append/complete, not update; complete emits the final merged session
    set when the bounded stream drains). The batch oracle — lag-based gap
    sessionization in SQL — checks it value-for-value. Summarized per
    user like q_sessionize so the driver hash covers every session
    without per-session timestamps."""
    from bigdatalog_spark.streaming.ops import sessionize, write_memory_sink

    schema = load_table(spark, sf_dir, "events").schema
    stream = _stream_events(spark, sf_dir, schema)
    sess = sessionize(stream, gap="30 minutes")
    with _stream_state_partitions(spark):
        q = write_memory_sink(
            sess, "q_stream_sessionize_sink", output_mode="complete"
        )
        q.awaitTermination()
    return (
        spark.table("q_stream_sessionize_sink")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )


def q_stream_sessionize_append(spark, sf_dir):
    """Session windows through the PRODUCTION streaming shape: file-source
    readStream → watermarked ``session_window`` → APPEND-mode parquet file
    sink with exactly-once checkpointing (streaming/ops.py:write_file_sink).
    Unlike q_stream_sessionize (complete-mode memory sink — drains ALL
    session state to the driver every trigger, bench-only by design),
    append mode emits each session exactly once, when the watermark closes
    it: state volume is watermark-bounded and the sink is distributed —
    the 100 TB shape. A sentinel row far past max(ts), staged as a
    strictly-later file so it forms the final micro-batch, pushes the
    watermark past the last session end and drains the bounded stream
    (watermarks only advance BETWEEN micro-batches; see
    tests/test_streaming.py::test_session_append_file_sink_parity).
    Result is summarized per user; sentinel rows filtered out. Oracle:
    the same lag-based gap sessionization as q_sessionize."""
    import datetime
    import glob as _glob
    import os
    import shutil
    import tempfile
    import time

    from bigdatalog_spark.streaming.ops import (
        sessionize,
        stream_events_from_files,
        write_file_sink,
    )

    events = load_table(spark, sf_dir, "events")
    schema = events.schema
    d = tempfile.mkdtemp(prefix="sess_append_")
    try:
        in_dir = os.path.join(d, "in")
        os.makedirs(in_dir)
        # stage the input files by symlink (no data copy; the file source
        # stats through the link, so data keeps its old mtime and the
        # sentinel written below is strictly newer)
        src = os.path.join(sf_dir, "events.parquet")
        files = (
            sorted(_glob.glob(os.path.join(src, "*.parquet")))
            if os.path.isdir(src) else [src]
        )
        for i, f in enumerate(files):
            os.symlink(f, os.path.join(in_dir, f"data_{i:05d}.parquet"))

        # Sentinel staging is DRIVER metadata work, not a query: max(ts)
        # comes from the parquet row-group statistics of the staged files
        # (a pure footer read — the files are already the query's input)
        # and the one-row sentinel file is written with pyarrow using the
        # first data file's physical schema, so it matches the stream's
        # layout byte-for-byte. This removes three Spark jobs per run
        # (full-scan max aggregate, limit(1) collect, single-row write +
        # commit protocol). Any surprise (missing stats, exotic ts type)
        # falls back to the original Spark path.
        sentinel_path = os.path.join(in_dir, "zz_sentinel.parquet")
        max_ts = None
        staged = False
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq

            first_schema = pq.ParquetFile(files[0]).schema_arrow
            if not pa.types.is_timestamp(first_schema.field("ts").type):
                raise ValueError("non-timestamp ts layout")
            for f in files:
                md = pq.ParquetFile(f).metadata
                ts_idx = next(
                    i for i in range(md.num_columns)
                    if md.schema.column(i).name == "ts"
                )
                for rg in range(md.num_row_groups):
                    grp = md.row_group(rg)
                    if grp.num_rows == 0:
                        continue
                    st = grp.column(ts_idx).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError("ts stats missing")
                    if max_ts is None or st.max > max_ts:
                        max_ts = st.max
            if max_ts is not None:
                sentinel_ts = max_ts + datetime.timedelta(days=365)
                cols = {}
                for name in first_schema.names:
                    t = first_schema.field(name).type
                    if name == "ts":
                        cols[name] = pa.array([sentinel_ts], type=t)
                    elif name == "user_id":
                        cols[name] = pa.array([-1], type=t)
                    elif pa.types.is_integer(t):
                        cols[name] = pa.array([0], type=t)
                    elif pa.types.is_floating(t):
                        cols[name] = pa.array([0.0], type=t)
                    elif pa.types.is_string(t) or pa.types.is_large_string(t):
                        cols[name] = pa.array(["sentinel"], type=t)
                    else:
                        raise ValueError(f"unhandled sentinel type {t}")
                pq.write_table(
                    pa.table(cols).cast(first_schema), sentinel_path
                )
            staged = True
        except Exception as exc:  # fall back to the Spark staging path
            # Say WHY (once per process): a silent fallback here quietly
            # re-adds three Spark jobs per run and looks like a perf
            # regression with no diagnosable cause (ADVICE r10).
            global _SENTINEL_FALLBACK_LOGGED
            if not _SENTINEL_FALLBACK_LOGGED:
                _SENTINEL_FALLBACK_LOGGED = True
                print(
                    "[bigdatalog] sentinel footer staging fell back to the "
                    f"Spark path: {type(exc).__name__}: {exc}",
                    file=sys.stderr,
                )
            max_ts = None
            staged = False
        if not staged:
            max_ts = events.agg(F.max("ts")).first()[0]
        if max_ts is None:  # empty corpus: no sessions, no stream to drain
            return spark.createDataFrame(
                [], "user_id bigint, n_sessions bigint, n_events bigint"
            )
        if not staged:
            sentinel_ts = max_ts + datetime.timedelta(days=365)
            sentinel = events.limit(1).select(
                F.col("event_id"),
                F.lit(sentinel_ts).cast(schema["ts"].dataType).alias("ts"),
                F.lit(-1).cast(schema["user_id"].dataType).alias("user_id"),
                F.col("event_type"),
                F.col("value"),
                F.col("props"),
            ).select(*[f.name for f in schema.fields])
            sentinel.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(d, "sentinel")
            )
            (part,) = _glob.glob(os.path.join(d, "sentinel", "*.parquet"))
            shutil.copy(part, sentinel_path)
        # FileStreamSource orders unseen files by mtime: future-date the
        # sentinel explicitly so it sorts strictly after the data files
        # even on coarse-granularity filesystems or a just-generated sf
        # dir (no reliance on wall-clock sleeps or no-data micro-batches)
        future = time.time() + 3600
        os.utime(sentinel_path, (future, future))

        # all data files in micro-batch 1, the sentinel alone in batch 2
        stream = stream_events_from_files(
            spark, in_dir, schema, max_files_per_trigger=max(1, len(files))
        )
        with _stream_state_partitions(spark):
            q = write_file_sink(
                sessionize(stream, gap="30 minutes"),
                path=os.path.join(d, "out"),
                checkpoint=os.path.join(d, "ckpt"),
            )
            q.awaitTermination()
        return (
            spark.read.parquet(os.path.join(d, "out"))
            .where(F.col("user_id") >= 0)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.sum("n_events").alias("n_events"),
            )
            # materialize before the temp sink dir is removed
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_stream_enrich(spark, sf_dir):
    """Stream-static enrichment join (streaming/ops.py:enrich_stream) —
    the canonical streaming dimension lookup: the events file-stream is
    joined per micro-batch against the static customer table
    (user_id = c_custkey) with the dim BROADCAST, so the unbounded stream
    side never shuffles and no state store is involved (stream-static
    joins are stateless by Structured Streaming's semantics, so the
    bounded stream drains fully in append mode with NO sentinel). The
    enriched stream lands in an append-mode parquet file sink — the
    production shape, distributed, never driver-collected; the returned
    frame summarizes per market segment. Sums run in decimal on both
    sides so the oracle is order-independent."""
    import os
    import shutil
    import tempfile

    from bigdatalog_spark.streaming.ops import enrich_stream, write_file_sink

    events = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    if events.limit(1).count() == 0:  # empty stream: sink writes no files
        return spark.createDataFrame(
            [], "c_mktsegment string, n_events bigint, sum_value double"
        )
    stream = _stream_events(spark, sf_dir, events.schema)
    enriched = enrich_stream(stream, dim, on="user_id").select(
        "c_mktsegment", "value"
    )
    d = tempfile.mkdtemp(prefix="stream_enrich_")
    try:
        q = write_file_sink(
            enriched, path=os.path.join(d, "out"),
            checkpoint=os.path.join(d, "ckpt"),
        )
        q.awaitTermination()
        return (
            spark.read.parquet(os.path.join(d, "out"))
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("sum_value"),
            )
            # materialize before the temp sink dir is removed
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def dl_agg_over_tc(spark, sf_dir):
    """Stratified aggregation OVER a recursion stratum — the reference's
    AggregatesOverRecursionQuerySuite pattern (min/count over a completed
    fixpoint): per source vertex, how many descendants and the smallest
    descendant id in the tree closure."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), arc(C,B)."
        "spans(A, count<B>, min<B>) <- tc(A,B).",
        {"arc": _tree_edges(spark, sf_dir)},
        "spans(A,N,M).",
    )
    return df.select(
        F.col("A").alias("src"),
        F.col("N").cast("long").alias("n_desc"),
        F.col("M").alias("min_desc"),
    )


def dl_tc_bound(spark, sf_dir):
    """Bound query form tc(1,B) — the engine pushes the constant into the
    fixpoint seed (adorned/magic-lite rewrite), exploring only vertex 1's
    slice of the closure instead of computing the full TC and filtering."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), arc(C,B).",
        {"arc": _tree_edges(spark, sf_dir)},
        "tc(1,B).",
    )
    return df.select(F.col("B").alias("dst"))


def dl_tc_nonlinear(spark, sf_dir):
    """Non-linear transitive closure tc(X,Y) <- tc(X,Z), tc(Z,Y)
    (RecursiveQuerySuites TC-NL): both body occurrences read the
    accumulated set, so the fixpoint converges in O(log diameter)
    iterations instead of O(diameter)."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B).",
        {"arc": _tree_edges(spark, sf_dir)},
        "tc(A,B).",
    )
    return df.select(F.col("A").alias("src"), F.col("B").alias("dst"))


def dl_tc_nl_bound(spark, sf_dir):
    """Bound query form over NON-LINEAR TC, tc(5,B) — the generalized
    adorned magic-sets path (context._magic_bound_general): left-to-right
    SIP gives the left occurrence the head's demand and routes the right
    occurrence's demand through the left's guarded results, so the
    transformed program is mutually recursive (magic ⇄ guarded) and the
    fixpoint explores only vertex 5's subtree of the closure instead of
    the full quadratic-ish TC. This is the query form the reference's
    DeALS front end adorns for all rule shapes (SURVEY §3 step 3,
    consumed at LogicalPlanGenerator.scala:344-384)."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B).",
        {"arc": _tree_edges(spark, sf_dir)},
        "tc(5,B).",
    )
    return df.select(F.col("B").alias("dst"))


def dl_tc_nl_bound_rev(spark, sf_dir):
    """Bound SECOND position on non-linear TC, tc(A, mid) — the query
    form with NO left-to-right adornment (demand for the first
    occurrence is empty), which the local demand transformation cannot
    serve at any scale. Round 8's chain-restricted tier answers it:
    demand = REVERSED reachability from the bound vertex over the exit
    edges (linear PSN), then the ordinary non-linear fixpoint over
    exit rows semi-joined on their destination
    (context._demand_chain_fallback; soundness invariants in its
    docstring). Bound at a mid-depth vertex so the demanded slice is the
    ancestor chain — O(log n), scale-independent. Before this tier the
    engine paid the FULL unbound closure for this goal."""
    mx = _part_max(spark, sf_dir)
    mid = mx // 2 + 1  # a leaf-ish vertex: ancestors = the root path
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B).",
        {"arc": _tree_edges(spark, sf_dir)},
        f"tc(A,{mid}).",
    )
    return df.select(F.col("A").alias("src"))


def dl_mutual_bound(spark, sf_dir):
    """Bound query form on a MUTUAL recursive clique — p/q alternate down
    the tree (p = odd-depth descendants, q = even-depth ≥ 2): each clique
    predicate gets its own adorned magic/guarded pair and the whole
    transformed program evaluates as one mutually recursive clique
    (context._magic_bound_general; MutualRecursion.scala:28-131 is the
    reference executor this generalizes the bound form of). Binding at
    vertex 5 makes the answer the odd-depth half of 5's subtree — a
    result set that GROWS with sf (~n/8 rows), so the driver row checks
    real demand propagation depth, not a constant-size fixture."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "p(X,Y) <- arc(X,Y)."
        "p(X,Y) <- arc(X,Z), q(Z,Y)."
        "q(X,Y) <- arc(X,Z), p(Z,Y).",
        {"arc": _tree_edges(spark, sf_dir)},
        "p(5,Y).",
    )
    return df.select(F.col("Y").alias("dst"))


def dl_mutual_even_odd(spark, sf_dir):
    """Mutual recursion (MutualRecursion.scala:28-131 semantics): vertices
    at even/odd hop distance from the root, two mutually-recursive
    predicates advanced in one combined fixpoint."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "even(X) <- X = 1."
        "odd(Y) <- even(X), arc(X,Y)."
        "even(Y) <- odd(X), arc(X,Y).",
        {"arc": _tree_edges(spark, sf_dir)},
        "even(X).",
    )
    return df.select(F.col("X").alias("vertex"))


def dl_reach(spark, sf_dir):
    """Reachability from a literal seed (Reach program)."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "reach(A) <- A = 1."
        "reach(B) <- reach(A), arc(A,B).",
        {"arc": _tree_edges(spark, sf_dir)},
        "reach(A).",
    )
    return df.select(F.col("A").alias("vertex"))


_MLM_PROGRAM = (
    "database({"
    "sponsor(M:integer, NM:integer), "
    "sales(M:integer, S:double, P:double), "
    "schedule(LS:double, RS:double, BP:double)})."
    "member_sales(M, sum<S>) <- sales(M, S, _)."
    "network_tc(M, M) <- sponsor(M, _)."
    "network_tc(M, M) <- sponsor(_, M)."
    "network_tc(M, M2) <- network_tc(M, M1), sponsor(M1, M2)."
    "member_total_sales(M, sum<S>) <- network_tc(M, NM), member_sales(NM, S)."
    "member_bonus_self(M, B) <- member_sales(M, ST), member_total_sales(M, S), "
    "schedule(LS, RS, BP), S >= LS, S < RS, B = ST * BP."
    "member_bonus_frontline(M, sum<B>) <- sponsor(M, NM), "
    "member_total_sales(NM, S), schedule(LS, RS, BP), S >= LS, S < RS, "
    "B = S * BP."
    "bonus(sum<B>) <- member_bonus_self(M,B1), member_bonus_frontline(M,B2), "
    "B = B1 + B2."
    "gross_profit(sum<P>) <- sales(_, _, P)."
    "net_profit(NP) <- gross_profit(P), bonus(B), NP = P - B."
)


def _mlm_ctx(spark, sf_dir):
    """MLM program (Experiments-class benchmark: recursion + stratified
    aggregation + arithmetic, RecursiveQuerySuites MLM) over derived data:
    the 63-node part-key tree as the sponsor network, one sales row per
    member, a 3-band bonus schedule."""
    part = load_table(spark, sf_dir, "part")
    sponsor = _tree_edges(spark, sf_dir).where(F.col("dst") <= 63)
    sales = part.where(F.col("p_partkey").between(1, 63)).select(
        F.col("p_partkey").cast("int").alias("m"),
        ((F.col("p_partkey") % 50) + 0.5).cast("double").alias("s"),
        ((F.col("p_partkey") % 20) + 0.25).cast("double").alias("p"),
    )
    ctx = BigDatalogContext(spark)
    ctx.load_program(_MLM_PROGRAM)
    ctx.register("sponsor", sponsor)
    ctx.register("sales", sales)
    ctx.register_data(
        "schedule", ["0.0, 100.0, 0.05", "100.0, 500.0, 0.08",
                     "500.0, 1000000000.0, 0.1"]
    )
    return ctx


def dl_mlm_total_sales(spark, sf_dir):
    """MLM downline totals: sum of member sales over the recursive sponsor
    network (recursion + stratified sum layering)."""
    df = _mlm_ctx(spark, sf_dir).query("member_total_sales(M, S).")
    return df.select(
        F.col("M").alias("m"), F.round(F.col("S"), 2).alias("total_sales")
    )


def dl_mlm_net_profit(spark, sf_dir):
    """MLM bottom line: gross profit minus banded bonuses — the full
    program (recursion, three aggregate strata, banded theta-join,
    arithmetic heads) collapsing to one row."""
    df = _mlm_ctx(spark, sf_dir).query("net_profit(NP).")
    return df.select(F.round(F.col("NP"), 4).alias("net_profit"))


def dl_unreachable(spark, sf_dir):
    """Stratified negation OVER a recursive stratum: nodes of the forest
    graph not reachable from node 1 (`~reach(N)` in a later stratum than
    the reach fixpoint — the layering NegationQuerySuite exercises on
    aggregates, applied to recursion)."""
    forest = _tree_edges(spark, sf_dir).where(F.col("dst") % 97 != 0)
    nodes = forest.select(F.col("src").alias("n")).union(
        forest.select(F.col("dst"))
    ).distinct()
    df = _datalog(
        spark,
        "database({arc(S:long, D:long), node(N:long)})."
        "reach(A) <- A = 1."
        "reach(B) <- reach(A), arc(A,B)."
        "unreachable(N) <- node(N), ~reach(N).",
        {"arc": forest, "node": nodes},
        "unreachable(N).",
    )
    return df.select(F.col("N").alias("vertex"))


def dl_sssp(spark, sf_dir):
    """SSSP via monotonic mmin aggregate in recursion
    (AggregatesInRecursionQuerySuite SSSP)."""
    edges = _tree_edges(spark, sf_dir).withColumn(
        "w", F.lit(1) + F.col("dst") % 3
    )
    df = _datalog(
        spark,
        "database({arc(S:long, D:long, W:long)})."
        "mminpath(X, mmin<D>) <- X = 1, D = 0."
        "mminpath(Z, mmin<D>) <- mminpath(X, D1), arc(X, Z, W), D = D1 + W."
        "sssp(X, min<D>) <- mminpath(X, D).",
        {"arc": edges},
        "sssp(V, D).",
    )
    return df.select(F.col("V").alias("vertex"), F.col("D").alias("distance"))


def dl_cc(spark, sf_dir):
    """Connected components (mmin fixpoint → min → countd) on the forest."""
    forest = _tree_edges(spark, sf_dir).where(F.col("dst") % 97 != 0)
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "cc3(X, mmin<X>) <- arc(X, _)."
        "cc3(Y, mmin<V>) <- cc3(X, V), arc(X, Y)."
        "cc2(X, min<Y>) <- cc3(X, Y)."
        "cc(countd<X>) <- cc2(_, X).",
        {"arc": forest},
        "cc(N).",
    )
    return df.select(F.col("N").alias("n_components"))


def dl_attend_mcount(spark, sf_dir):
    """mcount (additive monotonic aggregate) INSIDE recursion — the Attend
    program shape the reference declares but leaves unimplemented
    (AggregateSetRDD.scala:146-148 "TODO implement MCOUNT/MSUM").

    Graph: tree edges ∪ grandparent edges, so every node m ≥ 4 has exactly
    two in-neighbors {m/2, m/4}. Bootstrap percolation with threshold 2 and
    organizers {1, 3} then converges to exactly {1} ∪ subtree(3): a node
    attends iff BOTH its parent and grandparent attend, which by induction
    holds exactly inside 3's subtree (nodes 4,5 need 2, which never
    attends: its only in-neighbor is 1). That closed form is the DuckDB
    oracle; the engine runs the genuine mixed set+mcount fixpoint."""
    tree = _tree_edges(spark, sf_dir)
    grand = (
        tree.alias("a")
        .join(tree.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
    )
    garc = tree.union(grand)
    df = _datalog(
        spark,
        "database({garc(S:long, D:long)})."
        "attend(X) <- X = 1."
        "attend(X) <- X = 3."
        "attend(Y) <- cnt(Y, N), N >= 2."
        "cnt(Y, mcount<X>) <- attend(X), garc(X, Y).",
        {"garc": garc},
        "attend(V).",
    )
    return df.select(F.col("V").cast("long").alias("vertex"))


def dl_viral_msum(spark, sf_dir):
    """msum (additive monotonic aggregate) INSIDE recursion: weighted
    influence percolation. On the tree every node has in-degree 1, so
    msum(Y) = its parent's edge weight once the parent is active — the
    fixpoint equals weight-filtered reachability from the root, which is
    the DuckDB oracle; the engine runs the real mixed set+msum fixpoint."""
    edges = _tree_edges(spark, sf_dir).withColumn(
        "w", F.lit(1) + F.col("dst") % 3
    )
    df = _datalog(
        spark,
        "database({arc(S:long, D:long, W:long)})."
        "active(X) <- X = 1."
        "active(Y) <- wsum(Y, S), S >= 2."
        "wsum(Y, msum<W>) <- active(X), arc(X, Y, W).",
        {"arc": edges},
        "active(V).",
    )
    return df.select(F.col("V").cast("long").alias("vertex"))


def q_cc_fast(spark, sf_dir):
    """Connected components via O(log n)-round star contraction — the
    cluster-scale alternative to dl_cc's diameter-bound label propagation.
    Full (vertex, component) labels, oracle-checked."""
    from bigdatalog_spark.operators.graph import connected_components_fast

    forest = _tree_edges(spark, sf_dir).where(F.col("dst") % 97 != 0)
    return connected_components_fast(forest)


def q_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (operators/graph.py pagerank) over the
    part-key tree plus a deterministic cross-link per node
    (src → (src·31+7) mod max + 1), giving in-degree ≤ 2 so every
    per-node contribution sum has at most two terms — bit-identical in
    any IEEE engine, which is what lets the unrolled-SQL oracle
    hash-match. 8 power iterations, full (node, rank) table."""
    from bigdatalog_spark.operators.graph import pagerank

    mx = _part_max(spark, sf_dir)
    tree = _tree_edges(spark, sf_dir, mx=mx)
    cross = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") >= 1)
        .select(
            F.col("p_partkey").alias("src"),
            ((F.col("p_partkey") * 31 + 7) % F.lit(mx) + 1).alias("dst"),
        )
    )
    edges = tree.union(cross).where(F.col("src") != F.col("dst")).distinct()
    pr = pagerank(edges, iterations=8, damping=0.85)
    return pr.select("node", F.round("rank", 8).alias("rank"))


def q_kcore(spark, sf_dir):
    """k-core decomposition (operators/graph.py k_core — Seidman 1983
    iterative peeling) on the part-key tree plus one deterministic
    cross-link per node (same graph as q_pagerank, so the chords give the
    tree a non-trivial 2-core). The k-core is the UNIQUE maximal subgraph
    where every vertex has degree >= k, so any peel order — the engine's
    simultaneous rounds, the local vectorized path, or the oracle's
    unrolled per-round SQL — converges to identical (vertex, degree)
    rows."""
    from bigdatalog_spark.operators.graph import k_core

    mx = _part_max(spark, sf_dir)
    tree = _tree_edges(spark, sf_dir, mx=mx)
    cross = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") >= 1)
        .select(
            F.col("p_partkey").alias("src"),
            ((F.col("p_partkey") * 31 + 7) % F.lit(mx) + 1).alias("dst"),
        )
    )
    edges = tree.union(cross)
    return k_core(edges, k=2).select(
        F.col("vertex").cast("long").alias("vertex"), "degree"
    )


def dl_apsp(spark, sf_dir):
    """All-pairs shortest paths via mmin over (source, dest) keys
    (Experiments.scala program 31) on the weighted tree, capped at the
    top levels to keep the pair space bounded."""
    edges = _tree_edges(spark, sf_dir).where(F.col("dst") <= 511).withColumn(
        "w", F.lit(1) + F.col("dst") % 3
    )
    df = _datalog(
        spark,
        "database({arc(S:long, D:long, W:long)})."
        "apsp(X, Y, mmin<D>) <- arc(X, Y, D)."
        "apsp(X, Y, mmin<D>) <- apsp(X, Z, D1), arc(Z, Y, W), D = D1 + W.",
        {"arc": edges},
        "apsp(X, Y, D).",
    )
    return df.select(
        F.col("X").alias("src"), F.col("Y").alias("dst"),
        F.col("D").alias("distance"),
    )


def dl_apsp_bound(spark, sf_dir):
    """Bound-source shortest paths as a bound QUERY FORM on the monotonic
    apsp clique — apsp(3,Y,D) with no seed rule in the program (unlike
    dl_sssp, which writes the source into the exit rule). Served by the
    r09 stable-group-key demand pushdown (context._bound_aggregate_df):
    the engine filters the exit contribution stream to X=3 and runs a
    single-source fixpoint over the FULL tree — dl_apsp by contrast must
    cap its pair space at dst<=511 because it pays the all-pairs closure.
    Reference: DeALS adorned rewriting serves all bound query forms before
    evaluation-type selection (BigDatalogContext.scala:124-138)."""
    edges = _tree_edges(spark, sf_dir).withColumn(
        "w", F.lit(1) + F.col("dst") % 3
    )
    df = _datalog(
        spark,
        "database({arc(S:long, D:long, W:long)})."
        "apsp(X, Y, mmin<D>) <- arc(X, Y, D)."
        "apsp(X, Y, mmin<D>) <- apsp(X, Z, D1), arc(Z, Y, W), D = D1 + W.",
        {"arc": edges},
        "apsp(3, Y, D).",
    )
    return df.select(
        F.col("Y").alias("dst"), F.col("D").alias("distance")
    )


def dl_apsp_bound_rev(spark, sf_dir):
    """Bound-DESTINATION shortest paths — apsp(X,mid,D), "every vertex's
    distance TO mid" — the bound position is NOT stable (it walks through
    the recursion), so no seed filter applies; served by the r09
    chain-restricted MONOTONIC demand tier (_bound_monotonic_chain_df):
    demand = reverse reachability of mid over the key-projected E* (on the
    tree: mid's ancestor chain), then the ordinary mmin fixpoint with the
    exit contribution stream semi-joined to it — log(n)-sized instead of
    the full all-pairs closure. Reference: DeALS adorned rewriting covers
    all bound query forms (BigDatalogContext.scala:124-138)."""
    mx = _part_max(spark, sf_dir)
    mid = mx // 2 + 1
    edges = _tree_edges(spark, sf_dir, mx=mx).withColumn(
        "w", F.lit(1) + F.col("dst") % 3
    )
    df = _datalog(
        spark,
        "database({arc(S:long, D:long, W:long)})."
        "apsp(X, Y, mmin<D>) <- arc(X, Y, D)."
        "apsp(X, Y, mmin<D>) <- apsp(X, Z, D1), arc(Z, Y, W), D = D1 + W.",
        {"arc": edges},
        f"apsp(X, {mid}, D).",
    )
    return df.select(
        F.col("X").alias("src"), F.col("D").alias("distance")
    )


def dl_same_generation(spark, sf_dir):
    """Same-generation (non-linear variable flow) on the tree top levels."""
    pc = _tree_edges(spark, sf_dir).where(F.col("dst") <= 255)
    df = _datalog(
        spark,
        "database({pc(P:long, C:long)})."
        "sg(X,Y) <- pc(P,X), pc(P,Y), X ~= Y."
        "sg(X,Y) <- pc(A,X), sg(A,B), pc(B,Y).",
        {"pc": pc},
        "sg(X,Y).",
    )
    return df.select(F.col("X").alias("x"), F.col("Y").alias("y"))


def dl_sg_bound(spark, sf_dir):
    """Bound same-generation sg(12,Y) — the bound position is NOT stable
    (X changes through the recursion), so this takes the magic-sets demand
    path (context._magic_bound_df): a demand fixpoint first computes the
    ancestors of 12 via pc, then the sg fixpoint is semijoined against
    that demand set each iteration instead of materializing the full
    same-generation relation (the DeALS compiler's magic rewriting,
    SURVEY.md §3 step 3)."""
    pc = _tree_edges(spark, sf_dir).where(F.col("dst") <= 255)
    df = _datalog(
        spark,
        "database({pc(P:long, C:long)})."
        "sg(X,Y) <- pc(P,X), pc(P,Y), X ~= Y."
        "sg(X,Y) <- pc(A,X), sg(A,B), pc(B,Y).",
        {"pc": pc},
        "sg(12,Y).",
    )
    return df.select(F.col("Y").alias("y"))


def dl_triangle_count(spark, sf_dir):
    """Triangle counting with inequality filters + count<_>
    (TriangleQuerySuite program) on tree ∪ sibling ∪ up edges."""
    tree = _tree_edges(spark, sf_dir)
    mx = _part_max(spark, sf_dir)
    base = load_table(spark, sf_dir, "part").where(
        (F.col("p_partkey") >= 1) & (F.col("p_partkey") * 2 + 1 <= mx)
    ).select(F.col("p_partkey").alias("k"))
    sib = base.select(
        (F.col("k") * 2).alias("src"), (F.col("k") * 2 + 1).alias("dst")
    )
    up = base.select((F.col("k") * 2 + 1).alias("src"), F.col("k").alias("dst"))
    arcs = tree.union(sib).union(up)
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "triangles(X,Y,Z) <- arc(X,Y), X < Y, arc(Y,Z), Y < Z, arc(Z,X)."
        "tcount(count<_>) <- triangles(X,Y,Z).",
        {"arc": arcs},
        "tcount(N).",
    )
    return df.select(F.col("N").alias("n_triangles"))


# ----------------------------------------------------------- DataFrame analytics

def dl_pymk(spark, sf_dir):
    """PYMK / triangle-closing recommendation (the reference's programs
    72-73, TriangleQuerySuite pymk): for non-adjacent vertex pairs sharing
    neighbors, count the common neighbors and return the deterministic
    top-20 — negation + aggregate-over-aggregate + multi-key sort + limit
    in one Datalog program."""
    df = _datalog(
        spark,
        "database({arc(S:long, D:long)})."
        "uarc(X,Y) <- arc(X,Y)."
        "uarc(Y,X) <- arc(X,Y)."
        "tclose(Y, Z, count<X>) <- uarc(X,Y), uarc(X,Z), Y ~= Z, ~uarc(Y,Z)."
        "pymk(Y, Z, N) <- tclose(Y, Z, N),"
        " sort((N,desc),(Y,asc),(Z,asc)), limit(20).",
        {"arc": _tree_edges(spark, sf_dir)},
        "pymk(A,B,N).",
    )
    return df.select(
        F.col("A").alias("y"), F.col("B").alias("z"),
        F.col("N").cast("long").alias("n_common"),
    )


def q1_pricing_summary(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= "2000-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_order_revenue(spark, sf_dir):
    """Join-order + pre-aggregation shape chosen for 100 TB: customer
    (filtered, broadcast) reduces orders FIRST — a 5× semi-join reduction
    before anything touches lineitem — and lineitem pre-aggregates
    revenue per orderkey BEFORE its join (map-side combine compresses the
    shuffle to ~unique orderkeys; per-orderkey sums are unchanged by the
    later membership filter, so results are identical). The naive
    (lineitem ⋈ orders) ⋈ customer form SMJ-shuffles the full fact pair
    first and aggregates last — measured 31.3 s vs 12–20 s at sf10 (warm
    pair of runs 12.1/19.8 s), par at sf0.1."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select("o_orderkey")
    rev = l.groupBy("l_orderkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    return (
        rev.join(oc, rev.l_orderkey == oc.o_orderkey)
        .select("o_orderkey", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q5_region_revenue(spark, sf_dir):
    """Pre-aggregated form for 100 TB: lineitem collapses to one
    (revenue, count) row per orderkey BEFORE the fact join (map-side
    combine — lineitem is clustered by orderkey, so the shuffle carries
    ~unique keys, 4× fewer rows), and the orders side picks up its
    region/nation labels through broadcast dim joins. Per-orderkey
    partials re-aggregate to the same group sums (counts exactly;
    revenue up to double addition order, which the join form never
    guaranteed either). Measured at sf10: 20.2 → 15.0 s warm."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dims = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("o_orderkey", "r_name", "n_name")
    )
    la = l.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        la.join(dims, la.l_orderkey == dims.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.sum("cnt").alias("n_lineitems"),
        )
    )


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: scan + fully-pushed filters + one global agg. At
    100 TB this is a pure map-side pipeline — every predicate reaches the
    parquet scan (PushedFilters), only 4 of 11 columns are read, and the
    only exchange carries one partial-agg row per task."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


def q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer over a quarter,
    top 20. The fact table streams through one shuffled join (orders) and
    two broadcasts (customer dim is larger, but the post-join group-by is
    keyed on c_custkey so Catalyst reuses that exchange)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        # per-term decimal(18,4) cast makes the sum order-independent
        # (exact decimal addition), so the 2-decimal rounding can't
        # straddle a half-cent boundary differently per engine
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a fact-dim join —
    promo revenue share for one month. part broadcasts; the month filter
    is pushed to the lineitem scan; one exchange total (the single-row
    final agg)."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated avg-quantity subquery, decorrelated
    into a per-part aggregate joined back to the fact table. The per-part
    thresholds are tiny (one row per part) → broadcast; the brand filter
    prunes before either join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#11") & (F.col("p_type") == "SMALL")
    )
    lim = l.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(lim.withColumnRenamed("l_partkey", "lim_partkey")),
              F.col("l_partkey") == F.col("lim_partkey"))
        .where(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: group-by-having on the fact table (map-side
    combinable sum per orderkey), survivors rejoined to orders+customer.
    The having output is tiny → both rejoins broadcast the survivor set,
    so the dims are never shuffled."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts
    INCLUDING zero-order customers (left outer join + two-level
    aggregation). The first group-by is keyed on c_custkey (uniform);
    the second input is one row per customer."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average balance and no
    URGENT orders (scalar-subquery threshold + anti-join on a filtered
    fact slice), grouped by a derived code. The average is one scalar
    broadcast; the anti-join streams the customer side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between two nation pairs by year —
    a 5-way join where both nation dims broadcast and the pair predicate
    is a disjunction over the two broadcast columns."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of regional revenue per year —
    conditional aggregation (sum of CASE) over a star join."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
        F.col("n_regionkey").alias("sn_region"),
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(r), F.col("sn_region") == r.r_regionkey)
        .where(F.col("r_name") == "EUROPE")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        # exact decimal sums (order-independent), ratio taken in double —
        # both engines divide the SAME two doubles, so round(.,6) agrees
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_6", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and year over a
    name-filtered part slice (LIKE predicate pushed to the part scan;
    cost proxied by p_retailprice since the schema has no partsupp)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


def q12_priority_lines(spark, sf_dir):
    """TPC-H Q12 shape: late-shipment counts split by order priority —
    conditional counts over a date-lag filter (l_shipdate more than 60
    days after o_orderdate stands in for the missing commit/receipt
    dates)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(l.l_shipdate > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with maximum quarterly revenue — an
    aggregate view joined against its own scalar max (the revenue view is
    computed once and reused via self-agg, not recomputed per row)."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q19_disjunctive_filter(spark, sf_dir):
    """TPC-H Q19 shape: revenue under a disjunction of brand/quantity/size
    conjunctions — the OR-of-ANDs must still prune at the scans (each arm
    references both sides, so the filter sits on the joined stream but the
    shared p/l prefilters push down)."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 11)
        & (F.col("p_size").between(1, 5))
    )
    arm2 = (
        (F.col("p_brand") == "Brand#9")
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
        & (F.col("p_size").between(1, 10))
    )
    arm3 = (
        (F.col("p_brand") == "Brand#15")
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 30)
        & (F.col("p_size").between(1, 15))
    )
    return j.where(arm1 | arm2 | arm3).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier order — EXISTS (another supplier on the order) plus
    NOT EXISTS (another LATE supplier on the order): a left-semi and a
    left-anti against two slices of the same fact table."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    # EXISTS/NOT-EXISTS as ONE per-order aggregation pass: join the fact
    # to the F-order slice once (shuffle on l_orderkey), then a single
    # co-partitioned groupBy(l_orderkey) computes everything the classic
    # formulation needed three shuffles and two semi-joins for —
    # n_supp (another supplier ⇔ ≥ 2), n_late_supp (no OTHER late
    # supplier ⇔ = 1), and, because exactly one supplier is late in a
    # surviving order, max(late supplier key) IS that supplier. Counting
    # over the F-slice equals counting over all lineitems for the
    # surviving orders (late orders are F orders, and the slice keeps
    # every line of an F order). Count-distincts are map-side combinable;
    # the supplier join is left to AQE — both sides scale with SF, so the
    # smaller lands broadcast at bench scale without pinning a hint that
    # would ship a linearly-growing survivor set at 100 TB.
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    survivors = (
        l.join(o.select("o_orderkey", "o_orderdate"),
               l.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("__n_supp"),
            F.count_distinct(F.when(late, F.col("l_suppkey"))).alias(
                "__n_late"
            ),
            F.max(F.when(late, F.col("l_suppkey"))).alias("__late_supp"),
        )
        .where((F.col("__n_late") == 1) & (F.col("__n_supp") >= 2))
        .select("__late_supp")
    )
    return (
        s.join(survivors, F.col("__late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering
    the REGIONAL MINIMUM supply cost — the correlated-min subquery becomes
    a per-part min aggregate joined back against the candidate rows.

    The testdata has no partsupp table, so the supplier catalog is derived
    from the fact table itself: supplycost(part, supplier) = the cheapest
    observed unit price, min over the RAW double quotient — IEEE division
    of identical doubles is bit-identical across engines and min is an
    exact selection, so no rounding enters the compared values at all
    (round(x, 6) is NOT portable: Spark rounds HALF_UP on the shortest
    decimal representation, DuckDB multiplies and std::rounds — they
    disagree on ~1 in 10⁵ of these quotients).
    Scale: the part filter broadcast-reduces lineitem BEFORE the (part,
    supplier) aggregation; supplier⋈nation⋈region is a broadcast dim; the
    per-part min is one row per qualifying part and broadcasts back, so
    the only fact-sized shuffle is the groupBy(part, supplier)."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    l = load_table(spark, sf_dir, "lineitem")
    eur_supp = (
        s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supplycost"
            )
        )
    )
    ps_eur = ps.join(F.broadcast(eur_supp), ps.l_suppkey == F.col("s_suppkey"))
    mn = ps_eur.groupBy("l_partkey").agg(F.min("supplycost").alias("__mn"))
    return (
        ps_eur.join(F.broadcast(mn), "l_partkey")
        .where(F.col("supplycost") == F.col("__mn"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "supplycost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q4_priority_late_orders(spark, sf_dir):
    """TPC-H Q4 shape: order-priority checking — count a quarter's orders
    where EXISTS a lineitem that slipped (shipped > 45 days after the
    order date; the testdata has no commit/receipt dates, so the ship lag
    is the lateness proxy). The EXISTS is a left-semi join whose condition
    references both sides, exactly like the reference's comparison-bearing
    joins (LogicalPlanGenerator.scala:242-267 builds Join(condition) from
    non-equi goals). The quarter filter pushes to the orders scan; the
    semi-join shuffles on orderkey and keeps at most one survivor per
    order, so the groupBy is over the reduced slice."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > F.date_add(F.col("o_orderdate"), 45)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's supplied value — a grouped aggregate HAVING > k × a scalar
    computed FROM the grouped result (not a second fact pass) and
    broadcast back. TPC-H's fixed FRACTION×total dilutes as the part
    catalog grows (0 survivors past a few thousand parts), so the
    threshold is 2.5× the MEAN per-part value — same scalar-subquery
    shape, selectivity invariant under scale-up. Value sums accumulate in
    decimal(18,4) so the boundary is order-independent and
    engine-portable (double accumulation would make it ulp-sensitive).
    partsupp is derived from the fact table: a nation's supplied value
    per part = revenue its suppliers shipped. One fact-sized shuffle
    (groupBy partkey); the nation's supplier list is a broadcast
    semi-join reducing lineitem first."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    l = load_table(spark, sf_dir, "lineitem")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey")).select(
        "s_suppkey"
    )
    vals = (
        l.join(F.broadcast(nat_supp), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("value")
        )
        # both the scalar threshold and the final filter read vals; without
        # this the fact scan + aggregation run TWICE (Catalyst's exchange
        # reuse does not unify the two branches). vals is parts-sized —
        # materializing it once is cheap at any SF. sf1 warm measured:
        # 18.7 → 2.0 s.
        .localCheckpoint(eager=True)
    )
    # exact decimal accumulation, then ONE double conversion before the
    # divide — decimal-division scale rules differ across engines
    thr = vals.agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
            * F.lit(2.5)
        ).alias("__thr")
    )
    return (
        vals.join(F.broadcast(thr))
        .where(F.col("value") > F.col("__thr"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    (brand, type, size) part group, excluding a blacklist of suppliers —
    NOT IN becomes a left-anti join against the (broadcast) blacklist
    (negative account balance stands in for the complaints predicate).
    The fact table collapses to distinct (part, supplier) pairs FIRST —
    the one fact-sized shuffle — so the part join and the final
    count_distinct run over the reduced pair set."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    pairs = (
        l.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        pairs.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q20_dominant_supplier(spark, sf_dir):
    """TPC-H Q20 shape: suppliers holding a dominant position on a part
    family — nested semi-joins over two aggregation levels. Without
    partsupp.availqty, dominance = shipped more than half of a part's
    1997 volume ('small %' name prefix selects the family). Quantities
    are small exact integers in doubles, so the 0.5×total comparison is
    exact in both engines. Plan: broadcast part-family filter reduces the
    fact slice, one shuffle to (part, supplier) sums; the per-part totals
    re-aggregate FROM the pair sums (parts-sized, not fact-sized) and the
    join back is left to AQE — at bench scale it lands broadcast, at
    100 TB both sides stay partkey-partitioned from the same shuffle."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").startswith("small "))
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_ps = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    dom = (
        per_ps.join(per_p, "l_partkey")
        .where(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dom, s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def q_subword_tokens(spark, sf_dir):
    """Token budgets per source with the BPE-ish run counter next to the
    whitespace counter — the fidelity gap between them is exactly the
    punctuation/digit-boundary token mass a subword tokenizer adds."""
    from bigdatalog_spark.functions.text import subword_token_count, token_count

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(subword_token_count("text")).alias("subword_tokens"),
        F.sum(token_count("text")).alias("ws_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_tfidf_topk(spark, sf_dir):
    """Top-3 tf-idf terms per document (inverted-index shape) over a
    bounded doc slice."""
    from bigdatalog_spark.functions.text import tfidf_top_terms

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return tfidf_top_terms(d, k=3)


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing (rolling-hash) document fingerprints, summarized per doc
    (count + extremes) so the driver hash checks the full fingerprint
    pipeline without shipping every (doc, fp) row."""
    from bigdatalog_spark.functions.text import winnowing_fingerprints

    d = load_table(spark, sf_dir, "documents")
    return (
        winnowing_fingerprints(d, k=5, window=4)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
    )


def q_shard_manifest(spark, sf_dir):
    """Training-shard export manifest: per-shard row/token budgets from the
    deterministic md5 shard assignment (operators/io.py). A pure
    map-side expression + one keyed count — the planning table a training
    loader schedules from, recomputable by any engine (the oracle does)."""
    from bigdatalog_spark.operators.io import shard_manifest

    d = load_table(spark, sf_dir, "documents")
    return shard_manifest(d, num_shards=8)


def q_exists_semijoin(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def q_topk_users_window(spark, sf_dir):
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    totals = e.groupBy("user_id").agg(F.round(F.sum("value"), 4).alias("total_value"))
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id").asc())
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("user_id", "total_value", "rank")
    )


def q_hourly_events(spark, sf_dir):
    """Hourly per-type event counts — executed through the REAL
    Structured Streaming path, not the batch-parity form: file-source
    ``readStream`` over the events parquet, tumbling-window aggregation,
    ``Trigger.AvailableNow`` into a memory sink (complete mode, so every
    window is emitted when the bounded stream drains). The oracle is the
    batch-equivalent SQL — streaming/batch parity is the Structured
    Streaming contract this entry exists to exercise."""
    from bigdatalog_spark.streaming.ops import write_memory_sink

    schema = load_table(spark, sf_dir, "events").schema
    stream = _stream_events(spark, sf_dir, schema)
    agg = windowed_event_counts(stream, "1 hour")
    with _stream_state_partitions(spark):
        q = write_memory_sink(agg, "q_hourly_events_sink", output_mode="complete")
        q.awaitTermination()
    return spark.table("q_hourly_events_sink")


def q_sliding_windows(spark, sf_dir):
    """Sliding event-time windows (1 hour wide, 15-minute slide): every
    event lands in exactly 4 overlapping windows. F.window's streaming
    semantics on its batch face; the oracle replays the window grid with
    integer-microsecond arithmetic (events carry sub-second timestamps,
    so float epoch math would drift)."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "total",
        )
    )


def q_cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-seen week, counted by
    distinct active users per weeks-since-cohort offset. Two keyed
    aggregations (first-seen per user; distinct users per cohort×offset)
    and one user-keyed join — the canonical product-analytics rollup."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("active_week")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy("cohort_week")
        .agg(
            F.count_distinct("user_id").alias("cohort_size"),
            F.count_distinct(
                F.when(
                    F.datediff("active_week", "cohort_week") == 7,
                    F.col("user_id"),
                )
            ).alias("week1_retained"),
            F.count_distinct(
                F.when(
                    F.datediff("active_week", "cohort_week") == 28,
                    F.col("user_id"),
                )
            ).alias("week4_retained"),
        )
    )


def q_countd_approx(spark, sf_dir):
    """HyperLogLog++ distinct-user counts per event type, driver-checked
    with the same bound-form contract as the percentile sketch: each group
    emits a boolean asserting |approx − exact| ≤ 5% of exact (the sketch's
    default rsd is 5%; exact countd is the oracle's pinned TRUE). The HLL
    is the 100 TB path — partial sketches merge map-side, no distinct
    shuffle of the raw keys."""
    e = load_table(spark, sf_dir, "events")
    # rsd=0.01: the default 5% rsd is a standard deviation, not a bound —
    # at sf0.1 group sizes (~10k distinct) it routinely exceeds a 5%
    # tolerance. 1% rsd under a 5% bound gives ~5 sigma of headroom.
    # The exact and approx counts are SEPARATE aggregations joined on the
    # (tiny) group key: combining count_distinct with the HLL in one agg
    # plans an Expand that duplicates every row and drags the 16 KB HLL
    # buffers through the widened shuffle (measured 3-18 s erratic at sf1
    # vs a stable 0.8 s split).
    ap = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("__a")
    )
    ex = e.groupBy("event_type").agg(F.count_distinct("user_id").alias("__x"))
    return ap.join(ex, "event_type").select(
        "event_type",
        (F.abs(F.col("__a") - F.col("__x")) <= F.col("__x") * 0.05).alias(
            "countd_ok"
        ),
    )


def q_sessionize(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    sess = sessionize(e, gap="30 minutes")
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


def q_salted_join(spark, sf_dir):
    """Skew-tolerant salted equi-join (operators/joins.py salted_join):
    the skewed side gets a random sub-key, the other side replicates
    across salt values, the join keys on (key, salt). Output ROWS are
    identical to the plain join — salt only changes task distribution —
    which is exactly what the plain-SQL oracle verifies."""
    from bigdatalog_spark.operators.joins import salted_join

    l = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_quantity")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return salted_join(l, o, on="l_orderkey", salt=8)


def q_funnel(spark, sf_dir):
    """Ordered view→click→purchase funnel per user (operators/funnel.py):
    t_i = earliest step-i event at or after t_{i-1}, within 24 hours of
    t_1; `reached` counts completed steps. k−1 user-keyed joins over
    step-filtered slices — each scan pruned by the pushed type filter."""
    from bigdatalog_spark.operators.funnel import funnel

    e = load_table(spark, sf_dir, "events")
    return funnel(e, ["view", "click", "purchase"], within="24 hours")


def q_rollup_revenue(spark, sf_dir):
    """Hierarchical rollup (region → nation) — grouping-analytics surface
    beyond the reference's flat aggregates."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


def q_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per event type (continuous quantile)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


def q_value_percentiles_approx(spark, sf_dir):
    """Sketch percentiles (approx_percentile, rank error 1e-4): the scale
    path beside q_value_percentiles' exact baseline. The underlying
    quantile sketch is partially aggregated map-side and merged — at
    100 TB this is the only percentile that doesn't sort the world.

    Driver-checkable bound form: the sketch value itself isn't
    engine-portable, so each group emits a boolean asserting the approx
    value lies between the EXACT quantiles at q±0.005 (50x the sketch's
    guaranteed rank error). The oracle pins every boolean to TRUE, so a
    hash match == "every group's sketch is within tolerance"."""
    e = load_table(spark, sf_dir, "events")
    delta = 0.005

    def ok(q):
        approx = F.percentile_approx("value", F.lit(q), F.lit(10000))
        lo = F.percentile("value", F.lit(max(0.0, q - delta)))
        hi = F.percentile("value", F.lit(min(1.0, q + delta)))
        return (approx >= lo) & (approx <= hi)

    return e.groupBy("event_type").agg(
        ok(0.5).alias("p50_ok"),
        ok(0.95).alias("p95_ok"),
        ok(0.99).alias("p99_ok"),
    )


def q_running_avg(spark, sf_dir):
    """Per-user running mean over the last 10 events (window frame)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-9, 0)
    )
    return e.where(F.col("user_id") < 100).select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("running_avg"),
    )


def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the irregular-subtotal shape ROLLUP/CUBE
    can't express: (priority, status), (priority), (status) but NOT the
    grand total. One pass, map-side partial aggregation per set; the
    Datalog surface has no grouping analytics (SURVEY §2.4), so this is
    engine-surface beyond parity, driver-checked."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql("""
        SELECT coalesce(o_orderpriority, '(all)') AS o_orderpriority,
               coalesce(o_orderstatus, '(all)') AS o_orderstatus,
               round(sum(o_totalprice), 2) AS total,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))
    """)


def q_asof_forward(spark, sf_dir):
    """Forward as-of join (operators/joins.py asof_join
    direction='forward'): for every click, the user's NEXT purchase at or
    after it — the other branch of the window-merge formulation."""
    from bigdatalog_spark.operators.joins import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("pvalue"))
    )
    return asof_join(
        clicks, purchases, on="user_id", left_time="ts", right_time="ts",
        direction="forward",
    ).select("user_id", "ts", "event_id", "ts_right", "pvalue")


def q_asof_purchase(spark, sf_dir):
    """As-of join (operators/joins.py asof_join): for every click event,
    the user's most recent purchase value at-or-before the click — ONE
    window shuffle, no nested-loop probe. Right side pre-aggregated to one
    row per (user, ts) for a deterministic match (DuckDB ASOF oracle)."""
    from bigdatalog_spark.operators.joins import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("pvalue"))
    )
    return asof_join(
        clicks, purchases, on="user_id", left_time="ts", right_time="ts"
    ).select("user_id", "ts", "event_id", "ts_right", "pvalue")


def q_interval_join(spark, sf_dir):
    """Batch face of the stream-stream interval join (streaming/ops.py
    interval_join): purchases within one hour AFTER each click by the same
    user. The same code path runs on streams with watermarked state."""
    from bigdatalog_spark.streaming.ops import interval_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    return interval_join(
        clicks, purchases, on="user_id", lower="0 seconds", upper="1 hour"
    ).select("user_id", "click_id", "purchase_id", "ts", "ts_r")


def q_range_acctbal_band(spark, sf_dir):
    """Range (point-in-interval) join via interval bucketing
    (operators/joins.py range_join): customers whose balance falls within
    ±50 of each supplier's balance, aggregated per supplier — an equi-join
    on bucket ids instead of Spark's O(n·m) nested-loop inequality join."""
    from bigdatalog_spark.operators.joins import range_join

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 50).alias("lo"),
        (F.col("s_acctbal") + 50).alias("hi"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    j = range_join(c, s, "c_acctbal", "lo", "hi", bucket_width=100.0)
    return j.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


# ----------------------------------------------------------- pipeline operators

def q_dedup_exact(spark, sf_dir):
    from bigdatalog_spark.functions.text import fingerprint

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.5)


_BOILERPLATE = (
    "terms of service apply to this document please read carefully "
    "before proceeding"
)


def q_dedup_jaccard_capped(spark, sf_dir):
    """Jaccard dedup under shingle skew: every document gets the same
    boilerplate header (the classic crawl-corpus pathology — one shingle
    shared by ALL docs would fan the self-join out quadratically in a
    single shuffle key). max_doc_freq drops shingles whose doc-frequency
    exceeds the cap from both intersection and union, so the join's
    per-key blow-up is bounded by cap² and the Jaccard measure is exact
    over the filtered shingle space."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.concat(F.lit(_BOILERPLATE + " "), F.col("text"))
    )
    return ngram_jaccard_pairs(d, threshold=0.5, max_doc_freq=100)


def q_dedup_minhash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, threshold=0.5)


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs, driven with the engine-portable md5 token
    hash so the result is oracle-checkable: the block trick's pigeonhole
    recall is exactly 1, so the output equals the full pairwise
    hamming ≤ 3 filter the DuckDB oracle computes. Production keeps the
    xxhash64 default (operators/dedup.py simhash)."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, max_hamming=3, hash_fn="portable_md5")


def q_fuzzy_names(spark, sf_dir):
    """Entity-resolution fuzzy join (operators/dedup.py qgram_fuzzy_pairs):
    distinct part names within Levenshtein distance 2, candidates from a
    q-gram blocking self-join (guaranteed recall for names ≥ q·(d+1)
    chars, short-string fallback below), verified with the exact
    levenshtein expression — which DuckDB shares, making the oracle a
    brute-force distinct-name cross check."""
    from bigdatalog_spark.operators.dedup import qgram_fuzzy_pairs

    p = load_table(spark, sf_dir, "part")
    return qgram_fuzzy_pairs(p, col="p_name", max_dist=2).select(
        "left_name", "right_name", "dist"
    )


def q_dedup_embedding(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(e, threshold=0.4, block_col="label")


def q_ann_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(e, q, k=5)


def q_ann_ivf(spark, sf_dir):
    """IVF-style ANN (coarse quantizer cells + nprobe probing) — the scale
    path next to q_ann_topk's exact baseline. Deterministic axis-aligned
    centroids; rows-only check (approximate by design)."""
    from bigdatalog_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    centroids = []
    for c in range(4):
        v = [0.0] * dim
        v[c % dim] = 1.0
        centroids.append(v)
    q = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(e, q, centroids, k=5, nprobe=2)


def q_ann_lsh(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN (operators/similarity.py lsh_topk) —
    the third scale path next to brute force and IVF. Axis-aligned planes
    make the 16-bucket signature (sign of the first 4 components) exactly
    reproducible in SQL, so the approximate result is hash-checked, not
    rows-only."""
    from bigdatalog_spark.operators.similarity import lsh_topk

    e = load_table(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    planes = []
    for i in range(4):
        p = [0.0] * dim
        p[i] = 1.0
        planes.append(p)
    q = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(e, q, planes, k=5)


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: documents → opaque binary payloads → Arrow-
    batched mapInPandas feature extraction (deterministic stub decode)."""
    from bigdatalog_spark.operators.multimodal import extract_features

    return extract_features(_media_table(spark, sf_dir)).select(
        "media_id", "n_bytes"
    )


def _media_table(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.length("text") * 10).cast("long").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def q_wav_features(spark, sf_dir):
    """REAL audio decode on the driver surface: per document, synthesize a
    deterministic square-wave WAV payload (stdlib encoder, amplitude and
    length derived from doc_id), run it through the strict (no-fake)
    multimodal feature extractor — actual RIFF/PCM parsing + sample
    statistics in functions/wav.py — and emit the waveform features. The
    square wave makes every feature CLOSED-FORM and exactly representable
    (amplitude a/32768 is a power-of-two divide, so float32 storage is
    exact): rms = mean_abs = a/32768, zero-crossing rate = 1, dc = 0,
    duration = n/8 ms at 8 kHz with n a multiple of 8 — which is what
    lets a plain-arithmetic DuckDB oracle hash-match a real codec run."""
    from bigdatalog_spark.functions.wav import encode_wav
    from bigdatalog_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 800 + (did % 7) * 80  # multiple of 8 → exact ms
                a = 1000 + (did * 37) % 30000  # int16 amplitude
                x = a / 32768.0
                samples = np.empty(n)
                samples[0::2] = x
                samples[1::2] = -x
                out.append(
                    {
                        "media_id": did,
                        "kind": "audio",
                        "payload": encode_wav(samples.reshape(-1, 1), 8000),
                        "meta": {
                            "width": None,
                            "height": None,
                            "sample_rate": 8000,
                            "duration_ms": n // 8,
                            "codec": "pcm_s16le",
                        },
                    }
                )
            yield pd.DataFrame(out)

    media = d.mapInPandas(synth, MEDIA_SCHEMA)
    f = extract_features(media, deterministic_fake=False)
    return f.select(
        "media_id",
        F.col("feature")[0].cast("double").alias("sample_rate"),
        F.col("feature")[2].cast("double").alias("duration_ms"),
        F.col("feature")[3].cast("double").alias("rms"),
        F.col("feature")[6].cast("double").alias("zcr"),
        F.col("feature")[7].cast("double").alias("dc"),
    )


def q_media_frames(spark, sf_dir):
    """Video frame sampling (operators/multimodal.py sample_frames): the
    1→N mapInPandas shape — one output row per sampled timestamp, Arrow-
    batched, deterministic stub decode so the frame grid is oracle-able."""
    from bigdatalog_spark.operators.multimodal import sample_frames

    frames = sample_frames(_media_table(spark, sf_dir), every_ms=1000)
    return frames.select("media_id", "ts_ms")


def q_text_profile(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return text_profile(d).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality",
        "lang_pred", "fp",
    )


def q_dedup_cluster(spark, sf_dir):
    """Pairwise dup evidence → transitive clusters → canonical doc per
    cluster (operators/dedup.py dedup_clusters, O(log n) star contraction).
    Oracle: DuckDB WITH RECURSIVE reachability over the same exact-Jaccard
    pair graph."""
    from bigdatalog_spark.operators.dedup import dedup_clusters

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.5)
    return dedup_clusters(d, pairs)


def q_lang_histogram(spark, sf_dir):
    """Corpus language composition: n-gram-marker language ID rolled up to
    per-language doc counts (the first report any multilingual training-
    data pipeline produces)."""
    d = load_table(spark, sf_dir, "documents")
    # via the STAGED profile (tokens computed once, marker filters over the
    # shared array) — calling lang_id() directly inlines the tokenizer into
    # every marker filter and whole-stage-codegen compilation dominates
    # (~10 s before the first row at sf0.1); unused profile columns prune
    return (
        text_profile(d)
        .select("lang_pred")
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_quality_filter(spark, sf_dir):
    """Quality gate: keep documents whose composite quality score passes
    threshold — the canonical corpus-filtering step. Score is built from
    length/stopword/punctuation ratios, all JVM-side expressions."""
    from bigdatalog_spark.functions.text import quality_score

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.round(quality_score("text"), 6).alias("quality"))
        .where(F.col("quality") >= 0.5)
    )


def q_pack_sequences(spark, sf_dir):
    """Offset packing of the corpus into 2048-token packs, 8 shards
    (operators/corpus.py pack_sequences): one window aggregate per shard,
    no stateful scan."""
    from bigdatalog_spark.operators.corpus import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        d, budget=2048, shard_col=(F.col("doc_id") % 8)
    )


def q_pii_stats(spark, sf_dir):
    """PII span counts over the corpus with a synthetic injection (the
    testdata text carries no real PII): every 7th doc gets an email-shaped
    token appended, every 11th a phone-shaped one. Pure JVM regex — the
    operator under test is operators/corpus.py pii_stats."""
    from bigdatalog_spark.operators.corpus import pii_stats

    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" user@example.com"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" +1-555-123-4567"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_stats(aug)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing any word 3-gram with
    the 'benchmark' slice (doc_id < 5). Benchmark shingle set broadcasts;
    corpus is scanned once."""
    from bigdatalog_spark.operators.corpus import decontaminate

    d = load_table(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") < 5)
    corpus = d.where(F.col("doc_id") >= 5)
    return decontaminate(corpus, bench)


def q_pivot_event_types(spark, sf_dir):
    """PIVOT: per-user event counts spread across one column per event
    type (explicit value list so the plan is a single groupBy — no extra
    distinct-values job, and stable schema at any scale)."""
    e = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds],
        )
    )


def q_cube_revenue(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all four grouping combinations
    in one pass (map-side partial aggregation per grouping set)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        # subtotal rows carry NULL group keys; present them as '(all)' so
        # the result is null-free (and sortable by any downstream consumer)
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("l_linestatus"),
            "revenue",
            "n_items",
        )
    )


def q_token_topk(spark, sf_dir):
    """Corpus vocabulary head: top-25 whitespace tokens by frequency.
    explode → two-phase count (map-side partial agg) → global top-k;
    deterministic tie-break on the token itself."""
    from bigdatalog_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(25)
    )


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by seeded md5 hash of the
    doc id (operators/sampling.py hash_split): pure map-side expression,
    reproducible across engines and corpus growth — a doc never changes
    split when data is added."""
    from bigdatalog_spark.operators.sampling import hash_split

    d = load_table(spark, sf_dir, "documents")
    return hash_split(
        d, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42
    ).select("doc_id", "split")


def q_mixture_sample(spark, sf_dir):
    """Data-mixture weighting: per-source Bernoulli keep rates applied by
    id hash (operators/sampling.py mixture_sample). Zero-shuffle scan at
    any scale; deterministic membership."""
    from bigdatalog_spark.operators.sampling import mixture_sample

    d = load_table(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 1.0, "src2": 0.5, "src3": 0.5, "src4": 0.25}
    return mixture_sample(d, rates, default_rate=0.1, seed=7).select(
        "doc_id", "source"
    )


def q_mixture_upsample(spark, sf_dir):
    """Epoch oversampling: rate 2.5 → 2 deterministic copies + a third
    with probability 0.5 by id hash (operators/sampling.py
    mixture_upsample). sequence + explode, map-side only."""
    from bigdatalog_spark.operators.sampling import mixture_upsample

    d = load_table(spark, sf_dir, "documents")
    rates = {"src0": 2.5, "src1": 1.0}
    return mixture_upsample(d, rates, default_rate=0.25, seed=11).select(
        "doc_id", "source", "epoch"
    )


def q_weighted_sample(spark, sf_dir):
    """Size-biased sample without replacement (operators/sampling.py
    weighted_sample, Efraimidis–Spirakis keys u^(1/w) on n_chars): 50
    docs, longer docs proportionally likelier. TakeOrdered top-n — no
    global sort."""
    from bigdatalog_spark.operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    return weighted_sample(d, 50, "n_chars", seed=13).select(
        "doc_id", "source", "n_chars"
    )


def q_doc_chunks(spark, sf_dir):
    """Fixed-size token chunking with overlap (operators/corpus.py
    chunk_documents): 64-token windows, 16-token overlap — the standard
    pre-embedding/pre-training chunker. Map-side only (no shuffle)."""
    from bigdatalog_spark.operators.corpus import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=64, overlap=16)


def q_dedup_chunks(spark, sf_dir):
    """Cross-document boilerplate removal (operators/corpus.py
    dedup_chunks): 8-word chunks occurring in more than 2 documents are
    stripped from every document and the survivors reassembled in order.
    The removal anti-join carries NO broadcast hint — the heavy-hitter
    chunk set grows with corpus size, so AQE sizes it at runtime and
    picks broadcast only when it actually fits."""
    from bigdatalog_spark.operators.corpus import dedup_chunks

    d = load_table(spark, sf_dir, "documents")
    return dedup_chunks(d, chunk_words=8, max_docs=2)


def q_stratified_sample(spark, sf_dir):
    """Exact-count per-source sample (operators/sampling.py
    stratified_sample): the 20 smallest-hash docs per source — balanced
    eval-set assembly, deterministic in any engine with md5."""
    from bigdatalog_spark.operators.sampling import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    return stratified_sample(d, 20, seed=7).select("doc_id", "source")


def q_corpus_shuffle(spark, sf_dir):
    """Deterministic global shuffle before sequence packing
    (operators/sampling.py deterministic_shuffle): order = seeded hash of
    doc id; one range exchange + local sort. Query face returns the head of
    the permutation."""
    from bigdatalog_spark.operators.sampling import deterministic_shuffle

    d = load_table(spark, sf_dir, "documents")
    return (
        deterministic_shuffle(d, seed=3, num_partitions=8)
        .select("doc_id", F.round("shuffle_key", 6).alias("shuffle_key"))
        .orderBy("shuffle_key")
        .limit(20)
    )


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals: duplicate-token fraction +
    most-frequent-bigram share per doc (functions/text.py
    repetition_stats). Token stats are array expressions; the bigram mode
    is explode + two uniform-key aggregations."""
    from bigdatalog_spark.functions.text import repetition_stats

    d = load_table(spark, sf_dir, "documents")
    return repetition_stats(d)


def q_stream_dedup(spark, sf_dir):
    """Streaming exact deduplication — the streaming face of the batch
    exact-dedup operator: file-source readStream → watermarked
    ``dropDuplicatesWithinWatermark`` on (user_id, event_type) →
    ``Trigger.AvailableNow`` → append-mode memory sink (dedup streams
    support append; no aggregation state to re-emit). Projecting only the
    key columns makes the output the distinct key set regardless of which
    arrival each key kept, so the batch SELECT DISTINCT oracle checks it
    value-for-value. State is bounded by the watermark (keys evicted once
    the event-time watermark passes them) — the production property a
    plain dropDuplicates over an unbounded stream lacks."""
    from bigdatalog_spark.streaming.ops import stream_dedup, write_memory_sink

    schema = load_table(spark, sf_dir, "events").schema
    stream = _stream_events(spark, sf_dir, schema).select(
        "ts", "user_id", "event_type"
    )
    deduped = stream_dedup(
        stream, ["user_id", "event_type"], watermark="1 hour"
    ).select("user_id", "event_type")
    with _stream_state_partitions(spark):
        q = write_memory_sink(
            deduped, "q_stream_dedup_sink", output_mode="append"
        )
        q.awaitTermination()
    return spark.table("q_stream_dedup_sink")


def q_stream_interval_join(spark, sf_dir):
    """Stream-stream watermarked join driven end-to-end as TWO live
    file-source streams (the streaming face of q_interval_join, which
    runs the same interval_join code on batch frames): a clicks stream ⋈
    a purchases stream on user with purchase ts ∈ [click ts, click ts +
    1 h]. INNER stream-stream joins emit a match as soon as both rows
    have arrived — the watermark's job here is state EVICTION, not
    result release — so an AvailableNow drain through an append memory
    sink yields exactly the batch answer and the batch SQL oracle checks
    it value-for-value. State on each side is bounded by (watermark +
    interval) × arrival rate: the production contract that makes this
    join runnable on unbounded streams, unlike an unwatermarked join
    whose state never evicts.

    Stream-stream joins keep FOUR state stores per shuffle partition
    (left/right × keyToNumValues/keyWithIndexToValue), so the state
    partition count is a sizing knob, not a parallelism default: 32
    partitions = 128 store instances whose per-batch snapshot/commit
    I/O dominates a bounded drain (sf0.1: 17.7 → 3.2 s end-to-end,
    8.5 → 2.8 s warm in-session). Production sizes this to state volume ÷ store budget —
    for the bench drain, 8. The conf is scoped to this query and
    restored (it binds at stream START, so the session value is
    untouched for later queries)."""
    from bigdatalog_spark.streaming.ops import interval_join, write_memory_sink

    schema = load_table(spark, sf_dir, "events").schema
    clicks = (
        _stream_events(spark, sf_dir, schema)
        .where(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    purchases = (
        _stream_events(spark, sf_dir, schema)
        .where(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("event_id").alias("purchase_id"))
    )
    j = interval_join(
        clicks,
        purchases,
        on="user_id",
        lower="0 seconds",
        upper="1 hour",
        watermark="2 hours",
    )
    out = j.select("user_id", "click_id", "purchase_id", "ts", "ts_r")
    with _stream_state_partitions(spark):
        q = write_memory_sink(out, "q_stream_ij_sink", output_mode="append")
        q.awaitTermination()
    return spark.table("q_stream_ij_sink")


def q_json_props(spark, sf_dir):
    """Semi-structured extraction: pull props.k out of the events JSON
    column JVM-side (get_json_object — no UDF) and aggregate per event
    type. The extraction is map-side; one uniform-key aggregation."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


# ----------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Datalog transitive closure on the sf0.001 derived graph."""
    return dl_tc(spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver's correctness harness checks the FIRST 50
    # dict entries per round. (bench.py is DECOUPLED from this order — it
    # times queries in fixed sorted-name order, r10.) The r11 window (per
    # VERDICT r10 "Next round" #7) continues the rotation so no query's
    # newest driver check ages past 3 rounds:
    #   1. the 4 r07-stale adapted TPC-H rows (q4/q11/q16/q20) — their
    #      newest check is now 4 rounds old, oldest on the board;
    #   2. the 17 rows last checked r08 (window/sampling/joins tail);
    #   3. the r09-checked rows in their r09 order — the first 29 land
    #      inside the 50-row window, the remaining 21 follow at 51+;
    #   4. the 50 rows of the r10 window (all 33 dl_* + 17 fills) at the
    #      end — they hold the newest check on the board.
    return {
        # --- 1. r07-stale adapted TPC-H (oldest checks on the board) ---
        "q4_priority_late_orders": q4_priority_late_orders,
        "q11_important_parts": q11_important_parts,
        "q16_supplier_part_counts": q16_supplier_part_counts,
        "q20_dominant_supplier": q20_dominant_supplier,
        # --- 2. r08-checked rows ---
        "q_running_avg": q_running_avg,
        "q_asof_forward": q_asof_forward,
        "q_grouping_sets": q_grouping_sets,
        "q_interval_join": q_interval_join,
        "q_range_acctbal_band": q_range_acctbal_band,
        "q_pivot_event_types": q_pivot_event_types,
        "q_cube_revenue": q_cube_revenue,
        "q_cohort_retention": q_cohort_retention,
        "q_countd_approx": q_countd_approx,
        "q_value_percentiles_approx": q_value_percentiles_approx,
        "q_hash_split": q_hash_split,
        "q_mixture_sample": q_mixture_sample,
        "q_mixture_upsample": q_mixture_upsample,
        "q_stratified_sample": q_stratified_sample,
        "q_weighted_sample": q_weighted_sample,
        "q_corpus_shuffle": q_corpus_shuffle,
        "q_shard_manifest": q_shard_manifest,
        # --- 3. r09-checked rows (first 29 complete the 50-row window) ---
        "dl_inmemory_csv": dl_inmemory_csv,
        "q_cc_fast": q_cc_fast,
        "q_pagerank": q_pagerank,
        "q1_pricing_summary": q1_pricing_summary,
        "q3_order_revenue": q3_order_revenue,
        "q5_region_revenue": q5_region_revenue,
        "q7_nation_volume": q7_nation_volume,
        "q10_returned_revenue": q10_returned_revenue,
        "q12_priority_lines": q12_priority_lines,
        "q14_promo_share": q14_promo_share,
        "q19_disjunctive_filter": q19_disjunctive_filter,
        "q_hourly_events": q_hourly_events,
        "q_sessionize": q_sessionize,
        "q_sliding_windows": q_sliding_windows,
        "q_topk_users_window": q_topk_users_window,
        "q_stream_dedup": q_stream_dedup,
        "q_stream_enrich": q_stream_enrich,
        "q_stream_sessionize_append": q_stream_sessionize_append,
        "q_wav_features": q_wav_features,
        "q_winnow_fingerprints": q_winnow_fingerprints,
        "q_fuzzy_names": q_fuzzy_names,
        "q_json_props": q_json_props,
        "q_kcore": q_kcore,
        "dl_apsp_bound": dl_apsp_bound,
        "dl_apsp_bound_rev": dl_apsp_bound_rev,
        "q_dedup_exact": q_dedup_exact,
        "q_dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "q_dedup_jaccard_capped": q_dedup_jaccard_capped,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q18_large_volume_customers": q18_large_volume_customers,
        "q13_order_count_distribution": q13_order_count_distribution,
        "q22_global_sales_opportunity": q22_global_sales_opportunity,
        "q_exists_semijoin": q_exists_semijoin,
        "q_salted_join": q_salted_join,
        "q_funnel": q_funnel,
        "q_rollup_revenue": q_rollup_revenue,
        "q_value_percentiles": q_value_percentiles,
        "q_stream_sessionize": q_stream_sessionize,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q8_market_share": q8_market_share,
        "q9_product_profit": q9_product_profit,
        "q15_top_supplier": q15_top_supplier,
        "q21_waiting_supplier": q21_waiting_supplier,
        "q_text_profile": q_text_profile,
        "q_subword_tokens": q_subword_tokens,
        "q_tfidf_topk": q_tfidf_topk,
        "q_lang_histogram": q_lang_histogram,
        "q_quality_filter": q_quality_filter,
        "q_token_topk": q_token_topk,
        "q_repetition_stats": q_repetition_stats,
        # --- 4. the r10 window (newest checks) ---
        # --- (a) dl_* engine family, newest check r08, code changed r09/r10 ---
        "dl_filter_project": dl_filter_project,
        "dl_join_3way": dl_join_3way,
        "dl_negation": dl_negation,
        "dl_union_distinct": dl_union_distinct,
        "dl_agg_multi": dl_agg_multi,
        "dl_countd": dl_countd,
        "dl_sort_limit": dl_sort_limit,
        "dl_arith": dl_arith,
        "dl_date_filter": dl_date_filter,
        "dl_tc": dl_tc,
        "dl_tc_rl": dl_tc_rl,
        "dl_agg_over_tc": dl_agg_over_tc,
        "dl_tc_bound": dl_tc_bound,
        "dl_tc_nonlinear": dl_tc_nonlinear,
        "dl_mutual_even_odd": dl_mutual_even_odd,
        "dl_reach": dl_reach,
        "dl_unreachable": dl_unreachable,
        "dl_mlm_total_sales": dl_mlm_total_sales,
        "dl_mlm_net_profit": dl_mlm_net_profit,
        "dl_sssp": dl_sssp,
        "dl_attend_mcount": dl_attend_mcount,
        "dl_viral_msum": dl_viral_msum,
        "dl_cc": dl_cc,
        "dl_apsp": dl_apsp,
        "dl_same_generation": dl_same_generation,
        "dl_sg_bound": dl_sg_bound,
        "dl_triangle_count": dl_triangle_count,
        "dl_pymk": dl_pymk,
        "dl_tc_distributed": dl_tc_distributed,
        "dl_tc_nl_bound": dl_tc_nl_bound,
        "dl_mutual_bound": dl_mutual_bound,
        "dl_tc_null_labels": dl_tc_null_labels,
        "dl_tc_nl_bound_rev": dl_tc_nl_bound_rev,
        # --- (b) r07-stale fill: dedup family ---
        "q_dedup_minhash": q_dedup_minhash,
        "q_dedup_simhash": q_dedup_simhash,
        "q_dedup_embedding": q_dedup_embedding,
        "q_dedup_cluster": q_dedup_cluster,
        "q_dedup_chunks": q_dedup_chunks,
        # --- (b) r07-stale fill: ANN ---
        "q_ann_topk": q_ann_topk,
        "q_ann_ivf": q_ann_ivf,
        "q_ann_lsh": q_ann_lsh,
        # --- (b) r07-stale fill: multimodal + corpus ---
        "q_media_features": q_media_features,
        "q_media_frames": q_media_frames,
        "q_pack_sequences": q_pack_sequences,
        "q_doc_chunks": q_doc_chunks,
        "q_pii_stats": q_pii_stats,
        "q_decontaminate": q_decontaminate,
        # --- (b) r07-stale fill: joins/streaming/TPC-H ---
        "q_asof_purchase": q_asof_purchase,
        "q_stream_interval_join": q_stream_interval_join,
        "q2_min_cost_supplier": q2_min_cost_supplier,
    }


_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"

# shared CTE body: exact word-3-gram Jaccard pairs >= 0.5 (mirrors
# operators/dedup.py ngram_jaccard_pairs)
_JACCARD_CTES = """
  w AS (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
    FROM documents),
  sh AS (
    SELECT DISTINCT doc_id, sh FROM (
      SELECT doc_id, ws[i]||' '||ws[i+1]||' '||ws[i+2] AS sh
      FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i
            FROM w WHERE len(ws) >= 3))),
  sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS i
    FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2),
  jpairs AS (
    SELECT left_id, right_id,
           round(CAST(i AS DOUBLE) / (ls.sz + rs.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes ls ON ls.doc_id = left_id
    JOIN sizes rs ON rs.doc_id = right_id
    WHERE round(CAST(i AS DOUBLE) / (ls.sz + rs.sz - i), 6) >= 0.5)
"""

_PROFILE_SCORES = """
  toks AS (SELECT doc_id, {toks} AS ws, text FROM documents),
  scores AS (
    SELECT doc_id, 'en' AS code,
           len(list_filter(ws, t -> t IN ('the','and','of'))) AS n FROM toks
    UNION ALL SELECT doc_id, 'de', len(list_filter(ws, t -> t IN ('der','und','die'))) FROM toks
    UNION ALL SELECT doc_id, 'es', len(list_filter(ws, t -> t IN ('el','y','de'))) FROM toks
    UNION ALL SELECT doc_id, 'fr', len(list_filter(ws, t -> t IN ('le','et','la'))) FROM toks
    UNION ALL SELECT doc_id, 'zh', len(list_filter(ws, t -> t IN ('de','le','shi'))) FROM toks),
  lang AS (
    SELECT doc_id, CASE WHEN n > 0 THEN code ELSE 'und' END AS lang_pred
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, code DESC) rk
          FROM scores) WHERE rk = 1)
""".format(toks=_TOKS)


def oracle_sql() -> dict[str, str]:
    return {
        # literal data loaded through the in-memory CSV path; the expected
        # result is the hand-computed join/filter over those literals
        "dl_inmemory_csv": """
            SELECT * FROM (VALUES
              (CAST(1 AS BIGINT), 'widget', CAST(12.75 AS DOUBLE), 'tools'),
              (CAST(5 AS BIGINT), 'whatsit', CAST(10.51 AS DOUBLE), 'misc')
            ) t(id, name, price, tag)
        """,
        "dl_filter_project": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE o_totalprice > 450000
        """,
        "dl_join_3way": """
            SELECT DISTINCT c_name, n_name
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        """,
        "dl_negation": """
            SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        """,
        "dl_union_distinct": """
            SELECT c_custkey FROM customer WHERE c_acctbal > 7000
            UNION
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        """,
        "dl_agg_multi": """
            SELECT c_mktsegment, CAST(count(c_custkey) AS BIGINT) AS n_customers,
                   round(avg(c_acctbal), 4) AS avg_balance
            FROM customer GROUP BY c_mktsegment
        """,
        "dl_countd": """
            SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
            FROM lineitem GROUP BY l_suppkey
        """,
        "dl_sort_limit": """
            SELECT p_partkey, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
        """,
        "dl_arith": """
            SELECT DISTINCT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) AS revenue
            FROM lineitem
        """,
        "dl_date_filter": """
            SELECT o_orderkey, o_orderdate FROM orders
            WHERE o_orderdate >= TIMESTAMP '1999-01-01'
              AND o_orderdate < TIMESTAMP '2000-01-01'
        """,
        "dl_tc": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            tc(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT tc.src, e.dst FROM tc JOIN edges e ON tc.dst = e.src)
            SELECT src, dst FROM tc
        """,
        # right-linear compilation, identical closure
        "dl_tc_rl": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            tc(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT tc.src, e.dst FROM tc JOIN edges e ON tc.dst = e.src)
            SELECT src, dst FROM tc
        """,
        "dl_tc_distributed": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            tc(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT tc.src, e.dst FROM tc JOIN edges e ON tc.dst = e.src)
            SELECT src, dst FROM tc
        """,
        "dl_tc_null_labels": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            lab AS (
              SELECT p_partkey AS node,
                     CASE WHEN p_partkey % 4 = 0 THEN NULL
                          ELSE p_partkey % 100 END AS lab
              FROM part),
            p(node, lab) AS (
              SELECT node, lab FROM lab
              UNION
              SELECT e.dst, p.lab FROM p JOIN edges e ON e.src = p.node)
            SELECT node, lab FROM p
        """,
        "dl_tc_nl_bound_rev": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            m AS (SELECT max(p_partkey) // 2 + 1 AS mid FROM part),
            anc(src) AS (
              SELECT e.src FROM edges e, m WHERE e.dst = m.mid
              UNION
              SELECT e.src FROM anc JOIN edges e ON e.dst = anc.src)
            SELECT src FROM anc
        """,
        "dl_agg_over_tc": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            tc(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT tc.src, e.dst FROM tc JOIN edges e ON tc.dst = e.src)
            SELECT src, CAST(count(dst) AS BIGINT) AS n_desc,
                   min(dst) AS min_desc
            FROM tc GROUP BY src
        """,
        "dl_tc_bound": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            reach(dst) AS (
              SELECT dst FROM edges WHERE src = 1
              UNION
              SELECT e.dst FROM reach JOIN edges e ON e.src = reach.dst)
            SELECT dst FROM reach
        """,
        "dl_tc_nonlinear": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            tc(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT tc.src, e.dst FROM tc JOIN edges e ON tc.dst = e.src)
            SELECT src, dst FROM tc
        """,
        # NL and linear TC agree on the answer set, so the oracle replays
        # the bound slice as plain reachability from the constant
        "dl_tc_nl_bound": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            reach(dst) AS (
              SELECT dst FROM edges WHERE src = 5
              UNION
              SELECT e.dst FROM reach JOIN edges e ON e.src = reach.dst)
            SELECT dst FROM reach
        """,
        # p(5,Y) on the alternating p/q descent clique = vertices an ODD
        # number of down-steps below 5; replayed as a parity-tagged walk
        # (each tree vertex has a unique depth, so parity is well-defined)
        "dl_mutual_bound": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            walk(y, parity) AS (
              SELECT dst, 1 FROM edges WHERE src = 5
              UNION
              SELECT e.dst, 1 - walk.parity
              FROM walk JOIN edges e ON e.src = walk.y)
            SELECT y AS dst FROM walk WHERE parity = 1
        """,
        "dl_mutual_even_odd": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            hop(vertex, parity) AS (
              SELECT CAST(1 AS BIGINT), 0
              UNION
              SELECT e.dst, 1 - hop.parity
              FROM hop JOIN edges e ON e.src = hop.vertex)
            SELECT DISTINCT vertex FROM hop WHERE parity = 0
        """,
        "dl_reach": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            reach(vertex) AS (
              SELECT CAST(1 AS BIGINT)
              UNION
              SELECT e.dst FROM reach JOIN edges e ON e.src = reach.vertex)
            SELECT vertex FROM reach
        """,
        "dl_mlm_total_sales": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            {_MLM_CTES}
            SELECT m, round(s, 2) AS total_sales FROM mts
        """,
        "dl_mlm_net_profit": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            {_MLM_CTES},
            mbs AS (
              SELECT ms.m, ms.st * sc.bp AS b
              FROM member_sales ms JOIN mts ON mts.m = ms.m
              JOIN sched sc ON mts.s >= sc.ls AND mts.s < sc.rs),
            mbf AS (
              SELECT sp.src AS m, sum(mts.s * sc.bp) AS b
              FROM sponsor sp JOIN mts ON mts.m = sp.dst
              JOIN sched sc ON mts.s >= sc.ls AND mts.s < sc.rs
              GROUP BY sp.src),
            bonus AS (SELECT sum(mbs.b + mbf.b) AS b
                      FROM mbs JOIN mbf ON mbs.m = mbf.m),
            gross AS (SELECT sum(p) AS p FROM sales)
            SELECT round(gross.p - bonus.b, 4) AS net_profit
            FROM gross, bonus
        """,
        "dl_unreachable": f"""
            WITH RECURSIVE edges AS (
              SELECT * FROM ({_EDGES_SQL}) WHERE dst % 97 <> 0),
            nodes AS (
              SELECT DISTINCT n FROM (SELECT src AS n FROM edges
                                      UNION ALL SELECT dst FROM edges)),
            reach(vertex) AS (
              SELECT CAST(1 AS BIGINT)
              UNION
              SELECT e.dst FROM reach JOIN edges e ON e.src = reach.vertex)
            SELECT n AS vertex FROM nodes
            WHERE n NOT IN (SELECT vertex FROM reach)
        """,
        "dl_sssp": f"""
            WITH RECURSIVE edges AS (
              SELECT src, dst, 1 + dst % 3 AS w FROM ({_EDGES_SQL})),
            paths(vertex, d) AS (
              SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
              UNION
              SELECT e.dst, paths.d + e.w FROM paths JOIN edges e ON e.src = paths.vertex)
            SELECT vertex, CAST(min(d) AS BIGINT) AS distance
            FROM paths GROUP BY vertex
        """,
        "dl_attend_mcount": f"""
            WITH RECURSIVE edges AS ({_EDGES_SQL}),
            -- closed form (see dl_attend_mcount docstring): {{1}} ∪ subtree(3)
            r(v) AS (
              SELECT CAST(3 AS BIGINT)
              UNION
              SELECT e.dst FROM r JOIN edges e ON e.src = r.v)
            SELECT CAST(1 AS BIGINT) AS vertex
            UNION
            SELECT v FROM r
        """,
        "dl_viral_msum": f"""
            WITH RECURSIVE edges AS (
              SELECT src, dst, 1 + dst % 3 AS w FROM ({_EDGES_SQL})),
            -- in-degree 1: msum threshold == per-edge weight filter
            act(v) AS (
              SELECT CAST(1 AS BIGINT)
              UNION
              SELECT e.dst FROM act JOIN edges e ON e.src = act.v
              WHERE e.w >= 2)
            SELECT v AS vertex FROM act
        """,
        "dl_cc": f"""
            WITH RECURSIVE edges AS (
              SELECT * FROM ({_EDGES_SQL}) WHERE dst % 97 <> 0),
            -- label(X) = min source S (with outgoing edges) reaching X,
            -- matching the cc3 exit rule arc(X,_) seeding
            r(s, x) AS (
              SELECT DISTINCT src, src FROM edges
              UNION
              SELECT r.s, e.dst FROM r JOIN edges e ON e.src = r.x),
            labels AS (SELECT x, min(s) AS comp FROM r GROUP BY x)
            SELECT CAST(count(DISTINCT comp) AS BIGINT) AS n_components FROM labels
        """,
        "q_cc_fast": f"""
            WITH RECURSIVE edges AS (
              SELECT * FROM ({_EDGES_SQL}) WHERE dst % 97 <> 0),
            sym AS (SELECT src, dst FROM edges
                    UNION SELECT dst, src FROM edges),
            verts AS (SELECT DISTINCT src AS v FROM sym),
            -- undirected reachability; component = min reachable vertex id
            r(v, x) AS (
              SELECT v, v FROM verts
              UNION
              SELECT r.v, s.dst FROM r JOIN sym s ON s.src = r.x)
            SELECT CAST(v AS BIGINT) AS vertex,
                   CAST(min(x) AS BIGINT) AS component
            FROM r GROUP BY v
        """,
        "q_pagerank": _pagerank_sql(8),
        "q_kcore": _kcore_sql(2),
        "dl_apsp": f"""
            WITH RECURSIVE edges AS (
              SELECT src, dst, 1 + dst % 3 AS w FROM ({_EDGES_SQL})
              WHERE dst <= 511),
            paths(src, dst, d) AS (
              SELECT src, dst, CAST(w AS BIGINT) FROM edges
              UNION
              SELECT p.src, e.dst, p.d + e.w
              FROM paths p JOIN edges e ON e.src = p.dst)
            SELECT src, dst, CAST(min(d) AS BIGINT) AS distance
            FROM paths GROUP BY src, dst
        """,
        "dl_apsp_bound": f"""
            WITH RECURSIVE edges AS (
              SELECT src, dst, 1 + dst % 3 AS w FROM ({_EDGES_SQL})),
            paths(dst, d) AS (
              SELECT dst, CAST(w AS BIGINT) FROM edges WHERE src = 3
              UNION
              SELECT e.dst, p.d + e.w
              FROM paths p JOIN edges e ON e.src = p.dst)
            SELECT dst, CAST(min(d) AS BIGINT) AS distance
            FROM paths GROUP BY dst
        """,
        "dl_apsp_bound_rev": f"""
            WITH RECURSIVE edges AS (
              SELECT src, dst, 1 + dst % 3 AS w FROM ({_EDGES_SQL})),
            mid AS (
              SELECT (max(p_partkey) // 2 + 1) AS v FROM part),
            rpaths(src, d) AS (
              SELECT src, CAST(w AS BIGINT) FROM edges
              WHERE dst = (SELECT v FROM mid)
              UNION
              SELECT e.src, p.d + e.w
              FROM rpaths p JOIN edges e ON e.dst = p.src)
            SELECT src, CAST(min(d) AS BIGINT) AS distance
            FROM rpaths GROUP BY src
        """,
        "dl_same_generation": f"""
            WITH RECURSIVE pc AS (
              SELECT * FROM ({_EDGES_SQL}) WHERE dst <= 255),
            sg(x, y) AS (
              SELECT a.dst, b.dst FROM pc a JOIN pc b ON a.src = b.src
              WHERE a.dst <> b.dst
              UNION
              SELECT px.dst, py.dst FROM sg
              JOIN pc px ON px.src = sg.x
              JOIN pc py ON py.src = sg.y)
            SELECT x, y FROM sg
        """,
        "dl_sg_bound": f"""
            WITH RECURSIVE pc AS (
              SELECT * FROM ({_EDGES_SQL}) WHERE dst <= 255),
            sg(x, y) AS (
              SELECT a.dst, b.dst FROM pc a JOIN pc b ON a.src = b.src
              WHERE a.dst <> b.dst
              UNION
              SELECT px.dst, py.dst FROM sg
              JOIN pc px ON px.src = sg.x
              JOIN pc py ON py.src = sg.y)
            SELECT y FROM sg WHERE x = 12
        """,
        "dl_triangle_count": f"""
            WITH tree AS ({_EDGES_SQL}),
            mx AS (SELECT max(p_partkey) AS m FROM part),
            ks AS (SELECT p_partkey AS k FROM part, mx
                   WHERE p_partkey >= 1 AND p_partkey*2+1 <= m),
            arcs AS (
              SELECT src, dst FROM tree
              UNION ALL SELECT k*2, k*2+1 FROM ks
              UNION ALL SELECT k*2+1, k FROM ks),
            tri AS (
              SELECT 1 FROM arcs a1 JOIN arcs a2 ON a1.dst = a2.src
              JOIN arcs a3 ON a2.dst = a3.src AND a3.dst = a1.src
              WHERE a1.src < a1.dst AND a2.src < a2.dst)
            SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri
        """,
        "dl_pymk": f"""
            WITH tree AS ({_EDGES_SQL}),
            u AS (SELECT src, dst FROM tree UNION SELECT dst, src FROM tree),
            tclose AS (
              SELECT a.dst AS y, b.dst AS z, CAST(count(*) AS BIGINT) AS n_common
              FROM u a JOIN u b ON a.src = b.src AND a.dst <> b.dst
              WHERE NOT EXISTS (SELECT 1 FROM u
                                WHERE u.src = a.dst AND u.dst = b.dst)
              GROUP BY 1, 2)
            SELECT y, z, n_common FROM tclose
            ORDER BY n_common DESC, y ASC, z ASC LIMIT 20
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_order_revenue": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT r_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_lineitems
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
        "q10_returned_revenue": """
            SELECT c_custkey, c_name, n_name,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "q14_promo_share": """
            SELECT round(
              100 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0.0 END)
              / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'
        """,
        "q17_small_quantity_revenue": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN (SELECT l_partkey AS lim_partkey,
                         0.2 * avg(l_quantity) AS qty_lim
                  FROM lineitem GROUP BY l_partkey) lim
              ON l_partkey = lim_partkey
            WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
              AND l_quantity < qty_lim
        """,
        "q18_large_volume_customers": """
            SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
                   sum_qty
            FROM orders
            JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING round(sum(l_quantity), 2) > 300) big
              ON o_orderkey = big.l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 100
        """,
        "q13_order_count_distribution": """
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (
              SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q22_global_sales_opportunity": """
            SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode,
                   CAST(count(*) AS BIGINT) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0.0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
            GROUP BY c_nationkey % 5
            ORDER BY cntrycode
        """,
        "q_exists_semijoin": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority
        """,
        "q_topk_users_window": """
            SELECT user_id, total_value, CAST(rank AS INTEGER) AS rank FROM (
              SELECT user_id, round(sum(value), 4) AS total_value,
                     row_number() OVER (ORDER BY round(sum(value), 4) DESC, user_id ASC) AS rank
              FROM events GROUP BY user_id)
            WHERE rank <= 10
        """,
        "q_hourly_events": """
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
                   CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "q_sliding_windows": """
            WITH g AS (
              SELECT make_timestamp(epoch_us(ts) - (epoch_us(ts) % 900000000)
                                    - CAST(k.k AS BIGINT) * 900000000) AS w_start,
                     value
              FROM events, (VALUES (0),(1),(2),(3)) k(k))
            SELECT w_start, w_start + INTERVAL 60 MINUTE AS w_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS total
            FROM g GROUP BY w_start
        """,
        # strict > matches session_window's boundary exactly: an event
        # EXACTLY gap after the previous one MERGES (empirically pinned by
        # tests/test_streaming.py::test_session_window_exact_gap_boundary_merges)
        "q_sessionize": """
            WITH o AS (
              SELECT user_id,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
              FROM events)
            SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM o GROUP BY user_id
        """,
        "q_stream_sessionize": """
            WITH o AS (
              SELECT user_id,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
              FROM events)
            SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM o GROUP BY user_id
        """,
        "q_stream_sessionize_append": """
            WITH o AS (
              SELECT user_id,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
              FROM events)
            SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM o GROUP BY user_id
        """,
        "q_stream_enrich": """
            SELECT c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events LEFT JOIN customer ON user_id = c_custkey
            GROUP BY c_mktsegment
        """,
        "q_stream_dedup": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "q_wav_features": """
            SELECT doc_id AS media_id,
                   CAST(8000.0 AS DOUBLE) AS sample_rate,
                   (800 + (doc_id % 7) * 80) / CAST(8.0 AS DOUBLE)
                     AS duration_ms,
                   (1000 + (doc_id * 37) % 30000) / CAST(32768.0 AS DOUBLE)
                     AS rms,
                   CAST(1.0 AS DOUBLE) AS zcr,
                   CAST(0.0 AS DOUBLE) AS dc
            FROM documents
        """,
        "q_fuzzy_names": """
            WITH n AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS left_name, b.p_name AS right_name,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
            FROM n a JOIN n b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 2
        """,
        "q_salted_join": """
            SELECT l_orderkey, l_quantity, o_orderpriority
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_quantity >= 45
        """,
        "q_funnel": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t_1 FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (
              SELECT s1.user_id, t_1, min(e.ts) AS t_2
              FROM s1 LEFT JOIN events e
                ON e.user_id = s1.user_id AND e.event_type = 'click'
               AND e.ts >= s1.t_1 AND e.ts <= s1.t_1 + INTERVAL 24 HOUR
              GROUP BY s1.user_id, t_1),
            s3 AS (
              SELECT s2.user_id, t_1, t_2, min(e.ts) AS t_3
              FROM s2 LEFT JOIN events e
                ON e.user_id = s2.user_id AND e.event_type = 'purchase'
               AND e.ts >= s2.t_2 AND e.ts <= s2.t_1 + INTERVAL 24 HOUR
              GROUP BY s2.user_id, t_1, t_2)
            SELECT user_id, t_1, t_2, t_3,
                   CAST(CASE WHEN t_1 IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN t_2 IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN t_3 IS NOT NULL THEN 1 ELSE 0 END
                     AS INTEGER) AS reached
            FROM s3
        """,
        "q_rollup_revenue": """
            SELECT r_name, n_name,
                   round(sum(c_acctbal), 2) AS total_balance,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "q_value_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.95), 6) AS p95,
                   round(quantile_cont(value, 0.99), 6) AS p99
            FROM events GROUP BY event_type
        """,
        "q_winnow_fingerprints": """
            WITH base AS (
              SELECT doc_id,
                     regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nm
              FROM documents),
            h AS (
              -- polynomial k-gram hash, B=131 mod 2^31-1: coefficients
              -- 131^4..131^0 — replays functions/text.py term for term
              SELECT doc_id,
                     CASE WHEN length(nm) >= 5 THEN
                       list_transform(generate_series(1, length(nm) - 4),
                         i -> (CAST(ascii(substr(nm, i, 1)) AS BIGINT) * 294499921
                             + CAST(ascii(substr(nm, i + 1, 1)) AS BIGINT) * 2248091
                             + CAST(ascii(substr(nm, i + 2, 1)) AS BIGINT) * 17161
                             + CAST(ascii(substr(nm, i + 3, 1)) AS BIGINT) * 131
                             + CAST(ascii(substr(nm, i + 4, 1)) AS BIGINT))
                              % 2147483647)
                     ELSE [] END AS hs
              FROM base),
            f AS (
              SELECT doc_id,
                     CASE WHEN len(hs) >= 4 THEN
                       list_distinct(list_transform(
                         generate_series(1, len(hs) - 3),
                         j -> list_min(hs[j:j+3])))
                     ELSE [] END AS fps
              FROM h)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
                   min(fp) AS min_fp, max(fp) AS max_fp
            FROM (SELECT doc_id, unnest(fps) AS fp FROM f)
            GROUP BY doc_id
        """,
        "q_cohort_retention": """
            WITH fs AS (
              SELECT user_id,
                     CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
              FROM events GROUP BY user_id),
            active AS (
              SELECT DISTINCT user_id,
                     CAST(date_trunc('week', ts) AS DATE) AS active_week
              FROM events)
            SELECT cohort_week,
                   CAST(count(DISTINCT a.user_id) AS BIGINT) AS cohort_size,
                   CAST(count(DISTINCT CASE
                     WHEN date_diff('day', cohort_week, active_week) = 7
                     THEN a.user_id END) AS BIGINT) AS week1_retained,
                   CAST(count(DISTINCT CASE
                     WHEN date_diff('day', cohort_week, active_week) = 28
                     THEN a.user_id END) AS BIGINT) AS week4_retained
            FROM active a JOIN fs ON a.user_id = fs.user_id
            GROUP BY cohort_week
        """,
        # bound-check oracle (same contract as q_value_percentiles_approx):
        # Spark emits per-group booleans |HLL - exact| <= 5% exact; the
        # oracle pins TRUE, so a hash match proves the sketch tolerance.
        "q_countd_approx": """
            SELECT event_type, TRUE AS countd_ok
            FROM events GROUP BY event_type
        """,
        "q_subword_tokens": """
            SELECT source,
                   CAST(sum(len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))) AS BIGINT)
                     AS subword_tokens,
                   CAST(sum(len(string_split_regex(trim(text), '\\s+')))
                     AS BIGINT) AS ws_tokens,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        """,
        "q_tfidf_topk": """
            WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
            n AS (SELECT count(*) AS n_docs FROM d),
            tf AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id,
                           unnest(string_split_regex(lower(trim(text)),
                             '\\s+')) AS term
                    FROM d)
              WHERE term != ''
              GROUP BY doc_id, term),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            scored AS (
              SELECT doc_id, tf.term, tf,
                     round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6)
                       AS score
              FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
            SELECT doc_id, term, tf, score,
                   CAST(rank AS INTEGER) AS rank
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term ASC) AS rank
                  FROM scored)
            WHERE rank <= 3
        """,
        "q_shard_manifest": """
            WITH a AS (
              SELECT doc_id,
                     CAST(floor(
                       (('0x' || substr(md5('0|' || CAST(doc_id AS VARCHAR)),
                         1, 8))::BIGINT / 4294967296.0) * 8) AS INTEGER)
                       AS shard,
                     len(list_filter(
                       string_split_regex(trim(text), '\\s+'),
                       t -> t != '')) AS toks
              FROM documents)
            SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(toks) AS BIGINT) AS n_tokens
            FROM a GROUP BY shard ORDER BY shard
        """,
        "q7_nation_volume": """
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS l_year,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
               OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
            GROUP BY 1, 2, 3
        """,
        "q8_market_share": """
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   round(
                     CAST(sum(CASE WHEN n_name = 'NATION_6'
                              THEN CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY 1
        """,
        "q9_product_profit": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                        - 0.8 * p_retailprice * l_quantity
                        AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%gear%'
            GROUP BY 1, 2
        """,
        "q12_priority_lines": """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY l_returnflag
        """,
        "q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey AS supplier_no,
                     CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
              GROUP BY 1)
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON supplier_no = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "q19_disjunctive_filter": """
            SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#3' AND l_quantity BETWEEN 1 AND 11
                   AND p_size BETWEEN 1 AND 5)
               OR (p_brand = 'Brand#9' AND l_quantity BETWEEN 10 AND 20
                   AND p_size BETWEEN 1 AND 10)
               OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 20 AND 30
                   AND p_size BETWEEN 1 AND 15)
        """,
        "q21_waiting_supplier": """
            WITH late AS (
              SELECT DISTINCT l_orderkey, l_suppkey
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F'
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY),
            allsupp AS (
              SELECT DISTINCT l_orderkey AS a_okey, l_suppkey AS a_skey
              FROM lineitem)
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM late t
            JOIN supplier ON t.l_suppkey = s_suppkey
            WHERE EXISTS (SELECT 1 FROM allsupp a
                          WHERE a.a_okey = t.l_orderkey
                            AND a.a_skey <> t.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM late b
                              WHERE b.l_orderkey = t.l_orderkey
                                AND b.l_suppkey <> t.l_suppkey)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name ASC
            LIMIT 20
        """,
        "q2_min_cost_supplier": """
            WITH eurs AS (
              SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'),
            ps AS (
              SELECT l_partkey, l_suppkey,
                     min(l_extendedprice / l_quantity) AS supplycost
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
              GROUP BY 1, 2),
            pse AS (
              SELECT * FROM ps JOIN eurs ON l_suppkey = s_suppkey),
            mn AS (
              SELECT l_partkey, min(supplycost) AS mn FROM pse GROUP BY 1)
            SELECT s_acctbal, s_name, n_name, pse.l_partkey AS p_partkey,
                   supplycost
            FROM pse JOIN mn ON pse.l_partkey = mn.l_partkey
            WHERE supplycost = mn
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
        "q4_priority_late_orders": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders o
            WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "q11_important_parts": """
            WITH vals AS (
              SELECT l_partkey AS ps_partkey,
                     CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,4))), 2) AS DOUBLE) AS value
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_7'
              GROUP BY 1)
            SELECT ps_partkey, value
            FROM vals
            WHERE value > (SELECT CAST(sum(CAST(value AS DECIMAL(18,2)))
                                       AS DOUBLE) / count(*) * 2.5 FROM vals)
            ORDER BY value DESC, ps_partkey
        """,
        "q16_supplier_part_counts": """
            WITH pairs AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
              WHERE l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
            SELECT p_brand, p_type, p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM pairs JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
              AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "q20_dominant_supplier": """
            WITH per_ps AS (
              SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'small %'
                AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
              GROUP BY 1, 2),
            per_p AS (
              SELECT l_partkey, sum(qty) AS total_qty FROM per_ps GROUP BY 1),
            dom AS (
              SELECT DISTINCT a.l_suppkey
              FROM per_ps a JOIN per_p b ON a.l_partkey = b.l_partkey
              WHERE a.qty > 0.5 * b.total_qty)
            SELECT s_suppkey, s_name, n_name
            FROM supplier
            JOIN dom ON s_suppkey = dom.l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            ORDER BY s_suppkey
        """,
        # bound-check oracle: the Spark side emits booleans asserting the
        # sketch value sits between the exact q±0.005 quantiles; the oracle
        # pins them TRUE so a hash match == tolerance held for every group.
        "q_value_percentiles_approx": """
            SELECT event_type, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
            FROM events GROUP BY event_type
        """,
        "q_running_avg": """
            SELECT user_id, event_id,
                   round(avg(value) OVER (
                     PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS running_avg
            FROM events WHERE user_id < 100
        """,
        "q_asof_purchase": """
            WITH clicks AS (
              SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
            purch AS (
              SELECT user_id, ts, round(max(value), 6) AS pvalue
              FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
            SELECT c.user_id, c.ts, c.event_id,
                   p.ts AS ts_right, p.pvalue
            FROM clicks c ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "q_asof_forward": """
            WITH clicks AS (
              SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
            purch AS (
              SELECT user_id, ts, round(max(value), 6) AS pvalue
              FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
            SELECT c.user_id, c.ts, c.event_id,
                   p.ts AS ts_right, p.pvalue
            FROM clicks c ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.ts <= p.ts
        """,
        "q_grouping_sets": """
            SELECT coalesce(o_orderpriority, '(all)') AS o_orderpriority,
                   coalesce(o_orderstatus, '(all)') AS o_orderstatus,
                   round(sum(o_totalprice), 2) AS total,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                    (o_orderpriority), (o_orderstatus))
        """,
        "q_interval_join": """
            WITH clicks AS (
              SELECT user_id, ts, event_id AS click_id FROM events
              WHERE event_type = 'click'),
            purch AS (
              SELECT user_id, ts, event_id AS purchase_id FROM events
              WHERE event_type = 'purchase')
            SELECT c.user_id, c.click_id, p.purchase_id,
                   c.ts, p.ts AS ts_r
            FROM clicks c JOIN purch p
              ON c.user_id = p.user_id
             AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 1 HOUR
        """,
        # streaming face of q_interval_join — inner stream-stream joins
        # drained AvailableNow equal the batch join exactly
        "q_stream_interval_join": """
            WITH clicks AS (
              SELECT user_id, ts, event_id AS click_id FROM events
              WHERE event_type = 'click'),
            purch AS (
              SELECT user_id, ts, event_id AS purchase_id FROM events
              WHERE event_type = 'purchase')
            SELECT c.user_id, c.click_id, p.purchase_id,
                   c.ts, p.ts AS ts_r
            FROM clicks c JOIN purch p
              ON c.user_id = p.user_id
             AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 1 HOUR
        """,
        "q_range_acctbal_band": """
            SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_customers,
                   round(sum(c_acctbal), 2) AS sum_acctbal
            FROM supplier JOIN customer
              ON c_acctbal BETWEEN s_acctbal - 50 AND s_acctbal + 50
            GROUP BY s_suppkey
        """,
        "q_dedup_exact": """
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        """,
        "q_dedup_ngram_jaccard": f"""
            WITH {_JACCARD_CTES}
            SELECT left_id, right_id, jaccard FROM jpairs
        """,
        # skewed-corpus variant: boilerplate header on every doc; shingles
        # with doc-frequency > 100 are dropped from intersection AND sizes
        # (Jaccard over the filtered shingle space, mirroring max_doc_freq)
        "q_dedup_jaccard_capped": f"""
            WITH w AS (
                SELECT doc_id,
                       string_split(regexp_replace(
                         lower(trim('{_BOILERPLATE} ' || text)),
                         '\\s+', ' ', 'g'), ' ') AS ws
                FROM documents),
              sh0 AS (
                SELECT DISTINCT doc_id, sh FROM (
                  SELECT doc_id, ws[i]||' '||ws[i+1]||' '||ws[i+2] AS sh
                  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i
                        FROM w WHERE len(ws) >= 3))),
              sh AS (
                SELECT doc_id, sh FROM sh0
                WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh
                             HAVING count(*) <= 100)),
              sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
              inter AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS i
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT left_id, right_id,
                   round(CAST(i AS DOUBLE) / (ls.sz + rs.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes ls ON ls.doc_id = left_id
            JOIN sizes rs ON rs.doc_id = right_id
            WHERE round(CAST(i AS DOUBLE) / (ls.sz + rs.sz - i), 6) >= 0.5
        """,
        "q_dedup_cluster": f"""
            WITH RECURSIVE {_JACCARD_CTES},
            sym AS (
              SELECT left_id AS u, right_id AS v FROM jpairs
              UNION SELECT right_id, left_id FROM jpairs),
            r(a, b) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM sym)
              UNION
              SELECT r.a, s.v FROM r JOIN sym s ON s.u = r.b),
            labels AS (SELECT a AS doc_id, min(b) AS canonical_id
                       FROM r GROUP BY a)
            SELECT d.doc_id,
                   coalesce(l.canonical_id, d.doc_id) AS canonical_id
            FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
        """,
        # q_dedup_minhash runs with verify=True, so every emitted pair
        # carries its EXACT shingle-set jaccard and candidates below the
        # threshold are dropped; the LSH stage only affects recall. On this
        # corpus recall is 1 (near-dup pairs are clones with jaccard ≈ 1,
        # far above the 8-band/4-row S-curve midpoint ≈ 0.59), verified
        # by tools/check_oracle.py — so the exact-jaccard SQL is a faithful
        # oracle for the full pipeline output.
        "q_dedup_minhash": f"""
            WITH {_JACCARD_CTES}
            SELECT left_id, right_id, jaccard FROM jpairs
        """,
        # simhash with the portable md5 token hash (see
        # operators/dedup.py portable_hash64): pigeonhole recall is exactly
        # 1, so the blocked pipeline's output equals this full pairwise
        # hamming filter.
        "q_dedup_simhash": f"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split(regexp_replace(lower(trim(text)),
                       '\\s+', ' ', 'g'), ' ')) AS tok
              FROM documents),
            h AS (SELECT doc_id,
                         ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
                  FROM toks),
            sums AS (
              SELECT doc_id,
                     {', '.join(f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}" for i in range(60))}
              FROM h GROUP BY doc_id),
            fp AS (
              SELECT doc_id,
                     ({' | '.join(f"CASE WHEN s{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END" for i in range(60))}) AS sh
              FROM sums)
            SELECT l.doc_id AS left_id, r.doc_id AS right_id,
                   CAST(bit_count(xor(l.sh, r.sh)) AS INTEGER) AS hamming
            FROM fp l JOIN fp r ON l.doc_id < r.doc_id
            WHERE bit_count(xor(l.sh, r.sh)) <= 3
        """,
        "q_dedup_embedding": """
            WITH v AS (SELECT vec_id, embedding, label FROM embeddings),
            pairs AS (
              SELECT l.vec_id AS left_id, r.vec_id AS right_id,
                     l.embedding AS le, r.embedding AS re
              FROM v l JOIN v r ON l.label = r.label AND l.vec_id < r.vec_id),
            scored AS (
              SELECT left_id, right_id,
                round(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) /
                  (sqrt(SUM(CAST(x AS DOUBLE)**2)) * sqrt(SUM(CAST(y AS DOUBLE)**2))), 6) AS cosine
              FROM (SELECT left_id, right_id, unnest(le) AS x, unnest(re) AS y FROM pairs)
              GROUP BY left_id, right_id)
            SELECT left_id, right_id, cosine FROM scored WHERE cosine >= 0.4
        """,
        "q_ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                       WHERE vec_id < 8),
            scored AS (
              SELECT query_id, v.vec_id AS neighbor_id,
                round(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) /
                  (sqrt(SUM(CAST(x AS DOUBLE)**2)) * sqrt(SUM(CAST(y AS DOUBLE)**2))), 6) AS cosine
              FROM (SELECT query_id, vec_id, unnest(qe) AS x, unnest(v2.embedding) AS y
                    FROM q, embeddings v2) AS z(query_id, vec_id, x, y)
              JOIN embeddings v ON v.vec_id = z.vec_id
              GROUP BY query_id, v.vec_id)
            SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        # q_ann_ivf is approximate-by-design versus brute force, but fully
        # deterministic given its axis-aligned centroids: cell(v) = argmax
        # of the first 4 embedding components (ties → lower cell), queries
        # probe their 2 best cells, and the result is exact top-5 within
        # the probed cells — all of which SQL expresses directly.
        "q_ann_ivf": """
            WITH cells AS (
              SELECT vec_id, embedding,
                     CASE WHEN embedding[1] >= embedding[2]
                           AND embedding[1] >= embedding[3]
                           AND embedding[1] >= embedding[4] THEN 0
                          WHEN embedding[2] >= embedding[3]
                           AND embedding[2] >= embedding[4] THEN 1
                          WHEN embedding[3] >= embedding[4] THEN 2
                          ELSE 3 END AS cell
              FROM embeddings),
            qprobe AS (
              SELECT query_id, qe, cell FROM (
                SELECT vec_id AS query_id, embedding AS qe, c.cell,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY embedding[c.cell + 1] DESC, c.cell ASC) AS rn
                FROM embeddings, (VALUES (0),(1),(2),(3)) c(cell)
                WHERE vec_id < 8)
              WHERE rn <= 2),
            scored AS (
              SELECT query_id, vec_id AS neighbor_id,
                round(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) /
                  (sqrt(SUM(CAST(x AS DOUBLE)**2)) * sqrt(SUM(CAST(y AS DOUBLE)**2))), 6) AS cosine
              FROM (SELECT q.query_id, cv.vec_id, unnest(q.qe) AS x,
                           unnest(cv.embedding) AS y
                    FROM qprobe q JOIN cells cv ON cv.cell = q.cell)
              GROUP BY query_id, vec_id)
            SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        # axis-aligned hyperplanes: bucket bit i = (embedding[i] >= 0),
        # so the 16-bucket signature and the bucket-local exact top-5 are
        # both directly expressible — the approximate pipeline hash-checks.
        "q_ann_lsh": """
            WITH b AS (
              SELECT vec_id, embedding,
                     (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
                      + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
                      + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
                      + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
              FROM embeddings),
            q AS (SELECT vec_id AS query_id, embedding AS qe, bucket
                  FROM b WHERE vec_id < 8),
            scored AS (
              SELECT query_id, vec_id AS neighbor_id,
                round(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) /
                  (sqrt(SUM(CAST(x AS DOUBLE)**2)) * sqrt(SUM(CAST(y AS DOUBLE)**2))), 6) AS cosine
              FROM (SELECT q.query_id, v.vec_id, unnest(q.qe) AS x,
                           unnest(v.embedding) AS y
                    FROM q JOIN b v ON v.bucket = q.bucket)
              GROUP BY query_id, vec_id)
            SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "q_media_features": """
            SELECT doc_id AS media_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        "q_media_frames": """
            SELECT doc_id AS media_id,
                   CAST(unnest(generate_series(0, length(text)*10 - 1, 1000))
                        AS BIGINT) AS ts_ms
            FROM documents
            WHERE doc_id % 3 = 2 AND length(text) > 0
        """,
        "q_text_profile": f"""
            WITH {_PROFILE_SCORES},
            base AS (
              SELECT d.doc_id,
                len(t.ws) AS n_tokens,
                CAST(length(regexp_replace(d.text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                  / greatest(length(d.text), 1) AS praw,
                CAST(len(list_filter(t.ws, x -> x IN
                  ('the','a','of','and','to','in','is','it','for','on','with'))) AS DOUBLE)
                  / greatest(len(t.ws), 1) AS sraw,
                least(length(d.text) / 500.0, 1.0) AS len_score,
                md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp
              FROM documents d JOIN toks t ON d.doc_id = t.doc_id)
            SELECT b.doc_id,
                   CAST(b.n_tokens AS INTEGER) AS n_tokens,
                   round(b.praw, 6) AS punct_ratio,
                   round(b.sraw, 6) AS stopword_ratio,
                   round(0.5 * b.len_score + 0.3 * least(b.sraw * 4.0, 1.0)
                         + 0.2 * (1.0 - least(b.praw * 5.0, 1.0)), 6) AS quality,
                   l.lang_pred, b.fp
            FROM base b JOIN lang l ON b.doc_id = l.doc_id
        """,
        "q_lang_histogram": f"""
            WITH {_PROFILE_SCORES}
            SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs
            FROM lang GROUP BY lang_pred
        """,
        "q_quality_filter": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS ws, text FROM documents),
            base AS (
              SELECT doc_id,
                CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                  / greatest(length(text), 1) AS praw,
                CAST(len(list_filter(ws, x -> x IN
                  ('the','a','of','and','to','in','is','it','for','on','with'))) AS DOUBLE)
                  / greatest(len(ws), 1) AS sraw,
                least(length(text) / 500.0, 1.0) AS len_score
              FROM toks)
            SELECT doc_id,
                   round(0.5 * len_score + 0.3 * least(sraw * 4.0, 1.0)
                         + 0.2 * (1.0 - least(praw * 5.0, 1.0)), 6) AS quality
            FROM base
            WHERE round(0.5 * len_score + 0.3 * least(sraw * 4.0, 1.0)
                        + 0.2 * (1.0 - least(praw * 5.0, 1.0)), 6) >= 0.5
        """,
        "q_token_topk": f"""
            SELECT token, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest({_TOKS}) AS token FROM documents)
            GROUP BY token
            ORDER BY n DESC, token ASC
            LIMIT 25
        """,
        "q_pivot_event_types": """
            SELECT user_id,
                   CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
                   CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
                   CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
                   CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "q_cube_revenue": """
            SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
                   coalesce(l_linestatus, '(all)') AS l_linestatus,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "q_pack_sequences": """
            WITH base AS (
              SELECT doc_id, doc_id % 8 AS shard,
                     CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                       AS n_tokens
              FROM documents),
            offs AS (
              SELECT doc_id, shard, n_tokens,
                     CAST(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
              FROM base)
            SELECT doc_id, shard, n_tokens, start_off,
                   CAST(floor(start_off / 2048.0) AS BIGINT) AS pack_id
            FROM offs
        """,
        "q_pii_stats": """
            WITH aug AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 7 = 0 THEN ' user@example.com' ELSE '' END
                     || CASE WHEN doc_id % 11 = 0 THEN ' +1-555-123-4567' ELSE '' END
                       AS text
              FROM documents)
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                     AS n_emails,
                   CAST(len(regexp_extract_all(text,
                     '\\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}')) AS BIGINT) AS n_phones,
                   (len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                    + len(regexp_extract_all(text,
                     '\\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}'))) > 0 AS has_pii
            FROM aug
        """,
        "q_decontaminate": """
            WITH w AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id, ws[i]||' '||ws[i+1]||' '||ws[i+2] AS sh
                FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i
                      FROM w WHERE len(ws) >= 3))),
            bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 5)
            SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
            FROM sh s JOIN bench b ON s.sh = b.sh
            WHERE s.doc_id >= 5
            GROUP BY s.doc_id
        """,
        # seeded engine-portable U[0,1): first 8 md5 hex chars as an int
        # (same formula as operators/sampling.py uniform_hash)
        "q_hash_split": """
            WITH u AS (
              SELECT doc_id,
                     ('0x' || substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u
              FROM documents)
            SELECT doc_id,
                   CASE WHEN u < 0.8 THEN 'train'
                        WHEN u < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM u
        """,
        "q_mixture_sample": """
            WITH u AS (
              SELECT doc_id, source,
                     ('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u
              FROM documents)
            SELECT doc_id, source FROM u
            WHERE u < CASE source
                        WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 1.0
                        WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.5
                        WHEN 'src4' THEN 0.25 ELSE 0.1 END
        """,
        "q_mixture_upsample": """
            WITH u AS (
              SELECT doc_id, source,
                     ('0x' || substr(md5('11|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u
              FROM documents),
            r AS (
              SELECT doc_id, source, u,
                     CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
                                 ELSE 0.25 END AS rate
              FROM u),
            n AS (
              SELECT doc_id, source,
                     CAST(floor(rate) AS BIGINT)
                       + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END AS n
              FROM r)
            SELECT doc_id, source, unnest(generate_series(0, n - 1)) AS epoch
            FROM n WHERE n > 0
        """,
        "q_weighted_sample": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE n_chars > 0
            ORDER BY pow(
              ('0x' || substr(md5('13|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                / 4294967296.0,
              1.0 / n_chars) DESC, doc_id ASC
            LIMIT 50
        """,
        "q_doc_chunks": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(regexp_replace(lower(trim(text)),
                       '\\s+', ' ', 'g'), ' '), t -> t != '') AS ws
              FROM documents),
            k AS (
              SELECT doc_id, ws, len(ws) AS n,
                     CASE WHEN len(ws) = 0 THEN 0
                          WHEN len(ws) <= 64 THEN 1
                          ELSE 1 + CAST(ceil((len(ws) - 64) * 1.0 / 48) AS INTEGER)
                     END AS k
              FROM toks),
            c AS (
              SELECT doc_id, ws,
                     unnest(generate_series(0, k - 1)) AS chunk_id
              FROM k)
            SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
                   array_to_string(
                     list_slice(ws, chunk_id*48 + 1, chunk_id*48 + 64),
                     ' ') AS chunk_text,
                   CAST(len(list_slice(ws, chunk_id*48 + 1, chunk_id*48 + 64))
                        AS INTEGER) AS n_tokens
            FROM c
        """,
        "q_dedup_chunks": """
            WITH ws AS (
              SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
              FROM documents),
            k AS (
              SELECT doc_id, w,
                     CAST(ceil(len(w) / 8.0) AS INTEGER) AS k
              FROM ws),
            c AS (
              SELECT doc_id, w,
                     unnest(generate_series(0, k - 1)) AS cn
              FROM k),
            ch AS (
              SELECT doc_id, cn,
                     array_to_string(
                       list_slice(w, cn*8 + 1, cn*8 + 8), ' ') AS chunk
              FROM c),
            dup AS (
              SELECT chunk FROM ch
              GROUP BY chunk HAVING count(DISTINCT doc_id) > 2),
            kept AS (
              SELECT doc_id, cn, chunk FROM ch
              WHERE chunk NOT IN (SELECT chunk FROM dup)),
            re AS (
              SELECT doc_id,
                     string_agg(chunk, ' ' ORDER BY cn) AS text_clean,
                     count(*) AS nk
              FROM kept GROUP BY doc_id)
            SELECT k.doc_id,
                   coalesce(re.text_clean, '') AS text_clean,
                   CAST(k.k AS BIGINT) AS n_chunks,
                   CAST(k.k - coalesce(re.nk, 0) AS BIGINT) AS n_removed
            FROM k LEFT JOIN re ON k.doc_id = re.doc_id
        """,
        "q_stratified_sample": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source ORDER BY
                       ('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                         / 4294967296.0 ASC, doc_id ASC) AS rn
              FROM documents)
            WHERE rn <= 20
        """,
        "q_corpus_shuffle": """
            SELECT doc_id,
                   round(('0x' || substr(md5('3|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                         / 4294967296.0, 6) AS shuffle_key
            FROM documents
            ORDER BY shuffle_key LIMIT 20
        """,
        "q_repetition_stats": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
              FROM documents),
            bg AS (
              SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg
              FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-1)) AS i
                    FROM toks WHERE len(ws) >= 2)),
            bgc AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2),
            bgm AS (SELECT doc_id, max(n) AS top_bg, sum(n) AS total_bg
                    FROM bgc GROUP BY 1)
            SELECT t.doc_id,
                   len(ws) AS n_tokens,
                   len(list_distinct(ws)) AS n_distinct_tokens,
                   round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE)
                             / greatest(len(ws), 1), 6) AS dup_token_frac,
                   round(coalesce(CAST(top_bg AS DOUBLE) / greatest(total_bg, 1),
                                  0.0), 6) AS top_bigram_frac
            FROM toks t LEFT JOIN bgm ON t.doc_id = bgm.doc_id
        """,
        "q_json_props": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(avg(json_extract_string(props, '$.k')::BIGINT), 6) AS avg_k,
                   max(json_extract_string(props, '$.k')::BIGINT) AS max_k
            FROM events GROUP BY event_type
        """,
    }
