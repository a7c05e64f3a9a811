"""Join strategies for scale: salted joins for skewed keys, bucketed
tables for exchange-free co-located joins.

AQE's skew-join handling (on by default in the engine session) splits
oversized partitions at runtime, which covers most skew. The operators here
cover the cases AQE can't:

* `salted_join` — a *broadcast-incompatible* skewed join where one hot key
  dominates (e.g. the null/default key, a celebrity node in a graph). The
  hot side's key is salted into `salt` sub-keys; the other side is
  replicated `salt` times. Deterministic, no runtime stats needed.
* `write_bucketed` / `bucketed_join_ready` — persistent co-location: two
  tables bucketed by the same key into the same bucket count join with NO
  exchange on either side, the parquet-era equivalent of the reference's
  Generalized-Pivot-Set pre-partitioning (GeneralizedPivotSetInfo.scala:
  30-170), which exists precisely to make every fixpoint iteration
  shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hint_static(df: DataFrame, max_bytes: int = 512 << 20) -> DataFrame:
    """Prepare a static (loop-invariant) join side for iterative reuse:
    persist it (broadcast exchanges are not reused across the separate
    actions an iteration loop issues — without the persist the source is
    re-scanned every iteration), then broadcast-hint it only when
    Catalyst's size estimate fits; a forced hint on a 100 TB relation
    would OOM the driver."""
    df = df.persist()
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        size = -1
    if 0 <= size <= max_bytes:
        return F.broadcast(df)
    return df


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed[on]` has heavy hitters: salt the skewed side
    (random sub-key per row), replicate the other side across all salt
    values, join on (key, salt). The hot key's rows spread over `salt`
    tasks instead of one straggler.

    Cost model: other side is scanned once but shuffled `salt`×. Use when
    the skewed side's hot keys are the bottleneck and `other` is much
    smaller (but too big to broadcast outright).
    """
    s = skewed.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = s.join(o, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list,
    num_buckets: int = 64,
    sort_cols: list | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed by the same columns into the same `num_buckets`
    join/aggregate with no exchange; sorted buckets additionally skip the
    sort of a sort-merge join. This is how a 100 TB fact table joins a
    10 TB fact table nightly without either side shuffling.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join_ready(spark, left_table: str, right_table: str) -> DataFrame:
    """Read two same-bucketed tables for an exchange-free join (verify with
    .explain(): no Exchange above either scan)."""
    return spark.table(left_table), spark.table(right_table)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the nearest
    ``right_time`` ≤ ``left_time`` (backward, inclusive) or ≥ (forward)
    within the same key group; left rows with no match keep nulls.

    Spark-first plan (no built-in ASOF): tag and UNION both sides, then one
    window pass per key ordered by time takes `last(right_payload,
    ignorenulls=True)` over the preceding frame — ONE shuffle on the join
    key, O(n log n) in-partition sort, no per-row range probe and no
    nested-loop join. This is the streaming-merge formulation DuckDB/pandas
    use, expressed as a Spark window so it scales horizontally: a key's
    rows land in one partition, so skewed keys are the only hazard (salt
    or split the window frame if one key dominates).

    Determinism: if several right rows share (key, right_time), the match
    is ambiguous — pre-aggregate the right side to one row per (key, time)
    first (the driver queries do).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = on if isinstance(on, list) else [on]
    lpayload = [c for c in left.columns if c not in keys]
    rpayload = [c for c in right.columns if c not in keys]
    lstruct = F.struct(*[F.col(c) for c in lpayload])
    rstruct = F.struct(*[F.col(c) for c in rpayload])
    ltype = left.select(lstruct.alias("s")).schema["s"].dataType
    rtype = right.select(rstruct.alias("s")).schema["s"].dataType

    l = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        lstruct.alias("__l"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    r = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(ltype).alias("__l"),
        rstruct.alias("__r"),
    )
    u = l.unionByName(r)

    from pyspark.sql import Window

    order = (
        [F.col("__t").asc(), F.col("__is_left").asc()]
        if direction == "backward"
        else [F.col("__t").desc(), F.col("__is_left").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out_cols = (
        [F.col(k) for k in keys]
        + [F.col("__l")[c].alias(c) for c in lpayload]
        + [
            F.col("__m")[c].alias(c + suffix if c in lpayload else c)
            for c in rpayload
        ]
    )
    return matched.where(F.col("__is_left") == 1).select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    on: str | list | None = None,
) -> DataFrame:
    """Point-in-interval join: rows of ``points`` matched to every
    ``intervals`` row with lo ≤ point ≤ hi (plus optional equi-keys).

    Spark plans a bare inequality join as a nested-loop — O(n·m). This
    operator bucketizes instead: each interval explodes to the bucket ids
    it covers, each point maps to its single bucket, and the join becomes
    an EQUI-join on (keys..., bucket) followed by the exact range filter —
    hash-partitioned, skew-bounded by interval span / bucket_width.
    Choose bucket_width near the typical interval length: wider wastes
    filter work, narrower multiplies the interval-side explode factor.
    Columns shared by both inputs must be disjoint (rename first).
    """
    keys = [] if on is None else (on if isinstance(on, list) else [on])
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_width))
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)),
                F.floor(F.col(hi_col) / F.lit(bucket_width)),
            )
        ),
    )
    return (
        p.join(i, on=keys + ["__bucket"])
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )
