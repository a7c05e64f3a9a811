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
