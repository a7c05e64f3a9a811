"""Training-shard export/import: the sink side of the corpus pipeline.

A pretraining data loader wants the corpus as N equal-ish shards, globally
shuffled, with a manifest of per-shard sizes — and it wants the SAME shard
layout on every rerun (resumable downloads, reproducible epochs). These
operators produce that layout from any DataFrame:

* ``shard_assignments``  — pure column expressions: deterministic shard id
  (md5-based, engine-portable like operators/sampling.py) + intra-shard
  sort key. No shuffle; recomputable by any engine.
* ``write_training_shards`` — one directory per shard (``shard=K/``), one
  file per shard, rows in the deterministic shuffled order; returns the
  manifest (shard, n_rows, n_tokens).
* ``read_training_shards`` — read back, with the shard id recovered from
  the partition directory.

Scale notes (100 TB framing): shard assignment is map-side; the only
shuffle is the one repartition on shard id that any sharded write needs.
One file per shard means shard count must target file size (e.g. 100 TB /
512 MB ≈ 200k shards) — the repartition spreads those across the cluster,
and no task holds more than one shard. The manifest is a map-side-combined
count, not a second scan (computed from the same assignment expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import uniform_hash


def shard_assignments(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Add deterministic ``shard`` (0..num_shards-1) and ``shard_key``
    (intra-shard order) columns.

    Both derive from the same seeded md5 hash of the id, so the layout is
    a pure function of (ids, num_shards, seed): rerunning on the same
    corpus reproduces every shard byte-for-byte, and any engine with md5
    can recompute the mapping (the DuckDB oracle does).
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    u = uniform_hash(id_col, seed)
    return df.withColumn("shard", (u * num_shards).cast("int")).withColumn(
        # second hash (different seed) decorrelates intra-shard order from
        # shard assignment, giving a genuine global shuffle within shards
        "shard_key",
        uniform_hash(id_col, seed + 1),
    )


def shard_manifest(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    seed: int = 0,
) -> DataFrame:
    """Per-shard (n_rows, n_tokens) from the assignment expressions alone —
    no write needed. n_tokens counts whitespace tokens of ``text_col``
    (0 for empty docs), the budget number a loader schedules by."""
    a = shard_assignments(df, num_shards, id_col, seed)
    # coalesce NULL text to '' so split/trim don't propagate NULL into
    # F.size (which returns -1 for NULL under legacy sizeOfNull) — NULL
    # docs must count 0 tokens, matching both the docstring and an
    # aggregate oracle that skips NULLs
    toks = (
        F.size(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        )
        if text_col is not None
        else F.lit(1)
    )
    return (
        a.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(toks).alias("n_tokens"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    format: str = "parquet",
) -> None:
    """Write ``path/shard=K/part-*`` with ONE file per shard, rows in the
    deterministic shuffled order.

    repartition on the shard column puts each shard's rows in exactly one
    task (hash collisions between shard ids only co-locate two shards in
    one task, never split one shard across files, because partitionBy
    splits the task's output by directory); sortWithinPartitions makes
    the row order inside each file reproducible."""
    a = shard_assignments(df, num_shards, id_col, seed)
    (
        a.repartition(num_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_key", id_col)
        .drop("shard_key")
        .write.format(format)
        .partitionBy("shard")
        .mode("overwrite")
        .save(path)
    )


def read_training_shards(spark, path: str, format: str = "parquet") -> DataFrame:
    """Read a sharded export; ``shard`` comes back as a partition column."""
    return spark.read.format(format).load(path)
