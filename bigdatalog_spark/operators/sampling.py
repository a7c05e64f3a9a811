"""Deterministic sampling / splitting / shuffling for training-data pipelines.

The reference engine has no sampling surface (SURVEY.md §2); these are the
corpus-assembly operators a pretraining pipeline needs between "filtered
corpus" and "tokenizer input":

* uniform_hash          — seeded, engine-portable U[0,1) per row
* hash_split            — deterministic train/val/test assignment
* mixture_sample        — per-source Bernoulli rates (data-mixture weighting)
* deterministic_shuffle — stable global permutation, cluster-parallel

Everything is a pure column expression over ``md5`` (identical output in
Spark, DuckDB, Trino, Presto…), so splits are reproducible across engines
and across runs — re-running the pipeline on a grown corpus keeps every
previously-assigned row in the same split (no RNG state, no sampling by
position). That property is what makes hash-based assignment the standard
over ``df.sample``/``randomSplit`` for corpus work: those reshuffle
membership whenever partitioning or row order changes.

Scale notes: the hash is computed map-side from the id column alone — no
shuffle for split/sample; deterministic_shuffle is exactly one range
exchange + local sort (the minimum any global permutation needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def uniform_hash(col: Column | str, seed: int = 0) -> Column:
    """Seeded uniform double in [0,1) from the first 8 hex chars of
    ``md5(seed || '|' || value)`` — 32 bits of the digest, plenty for split
    thresholds, and expressible in any engine with md5 + hex parsing
    (DuckDB: ``('0x' || substr(md5(...),1,8))::BIGINT / 4294967296.0``)."""
    c = F.col(col) if isinstance(col, str) else col
    key = F.concat(F.lit(str(seed)), F.lit("|"), c.cast("string"))
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return bucket / F.lit(float(2**32))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Assign each row to a named split with probability proportional to its
    weight, deterministically by id hash. Adds a ``split`` column.

    Assignment is a pure row-local expression — adding data later never
    moves an existing row between splits (critical for eval-set hygiene:
    a doc that was ever in 'val' can never silently enter 'train')."""
    total = float(sum(weights.values()))
    u = uniform_hash(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Weighted data-mixture sampling: keep each row with the Bernoulli rate
    configured for its source (e.g. wiki ×1.0, commoncrawl ×0.1).

    The rate table is embedded as a CASE expression (sources are few); the
    filter is map-side only — at 100 TB this is a scan with zero shuffle,
    and the parquet reader still prunes columns/row-groups beneath it.

    Rates > 1 (epoch oversampling) are valid here too but keep one copy —
    use :func:`mixture_upsample` when repeats are wanted."""
    return df.where(uniform_hash(id_col, seed) < _rate_expr(rates, source_col, default_rate))


def _rate_expr(rates: dict[str, float], source_col: str, default_rate: float):
    expr = None
    for src, rate in rates.items():
        branch = (F.col(source_col) == src, F.lit(float(rate)))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    return (
        F.lit(float(default_rate))
        if expr is None
        else expr.otherwise(F.lit(float(default_rate)))
    )


def mixture_upsample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Mixture weighting with epoch oversampling: a rate of 2.5 yields 2
    deterministic copies of every row plus a third with probability 0.5
    (by id hash) — expected multiplicity = rate, variance only on the
    fractional epoch. The standard way training mixes express "see wiki
    ~3× per epoch" without an RNG pass.

    Adds an ``epoch`` column (0-based copy index) so downstream shuffling
    can spread the copies. Map-side only: sequence + explode, no shuffle,
    no UDF."""
    rate_col = _rate_expr(rates, source_col, default_rate)
    n_copies = (
        F.floor(rate_col)
        + (uniform_hash(id_col, seed) < (rate_col - F.floor(rate_col))).cast("long")
    ).alias("__n")
    out = df.select("*", n_copies).where(F.col("__n") > 0)
    return (
        out.select(
            "*", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)).alias("epoch")
        )
        .drop("__n")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Stable global permutation: order rows by seeded hash of their id.

    Adds a ``shuffle_key`` column and returns the frame range-partitioned +
    locally sorted by it — the standard "shuffle the corpus once before
    sequence packing" step. One range exchange (sampled boundaries keep
    partitions balanced because the key is uniform) and one local sort;
    downstream writers preserve the order per output file."""
    key = uniform_hash(id_col, seed).alias("shuffle_key")
    out = df.select("*", key)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "shuffle_key")
    else:
        out = out.repartitionByRange("shuffle_key")
    return out.sortWithinPartitions("shuffle_key")


def stratified_sample(
    df: DataFrame,
    n_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-group sample: the ``n_per_group`` rows with the
    smallest seeded hash in each group — a stable "random" subset any
    engine reproduces (the per-group analogue of :func:`mixture_sample`,
    for when you need an exact count per stratum, e.g. balanced eval sets
    or per-source inspection samples).

    One shuffle keyed on the group column. Note row_number over a
    partitionBy window sorts the ENTIRE group (spilling if it exceeds
    memory) — so for mega-groups at 100 TB the scaling path is to
    pre-filter with ``uniform_hash < (a few × n/|group|)`` first, leaving
    the window a small superset to sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        uniform_hash(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    each row gets key u^(1/w) from its deterministic uniform hash u and
    weight w > 0; the n largest keys are the sample. Inclusion probability
    is proportional to weight, with no RNG state and no sequential pass —
    the standard way to take a "size-biased" corpus sample (longer/heavier
    docs proportionally more likely) reproducibly.

    Rows with weight ≤ 0 are excluded (zero weight means zero inclusion
    probability; a negative weight would otherwise INVERT the bias —
    u^(1/w) exceeds 1 for w < 0, making corrupt rows near-certain picks).

    Scale shape: the key is a map-side expression; ORDER BY + LIMIT plans
    as TakeOrderedAndProject — each task keeps a bounded n-row heap and the
    driver merges task heads, so no global sort and no full shuffle at any
    corpus size."""
    key = F.pow(uniform_hash(id_col, seed), 1.0 / F.col(weight_col))
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__k", key)
        .orderBy(F.col("__k").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("__k")
    )
