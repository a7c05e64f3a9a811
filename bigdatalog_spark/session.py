"""Tuned SparkSession builder for the engine.

Defaults chosen for iterative Datalog + large-scan analytics workloads:
AQE on (runtime re-planning, skew-join handling, small-partition
coalescing), moderate shuffle parallelism locally, Arrow for any
Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "bigdatalog-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    rocksdb_state_store: bool = False,
) -> SparkSession:
    """``rocksdb_state_store=True`` switches Structured Streaming state to
    the RocksDB provider (native memory + local disk with changelog
    checkpointing) instead of the default HDFS-backed store, which holds
    every key in JVM heap. At production state volumes (stream-stream
    join state is (watermark + interval) × arrival rate PER side) the
    heap store OOMs executors long before the join is wrong — RocksDB is
    the documented choice for large-state streaming. Off by default
    locally: bounded test/bench drains are heap-friendly and the HDFS
    store avoids RocksDB's per-batch native-file overhead at toy sizes."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        # driver testdata writes events.ts as TIMESTAMP(NANOS); read as long
        # and convert in sources.tables.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark 4's DataFrame debugging decorates EVERY Column/DataFrame
        # op with a Python-traceback capture plus THREE extra py4j round
        # trips (conf read + PySparkCurrentOrigin set/clear) purely to
        # enrich error messages with the Python call site. A driver loop
        # that builds plans per iteration (the Datalog fixpoints: ~800
        # wrapped ops per query) pays ~2 s/query for it; measured medians
        # with it off: dl_tc_null_labels 9.6 -> 6.6 s, dl_mlm_net_profit
        # 2.7 -> 2.4 s, flat elsewhere. Errors still carry the full JVM
        # context — only the Python-side call-site annotation is dropped.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if rocksdb_state_store:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ).config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
            ".enabled",
            "true",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _enable_ancestor_checkpointing(spark)
    return spark


def _enable_ancestor_checkpointing(spark: SparkSession) -> None:
    """Make lazy localCheckpoints actually truncate in iterative loops.

    RDD.doCheckpoint's descent STOPS at the first RDD that has checkpoint
    data (core/.../rdd/RDD.scala doCheckpoint), so in a fixpoint loop only
    the delta's checkpoint — the frame the convergence-count job runs on —
    ever truncates; the accumulated set's marked-but-never-reached RDD
    keeps its full lineage and after a few hundred iterations task
    serialization dies with StackOverflowError. The thread-local property
    below ("spark.checkpoint.checkpointAllMarkedAncestors") makes every
    marked ancestor checkpoint during the same job. Inherited by child
    threads; fixpoint entry points also set it defensively for sessions
    not built here."""
    spark.sparkContext.setLocalProperty(
        "spark.checkpoint.checkpointAllMarkedAncestors", "true"
    )


def ensure_min_parallelism(df):
    """Repartition ``df`` up to the cluster's default parallelism when the
    scan produced fewer partitions (a single small parquet file = ONE
    task). Heavy per-row work downstream of such a scan — interpreted
    higher-order functions, wide partial aggregates, per-token hashing —
    otherwise runs on one core regardless of cluster size. At real scale
    the input already has ≥ cores partitions and this is a no-op (no
    shuffle added); it only bites on toy inputs where the shuffle is
    cheap."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
