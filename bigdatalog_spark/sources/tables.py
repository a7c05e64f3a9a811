"""Loaders for the driver's parquet testdata tables.

Handles the one representational wrinkle: `events.ts` is written as
parquet TIMESTAMP(NANOS) which Spark cannot represent natively (max
microseconds). With spark.sql.legacy.parquet.nanosAsLong=true (set by
build_session) the column reads as LongType nanoseconds; we convert to a
proper TimestampType truncating to microseconds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        elif isinstance(ts_type, T.TimestampNTZType):
            # TIMESTAMP(MICROS) without UTC adjustment reads as NTZ, which
            # streaming watermarks reject; cast to TimestampType (wallclock-
            # preserving in the session timezone)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
