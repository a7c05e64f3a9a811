"""DeAL-style text sources.

Re-creates Utilities.loadRowRDDFromFile / loadRowRDDFromDataset semantics
(/root/reference/datalog/src/main/scala/.../Utilities.scala:85-137):
`,`-separated for .csv, `\t` for any other extension; blank lines and
`%`-comment lines skipped; fields trimmed and converted per declared schema.

Spark-first: file loads go through spark.read.csv (distributed, pushdown-
friendly) instead of a hand-rolled RDD loop.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_deal_table(
    spark: SparkSession, path: str, schema: T.StructType, sep: str | None = None
) -> DataFrame:
    """Distributed CSV/TSV load honoring the reference's conventions."""
    if sep is None:
        sep = "," if path.endswith(".csv") else "\t"
    # Fail fast on arity mismatch — the reference's loader throws the same
    # way (Utilities.scala:98-108 indexes every declared column). Spark's
    # CSV reader pads missing trailing columns with nulls even under
    # FAILFAST, and silent nulls poison downstream arithmetic (e.g. mmin
    # distances of null never improve and the fixpoint runs forever), so
    # probe the first data line explicitly.
    first = (
        spark.read.text(path)
        .where((F.trim("value") != "") & ~F.col("value").startswith("%"))
        .limit(1)
        .collect()
    )
    if first:
        nfields = len(first[0][0].split(sep))
        if nfields != len(schema.fields):
            raise ValueError(
                f"{path}: rows have {nfields} fields, schema "
                f"declares {len(schema.fields)}"
            )
    return (
        spark.read
        .schema(schema)
        .option("sep", sep)
        .option("comment", "%")
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def _coerce(value: str, dtype: T.DataType):
    value = value.strip()
    if value == "":
        return None
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(value)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(value)
    if isinstance(dtype, T.DateType):
        return _dt.date.fromisoformat(value)
    return value


def dataframe_from_lines(
    spark: SparkSession, lines, schema: T.StructType, sep: str = ","
) -> DataFrame:
    """In-memory dataset load (Utilities.loadRowRDDFromDataset,
    Utilities.scala:116-137). ``lines`` is an iterable of CSV strings."""
    rows = []
    fields = schema.fields
    for line in lines:
        line = line.strip()
        if not line or line.startswith("%"):
            continue
        parts = line.split(sep)
        if len(parts) != len(fields):
            raise ValueError(
                f"row {line!r} has {len(parts)} fields, schema expects {len(fields)}"
            )
        rows.append(tuple(_coerce(p, f.dataType) for p, f in zip(parts, fields)))
    return spark.createDataFrame(rows, schema)
