"""Generic delimited/JSONL file source-sink layer (SURVEY §2 B1 breadth).

The reference ingests REST JSON and emits HTTP JSON; in a Spark engine
the equivalent interchange surfaces are CSV and JSON-lines files. Both
directions here keep the engine's schema discipline: explicit StructType
on every read (no ``inferSchema`` — schema inference is a full extra
pass over the data and type-drifts silently at scale), UTC timestamps,
and parallel per-partition writes (one file per partition; callers
``repartition(n)`` to choose file count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, *, header: bool = True, sep: str = ",") -> None:
    """Write a DataFrame as CSV part-files. Timestamps are formatted
    explicitly so round-trips don't depend on reader defaults."""
    (
        df.write.mode("overwrite")
        .option("header", header)
        .option("sep", sep)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSS")
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, *, header: bool = True, sep: str = ","
) -> DataFrame:
    """Read CSV with an EXPLICIT schema — mode FAILFAST so malformed rows
    surface at read time instead of becoming silent nulls mid-pipeline
    (the batch-source counterpart of the streaming source's
    permissive-null contract, which is the right trade for unattended
    streams but not for curated batch inputs)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSS")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write JSON-lines part-files (the CloudEvents-adjacent interchange
    format of the reference's HTTP path)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read JSON-lines with an explicit schema; PERMISSIVE with a
    corrupt-record column would be the streaming choice — batch reads
    fail fast like read_csv."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
