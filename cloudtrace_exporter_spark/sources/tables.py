"""Fixture-table loaders — the engine's batch source layer (SURVEY §2 B1).

The reference's source is a paginated REST scan with the time filter
pushed into the request (``/root/reference/pkg/adapter/adapter.go:98-130``).
Here the source is parquet and the same push-down happens for free:
explicit schema (no inference), Catalyst predicate pushdown and column
pruning reach the scan. At 100 TB the layout contract is: events
partitioned by ``date(event_time)`` so time-window queries prune
partitions (the reference's A3 window becomes a partition-pruned scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from cloudtrace_exporter_spark.schemas import EVENTS_RAW_SCHEMA, FIXTURE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = tuple(FIXTURE_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its explicit schema.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark's reader
    rejects; we read raw nanos (legacy flag) and floor-convert to a
    microsecond timestamp via integer division (`div`, not `/` — double
    math loses precision at 1e18 nanos).

    The raw nanos survive as ``ts_ns``: filters on the *derived* ``ts``
    cannot reach the parquet scan, so time-window operators re-express
    their range predicate on ``ts_ns`` (see normalize.time_window_filter)
    — that is what turns a 100 TB full scan into a row-group-pruned one.
    Unused, the column is pruned away like any other.
    """
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(FIXTURE_SCHEMAS)}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(path)
        return raw.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    return spark.read.schema(FIXTURE_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
