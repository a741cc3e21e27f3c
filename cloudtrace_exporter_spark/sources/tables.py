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

from cloudtrace_exporter_spark.schemas import FIXTURE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = tuple(FIXTURE_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its explicit schema.

    ``events.ts`` is plain TIMESTAMP(MICROS) in parquet (verified via the
    parquet footer at every scale factor), so it reads as a native
    TimestampType and time-range filters push straight into the scan —
    no legacy flags, no epoch arithmetic.  At 100 TB the same predicate
    additionally prunes date partitions (see layout.py).
    """
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(FIXTURE_SCHEMAS)}")
    path = f"{sf_dir}/{name}.parquet"
    return spark.read.schema(FIXTURE_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
