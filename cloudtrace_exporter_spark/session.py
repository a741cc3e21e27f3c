"""SparkSession factory.

One shared builder so every entry point (driver contract, bench, tests)
runs with the same scale-aware defaults:

- **AQE on** (runtime coalesce + skew-join splitting) — at 100 TB the
  static plan is always wrong somewhere; AQE re-plans from runtime stats.
- **UTC session timezone** — the reference forces UTC for its window
  math (``/root/reference/pkg/adapter/adapter.go:93-94``); also required
  for DuckDB-oracle comparability (DuckDB timestamps are UTC-naive).
- **Arrow on** — every Pandas-UDF operator ships batches, not rows.
- **shuffle.partitions ≈ cores** locally; on a real cluster this is
  superseded by AQE's coalescing from ``advisoryPartitionSizeInBytes``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "cloudtrace_exporter_spark", cpus: str | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    In local mode ``spark.driver.memory`` is the only memory knob; it must
    be set before the JVM starts, so tests/bench should call this before
    touching any other Spark API.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # dims (region/nation/customer at test SF; REGION/TENANT at prod) are
        # broadcast-join candidates; 64 MB covers every dimension table while
        # fact-fact joins still sort-merge.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cache_once(df: DataFrame) -> DataFrame:
    """``df.cache()`` with ONE caching owner per logical plan: if an
    identical plan is already in the CacheManager (e.g. a helper cached
    the shared frame, or a prior invocation of the same query built the
    same tree), return ``df`` untouched instead of re-registering it.

    Spark's CacheManager already dedups identical plans, so the
    re-``cache()`` was harmless — but it WARNs (`Asked to cache already
    cached data`), polluting the logs the plan audits read. The JVM
    lookup is Dataset-based (`cacheManager().lookupCachedData`); if the
    private API moves, fall back to plain ``cache()`` — correctness
    never depends on this helper.
    """
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        if cm.lookupCachedData(df._jdf).isDefined():
            return df
    except Exception:
        pass
    return df.cache()
