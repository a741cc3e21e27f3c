"""Storage layout operators — the partition/bucket design for 100 TB.

The reference's only "layout" is the REST API's time index: its poll
window becomes query params the server evaluates
(/root/reference/pkg/adapter/adapter.go:98-102). The warehouse-native
equivalent is a **date-partitioned event store**: land events under
``event_date=YYYY-MM-DD/`` so every time-window query (SURVEY §2 B2/A3)
prunes whole partitions at plan time, and the within-day remainder is
pruned at row-group level via min/max stats on ``ts``.

At 100 TB this is the single highest-leverage decision in the engine:
a 1-day window over 3 years of data touches ~0.1% of files before a
single byte is read. Secondary layout levers (documented, applied by the
writer): sort within partitions by ``ts`` to tighten row-group stats, and
size output files via a pre-write repartition on (date, hash-bucket) so
hot days don't produce one giant file and cold days don't produce dust.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(
    events: DataFrame,
    path: str,
    *,
    ts_col: str = "ts",
    buckets_per_day: int = 1,
) -> None:
    """Write events date-partitioned (+ optional intra-day bucket split).

    ``repartition(date, bucket)`` makes one task own each output file —
    bounded file count, no small-file dust; ``sortWithinPartitions(ts)``
    gives monotone row-group min/max so the residual (sub-day) time
    filter prunes row groups too.
    """
    with_date = events.withColumn("event_date", F.to_date(F.col(ts_col)))
    parts = [F.col("event_date")]
    if buckets_per_day > 1:
        with_date = with_date.withColumn(
            "__bucket", F.pmod(F.xxhash64("event_id"), F.lit(buckets_per_day)).cast("int")
        )
        parts.append(F.col("__bucket"))
    (
        with_date.repartition(*parts)
        .sortWithinPartitions(ts_col)
        .drop("__bucket")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_events_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned store. Filters on ``event_date`` (or on ``ts``
    through a ``to_date`` comparison) become PartitionFilters — verify
    with ``.explain`` that the scan lists pruned partitions."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist a table hash-bucketed (and sorted) on its join key.

    Bucketing is the pre-paid shuffle: two tables bucketed the same way
    on the same key join with NO Exchange and NO sort at query time —
    at 100 TB that turns the nightly fact⋈fact join from the dominant
    shuffle into a zip of co-located files. The bucket spec lives in the
    session catalog; ``path`` keeps the data external (no metastore
    needed — the default in-memory catalog carries the spec).
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def window_scan(
    spark: SparkSession, path: str, lo: str, hi: str, *, ts_col: str = "ts"
) -> DataFrame:
    """The reference's A3 window as a partition-pruned scan: a coarse
    date-level predicate (plan-time partition pruning) plus the exact
    timestamp bound (row-group pruning + residual filter)."""
    df = read_events_partitioned(spark, path)
    return df.filter(
        (F.col("event_date") >= F.to_date(F.lit(lo)))
        & (F.col("event_date") <= F.to_date(F.lit(hi)))
        & F.col(ts_col).between(F.lit(lo), F.lit(hi))
    )


def zorder_key(df: DataFrame, cols: list[str], *, bits: int = 12, rank_scale: bool = False) -> DataFrame:
    """Attach a Morton (Z-order) key ``_z`` interleaving the bits of the
    given numeric columns, each min-max scaled to ``bits`` bits.

    Z-ordering is the multi-dimensional data-skipping layout: sorting by
    ``_z`` makes files locally tight in EVERY listed dimension, so
    min/max file stats prune point/box queries on any of them — where a
    linear sort only prunes its leading column. Column stats come from a
    1-row agg broadcast back via crossJoin (no driver round-trip); the
    bit interleave is a JVM-side ``aggregate`` over the bit positions,
    inside whole-stage codegen. Min-max scaling is skew-sensitive; pass
    ``rank_scale=True`` to bucket by approximate quantile boundaries
    instead (skew-robust; bits ≤ 10).
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if rank_scale and bits > 10:
        raise ValueError("rank_scale materializes 2^bits quantile boundaries; use bits <= 10")
    top = (1 << bits) - 1
    n = len(cols)
    if rank_scale:
        # Skew-robust scaling: bucket by approximate quantile boundaries
        # (driver-side STATS collection, 2^bits floats per column — the
        # same class of metadata AQE gathers) so a Zipf/power-law column
        # still spreads uniformly across buckets. Bucket lookup is a
        # codegen'd aggregate over the boundary array, no join.
        out = df
        for j, c in enumerate(cols):
            probs = [i / (top + 1) for i in range(1, top + 1)]
            bounds = df.approxQuantile(c, probs, 0.001)
            arr = "array(" + ",".join(f"CAST({b!r} AS DOUBLE)" for b in bounds) + ")"
            out = out.withColumn(
                f"__s_{j}",
                F.expr(
                    f"aggregate({arr}, 0L, (acc, b) -> acc + IF(CAST({c} AS DOUBLE) > b, 1L, 0L))"
                ),
            )
    else:
        stats = df.agg(
            *[F.min(c).cast("double").alias(f"__min_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"__max_{c}") for c in cols],
        )
        out = df.crossJoin(F.broadcast(stats))
        for j, c in enumerate(cols):
            rng = F.col(f"__max_{c}") - F.col(f"__min_{c}")
            scaled = F.when(rng > 0,
                            F.floor((F.col(c) - F.col(f"__min_{c}")) / rng * top)
                            ).otherwise(F.lit(0))
            out = out.withColumn(f"__s_{j}", F.least(scaled, F.lit(top)).cast("long"))
    interleave = " + ".join(
        f"shiftleft((__s_{j} >> i) & 1, {n}*i + {j})" for j in range(n)
    )
    out = out.withColumn(
        "_z",
        F.expr(f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc + {interleave})"),
    )
    drop = [f"__s_{j}" for j in range(n)]
    if not rank_scale:
        drop += [f"__min_{c}" for c in cols] + [f"__max_{c}" for c in cols]
    return out.drop(*drop)


def zorder_layout(df: DataFrame, cols: list[str], *, num_partitions: int = 32,
                  bits: int = 12) -> DataFrame:
    """Cluster rows into Z-order for writing: range-partition + sort on
    the Morton key so each output file covers a tight hyper-rectangle of
    the listed dimensions (one shuffle — same cost as any sorted write)."""
    keyed = zorder_key(df, cols, bits=bits)
    return keyed.repartitionByRange(num_partitions, "_z").sortWithinPartitions("_z")


def range_partition_plan(
    df: DataFrame,
    col: str,
    *,
    fractions: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Equi-depth RANGE-PARTITION split points for ``col``: for each
    fraction f, the smallest value v with |rows ≤ v| ≥ ⌈f·n⌉ — exactly
    what `repartitionByRange` samples approximately, computed exactly
    for when the boundaries must be durable artifacts (a published
    dataset's shard manifest, a sorted 100 TB write where re-sampling
    per job would move shard edges between runs).

    WINDOWLESS by construction (a naive rank needs a global-sort
    window): value frequencies aggregate once, the cumulative count
    comes from a value≤value broadcast self-join over the DISTINCT-value
    frame (bounded by the value domain — token counts, prices, dates —
    not the corpus), and each fraction picks its min qualifying value.
    All-integer thresholds (⌈f·n⌉ via integer ceil-div on a 10⁶ scale,
    no float·count product) — full DuckDB oracle.
    """
    counts = df.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("c"))
    a, b = counts.alias("a"), counts.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.v") <= F.col("a.v"))
        .groupBy(F.col("a.v").alias("v"))
        .agg(F.sum("b.c").alias("cum"))
    )
    tot = counts.agg(F.sum("c").alias("n"))
    fr = F.explode(
        F.array(*[F.lit(int(round(f * 10**6))).alias("x") for f in fractions])
    ).alias("f_micro")
    targets = tot.select(fr, "n").select(
        (F.col("f_micro") / 1e6).alias("fraction"),
        # ceil(f·n) in pure integers: (f_micro·n + 999999) div 10^6
        F.floor((F.col("f_micro") * F.col("n") + (10**6 - 1)) / 10**6)
        .cast("long")
        .alias("target_rank"),
    )
    return (
        cum.crossJoin(F.broadcast(targets))
        .filter(F.col("cum") >= F.col("target_rank"))
        .groupBy("fraction", "target_rank")
        .agg(F.min("v").alias("boundary"))
        .select("fraction", "target_rank", "boundary")
    )


def compact_files(spark: SparkSession, input_path: str, output_path: str,
                  *, target_mb: int = 128) -> int:
    """Rewrite a parquet directory into ~``target_mb``-sized files — the
    small-files compaction every long-running ingest needs: thousands of
    micro-batch dust files become a bounded set of right-sized ones, so
    later scans pay one task per ~128 MB instead of one per file.

    File count derives from the ACTUAL input bytes (Hadoop
    ContentSummary — works on any FileSystem, not just local), then one
    round-robin repartition bounds every output file's size. Returns the
    number of files written.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(input_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, int(total_bytes // (target_mb * 1024 * 1024)) + (1 if total_bytes % (target_mb * 1024 * 1024) else 0))
    spark.read.parquet(input_path).repartition(n_files).write.mode("overwrite").parquet(output_path)
    return n_files


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    partition_col: str = "event_date",
) -> int:
    """MERGE (last-writer-wins upsert) into a date-partitioned parquet
    store, rewriting ONLY the partitions the update batch touches — the
    table-format-free answer to incremental mutation: at 100 TB a
    day's corrections rewrite one day's files, not the table.

    Mechanics: the touched partition values are collected (partition
    METADATA, bounded by the update batch's date spread — never row
    data), the matching slice of the target is read back, unioned with
    the updates, compacted by ``latest_by_key``, and written with
    dynamic partition overwrite so untouched partitions' files are never
    rewritten. The merged frame is localCheckpoint'ed first because
    Spark (correctly) refuses to overwrite files it is still lazily
    reading from.
    """
    from cloudtrace_exporter_spark.operators.normalize import latest_by_key

    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    target = spark.read.parquet(target_path)
    slice_ = target.filter(F.col(partition_col).isin(parts)).select(*updates.columns)
    merged = latest_by_key(
        slice_.unionByName(updates),
        key_cols=key_cols,
        order_col=order_col,
        tiebreak_col=tiebreak_col,
    ).localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(parts)
