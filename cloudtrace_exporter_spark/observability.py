"""Pipeline observability — per-stage metrics WITHOUT extra jobs.

The reference counts what it pushed per batch (delivered/failed in its
sender loop, pkg/exporter); the batch-side analog here is Spark's
``Observation`` API: named aggregates piggyback on whatever action the
pipeline already runs, so a curation funnel's stage counts come out of
the SAME single pass that writes the output — no per-stage ``count()``
jobs re-scanning 100 TB (which is what a naive funnel report costs).

Usage:
    staged, obs = observe_counts(docs, "ingest", null_cols=["lang"])
    ... more transforms ...
    result.write...   # or any action
    obs.get           # {'n_rows': ..., 'n_null_lang': ...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame, name: str, *, null_cols: tuple[str, ...] | list[str] = ()
) -> tuple[DataFrame, Observation]:
    """Attach row/null counters at this point of the plan; metrics are
    collected during the next action over the returned frame (zero extra
    scans — the counters ride inside the executing stages)."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    return df.observe(obs, *metrics), obs


def observed_funnel(source: DataFrame, stages) -> tuple[DataFrame, dict[str, Observation]]:
    """Instrument a transform chain: after each stage an observation node
    is inserted, so ONE action on the returned frame fills every stage's
    counters (the funnel report costs zero extra scans).

    ``stages`` is ``[(name, fn), ...]`` where each ``fn(df) -> df``
    builds on the (observed) output of the previous stage — the
    observation nodes must nest inside the executed plan to be filled.
    """
    if not stages:
        raise ValueError("observed_funnel needs at least one stage")
    observations: dict[str, Observation] = {}
    cur = source
    for name, fn in stages:
        cur, obs = observe_counts(fn(cur), name)
        observations[name] = obs
    return cur, observations


def observe_stream(df: DataFrame, name: str, *, null_cols: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """Streaming form: attach named metrics to a streaming frame; each
    micro-batch's counters surface in ``query.lastProgress
    ["observedMetrics"][name]`` — per-batch ingest accounting (the
    reference's delivered/failed counters) without a foreachBatch hook
    or a second aggregation query competing for the stream."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    return df.observe(name, *metrics)
