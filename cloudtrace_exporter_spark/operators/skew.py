"""Skew-handling operators — the 100 TB insurance layer.

Real audit-event streams are Zipf-skewed: one tenant, one resource, or
one hot token can own 30% of the rows, and a single reducer partition
then dominates the stage (AQE's skew-join splitting covers sort-merge
joins, but not aggregations or intentionally-shuffled windows). The two
rewrites here are the standard cures, expressed as reusable DataFrame
transforms:

- **two-stage salted aggregation** — pre-aggregate on (key, salt) so the
  hot key's rows land on ``n_salts`` reducers, then combine partials.
  Semantically identical to the direct groupBy for decomposable
  aggregates (count/sum/min/max — avg = sum/count at combine time).
- **salted join** — when the build side is too big to broadcast and the
  probe side's key is skewed: replicate the build side ``n_salts``×, salt
  the probe side deterministically, join on (key, salt).

Both use deterministic salts (hash-derived, never rand()) so re-runs and
retried tasks produce identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _deterministic_salt(df: DataFrame, n_salts: int) -> Column:
    """Uniform salt in [0, n_salts) derived from the whole row — stable
    across retries (rand() is not, and breaks exactly-once sinks)."""
    return F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    *,
    sum_cols: list[str] | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe groupBy: count(*) + sum(c) per key.

    Stage 1 shuffles on (key, salt) — the hot key fans out over
    ``n_salts`` reducers; stage 2 shuffles ``|keys|·n_salts`` partial rows
    (tiny). Output: ``n`` (count) and ``sum_<c>`` per sum column —
    bit-identical to the direct groupBy for these decomposable aggregates.
    """
    sum_cols = sum_cols or []
    partial = (
        df.withColumn(_SALT, _deterministic_salt(df, n_salts))
        .groupBy(*keys, _SALT)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the build side per salt, salt the
    probe side, join on (key, salt).

    Use when (a) the build side exceeds the broadcast threshold and
    (b) the probe side's join key is skewed enough that AQE's split of
    sort-merge partitions still leaves a straggler. Cost: build side
    shuffled ``n_salts``× — only worth it when the skew loss exceeds
    that. Join column layout matches ``probe.join(build, on, how)``.
    """
    salted_probe = probe.withColumn(_SALT, _deterministic_salt(probe, n_salts))
    replicated_build = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return salted_probe.join(replicated_build, on=[on, _SALT], how=how).drop(_SALT)
