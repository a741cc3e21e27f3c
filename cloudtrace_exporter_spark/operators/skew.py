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


def key_skew_audit(df: DataFrame, key_col: str, *, label: str | None = None) -> DataFrame:
    """Join-key skew diagnosis — the pre-shuffle report that decides
    whether a key needs ``salted_sum_count``/``salted_join`` or AQE's
    skew split BEFORE the 100 TB stage runs: per-key frequency spectrum
    reduced to one row of exact skew statistics.

    - ``gini``: the exact Gini coefficient of the key-frequency
      distribution via the sorted-rank identity
      G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with frequencies ranked
      ascending by (count, key) — a total order, so the rank-weighted
      sum is a pure function of the data. 0 = perfectly uniform keys,
      →1 = one key owns the table.
    - ``heavy_share_e6``: the row share (ppm, floor) held by the top
      ⌈n/100⌉ keys — the "does 1% of keys own the stage" number.
    - ``top_key``/``max_cnt``: the single heaviest key (count desc,
      key asc tie-break — the fd_audit argmax idiom).

    Exactness: every statistic is integer arithmetic except the final
    Gini ratio — two exact BIGINT operands (each < 2⁵³ here; escalate
    to DECIMAL(38,0) sums beyond ~10⁹ keys · 10⁹ rows) through one IEEE
    division, rounded to 6 places. The global ranking comes from
    ``analytics.global_row_number`` (range-partitioned two-phase
    numbering — never a single-task window over the key spectrum,
    which at 100 TB can be billions of distinct keys).

    Scale shape: one key-keyed aggregation (map-side combined), the
    range exchange for ranking, then a 1-row reduction. ``label`` names
    the audited table.column in the output for unioned multi-key audits.
    """
    from . import analytics

    counts = df.groupBy(F.col(key_col).cast("string").alias("__key")).agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    ranked = analytics.global_row_number(counts, ["__cnt", "__key"], with_total=True)
    n = F.max("_n_total").cast("long")
    heavy_from = F.col("_n_total") - F.ceil(F.col("_n_total") / 100) + 1
    one = ranked.agg(
        n.alias("n_keys"),
        F.sum("__cnt").cast("long").alias("total_rows"),
        F.max("__cnt").cast("long").alias("max_cnt"),
        F.min(F.struct((-F.col("__cnt")).alias("nc"), F.col("__key"))).alias("__top"),
        F.sum(F.col("rn") * F.col("__cnt")).cast("long").alias("__s"),
        F.sum(F.when(F.col("rn") >= heavy_from, F.col("__cnt")).otherwise(0))
        .cast("long")
        .alias("heavy_rows"),
        F.ceil(n / 100).cast("long").alias("heavy_keys"),
    )
    gini = F.round(
        (2 * F.col("__s") - (F.col("n_keys") + 1) * F.col("total_rows"))
        / (F.col("n_keys") * F.col("total_rows")),
        6,
    )
    return one.select(
        F.lit(label or key_col).alias("audited"),
        "n_keys",
        "total_rows",
        "max_cnt",
        F.col("__top.__key").alias("top_key"),
        "heavy_keys",
        "heavy_rows",
        F.floor(F.col("heavy_rows") * 1_000_000 / F.col("total_rows"))
        .cast("long")
        .alias("heavy_share_e6"),
        gini.alias("gini"),
    )
