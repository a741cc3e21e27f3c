"""UDF surface (SURVEY §2 B37): the sanctioned Python escape hatches.

Demonstrates each UDF tier with a real operator, slowest-to-fastest
preference INVERTED from usage priority (built-ins > pandas_udf >
applyInPandas > row-UDF; the row-at-a-time variant exists only as the
anti-pattern reference and is not used by any query).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# explicit DataType (not a DDL string): string schemas are parsed via the
# active session, which doesn't exist yet at import time
@F.pandas_udf(T.DoubleType())
def zscore_scalar(v: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) scalar op — batch-local demo transform.
    NOTE: normalizes within the Arrow batch, so use the grouped variant
    for semantically meaningful z-scores."""
    std = v.std(ddof=0)
    return (v - v.mean()) / std if std else v * 0.0


def grouped_zscore(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score via applyInPandas (grouped-map UDF).

    Population stddev (ddof=0) to match SQL ``stddev_pop`` — that is what
    makes this oracle-checkable. One shuffle on the group key; each group
    becomes a pandas DataFrame in an executor (groups must fit in
    memory — at 100 TB use the built-in window formulation below for
    unbounded groups; this operator is the pattern demo the driver
    mandates).
    """
    out_schema = f"event_id long, {group_col} string, zscore double"

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std else pdf[value_col] * 0.0
        return pd.DataFrame(
            {"event_id": pdf["event_id"], group_col: pdf[group_col], "zscore": z.round(6)}
        )

    return df.groupBy(group_col).applyInPandas(_z, out_schema)


def grouped_zscore_builtin(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The built-in equivalent (what production code should use): window
    aggregates, no Python. Kept for the bench comparison UDF-vs-builtin."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col)
    std = F.stddev_pop(value_col).over(w)
    z = (F.col(value_col) - F.avg(value_col).over(w)) / std
    return df.select(
        "event_id",
        group_col,
        F.round(F.when(std != 0, z).otherwise(F.lit(0.0)), 6).alias("zscore"),
    )
