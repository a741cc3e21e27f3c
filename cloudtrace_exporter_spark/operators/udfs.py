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


def sentence_spans(df: DataFrame) -> DataFrame:
    """Python UDTF (table function) — one input row → N output rows.

    Splits each document into sentence-ish spans with a 1-based index and
    a per-span token count; the lateral-join shape is the UDTF's reason to
    exist (a scalar UDF cannot change row count). Registered and invoked
    through SQL LATERAL — the DataFrame-API twin is ``explode``-based and
    stays JVM-side; the UDTF tier is for span logic too complex for
    built-ins (real tokenizers, parsers, decoders).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, span_idx: int, span: string, n_tokens: bigint")
    class SentenceSpans:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                n = sum(1 for t in s.split(" ") if t)
                yield doc_id, i + 1, s, n

    spark = df.sparkSession
    spark.udtf.register("sentence_spans", SentenceSpans)
    df.select("doc_id", "text").createOrReplaceTempView("__docs_for_spans")
    return spark.sql(
        "SELECT s.doc_id, s.span_idx, s.span, s.n_tokens "
        "FROM __docs_for_spans, LATERAL sentence_spans(doc_id, text) s"
    )


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
