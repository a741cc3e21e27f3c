"""Declarative data-quality expectation suite (Deequ / Great-
Expectations-style) — the admission gate a 100 TB ingest runs before a
table is allowed downstream.

The reference's only validation is per-record: the adapter drops traces
that fail CloudEvent conversion and counts them
(/root/reference/pkg/adapter/adapter.go:140-156). At warehouse scale the
same need becomes table-level: assert null rates, key uniqueness, value
domains, numeric bounds, and referential integrity BEFORE a batch is
published, and emit an auditable per-expectation report rather than a
boolean.

Scale shape: every row-level check in ``expectation_report`` compiles
into ONE aggregation pass over the table — each check is a
``sum(case when violated)`` column in a single wide agg (map-side
combined, one 1-row exchange), then the wide row is unpivoted to the
long report. Uniqueness checks add ``count distinct`` columns: Spark
plans multiple distinct aggregates via an Expand (one duplicated pass
per distinct column) — the standard cost of exact uniqueness; prefer
one unique key per call on very wide tables. Referential integrity is
already covered by ``analytics.audit_referential`` (broadcast anti-join
orphan counts, q_referential_audit) — this module deliberately does not
duplicate it; union the two reports for a full admission gate.

Every check emits (expectation, column, violations, total, pass):
violations/total are exact BIGINT counts, passed = violations == 0 — all
integer arithmetic, fully DuckDB-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("expectation", "column", "violations", "total", "passed")


def expectation_report(
    df: DataFrame,
    *,
    not_null: tuple[str, ...] | list[str] = (),
    unique: tuple[str, ...] | list[str] = (),
    bounds: dict[str, tuple[float | None, float | None]] | None = None,
    accepted: dict[str, list] | None = None,
    matches: dict[str, str] | None = None,
) -> DataFrame:
    """One row per declared expectation over ``df``.

    - ``not_null``: columns that must never be NULL.
    - ``unique``: columns whose non-null values must be distinct
      (violations = count(col) − count(distinct col): the surplus rows).
    - ``bounds``: col → (lo, hi); NULL bound = unbounded on that side.
      NULL values are not bound violations (declare them in not_null).
    - ``accepted``: col → allowed-value list (non-null values only).
    - ``matches``: col → regex the full value must match (RE2-compatible
      patterns keep Spark's and DuckDB's semantics aligned).

    All checks run in one aggregation pass; the wide 1-row result is
    unpivoted via an array-of-structs explode (no second scan).
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__total")]
    labels: list[tuple[str, str, str]] = []  # (expectation, column, agg alias)

    def viol(name: str, col: str, cond) -> None:
        alias = f"__v{len(labels)}"
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(alias))
        labels.append((name, col, alias))

    for c in not_null:
        viol("not_null", c, F.col(c).isNull())
    for c, (lo, hi) in (bounds or {}).items():
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(c) > F.lit(hi))
        viol("bounds", c, F.col(c).isNotNull() & cond)
    for c, allowed in (accepted or {}).items():
        viol("accepted", c, F.col(c).isNotNull() & ~F.col(c).isin(list(allowed)))
    for c, pat in (matches or {}).items():
        viol("matches", c, F.col(c).isNotNull() & ~F.col(c).rlike(pat))
    for c in unique:
        alias = f"__v{len(labels)}"
        aggs.append(
            (F.count(F.col(c)) - F.count_distinct(F.col(c))).cast("long").alias(alias)
        )
        labels.append(("unique", c, alias))

    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("expectation"),
                F.lit(col).alias("column"),
                F.col(alias).alias("violations"),
            )
            for name, col, alias in labels
        ]
    )
    return (
        wide.select(F.col("__total"), F.explode(rows).alias("r"))
        .select(
            F.col("r.expectation").alias("expectation"),
            F.col("r.column").alias("column"),
            F.col("r.violations").alias("violations"),
            F.col("__total").alias("total"),
            (F.col("r.violations") == 0).alias("passed"),
        )
    )


def fd_audit(
    df: DataFrame,
    *,
    lhs: str,
    rhs: str,
) -> DataFrame:
    """Functional-dependency audit: for each left-hand-side value,
    does ``lhs → rhs`` hold — and when it doesn't, what is the
    majority right-hand side and how many rows dissent? The schema-
    discovery / consistency primitive (Papenbrock's FD-discovery
    setting reduced to one candidate) that catches "this feed is
    supposed to be single-language" or "this tenant maps to two
    regions" without declaring a constraint up front — the discovery
    twin of expectation_report's declared checks.

    NULL rhs participates as an explicit '<null>' value (a NULL that
    breaks a dependency IS a violation worth seeing, and coalescing
    keeps the struct-argmax total order engine-portable).

    Scale shape: ONE (lhs, rhs) aggregation with map-side partials —
    the pair frame is bounded by the value-domain product, not data
    volume — then a tiny per-lhs argmax (count desc, rhs asc
    tie-break, the label-propagation idiom). Two keyed shuffles, the
    second on the already-reduced frame; no joins, no windows.
    """
    c = df.groupBy(
        F.col(lhs).alias("lhs_value"),
        F.coalesce(F.col(rhs).cast("string"), F.lit("<null>")).alias("rhs_value"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per = c.groupBy("lhs_value").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_rhs"),
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("rhs_value"))).alias("m"),
    )
    return per.select(
        "lhs_value",
        "n_rows",
        "n_distinct_rhs",
        F.col("m.rhs_value").alias("majority_rhs"),
        (-F.col("m.nc")).cast("long").alias("majority_n"),
        (F.col("n_rows") + F.col("m.nc")).cast("long").alias("n_violations"),
        (F.col("n_distinct_rhs") == 1).alias("fd_holds"),
    ).orderBy("lhs_value")


def k_anonymity_report(
    df: DataFrame,
    *,
    quasi: tuple[str, ...] | list[str],
    sensitive: str,
    k: int = 5,
) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    2007) — the privacy gate a corpus passes BEFORE release: group rows
    into equivalence classes on the quasi-identifier combination and
    report the class-size spectrum. A class of size < k re-identifies
    its members by linkage; a class whose sensitive attribute takes one
    value leaks it even at size ≥ k (homogeneity attack) — the
    complement of q_pii_report, which finds direct identifiers INSIDE
    text while this measures re-identification risk of the STRUCTURED
    columns.

    Output: one row per equivalence-class SIZE — n_classes, n_rows,
    the minimum l (distinct sensitive values) among classes of that
    size, and the k-violation flag. The table's k-anonymity level is
    the first row's class_size; rows_at_risk = Σ n_rows where
    violates_k. All counts are exact integers.

    Scale shape: ONE (quasi) aggregation with map-side partials (the
    class frame is bounded by the quasi-value domain product, not data
    volume), then a tiny class-size rollup. No joins, no windows.
    """
    classes = df.groupBy(*[F.col(c) for c in quasi]).agg(
        F.count(F.lit(1)).cast("long").alias("__sz"),
        F.count_distinct(F.col(sensitive)).cast("long").alias("__l"),
    )
    return (
        classes.groupBy(F.col("__sz").alias("class_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("__l").alias("min_l_diversity"),
        )
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).cast("long").alias("n_rows"),
            "min_l_diversity",
            (F.col("class_size") < F.lit(int(k))).alias("violates_k"),
        )
        .orderBy("class_size")
    )
