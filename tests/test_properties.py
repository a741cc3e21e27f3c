"""Property-based tests (hypothesis) for the normalize-chain edge
semantics cited in SURVEY §5.3 — the reference behaviors a hand-picked
example suite can miss: trailing-dot trimming over arbitrary blank
combinations, blank-aware subject coalescing over arbitrary whitespace,
and epoch-millis round-trips at boundary values.

One SparkSession round-trip per property batch (collect once over a
generated frame), so the suite stays fast.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from cloudtrace_exporter_spark.operators import normalize

_part = st.text(alphabet="abcXYZ 0", min_size=0, max_size=4)
_ws = st.text(alphabet=" \t\n", min_size=0, max_size=3)


def _one_row(spark, cols: dict[str, object], expr, out_type: str = "string"):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} {out_type}" for k in cols)
    )
    return df.select(expr.alias("out")).first()["out"]


@given(parts=st.tuples(_part, _part, _part, _part))
@settings(max_examples=15, deadline=None)
def test_event_type_never_ends_with_dot_and_is_lower(spark_prop, parts):
    out = _one_row(
        spark_prop,
        {"a": parts[0], "b": parts[1], "c": parts[2], "d": parts[3]},
        normalize.derive_event_type("a", "b", "c", "d"),
    )
    assert not out.endswith(".")
    assert out == out.lower()
    # reference parity: lower(join('.')) then strip trailing dots only
    expected = ".".join(parts).lower().rstrip(".")
    assert out == expected


@given(name_core=_part, lead=_ws, trail=_ws, rid=st.text(alphabet="abc123", min_size=1, max_size=6))
@settings(max_examples=15, deadline=None)
def test_subject_blank_coalesce_matches_go_trimspace(spark_prop, name_core, lead, trail, rid):
    name = lead + name_core + trail
    out = _one_row(
        spark_prop,
        {"resource_name": name, "resource_id": rid},
        normalize.derive_subject("resource_name", "resource_id"),
    )
    # Go: if strings.TrimSpace(name) != "" → UNtrimmed name, else id
    assert out == (name if name.strip() else rid)


@given(ms=st.integers(min_value=0, max_value=4102444800000))  # 1970..2100
@settings(max_examples=15, deadline=None)
def test_epoch_millis_roundtrip(spark_prop, ms):
    df = spark_prop.createDataFrame([(ms,)], "ms long")
    back = df.select(
        normalize.timestamp_to_millis(normalize.millis_to_timestamp("ms")).alias("out")
    ).first()["out"]
    assert back == ms


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.floats(0, 500, allow_nan=False)), min_size=1, max_size=20
    )
)
@settings(max_examples=15, deadline=None)
def test_dedup_idempotent_under_redelivery(spark_prop, rows):
    # at-least-once invariant: dedup(x ∪ x) == dedup(x) keyed by event id
    df = spark_prop.createDataFrame(rows, "event_id int, value double")
    once = normalize.dedup_events(df, "event_id").count()
    twice = normalize.dedup_events(df.union(df), "event_id").count()
    assert once == twice == df.select("event_id").distinct().count()
