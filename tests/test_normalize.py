"""Unit tests for the trace→CloudEvent normalize family (SURVEY §5.3).

Covers every reference edge case cited in SURVEY §2 A5-A11:
trailing-dot trim, blank-name coalesce, ms-epoch boundaries, override
precedence, duplicate absorption.
"""

from __future__ import annotations

from pyspark.sql import Row

from cloudtrace_exporter_spark.operators import normalize
from cloudtrace_exporter_spark.schemas import EVENT_SCHEMA, TRACE_SCHEMA


def _trace(**kw) -> dict:
    base = dict(
        trace_id="t1",
        service_type="ECS",
        trace_type="ConsoleAction",
        resource_type="ecs",
        trace_name="createServer",
        resource_id="rid-1",
        resource_name="server-a",
        time=1700000000000,
        trace_status="normal",
        code="200",
    )
    base.update(kw)
    return base


def _normalize(spark, rows):
    df = spark.createDataFrame([Row(**r) for r in rows], schema=TRACE_SCHEMA)
    return normalize.normalize_traces(
        df, source="https://cts.example", region="eu-de", domain="d1", tenant="p1"
    )


def test_event_schema(spark):
    out = _normalize(spark, [_trace()])
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in EVENT_SCHEMA.fields]
    assert got == want  # nullability differs per literal/source — names+types are the contract


def test_type_derivation_lower_concat(spark):
    row = _normalize(spark, [_trace()]).collect()[0]
    # lower(concat_ws('.', ...)) — adapter.go:226-234
    assert row.type == "ecs.consoleaction.ecs.createserver"


def test_type_trailing_dot_trim(spark):
    # blank trailing parts leave dangling dots that must be right-trimmed
    row = _normalize(spark, [_trace(trace_name="")]).collect()[0]
    assert row.type == "ecs.consoleaction.ecs"
    row2 = _normalize(spark, [_trace(resource_type="", trace_name="")]).collect()[0]
    assert row2.type == "ecs.consoleaction"


def test_type_interior_blank_survives(spark):
    # Go strings.Join keeps interior empties; TrimRight only strips the tail
    row = _normalize(spark, [_trace(resource_type="", trace_name="x")]).collect()[0]
    assert row.type == "ecs.consoleaction..x"


def test_subject_prefers_nonblank_name(spark):
    row = _normalize(spark, [_trace(resource_name="server-a")]).collect()[0]
    assert row.subject == "server-a"


def test_subject_blank_name_falls_back_to_id(spark):
    for blank in ("", "   ", "\t"):
        row = _normalize(spark, [_trace(resource_name=blank)]).collect()[0]
        assert row.subject == "rid-1", f"blank={blank!r}"


def test_subject_keeps_untrimmed_name(spark):
    # adapter.go:236-240 trims only for the check, sets the raw value
    row = _normalize(spark, [_trace(resource_name="  padded  ")]).collect()[0]
    assert row.subject == "  padded  "


def test_epoch_millis_conversion(spark):
    row = _normalize(spark, [_trace(time=0)]).collect()[0]
    assert row.event_time.isoformat().startswith("1970-01-01T00:00:00")
    row2 = _normalize(spark, [_trace(time=1700000000123)]).collect()[0]
    assert row2.event_time.microsecond == 123000


def test_context_enrichment(spark):
    row = _normalize(spark, [_trace()]).collect()[0]
    assert (row.region, row.domain, row.tenant) == ("eu-de", "d1", "p1")
    assert row.source == "https://cts.example"


def test_override_precedence_last_writer_wins(spark):
    out = normalize.apply_overrides(_normalize(spark, [_trace()]), {"region": "eu-nl", "extra": "x"})
    row = out.collect()[0]
    assert row.region == "eu-nl"  # collision overwritten (adapter.go:256-261)
    assert row.extra == "x"  # new key appended
    assert row.domain == "d1"  # untouched keys survive


def test_data_payload_roundtrip(spark):
    import json

    row = _normalize(spark, [_trace()]).collect()[0]
    payload = json.loads(row.data)
    assert payload["trace_id"] == "t1"
    assert payload["service_type"] == "ECS"


def test_dedup_absorbs_overlapping_batches(spark):
    # A4: overlapping windows re-deliver; dedup makes it effectively-once
    batch1 = [_trace(trace_id=f"t{i}") for i in range(5)]
    batch2 = [_trace(trace_id=f"t{i}") for i in range(3, 8)]  # overlap t3,t4
    out = normalize.dedup_events(_normalize(spark, batch1 + batch2))
    assert out.count() == 8


def test_classify_status_buckets(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 150.0), (3, 350.0)], "id int, value double")
    rows = {r.id: r.status for r in normalize.classify_status(df, "value").collect()}
    assert rows == {1: "normal", 2: "warning", 3: "incident"}


def test_latest_by_key_keeps_newest_with_tiebreak(spark):
    import datetime as dt

    from cloudtrace_exporter_spark.operators import normalize as norm_ops

    t = dt.datetime(2024, 1, 1, 12)
    df = spark.createDataFrame(
        [
            (1, 7, t, "a", 1.0),
            (2, 7, dt.datetime(2024, 1, 2), "a", 2.0),  # newer ts wins
            (3, 8, t, "a", 3.0),
            (4, 8, t, "a", 4.0),  # same ts → higher event_id wins
        ],
        ["event_id", "user_id", "ts", "event_type", "value"],
    )
    got = {
        r["user_id"]: r["event_id"]
        for r in norm_ops.latest_by_key(df, key_cols=["user_id", "event_type"]).collect()
    }
    assert got == {7: 2, 8: 4}
