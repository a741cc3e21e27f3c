"""End-to-end pipeline assembly tests (SURVEY §3.1/§3.2 wiring).

Drive the full exporter-equivalent: paged ListTracesResponse landing dir
→ normalize (+overrides) → dedup → graph store + batched Cypher script,
in both CTS_STREAMS modes, with the reference's CTS_X_PNP forward gate
and the empty-input semantic fix (empty batch is normal, not an error).
"""

from __future__ import annotations

import os

import pytest

from cloudtrace_exporter_spark import runner
from cloudtrace_exporter_spark.config import EngineConfig
from cloudtrace_exporter_spark.operators import normalize
from cloudtrace_exporter_spark.sources import cts_pages
from cloudtrace_exporter_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
CTX = runner.AuthContext(
    source="https://cts.example", region="eu-de", domain="d1", tenant="p1"
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pages"))
    traces = normalize.events_as_traces(load_table(spark, SF, "events"))
    cts_pages.write_trace_pages(traces, out)
    return out


def test_batch_mode_delivers_graph_and_cypher(spark, pages_dir, tmp_path):
    cfg = EngineConfig(streams=False, forward=True, overrides={"priority": "high"})
    events, counters = runner.run_pipeline(
        spark, cfg, CTX, pages_dir, graph_dir=str(tmp_path / "out")
    )
    n = events.count()
    assert n == 1000
    assert events.filter(events.priority == "high").count() == n  # K_CE_OVERRIDES applied
    assert counters["graph"].delivered == n
    assert counters["cypher"].delivered == n
    assert counters["graph"].failed == counters["cypher"].failed == 0
    actions = spark.read.parquet(str(tmp_path / "out" / "graph" / "nodes" / "actions"))
    assert actions.count() == n
    assert os.path.exists(str(tmp_path / "out" / "cypher" / "statement.cypher"))


def test_stream_mode_matches_batch(spark, pages_dir, tmp_path):
    cfg = EngineConfig(streams=True, forward=True)
    _, counters = runner.run_pipeline(
        spark, cfg, CTX, pages_dir,
        graph_dir=str(tmp_path / "out"), checkpoint=str(tmp_path / "ckpt"),
    )
    assert counters["graph"].delivered == 1000
    actions = spark.read.parquet(str(tmp_path / "out" / "graph" / "nodes" / "actions"))
    assert actions.select("id").distinct().count() == 1000


def test_forward_gate_off_is_transform_only(spark, pages_dir):
    # CTS_X_PNP=false (the reference's actual default, main.go:26)
    cfg = EngineConfig(streams=False, forward=False)
    events, counters = runner.run_pipeline(spark, cfg, CTX, pages_dir)
    assert counters is None
    assert events.count() == 1000


def test_empty_input_is_normal_not_error(spark, tmp_path):
    # deliberate fix of adapter.go:112-114 ("no traces collected" error)
    empty = str(tmp_path / "empty_pages")
    os.makedirs(empty)
    cfg = EngineConfig(streams=False, forward=True)
    events, counters = runner.run_pipeline(
        spark, cfg, CTX, empty, graph_dir=str(tmp_path / "out")
    )
    assert events.count() == 0
    assert counters["graph"].failed == 0


def test_lifecycle_end_to_end_with_restart(spark, pages_dir, tmp_path):
    """Round-8 item #4: the composed lifecycle — ingest → normalize →
    graph → near-dup dedup → curation mixture → packed layout — as ONE
    resumable run with per-stage row accounting. Covers: (a) stage
    monotonicity (each funnel stage can only shrink its input), (b) the
    layout's prefix-sum invariant, (c) full-skip resume, (d) selective
    recompute after deleting one stage directory (checkpoint/restart)."""
    import shutil

    from pyspark.sql import functions as F

    from cloudtrace_exporter_spark import lifecycle

    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "life")
    man = lifecycle.run_lifecycle(
        spark, pages_dir=pages_dir, docs=docs, out_dir=out, ctx=CTX
    )["stages"]
    # (a) row accounting across the funnel
    assert man["ingest"]["rows"] == 1000
    assert 0 < man["events"]["rows"] <= man["ingest"]["rows"]
    assert man["graph"]["rows"] > man["events"]["rows"]  # ≥1 node+edges per event
    n_docs = docs.count()
    assert 0 < man["dedup"]["rows"] <= n_docs
    assert 0 < man["curated"]["rows"] <= man["dedup"]["rows"]
    assert man["layout"]["rows"] == man["curated"]["rows"]
    assert all(not s["skipped"] for s in man.values())
    # (b) packing invariant: offsets are an exclusive prefix sum — the
    # last document's offset + its tokens equals the total token count
    layout = spark.read.parquet(f"{out}/layout")
    agg = layout.agg(
        F.sum("n_tokens").alias("tot"),
        F.max(F.col("tok_offset") + F.col("n_tokens")).alias("hi"),
    ).collect()[0]
    assert agg["tot"] == agg["hi"]
    # graph store is idempotent-by-key: rerunning the stage would write
    # the same distinct (kind, label, element) set
    g = spark.read.parquet(f"{out}/graph")
    assert g.count() == g.dropDuplicates(["kind", "label", "element"]).count()
    # (c) resume: everything skipped, counts identical
    man2 = lifecycle.run_lifecycle(
        spark, pages_dir=pages_dir, docs=docs, out_dir=out, ctx=CTX
    )["stages"]
    assert all(s["skipped"] for s in man2.values())
    assert {k: s["rows"] for k, s in man2.items()} == {
        k: s["rows"] for k, s in man.items()
    }
    # (d) selective restart: drop ONE stage dir → only it recomputes
    shutil.rmtree(f"{out}/layout")
    man3 = lifecycle.run_lifecycle(
        spark, pages_dir=pages_dir, docs=docs, out_dir=out, ctx=CTX
    )["stages"]
    assert man3["layout"]["skipped"] is False
    assert man3["layout"]["rows"] == man["layout"]["rows"]
    assert all(s["skipped"] for k, s in man3.items() if k != "layout")
