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
