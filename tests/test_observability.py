"""Observation-based pipeline accounting (batch analog of DeliveryCounters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudtrace_exporter_spark.observability import observe_counts, observed_funnel
from cloudtrace_exporter_spark.sources.tables import load_table


def test_observe_counts_fills_on_single_action(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    staged, obs = observe_counts(docs, "ingest", null_cols=["lang"])
    kept = staged.filter(F.col("n_chars") > 100)
    n_kept = kept.count()  # the ONLY action — fills the observation too
    m = obs.get
    assert m["n_rows"] == docs.count()
    assert m["n_null_lang"] == 0
    assert n_kept <= m["n_rows"]


def test_observed_funnel_counts_every_stage_in_one_pass(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out, obs = observed_funnel(
        docs,
        [
            ("ingest", lambda df: df),
            ("quality", lambda df: df.filter(F.col("n_chars") >= 50)),
            ("english", lambda df: df.filter(F.col("lang") == "en")),
        ],
    )
    final = out.count()
    counts = {name: o.get["n_rows"] for name, o in obs.items()}
    assert counts["ingest"] == docs.count()
    assert counts["ingest"] >= counts["quality"] >= counts["english"] == final
    assert counts["english"] > 0


def test_observe_stream_reports_per_batch_metrics(spark, tmp_path):
    from pyspark.sql import functions as FF

    from cloudtrace_exporter_spark.observability import observe_stream
    from cloudtrace_exporter_spark.sources.tables import load_table as lt
    from cloudtrace_exporter_spark.streaming.pipeline import read_event_stream

    staged = str(tmp_path / "staged")
    ev = lt(spark, "/root/testdata/sf0.001", "events").drop("ts_ns")
    ev.repartition(4).write.parquet(staged)

    stream = read_event_stream(spark, staged, max_files_per_trigger=2)
    observed = observe_stream(stream.select("event_id", "event_type"), "ingest")
    q = (
        observed.writeStream.format("memory")
        .queryName("t_obs_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    total = sum(
        p["observedMetrics"]["ingest"]["n_rows"]
        for p in (q.recentProgress or [])
        if p.get("observedMetrics", {}).get("ingest")
    )
    assert total == ev.count()
