"""End-to-end STREAMING scale probe (SCALE.md evidence, round 6).

One continuous pipeline — the full reference ingest path re-expressed in
Structured Streaming — run at 1x and 10x the sf0.1 events corpus:

    CtsPagesDataSource (custom micro-batch source, page-count offsets)
      → normalize_traces (A5–A11 trace→CloudEvent projection)
      → dedup_within_watermark (A4+A14 effectively-once)
      → foreachBatch cypher-script sink (batched UNWIND MERGE delivery)

~1% duplicate traces are injected so the watermark dedup actually drops
rows (delivered < input is asserted, not assumed). Per micro-batch the
probe logs input rows, trigger wall, and the dedup state store's row
count + memory — the numbers that tell you whether state stays
O(keys-in-flight) as the corpus scales. Paste the output into SCALE.md.

Scale honesty note: the Simple stream reader materializes each batch
driver-side into the checkpoint WAL (documented in cts_datasource) — the
right fidelity trade for the 50-trace-page API contract, and the probe
measures it as-is. A 100 TB deployment lands pages on object storage and
uses the parquet file source (pipeline.read_event_stream), whose batches
never pass through the driver.

Usage:
    python tools/streaming_probe.py [sf_dir] [--scales 1,10]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def build_pages(spark, sf_dir: str, pages_dir: str, copies: int, page_size: int) -> int:
    """Land `copies`x the events corpus as paged ListTracesResponse JSON,
    with ~1% in-corpus duplicate traces (same trace_id re-landed on a
    later page — the overlap-window redelivery the reference tolerates
    via MERGE and we drop via watermark state)."""
    from cloudtrace_exporter_spark.operators import normalize
    from cloudtrace_exporter_spark.sources.tables import load_table

    ev1 = load_table(spark, sf_dir, "events")  # explicit schema: ts is TIMESTAMP
    n = ev1.count()
    parts = []
    for i in range(copies):
        parts.append(
            ev1.select(
                (F.col("event_id") + i * n).alias("event_id"),
                *[c for c in ev1.columns if c != "event_id"],
            )
        )
    ev = parts[0]
    for p in parts[1:]:
        ev = ev.unionByName(p)
    dups = ev.filter(F.pmod("event_id", F.lit(100)) == 0)  # ~1% redelivered
    traces = normalize.events_as_traces(ev.unionByName(dups))
    from cloudtrace_exporter_spark.sources import cts_pages

    cts_pages.write_trace_pages(traces, pages_dir, page_size=page_size)
    return ev.count() + dups.count()


def run_pipeline(spark, pages_dir: str, work: str, max_pages: int):
    from cloudtrace_exporter_spark.operators import normalize
    from cloudtrace_exporter_spark.sources.cts_datasource import CtsPagesDataSource
    from cloudtrace_exporter_spark.streaming.cypher_sink import foreach_batch_cypher_upsert
    from cloudtrace_exporter_spark.streaming.pipeline import dedup_within_watermark
    from cloudtrace_exporter_spark.streaming.sinks import DeliveryCounters

    try:
        spark.dataSource.register(CtsPagesDataSource)
    except Exception:
        pass  # already registered in this session

    stream = (
        spark.readStream.format("cts_pages")
        .option("path", pages_dir)
        .option("max_pages_per_batch", max_pages)
        .load()
    )
    normalized = normalize.normalize_traces(
        stream,
        source="https://cts.example", region="eu-de", domain="d1", tenant="p1",
    )
    # generous delay: the page landing order is trace_id-sorted, not
    # event-time-sorted, so a tight watermark would misclassify genuinely
    # new rows as late; state is then exactly keys-in-flight (= distinct
    # actions), which is what the per-batch state rows below report
    deduped = dedup_within_watermark(normalized, key="event_id", ts_col="event_time", delay="365 days")
    counters = DeliveryCounters()
    sink = foreach_batch_cypher_upsert(os.path.join(work, "cypher"), counters=counters)
    ckpt = os.path.join(work, "ckpt")
    batches = []
    t0 = time.time()
    # Python micro-batch sources don't implement Trigger.AvailableNow
    # (Spark falls back to a SINGLE batch and strands the backlog), so
    # drain it as a loop of Trigger.Once runs over a shared checkpoint —
    # each run consumes exactly one ≤max_pages micro-batch, which is also
    # what gives us clean per-batch telemetry
    while True:
        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(once=True)
            .start()
        )
        q.awaitTermination()
        p = q.lastProgress
        if p is None:
            break
        so = (p.get("stateOperators") or [{}])[0]
        rows_in = int(p.get("numInputRows") or 0)
        batches.append(
            {
                "batch": p.get("batchId"),
                "rows_in": rows_in,
                "trigger_ms": int((p.get("durationMs") or {}).get("triggerExecution") or 0),
                "state_rows": int(so.get("numRowsTotal") or 0),
                "state_mb": round(int(so.get("memoryUsedBytes") or 0) / 1e6, 1),
            }
        )
        if rows_in == 0:
            break
    wall = time.time() - t0
    return wall, counters, batches


def build_trace_parquet(spark, sf_dir: str, pages_dir: str, copies: int, n_files: int) -> int:
    """Land `copies`x the events corpus (+ the same ~1% duplicate traces
    as build_pages) as `n_files` parquet trace pages — the object-storage
    landing zone the file-source path ingests."""
    from cloudtrace_exporter_spark.operators import normalize
    from cloudtrace_exporter_spark.sources.tables import load_table

    ev1 = load_table(spark, sf_dir, "events")
    n = ev1.count()
    parts = []
    for i in range(copies):
        parts.append(
            ev1.select(
                (F.col("event_id") + i * n).alias("event_id"),
                *[c for c in ev1.columns if c != "event_id"],
            )
        )
    ev = parts[0]
    for p in parts[1:]:
        ev = ev.unionByName(p)
    dups = ev.filter(F.pmod("event_id", F.lit(100)) == 0)
    traces = normalize.events_as_traces(ev.unionByName(dups))
    traces.repartition(n_files).write.mode("overwrite").parquet(pages_dir)
    return ev.count() + dups.count()


def run_pipeline_file_source(spark, pages_dir: str, work: str, files_per_trigger: int):
    """The NON-driver-routed ingest line: pipeline.read_trace_stream
    (parquet file source — rows flow executor-side only) through the
    identical normalize → watermark-dedup → cypher-sink chain, drained
    with Trigger.AvailableNow (the file source implements it natively;
    per-batch telemetry comes from recentProgress)."""
    from cloudtrace_exporter_spark.operators import normalize
    from cloudtrace_exporter_spark.streaming.cypher_sink import foreach_batch_cypher_upsert
    from cloudtrace_exporter_spark.streaming.pipeline import (
        dedup_within_watermark,
        read_trace_stream,
    )
    from cloudtrace_exporter_spark.streaming.sinks import DeliveryCounters

    stream = read_trace_stream(spark, pages_dir, max_files_per_trigger=files_per_trigger)
    normalized = normalize.normalize_traces(
        stream,
        source="https://cts.example", region="eu-de", domain="d1", tenant="p1",
    )
    deduped = dedup_within_watermark(
        normalized, key="event_id", ts_col="event_time", delay="365 days"
    )
    counters = DeliveryCounters()
    sink = foreach_batch_cypher_upsert(os.path.join(work, "cypher"), counters=counters)
    ckpt = os.path.join(work, "ckpt")
    # keep every batch's telemetry at 10x (110 batches > the default 100)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    t0 = time.time()
    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = []
    for p in q.recentProgress:
        rows_in = int(p.get("numInputRows") or 0)
        if rows_in == 0:
            continue
        so = (p.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "batch": p.get("batchId"),
                "rows_in": rows_in,
                "trigger_ms": int((p.get("durationMs") or {}).get("triggerExecution") or 0),
                "state_rows": int(so.get("numRowsTotal") or 0),
                "state_mb": round(int(so.get("memoryUsedBytes") or 0) / 1e6, 1),
            }
        )
    wall = time.time() - t0
    return wall, counters, batches


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = [1, 10]
    if "--scales" in sys.argv:
        scales = [int(x) for x in sys.argv[sys.argv.index("--scales") + 1].split(",")]
    source = "simple"
    if "--source" in sys.argv:
        source = sys.argv[sys.argv.index("--source") + 1]
    from cloudtrace_exporter_spark.session import get_spark

    spark = get_spark("streaming_probe")
    if source == "file":
        for copies in scales:
            root = tempfile.mkdtemp(prefix=f"stream_probe_file_{copies}x_")
            pages = os.path.join(root, "pages")
            try:
                # constant rows per batch across scales: the file count
                # grows with copies (11 batches at 1x, 110 at 10x), so
                # "per-batch wall stays flat" is tested, not assumed
                landed = build_trace_parquet(spark, sf_dir, pages, copies, n_files=11 * copies)
                wall, counters, batches = run_pipeline_file_source(
                    spark, pages, root, files_per_trigger=1
                )
                for b in batches:
                    print(
                        f"  {copies}x batch {b['batch']:>3}: in={b['rows_in']:>8} "
                        f"trigger={b['trigger_ms']:>7} ms state_rows={b['state_rows']:>8} "
                        f"state={b['state_mb']:.1f} MB"
                    )
                walls = [b["trigger_ms"] for b in batches]
                dropped = landed - counters.delivered
                print(
                    f"{copies}x FILE-SOURCE TOTAL: landed={landed} "
                    f"delivered={counters.delivered} dup_dropped={dropped} "
                    f"failed={counters.failed} batches={len(batches)} "
                    f"stream_wall={wall:.1f} s "
                    f"per_batch_ms min/med/max={min(walls)}/{sorted(walls)[len(walls)//2]}/{max(walls)}"
                )
                assert counters.failed == 0
                assert 0 < dropped, "dedup should have dropped the injected duplicates"
            finally:
                shutil.rmtree(root, ignore_errors=True)
        return
    for copies in scales:
        root = tempfile.mkdtemp(prefix=f"stream_probe_{copies}x_")
        pages = os.path.join(root, "pages")
        try:
            landed = build_pages(spark, sf_dir, pages, copies, page_size=1000)
            t0 = time.time()
            wall, counters, batches = run_pipeline(spark, pages, root, max_pages=100)
            for b in batches:
                print(
                    f"  {copies}x batch {b['batch']:>3}: in={b['rows_in']:>8} "
                    f"trigger={b['trigger_ms']:>7} ms state_rows={b['state_rows']:>8} "
                    f"state={b['state_mb']:.1f} MB"
                )
            dropped = landed - counters.delivered
            print(
                f"{copies}x TOTAL: landed={landed} delivered={counters.delivered} "
                f"dup_dropped={dropped} failed={counters.failed} "
                f"batches={counters.batches} stream_wall={wall:.1f} s"
            )
            assert counters.failed == 0
            assert 0 < dropped, "dedup should have dropped the injected duplicates"
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
