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
        cm = so.get("customMetrics") or {}
        batches.append(
            {
                "batch": p.get("batchId"),
                "rows_in": rows_in,
                "trigger_ms": int((p.get("durationMs") or {}).get("triggerExecution") or 0),
                "state_rows": int(so.get("numRowsTotal") or 0),
                # HDFS provider: memoryUsedBytes IS the heap bill.
                # RocksDB provider: memoryUsedBytes is native block-cache/
                # memtable memory and the durable state sits in local SST
                # files — report both so the heap-vs-disk split is explicit.
                "state_mb": round(int(so.get("memoryUsedBytes") or 0) / 1e6, 1),
                "sst_mb": round(int(cm.get("rocksdbSstFileSize") or 0) / 1e6, 1),
            }
        )
    wall = time.time() - t0
    return wall, counters, batches


def probe_sketch_state(spark, scales=(1, 10)) -> None:
    """Round-9 probe: the three STATE-STORE SKETCH operators (KMV
    distinct, Misra-Gries heavy hitters, histogram quantiles) under a
    growing-cardinality stream — 1M and 10M events, 10 mtime-ordered
    files (one micro-batch each, maxFilesPerTrigger=1), the distinct-key
    universe growing 10x across batches while per-group state stays
    O(k)/O(capacity)/O(bins). Assertions (a probe that merely finishes
    cannot pass):

    - final KMV sketch per group == the order-free Python model over the
      full corpus (k smallest md5 hashes of the distinct keys);
    - final Misra-Gries counters == a Python replay of the SAME batch
      sequence (MG is batching-dependent; file order is pinned);
    - final histogram quantiles == the order-free Python histogram;
    - per-batch trigger wall stays FLAT: the max batch wall is bounded
      by 3x the median (state growth would show as a rising tail).
    """
    import hashlib
    import math

    from pyspark.sql import types as T

    from cloudtrace_exporter_spark.schemas import EVENTS_SCHEMA
    from cloudtrace_exporter_spark.streaming.pipeline import (
        stateful_heavy_hitters,
        stateful_histogram_quantiles,
        stateful_kmv_distinct,
    )

    types = ["a", "b", "c", "d", "e"]
    for copies in scales:
        n = 1_000_000 * copies
        n_files = 10
        per = n // n_files
        root = tempfile.mkdtemp(prefix=f"sketch_state_{copies}x_")
        src = os.path.join(root, "events")
        os.makedirs(src)
        # deterministic synthesized events: user pool grows with the
        # batch index (new keys keep arriving); values are multiples of
        # 0.25 in [-1000, 1000] (80 histogram bins at width 25); one
        # hot user (id 7) owns ~30% of rows (MG must surface it)
        base = spark.range(per)
        for i in range(n_files):
            df = base.select(
                (F.col("id") + i * per).alias("event_id"),
                F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("ts"),
                F.when(F.pmod(F.xxhash64("id", F.lit(i)), F.lit(10)) < 3, F.lit(7))
                .otherwise(
                    F.pmod(F.xxhash64("id", F.lit(i), F.lit(1)), F.lit(100_000 * (i + 1)))
                )
                .alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(t) for t in types]),
                    (F.pmod(F.xxhash64("id", F.lit(i), F.lit(2)), F.lit(5)) + 1).cast("int"),
                ).alias("event_type"),
                (F.pmod(F.xxhash64("id", F.lit(i), F.lit(3)), F.lit(8001)) / 4.0
                 - 1000.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
            p = os.path.join(src, f"f{i:02d}.parquet")
            df.coalesce(1).write.mode("overwrite").parquet(p + ".tmp")
            # flatten the part file so mtime order is per-batch-file
            part = next(
                f for f in os.listdir(p + ".tmp") if f.endswith(".parquet")
            )
            os.rename(os.path.join(p + ".tmp", part), p)
            shutil.rmtree(p + ".tmp")
            os.utime(p, (1_700_000_000 + i * 10,) * 2)

        def run(op, name, mode="update"):
            stream = (
                spark.readStream.schema(EVENTS_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            captured = []

            def sink(df, bid, captured=captured):
                captured.append((bid, df.collect()))

            t0 = time.time()
            q = (
                op(stream).writeStream.foreachBatch(sink)
                .outputMode(mode).trigger(availableNow=True).start()
            )
            q.awaitTermination()
            wall = time.time() - t0
            prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
            walls = sorted(p["batchDuration"] for p in prog)
            med, mx = walls[len(walls) // 2], walls[-1]
            state_rows = max(
                (so["numRowsTotal"] for p in prog for so in p["stateOperators"]),
                default=0,
            )
            print(
                f"  {copies}x {name}: wall={wall:5.1f} s batches={len(prog)} "
                f"per-batch med/max={med}/{mx} ms state_rows={state_rows}"
            )
            assert mx <= 3 * med + 2000, f"{name}: rising batch tail {walls}"
            assert state_rows <= 5, f"{name}: state rows exceed group count"
            final = {}
            for _, rows in sorted(captured):
                for r in rows:
                    final.setdefault(r.grp, [])
            # keep LAST emission(s) per group of the LAST batch they appear
            last = {}
            for bid, rows in sorted(captured):
                per_grp = {}
                for r in rows:
                    per_grp.setdefault(r.grp, []).append(r)
                last.update(per_grp)
            return last

        # Python models from the same deterministic generator
        rows_by_file = []
        for i in range(n_files):
            pdf = spark.read.parquet(os.path.join(src, f"f{i:02d}.parquet")).select(
                "user_id", "event_type", "value"
            ).collect()
            rows_by_file.append(pdf)

        last = run(lambda s: stateful_kmv_distinct(s, k=8), "kmv")
        for g in types:
            hs = {
                int(hashlib.md5(str(int(r.user_id)).encode()).hexdigest()[:12], 16)
                for chunk in rows_by_file for r in chunk if r.event_type == g
            }
            best = sorted(hs)[:8]
            want_n = len(best)
            want_est = float(want_n) if want_n < 8 else round(7 * float(1 << 48) / best[-1], 1)
            got = last[g][0]
            assert (got.n_sketch, got.kmv_estimate) == (want_n, want_est), g

        last = run(lambda s: stateful_heavy_hitters(s, capacity=8), "heavy_hitters")
        model = {}
        for chunk in rows_by_file:
            bc = {}
            for r in chunk:
                bc.setdefault(r.event_type, {})
                bc[r.event_type][r.user_id] = bc[r.event_type].get(r.user_id, 0) + 1
            for g, batch in bc.items():
                counters = model.setdefault(g, {})
                for bk in sorted(batch):
                    w = batch[bk]
                    if bk in counters:
                        counters[bk] += w
                        continue
                    if len(counters) < 8:
                        counters[bk] = w
                        continue
                    while w > 0:
                        m = min(counters.values())
                        d = min(w, m)
                        w -= d
                        counters = {k2: c2 - d for k2, c2 in counters.items() if c2 - d > 0}
                        if len(counters) < 8 and w > 0:
                            counters[bk] = w
                            w = 0
                model[g] = counters
        for g in types:
            got = {r.key: r.est_count for r in last[g]}
            assert got == model[g], f"MG {g}: {got} != {model[g]}"
            assert 7 in got, "the 30% hot user must survive every spill"

        last = run(
            lambda s: stateful_histogram_quantiles(s, bin_width=25.0), "histogram"
        )
        for g in types:
            hist = {}
            for chunk in rows_by_file:
                for r in chunk:
                    if r.event_type == g and r.value is not None:
                        b = math.floor(r.value / 25.0)
                        hist[b] = hist.get(b, 0) + 1
            items = sorted(hist.items())
            tot = sum(hist.values())
            want = []
            for qq in (0.5, 0.95):
                target = max(1, math.ceil(qq * tot))
                acc = 0
                for b, c in items:
                    acc += c
                    if acc >= target:
                        want.append(b * 25.0)
                        break
            got = last[g][0]
            assert (got.n, got.p50, got.p95) == (tot, want[0], want[1]), g
        shutil.rmtree(root, ignore_errors=True)
        print(f"{copies}x SKETCH-STATE: all three operators exact at {n:,} rows")


def probe_kill_resume(spark) -> None:
    """Round-9 probe: EXACTLY-ONCE across a kill -9 (A4+A14's strongest
    form). A child process runs the ingest pipeline — file source (one
    file per micro-batch), dedup_within_watermark, parquet sink with a
    checkpoint — and is SIGKILL'd after a few committed batches; the
    parent resumes the SAME checkpoint/output in-process to completion.
    Asserts from the sink's transaction log: every distinct input key
    present EXACTLY once — the killed batch neither lost rows nor
    double-wrote them, and duplicates straddling the kill still
    collapsed. (The graceful-stop variant lives in test_streaming; this
    one kills the JVM mid-flight, the failure a real cluster actually
    has.)"""
    import json
    import subprocess

    from pyspark.sql import functions as F

    n_files, per = 12, 50_000
    root = tempfile.mkdtemp(prefix="kill_resume_")
    src = os.path.join(root, "events")
    os.makedirs(src)
    base = spark.range(per)
    for i in range(n_files):
        ids = base.select((F.col("id") + i * per).alias("event_id"))
        # ~10% duplicates of the PREVIOUS file's keys (cross-batch and,
        # around the kill point, cross-PROCESS redelivery)
        if i:
            dup = spark.range(per // 10).select(
                (F.col("id") + (i - 1) * per).alias("event_id")
            )
            ids = ids.unionByName(dup)
        df = ids.select(
            "event_id",
            F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            F.lit("a").alias("event_type"),
            F.lit(0.25).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        p = os.path.join(src, f"f{i:02d}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(p + ".tmp")
        part = next(f for f in os.listdir(p + ".tmp") if f.endswith(".parquet"))
        os.rename(os.path.join(p + ".tmp", part), p)
        shutil.rmtree(p + ".tmp")
        os.utime(p, (1_700_000_000 + i * 10,) * 2)
    out = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")
    pipeline = f"""
import sys
sys.path.insert(0, "/root/repo")
from cloudtrace_exporter_spark.session import get_spark
from cloudtrace_exporter_spark.streaming import read_event_stream, dedup_within_watermark
spark = get_spark("kill_victim")
stream = read_event_stream(spark, {src!r}, max_files_per_trigger=1)
q = (dedup_within_watermark(stream, delay="3650 days").select("event_id")
     .writeStream.format("parquet").option("path", {out!r})
     .option("checkpointLocation", {ckpt!r})
     .trigger(availableNow=True).start())
q.awaitTermination()
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", pipeline],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    commits = os.path.join(ckpt, "commits")
    killed_at = None
    deadline = time.time() + 600
    while time.time() < deadline and proc.poll() is None:
        n_commits = len(
            [f for f in os.listdir(commits) if not f.startswith(".")]
        ) if os.path.isdir(commits) else 0
        if n_commits >= 3:
            proc.kill()
            killed_at = n_commits
            break
        time.sleep(0.2)
    proc.wait()
    assert killed_at is not None, "child drained the stream before the kill window"
    # resume the same checkpoint in-process
    from cloudtrace_exporter_spark.streaming import (
        dedup_within_watermark,
        read_event_stream,
    )

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        dedup_within_watermark(stream, delay="3650 days")
        .select("event_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # read through the sink's transaction log (orphan part files from
    # the killed batch are invisible to it)
    sunk = spark.read.parquet(out)
    n = sunk.count()
    nd = sunk.distinct().count()
    want = n_files * per
    print(
        f"KILL-RESUME: killed after {killed_at} commits; sink rows={n:,} "
        f"distinct={nd:,} expected={want:,}"
    )
    assert n == nd == want, "exactly-once violated across the kill"
    shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = [1, 10]
    if "--scales" in sys.argv:
        scales = [int(x) for x in sys.argv[sys.argv.index("--scales") + 1].split(",")]
    source = "simple"
    if "--source" in sys.argv:
        source = sys.argv[sys.argv.index("--source") + 1]
    state = "hdfs"
    if "--state" in sys.argv:
        state = sys.argv[sys.argv.index("--state") + 1]
    from cloudtrace_exporter_spark.session import get_spark, set_state_store

    # env (not just conf) so the kill-resume CHILD process inherits the
    # same state tier through its own get_spark
    os.environ["SPARK_GRAFT_STATE_STORE"] = state
    spark = get_spark("streaming_probe")
    set_state_store(spark, state)
    print(f"state store tier: {state}")
    if source == "sketch":
        probe_sketch_state(spark, scales=tuple(scales))
        return
    if source == "killresume":
        probe_kill_resume(spark)
        return
    if source == "file":
        for copies in scales:
            root = tempfile.mkdtemp(prefix=f"stream_probe_file_{copies}x_")
            pages = os.path.join(root, "pages")
            try:
                # constant rows per batch across scales: the file count
                # grows with copies (11 batches at 1x, 110 at 10x), so
                # "per-batch wall stays flat" is tested, not assumed
                landed = build_trace_parquet(spark, sf_dir, pages, copies, n_files=11 * copies)
                # --fpt N files per trigger (default 1: constant rows/batch,
                # batch count grows with scale; --fpt <copies> reproduces the
                # r7 11-batch rows-per-batch-grows shape for state probes)
                fpt = 1
                if "--fpt" in sys.argv:
                    fpt = int(sys.argv[sys.argv.index("--fpt") + 1])
                wall, counters, batches = run_pipeline_file_source(
                    spark, pages, root, files_per_trigger=fpt
                )
                for b in batches:
                    print(
                        f"  {copies}x batch {b['batch']:>3}: in={b['rows_in']:>8} "
                        f"trigger={b['trigger_ms']:>7} ms state_rows={b['state_rows']:>8} "
                        f"state={b['state_mb']:.1f} MB sst={b['sst_mb']:.1f} MB"
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
