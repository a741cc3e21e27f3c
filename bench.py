"""Benchmark runner — the driver executes this per round (BENCH_r{N}.json).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.

Output contract (round 10 — the r8/r9 artifacts were ``parsed: null``
because the single output line outgrew the driver's 2000-char stdout
capture): the final stdout line is a COMPACT JSON object (headline
value, sf, n_queries, the two calibration scalars, cpu_total — well
under 2000 chars), and the full per-query detail (walls, [min,max]
bands, per-query JVM CPU, load averages) is written to a committed
``BENCH_DETAIL_r{N}.json`` at the repo root, named in the compact
line's ``detail`` field.

``bands`` (round 8, now in the detail file) records each query's
[min, max] over the 3 timed attempts; a cross-round move counts as a
regression only when the new best exceeds the prior round's band max
by >20%.

Round 9 made the artifact self-defending against driver-box load
(BENCH_r08 printed a 1.27× phantom that a quiet-box rerun showed was
noise): ``queries_cpu``/``cpu_total`` record the driver JVM's CPU
seconds per query (box load inflates wall, not CPU), ``calibration``
times a fixed repo-independent codegen workload whose quiet-box band
lives in BASELINE.md (with the normalize rule), and
``load_avg_start``/``load_avg_end``/``ncpus`` snapshot the box.

Each query is forced with a count() (no driver-side collect of data);
a warm-up pass on sf's smallest table primes the JVM/codegen so the
numbers measure the plans, not session startup.

Round 12 (r11 verdict order #1 — "un-game the bench accounting"): the
detail file additionally carries ``queries_build``/``queries_build_cpu``
— wall + JVM CPU of ONE COLD invocation per query, taken with every
session-frozen artifact memo and the Spark CacheManager cleared
(``__spark_entry__.clear_session_caches``) — so any query whose warm
number rides a session cache (semdedup centroids, contrastive pool,
BM25 stats, LSH/MinHash/PQ/IVF indexes, cached token frames) shows its
full build+serve cost next to the steady-state serve cost. The warm
best-of-3 methodology and the compact line are unchanged (the compact
line gains a ``build_total`` scalar).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_join_star",
    "q_agg_by_status",
    "q_normalize_events",
    "q_dedup_events",
    "q_window_rank",
    "q_topk_resources",
    "q_rollup_region_nation",
    "q_asof_join",
    "q_count_per_window",
    "q_semi_join",
    # heavy-operator trend line (round-2 verdict #10): relational scan-agg,
    # MinHash-LSH dedup, and exact cosine top-k
    "q_pricing_summary",
    "q_minhash_dedup",
    "q_cosine_topk",
    # ANN scale paths (round-3 verdict #7): the bucketed equi-join variants
    # that actually run at 100 TB, benched next to the exact baseline
    "q_lsh_topk",
    "q_ivf_topk",
    # oracle-backed twins of the approximate scale paths (round-3 verdict
    # #6): the portable-hash variants that carry the green CORRECTNESS
    # rows should carry the perf trend too
    "q_lsh_topk_verified",
    "q_minhash_dedup_verified",
    # text-pipeline heavy scan-agg trend line (round 3): DSIR hashed-bigram
    # importance weighting — two corpus passes + broadcast profiles
    "q_dsir_importance",
    # round-4 retrieval + tokenizer trend lines: BM25 posting-slice scoring
    # and the 6-round iterative BPE trainer (vocab-sized rounds, scalar
    # collects)
    "q_bm25_topk",
    "q_bpe_merges",
    # round-5 trend lines: the two plans tuned this round (SMJ removed /
    # bucket-owner rewrite) so the wins stay visible in the history
    "q_contrastive_pairs",
    "q_fuzzy_sorted_neighborhood",
    # round-6 trend lines: the de-quadratized containment path
    # (prefix-filtered blocking) and the LSH threshold-sweep planner
    "q_containment_pairs",
    "q_dedup_threshold_sweep",
    # round-6 second wave: mixture planning, time-series fold, sketch
    # join estimation, corpus saturation — all sub-second flat-at-10x
    "q_water_fill_caps",
    "q_holt_forecast",
    "q_kmv_join_estimate",
    "q_vocab_growth",
    # round-6 third wave: the exact edit-distance join (the fuzzy family's
    # ground truth — candidate volume is the scale risk to watch), the
    # mutual-NN verify tail, and the integer-exact KS test
    "q_passjoin_exact",
    "q_mutual_nn",
    "q_ks_test",
    # round-7 trend lines: the injected-pair DBSCAN posture (the plan the
    # weak mark was cleared with), the distributed prefix-sum packing
    # primitive, the strict funnel's one-exchange window chain, and the
    # triangle join over the shared banded index
    "q_dbscan_lsh",
    "q_pack_layout",
    "q_funnel_strict",
    "q_triangle_degree",
    # round-9 trend lines: the iterative-graph path after the CC
    # one-join-per-round rewrite (TextRank = 10 pagerank rounds over the
    # word graph) and the two-phase-ranked corpus spectrum fit
    "q_textrank_keywords",
    "q_zipf_fit",
    # round-10 trend lines: SemDeDup (integer k-means + same-cell ε-pairs
    # + CC collapse — the new two-tier CC path under a headline query)
    # and the true-codepoint PassJoin (the fuzzy family's real-user mode)
    "q_semdedup",
    "q_passjoin_codepoint",
    # round-11 trend line: Bloom membership dedup (the bounded-memory
    # incremental-dedup mechanism — filter O(m/32) rows independent of
    # corpus size, build + broadcast probe + exact-verdict join)
    "q_bloom_dedup",
]


def _jvm_cpu_seconds(spark) -> float:
    """Cumulative CPU seconds (utime+stime) of the driver JVM process —
    in local mode every executor is a thread inside that one JVM, so
    per-query deltas of this counter are the query's true compute cost.
    Box load inflates WALL but leaves CPU nearly flat, so the cpu fields
    let a reader adjudicate a noisy BENCH_rN.json without a rerun
    (round-8 verdict item #2: BENCH_r08 showed 1.27× wall from box load
    alone). Returns 0.0 if /proc introspection fails (non-Linux)."""
    try:
        pid = spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        # fields after comm: utime is index 11, stime 12 (0-based here)
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return 0.0


def _calibration(spark) -> dict:
    """Fixed, repo-independent JVM workload (xxhash64 fold over a range —
    pure whole-stage-codegen compute, no I/O, no shuffle): its wall time
    on a quiet box is a constant of the hardware, so a loaded driver box
    is detectable from the artifact itself. BASELINE.md records the
    quiet-box reference band and the normalization rule."""
    n = 4_000_000_000

    def _fresh(salt: int):
        # a FRESH DataFrame per attempt: re-collecting the same DataFrame
        # object reuses its RDD's shuffle map outputs (the expensive
        # partial-sum stage shows as SKIPPED), which would time only the
        # one-row final stage. The salt also keys the plan distinctly.
        return spark.range(salt, salt + n, 1, 32).selectExpr(
            # modulo keeps the fold overflow-safe under ANSI mode
            "sum(xxhash64(id) % 1048576) AS h"
        )

    _fresh(99).collect()  # warm: codegen + JIT
    walls = []
    cpus = []
    for i in range(3):
        c0 = _jvm_cpu_seconds(spark)
        t0 = time.time()
        _fresh(i).collect()
        walls.append(time.time() - t0)
        cpus.append(_jvm_cpu_seconds(spark) - c0)
    return {
        "calib_wall_sec": round(min(walls), 3),
        "calib_wall_max": round(max(walls), 3),
        "calib_cpu_sec": round(cpus[walls.index(min(walls))], 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from cloudtrace_exporter_spark.session import get_spark

    spark = get_spark("bench")
    load_start = os.getloadavg()[0] if hasattr(os, "getloadavg") else None
    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]
    # warm-up (round-5 driver-run lesson: q_minhash_dedup/q_topk_resources/
    # q_bpe_merges regressed in the driver's single pass while best-of-3 at
    # HEAD was flat — cold parquet footers + JIT on the first touch of a
    # table set dominated): prime EVERY table the headline set reads, not
    # just the smallest query's, so the measured runs see warm scans
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        entry_mod.load_table(spark, sf_dir, t).count()
    qs[names[0]](spark, sf_dir).count()
    # calibration BEFORE the query loop as well as after: a transient
    # load/steal burst mid-run evades a single sample (observed on a
    # steal-prone box: calibration quiet at start, one query 3× its band
    # minutes later). Two samples bracket the measured window.
    calib_start = _calibration(spark)

    timings: dict[str, float] = {}
    bands: dict[str, list[float]] = {}
    cpu_timings: dict[str, float] = {}
    cpu_bands: dict[str, list[float]] = {}
    build_timings: dict[str, float] = {}
    build_cpu: dict[str, float] = {}
    for name in names:
        # round-12 build/serve split (r11 verdict order #1): the warm
        # passes below populate the session-frozen artifact memos (index
        # caches, k-means centroids, BM25 stats, cached token frames), so
        # the timed best-of-3 measures SERVE cost only. To keep that
        # number honest, time ONE cold invocation first — every session
        # memo and CacheManager entry cleared — and report it as
        # queries_build/queries_build_cpu in the detail file. The compact
        # line and the warm per-query methodology are unchanged.
        entry_mod.clear_session_caches(spark)
        c0 = _jvm_cpu_seconds(spark)
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        build_timings[name] = round(time.time() - t0, 3)
        build_cpu[name] = round(_jvm_cpu_seconds(spark) - c0, 3)
        # one more unmeasured warm pass (the cold pass above already paid
        # index .cache() builds, codegen compilation, and shuffle-file
        # creation; this gives the JIT one steady-state execution of the
        # generated kernels before the timed window — r7: q_agg_by_status
        # converges 0.50 → 0.24 s over repeated runs in a quiet session —
        # a C2-warmth artifact, not a plan change; one warm pass left the
        # timed best-of-3 mid-slope)
        qs[name](spark, sf_dir).count()
        samples: list[float] = []
        cpu_samples: list[float] = []
        for _ in range(3):  # best-of-3: absorbs GC/JIT/index-build noise (a
            # single repeat proved insufficient — one observed run had BOTH
            # attempts of one query land in a ~4 s GC/JIT stall while the
            # steady-state plan is sub-second; three attempts bound that)
            c0 = _jvm_cpu_seconds(spark)
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            samples.append(time.time() - t0)
            cpu_samples.append(_jvm_cpu_seconds(spark) - c0)
        timings[name] = round(min(samples), 3)
        bands[name] = [round(min(samples), 3), round(max(samples), 3)]
        # CPU of the fastest attempt: wall inflates under box load, JVM
        # CPU stays ~flat — the pair adjudicates noisy driver boxes
        cpu_timings[name] = round(cpu_samples[samples.index(min(samples))], 3)
        # round-11: committed CPU bands — [min, max] JVM CPU over ALL
        # timed attempts, so cross-round CPU moves are adjudicable by the
        # same band rule as wall (BASELINE.md: CPU is the load-immune
        # signal; new_cpu_min > 1.3 * prior_cpu_band_max = regression)
        cpu_bands[name] = [round(min(cpu_samples), 3), round(max(cpu_samples), 3)]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    calib_end = _calibration(spark)
    # Round number for the detail file: explicit override first
    # ($SPARK_GRAFT_ROUND or argv[1]), else inferred from the driver's
    # prior artifacts. The override exists because the inference assumes
    # "the driver hasn't written this round's BENCH_r{N}.json yet" — a
    # quiet-box recalibration RERUN after the driver ran would otherwise
    # write the detail file under NEXT round's name, desyncing the compact
    # line's `detail` pointer (advisor, round 10).
    repo = os.path.dirname(os.path.abspath(__file__))
    import re

    round_no = os.environ.get("SPARK_GRAFT_ROUND") or (
        sys.argv[1] if len(sys.argv) > 1 and sys.argv[1].isdigit() else None
    )
    # round-12 (r11 verdict order #2): a non-default-core run (the
    # driver's scaling pass, e.g. local[8] on a 32-core box) gets a
    # ``_c{cpus}``-suffixed detail name so it can never clobber the main
    # run's artifact — r11's c8 run wrote BENCH_DETAIL_r12.json because
    # the round inference assumes "this round's BENCH_r{N}.json doesn't
    # exist yet". For the same reason a suffixed (secondary) run infers
    # round = max(existing) — its main-run artifact is already on disk.
    from cloudtrace_exporter_spark.session import DEFAULT_CPUS

    cpus_suffix = "" if int(DEFAULT_CPUS) == os.cpu_count() else f"_c{DEFAULT_CPUS}"
    if round_no is None:
        rounds = [
            int(m.group(1))
            for f in os.listdir(repo)
            if (m := re.match(r"BENCH_r(\d+)\.json$", f))
        ]
        if not rounds:
            round_no = 1
        elif cpus_suffix:
            round_no = max(rounds)
        else:
            round_no = max(rounds) + 1
    detail_name = f"BENCH_DETAIL_r{int(round_no):02d}{cpus_suffix}.json"
    detail = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # round-8 variance protocol: per-query [min, max] of the 3 timed
        # attempts in THIS run. Cross-round comparisons should call a move a
        # regression only when the new best lands >20% ABOVE the old max —
        # sub-second box drift inside the band is noise by definition (the
        # q_agg_by_status chase, rounds 5-7, is the motivating case).
        "bands": bands,
        "regression_rule": "new_best > 1.2 * prior_band_max",
        # round-9 box-noise protocol (r8 verdict item #2): per-query JVM
        # CPU of the best attempt, a fixed repo-independent calibration
        # workload, and load averages. Normalize rule in BASELINE.md:
        # when calib_wall_sec exceeds its quiet-box band, scale wall
        # totals by (calib_ref / calib_wall_sec) before comparing, and
        # trust queries_cpu for per-query adjudication.
        "queries_cpu": cpu_timings,
        # round-11 (r10 verdict order #2): committed per-query CPU bands —
        # [min, max] JVM CPU across the 3 timed attempts. Regression rule
        # (BASELINE.md): a query's CPU regressed only if the new round's
        # cpu-of-best-wall exceeds the prior round's cpu band max by >30%
        # AND the new cpu band doesn't overlap the old one. Wall bands
        # adjudicate latency; CPU bands adjudicate load-immune cost.
        "queries_cpu_bands": cpu_bands,
        # round-12 build/serve split (r11 verdict order #1): wall + JVM
        # CPU of ONE cold invocation per query — session memos and the
        # CacheManager cleared first — so queries whose warm number rides
        # a session-frozen artifact (semdedup centroids, BM25 stats,
        # LSH/PQ/IVF indexes, cached token frames) show their full build
        # cost next to the steady-state serve cost.
        "queries_build": build_timings,
        "queries_build_cpu": build_cpu,
        "build_total": round(sum(build_timings.values()), 3),
        "cpu_total": round(sum(cpu_timings.values()), 3),
        "calibration_start": calib_start,
        "calibration": calib_end,
        "load_avg_start": load_start,
        "load_avg_end": os.getloadavg()[0] if hasattr(os, "getloadavg") else None,
        "ncpus": os.cpu_count(),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    with open(os.path.join(repo, detail_name), "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    # COMPACT final line (round 10): must fit the driver's 2000-char
    # stdout-tail capture — BENCH_r08/r09 were "parsed: null" because the
    # full detail overflowed it. Per-query data lives in `detail`.
    out = {
        "metric": "headline_queries_total_wall",
        "value": detail["value"],
        "unit": "sec",
        "sf": detail["sf"],
        "n_queries": len(timings),
        "build_total": detail["build_total"],
        "cpu_total": detail["cpu_total"],
        "calib_start": calib_start["calib_wall_sec"],
        "calib_end": calib_end["calib_wall_sec"],
        "detail": detail_name,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
