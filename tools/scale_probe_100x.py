"""100x scaling probe (round 7, SCALE.md evidence) — one order of
magnitude past the 10x tier, for the three families whose failure modes
are provably scale-ONLY:

1. **global numbering / range partitioning** (`global_row_number`): the
   round-6 rank-duplication bug appeared at >=50k rows (sparse range-
   boundary sampling made two un-reused exchanges disagree). This probe
   runs 50k / 500k / 5M synthesized rows and ASSERTS the bijection
   (n distinct ranks, min 1, max n) at every tier — wall is reported,
   but the point is that the materialize-once fix holds when boundary
   sampling is 100x sparser still.

2. **banded MinHash-LSH** (`minhash_lsh_pairs`, portable family): bucket
   occupancy and posting caps are the scale risk — a skew blow-up shows
   as superlinear wall or a straggler. Synthesized corpus (12-token docs
   over a 50k-word vocabulary, ~1% planted near-dup partners) at 200k /
   2M docs (10x and 100x the sf0.1 documents table). Planted-pair
   recall is asserted, so the probe cannot pass by finding nothing.

3. **watermark dedup state** (`dedup_within_watermark` on the parquet
   file source): the 10x probe scaled BACKLOG DEPTH at constant batch
   size; this one scales ROWS PER BATCH (~90k -> ~900k) with 10M total
   events and 10M-key state (~2.8 GB) — the axis that breaks first on a
   real cluster, since state-store commit cost is per-batch.

Usage:
    python tools/scale_probe_100x.py [--family rank|lsh|stream|all]

Timings are warm-session best-of-1 (plans compiled by the smaller tier
first), matching the 10x probe's methodology. Paste into SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def probe_rank(spark) -> None:
    from cloudtrace_exporter_spark.operators.analytics import global_row_number

    for n in (50_000, 500_000, 5_000_000):
        # key is a full-range permutation-ish hash (forces real range
        # sampling work; monotone ids would make boundaries trivial)
        df = spark.range(n).select(
            (F.col("id") * 2654435761 % 4294967296).alias("k"), F.col("id").alias("i")
        )
        t0 = time.time()
        rn = global_row_number(df, ["k", "i"])
        stats = rn.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("rn").alias("d"),
            F.min("rn").alias("lo"),
            F.max("rn").alias("hi"),
        ).collect()[0]
        wall = time.time() - t0
        ok = stats["n"] == stats["d"] == stats["hi"] == n and stats["lo"] == 1
        print(f"global_row_number n={n:>9,}: {wall:6.2f} s  bijection={'OK' if ok else 'BROKEN'}")
        assert ok, f"rank bijection broken at n={n}: {stats}"


def _synth_docs(spark, n: int):
    """12-token docs over a 50M-word vocabulary (wide enough that no two
    base ids collide by accident at n=2M — a 50k vocabulary made texts
    repeat every 50k ids and the probe measured its own 39.8M-pair
    output instead of the banded join); ~1% planted twin pairs (doc k
    and k+1 share text for k % 100 == 0) so recall is assertable."""
    base = F.when(F.col("id") % 100 == 1, F.col("id") - 1).otherwise(F.col("id"))
    words = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"), ((base * (j * 2 + 3) + j * j) % 50_000_000).cast("string")
            )
            for j in range(12)
        ],
    )
    return spark.range(n).select(F.col("id").alias("doc_id"), words.alias("text"))


def probe_lsh(spark) -> None:
    from cloudtrace_exporter_spark.operators import dedup

    for n in (200_000, 2_000_000):
        docs = _synth_docs(spark, n).repartition(64).cache()
        docs.count()
        planted = n // 100  # ids 1, 101, 201, ... pair with id-1
        t0 = time.time()
        pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9, portable=True).cache()
        total = pairs.count()
        found = pairs.filter(
            (F.col("doc_b") == F.col("doc_a") + 1) & (F.col("doc_a") % 100 == 0)
        ).count()
        wall = time.time() - t0
        print(
            f"minhash_lsh_pairs n={n:>9,}: {wall:6.2f} s  pairs={total:,} "
            f"planted recall={found}/{planted}"
        )
        assert found == planted, "identical planted twins must all collide"
        pairs.unpersist()
        docs.unpersist()


def probe_passjoin(spark) -> None:
    """PassJoin at 10×/50× the sf0.1 docs count — the bench notes name
    its candidate volume as the scale risk to watch. Prefixes are
    md5-derived (two random 20-hex strings are never within 3 edits, so
    incidental pairs are structurally absent — numeric-id prefixes
    would differ in ≤3 digits constantly and the probe would measure
    its own workload again); 1% planted twins flip the first char
    (edit distance exactly 1) and recall is asserted."""
    from cloudtrace_exporter_spark.operators import dedup

    for n in (200_000, 1_000_000):
        base = F.when(F.col("id") % 100 == 1, F.col("id") - 1).otherwise(F.col("id"))
        pfx = F.substring(F.md5(base.cast("string").cast("binary")), 1, 20)
        text = F.when(
            F.col("id") % 100 == 1, F.concat(F.lit("z"), F.substring(pfx, 2, 19))
        ).otherwise(pfx)
        docs = (
            spark.range(n)
            .select(F.col("id").alias("doc_id"), text.alias("text"))
            .repartition(64)
            .cache()
        )
        docs.count()
        planted = n // 100
        t0 = time.time()
        pairs = dedup.passjoin_edit_pairs(docs).cache()
        total = pairs.count()
        found = pairs.filter(
            (F.col("doc_b") == F.col("doc_a") + 1) & (F.col("doc_a") % 100 == 0)
        ).count()
        wall = time.time() - t0
        print(
            f"passjoin_edit_pairs n={n:>9,}: {wall:6.2f} s  pairs={total:,} "
            f"planted recall={found}/{planted}"
        )
        assert found == planted, "pigeonhole candidates must have NO false negatives"
        pairs.unpersist()
        docs.unpersist()


def probe_stream(spark) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from streaming_probe import build_trace_parquet, run_pipeline_file_source

    # 100x corpus (10.1M rows incl. dups) in 11 page files -> ~918k rows
    # per micro-batch, 10M-key state by the final batch
    root = tempfile.mkdtemp(prefix="stream_probe_100x_")
    pages = os.path.join(root, "pages")
    try:
        landed = build_trace_parquet(
            spark, "/root/testdata/sf0.1", pages, copies=100, n_files=11
        )
        wall, counters, batches = run_pipeline_file_source(
            spark, pages, root, files_per_trigger=1
        )
        for b in batches:
            print(
                f"  batch {b['batch']:>3}: in={b['rows_in']:>8} "
                f"trigger={b['trigger_ms']:>7} ms state_rows={b['state_rows']:>9} "
                f"state={b['state_mb']:.1f} MB"
            )
        dropped = landed - counters.delivered
        print(
            f"STREAM 100x-batch TOTAL: landed={landed} delivered={counters.delivered} "
            f"dup_dropped={dropped} failed={counters.failed} "
            f"batches={len(batches)} stream_wall={wall:.1f} s"
        )
        assert counters.failed == 0 and dropped > 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_dbscan(spark) -> None:
    """Injected-pair DBSCAN (the q_dbscan_lsh posture) at 100k / 1M
    vectors — round-8 tier above the 10× probe. 1% of vectors form
    planted 4-member clusters (group members share their base vector
    EXACTLY on the first n_bits coordinates, so sign-block recall is
    deterministic by construction, and differ by one 5e-4 nudge on a
    coordinate ≥ 40 — far inside the cos ≥ 0.95 ball); background
    vectors are iid uniform [-0.125, 0.125]^64 — UNIT-SCALE, i.e. ‖v‖≈0.72,
    inside the ε-test's documented 2⁶³ budget (quantized ‖a‖² ≈ 1e6; the
    first draft used [-1,1] coords, ‖v‖≈4.6, and num²·‖a‖²·‖b‖² genuinely
    overflowed BIGINT at the 1M tier — the budget boundary is real, and
    embeddings are unit-normalized in every production pipeline this
    serves; normalize_vectors is the in-repo path). Pairwise cos still
    concentrates at std ≈ 1/8 (scale-invariant), so a spurious ε-pair is
    a ≥7.6σ event — zero expected.
    Block bits are occupancy-scaled with n (the SCALE.md rule), and the
    probe ASSERTS planted recovery (every member core, cluster = min
    group id), zero spurious clusters, and candidate-volume linearity
    (pairs < 2n at both tiers)."""
    from cloudtrace_exporter_spark.operators import similarity

    for n, n_bits in ((100_000, 17), (1_000_000, 20)):
        groups = n // 400
        planted_n = groups * 4
        gid = F.floor(F.col("id") / 4).cast("long")
        is_p = F.col("id") < planted_n
        seed = F.when(is_p, gid + 10_000_000_000).otherwise(F.col("id") + 20_000_000_000)
        nudge_pos = F.lit(40) + F.pmod(F.col("id"), F.lit(4))
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                (F.pmod(F.xxhash64(seed, j), F.lit(2001)) - 1000) / 8000.0
                + F.when(is_p & (j == nudge_pos), F.lit(0.004)).otherwise(F.lit(0.0))
            ),
        )
        emb = (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
            .repartition(64)
            .cache()
        )
        emb.count()
        t0 = time.time()
        pairs = similarity.sign_block_pairs(emb, n_bits=n_bits).cache()
        n_pairs = pairs.count()
        res = similarity.dbscan_embeddings(
            emb, cos_num=95, cos_den=100, min_pts=4, pairs=pairs
        ).cache()
        planted = res.filter(F.col("vec_id") < planted_n).cache()
        bad_role = planted.filter(F.col("role") != "core").count()
        bad_cluster = planted.filter(
            F.col("cluster") != (F.floor(F.col("vec_id") / 4) * 4).cast("long")
        ).count()
        spurious = res.filter(
            (F.col("vec_id") >= planted_n) & (F.col("role") != "noise")
        ).count()
        wall = time.time() - t0
        print(
            f"dbscan_injected n={n:>9,} bits={n_bits}: {wall:6.2f} s  "
            f"candidates={n_pairs:,} ({n_pairs / n:.2f}/vec)  "
            f"planted {planted_n - bad_role - bad_cluster}/{planted_n} recovered  "
            f"spurious={spurious}"
        )
        assert bad_role == 0 and bad_cluster == 0, "planted clusters must recover"
        assert spurious == 0, "background must all be noise"
        assert n_pairs < 2 * n, "candidate volume must stay linear"
        planted.unpersist()
        res.unpersist()
        pairs.unpersist()
        emb.unpersist()


def probe_triangle(spark) -> None:
    """Triangle participation over the banded LSH pair graph at 200k /
    2M docs (10×/100× the sf0.1 documents table) — round-8 tier for the
    wedge-join family. The _synth_docs recipe is extended from planted
    PAIRS to planted TRIPLES (ids k, k+1, k+2 share text for k%100==0 —
    one 3-clique per 100 docs, no larger cliques so counts are exact);
    asserts every planted member participates in exactly 1 triangle,
    total = planted count, and Σ participation = 3 × triangle census."""
    from cloudtrace_exporter_spark.operators import dedup, graph

    for n in (200_000, 2_000_000):
        base = F.when(F.col("id") % 100 <= 2, F.col("id") - F.col("id") % 100).otherwise(
            F.col("id")
        )
        words = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"), ((base * (j * 2 + 3) + j * j) % 50_000_000).cast("string")
                )
                for j in range(12)
            ],
        )
        docs = (
            spark.range(n)
            .select(F.col("id").alias("doc_id"), words.alias("text"))
            .repartition(64)
            .cache()
        )
        docs.count()
        triples = n // 100
        t0 = time.time()
        # materialize-before-fan-out: triangle_counts consumes the edge
        # list in THREE subtrees (two wedge sides + the closure semi-join)
        # — uncached, the whole banded-LSH plan re-executes per subtree
        # (measured 449 s vs ~90 s at the 2M tier)
        pairs = (
            dedup.minhash_lsh_pairs(docs, threshold=0.9, portable=True)
            .select("doc_a", "doc_b")
            .cache()
        )
        pairs.count()
        tri = graph.triangle_counts(pairs).cache()
        total_participation = tri.agg(F.sum("n_triangles")).collect()[0][0] or 0
        members = tri.count()
        wrong = tri.filter(
            (F.col("n_triangles") != 1) | (F.pmod(F.col("doc_id"), F.lit(100)) > 2)
        ).count()
        wall = time.time() - t0
        print(
            f"triangle_counts n={n:>9,}: {wall:6.2f} s  members={members:,} "
            f"(expect {3 * triples:,})  sum={total_participation:,} wrong={wrong}"
        )
        assert members == 3 * triples, "every planted triple member participates"
        assert total_participation == 3 * triples, "sum = 3 x census (1 tri each)"
        assert wrong == 0, "no spurious triangles, none counted twice"
        tri.unpersist()
        pairs.unpersist()
        docs.unpersist()


def main() -> None:
    fam = "all"
    if "--family" in sys.argv:
        fam = sys.argv[sys.argv.index("--family") + 1]
    from cloudtrace_exporter_spark.session import get_spark

    spark = get_spark("scale_probe_100x")
    if fam in ("rank", "all"):
        probe_rank(spark)
    if fam in ("lsh", "all"):
        probe_lsh(spark)
    if fam in ("passjoin", "all"):
        probe_passjoin(spark)
    if fam in ("stream", "all"):
        probe_stream(spark)
    if fam in ("dbscan", "all"):
        probe_dbscan(spark)
    if fam in ("triangle", "all"):
        probe_triangle(spark)


if __name__ == "__main__":
    main()
