"""Skewed-corpus probe for the SemDeDup giant-cell guard (round 11,
r10 verdict order #1 "done" criterion).

Synthesizes an embedding corpus where ~60% of all vectors collapse into
ONE k-means cell (a tight blob — the near-duplicate-heavy-crawl shape
SemDeDup is actually deployed on), plants exact-ish twins, and measures:

1. the DEFAULT posture (`max_cell_rows=100_000` guard ON) at 200k and
   1M vectors — wall should stay near-linear because the guard
   auto-escalates the candidate key to (cell, bucket);
2. the hazard itself at a feasibility-bounded scale: guard OFF vs
   guard ON on the same 60k-vector skewed corpus — the unguarded
   equi-join on the cell alone goes O(giant_cell²).

Run:  python tools/semdedup_skew_probe.py [--small-only]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F


def make_skewed(spark, n: int, dim: int = 32, twin_every: int = 100):
    """~60% of vectors in one tight blob (same k-means cell), the rest
    spread; every ``twin_every``-th vector gets a planted twin perturbed
    on coordinate 20 by +0.0004 (inside the eps ball, above the guard's
    sign-block bits so bucketing cannot hide it)."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(
            # 60% blob: jitter in [-0.1, 0.1) around the origin — one
            # k-means cell (or a few, all past the guard threshold), with
            # VARYING leading signs so the guard's sign-block escalation
            # has something to split (the all-positive tight-blob case is
            # covered by the escalation-effectiveness warning instead)
            F.col("id") % 10 < 6,
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (F.pmod(F.xxhash64(F.col("id") * 131 + i), 200).cast("double") - 100.0) / 1000.0,
            ),
        ).otherwise(
            # 40% spread: coordinates in [-0.8, 0.8) — inside the x10^3
            # BIGINT envelope (dot^2 x tau_den^2 must stay under 2^63;
            # the loud ANSI overflow past it is the documented contract
            # and fired on a first [-4,4) cut of this probe)
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (F.pmod(F.xxhash64(F.col("id") * 977 + i), 1600).cast("double") - 800.0) / 1000.0,
            ),
        ).alias("embedding"),
    )
    twins = (
        base.filter(F.col("vec_id") % twin_every == 0)
        .select(
            (F.col("vec_id") + n).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 20, x + F.lit(0.0004)).otherwise(x),
            ).alias("embedding"),
        )
    )
    return base.unionByName(twins), n // twin_every


def run(spark, emb, n_twins: int, label: str, **kw) -> None:
    from cloudtrace_exporter_spark.operators import similarity

    t0 = time.time()
    out = similarity.semdedup_scaled(emb, n_centroids=16, tau_num=99, **kw).cache()
    dropped = out.filter(~F.col("keep")).count()
    wall = time.time() - t0
    cells = (
        out.groupBy("cell").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    total = out.count()
    print(
        f"{label}: n={total:,} wall={wall:.1f}s dropped={dropped:,} "
        f"(planted={n_twins:,}) max_cell={cells['count']:,} "
        f"({100.0 * cells['count'] / total:.0f}% of corpus)",
        flush=True,
    )
    out.unpersist()


def run_build_serve(spark, n: int) -> None:
    """Round 12 (r11 verdict order #8): the frozen-centroid serve path
    makes the bench's semdedup numbers serve-only, so the 100x-scale
    claim must separately cover the ARTIFACT BUILD (k-means training).
    Measures, on the skewed corpus at ``n`` vectors: (1) training
    (_scaled_kmeans: seed + 2 Lloyd rounds — the build the session
    freeze amortizes), (2) serve under the frozen centroids (the
    steady-state query path), and (3) the fused train+serve call (the
    pre-freeze posture, = the r10/r11 SCALE.md rows)."""
    from cloudtrace_exporter_spark.operators import similarity
    from cloudtrace_exporter_spark.operators.similarity import _scaled_kmeans

    emb, n_twins = make_skewed(spark, n)
    emb = emb.cache()
    emb.count()
    t0 = time.time()
    _, cents = _scaled_kmeans(
        emb, n_centroids=16, lloyd_iters=2, scale=10**3
    )
    build = time.time() - t0
    t0 = time.time()
    out = similarity.semdedup_scaled(
        emb, n_centroids=16, tau_num=99, centroids=cents
    ).cache()
    dropped = out.filter(~F.col("keep")).count()
    serve = time.time() - t0
    out.unpersist()
    spark.catalog.clearCache()
    emb.cache().count()
    t0 = time.time()
    out2 = similarity.semdedup_scaled(emb, n_centroids=16, tau_num=99).cache()
    dropped2 = out2.filter(~F.col("keep")).count()
    fused = time.time() - t0
    print(
        f"{n//1000}k skewed build/serve: train(build)={build:.1f}s "
        f"serve(frozen)={serve:.1f}s fused={fused:.1f}s "
        f"dropped={dropped:,}/{dropped2:,} (planted={n_twins:,})",
        flush=True,
    )
    out2.unpersist()
    emb.unpersist()


def main() -> None:
    sys.path.insert(0, ".")
    from cloudtrace_exporter_spark.session import get_spark

    spark = get_spark("semdedup_skew_probe")

    if "--build-serve" in sys.argv:
        run_build_serve(spark, 1_000_000)
        return

    # hazard demonstration at feasibility-bounded scale: same corpus,
    # guard OFF (the pre-r11 default posture) vs guard ON
    emb_s, tw_s = make_skewed(spark, 40_000)
    emb_s = emb_s.cache()
    emb_s.count()
    run(spark, emb_s, tw_s, "40k skewed, guard OFF (cell-only join)", max_cell_rows=None)
    run(spark, emb_s, tw_s, "40k skewed, guard ON  (auto (cell,bucket))", max_cell_rows=10_000)
    emb_s.unpersist()

    if "--small-only" in sys.argv:
        return

    for n in (200_000, 1_000_000):
        emb, tw = make_skewed(spark, n)
        emb = emb.cache()
        emb.count()
        # TRUE default posture (25k threshold): both corpora's blob cells
        # (~88k and ~447k rows) trip the guard and escalate. The original
        # 100k default let the 200k corpus's 87,778-row cell through
        # SILENTLY — 1,190 s of cell-only join vs 194 s for the 5x-larger
        # corpus that escalated; that inversion is why the default moved.
        run(spark, emb, tw, f"{n//1000}k skewed, DEFAULT guard")
        emb.unpersist()


if __name__ == "__main__":
    main()
