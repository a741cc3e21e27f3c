"""100×-tier probe for the Bloom dedup family (round 11).

Builds a production-sized filter (m = 2²⁷ bits = 4.19M packed words,
sized for ~10M keys at k=4 → theoretical FP ≈ (1-e^(-kn/m))^k ≈ 0.55%)
over a 10M-key corpus, probes a 1M-row batch (half planted dups, half
novel), and checks the two contracts at scale:

- zero false negatives (every planted dup bloom-hits) — structural;
- observed FP rate on the novel half lands near the theoretical rate
  (the filter is healthy, not saturated or mis-packed).

Also times an incremental `bloom_merge` of two half-corpus filters and
verifies it equals the full build (the snapshot-composition law at
size).

Run: python tools/bloom_scale_probe.py
"""

from __future__ import annotations

import math
import sys
import time

import pyspark.sql.functions as F


def main() -> None:
    sys.path.insert(0, ".")
    from cloudtrace_exporter_spark.operators import dedup
    from cloudtrace_exporter_spark.session import get_spark

    spark = get_spark("bloom_scale_probe")
    m_bits, k, n = 1 << 27, 4, 10_000_000

    corpus = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("key-"), F.md5(F.col("id").cast("string").cast("binary"))).alias("text"),
    )
    t0 = time.time()
    flt = dedup.bloom_build(corpus, m_bits=m_bits, k=k).persist()
    words = flt.count()
    build_s = time.time() - t0
    set_bits = flt.agg(F.sum(F.expr("bit_count(word)")).alias("b")).collect()[0]["b"]
    fill = set_bits / m_bits
    fp_theory = fill**k
    print(
        f"BUILD: n={n:,} m=2^27 k={k} wall={build_s:.1f}s words={words:,} "
        f"fill={fill:.4f} fp_theory={fp_theory:.5f} "
        f"(poisson est {(1 - math.exp(-k * n / m_bits)) ** k:.5f})",
        flush=True,
    )

    # probe batch: 500k planted dups (ids 0..500k) + 500k novel keys
    batch = (
        corpus.filter(F.col("doc_id") < 500_000)
        .select((F.col("doc_id") + 100_000_000).alias("doc_id"), "text")
        .unionByName(
            spark.range(500_000).select(
                (F.col("id") + 200_000_000).alias("doc_id"),
                F.concat(
                    F.lit("novel-"), F.md5(F.col("id").cast("string").cast("binary"))
                ).alias("text"),
            )
        )
    )
    t0 = time.time()
    probed = dedup.bloom_probe(batch, flt, m_bits=m_bits, k=k).persist()
    hits_dup = probed.filter(
        (F.col("doc_id") < 200_000_000) & F.col("bloom_hit")
    ).count()
    hits_novel = probed.filter(
        (F.col("doc_id") >= 200_000_000) & F.col("bloom_hit")
    ).count()
    probe_s = time.time() - t0
    fp_obs = hits_novel / 500_000
    print(
        f"PROBE: 1M rows wall={probe_s:.1f}s planted_hits={hits_dup:,}/500,000 "
        f"(must be all) novel_hits={hits_novel:,}/500,000 fp_obs={fp_obs:.5f}",
        flush=True,
    )
    assert hits_dup == 500_000, "false negative at scale!"
    assert fp_obs < 3 * fp_theory + 1e-4, "FP far above theory — filter unhealthy"
    probed.unpersist()

    # composition at size: two half-corpus filters OR-merged == full build
    t0 = time.time()
    f1 = dedup.bloom_build(corpus.filter(F.col("doc_id") % 2 == 0), m_bits=m_bits, k=k)
    f2 = dedup.bloom_build(corpus.filter(F.col("doc_id") % 2 == 1), m_bits=m_bits, k=k)
    merged = dedup.bloom_merge(f1, f2)
    diff = (
        merged.join(flt.withColumnRenamed("word", "w2"), "word_idx", "full")
        .filter(
            F.coalesce(F.col("word"), F.lit(-1)) != F.coalesce(F.col("w2"), F.lit(-1))
        )
        .count()
    )
    print(
        f"MERGE: two half-filters OR-merged vs full build: {diff} differing "
        f"words (must be 0) wall={time.time()-t0:.1f}s",
        flush=True,
    )
    assert diff == 0
    flt.unpersist()


if __name__ == "__main__":
    main()
