"""100×-tier probe for semantic decontamination (round 11).

1M-vector corpus (64-dim integer-friendly synthetic embeddings, 16
k-means cells) screened against a 5k-vector eval set of which 2,500 are
planted near-copies of known corpus vectors (tiny single-coordinate
perturbation) and 2,500 are far probes (orthogonal-ish random
directions). Checks:

- every planted eval probe flags its corpus seed contaminated
  (recall of the n_probe cell selection on ε-pairs that exist);
- the far probes flag ~nothing (no spurious contamination);
- wall scales with the candidate volume O(|eval| · n_probe · cell),
  not |corpus| · |eval| — reported for SCALE.md.

Run: python tools/contam_scale_probe.py
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

N_CORPUS = 1_000_000
N_EVAL_PLANT = 2_500
N_EVAL_FAR = 2_500
DIM = 64


def main() -> None:
    sys.path.insert(0, ".")
    from cloudtrace_exporter_spark.operators import similarity
    from cloudtrace_exporter_spark.session import get_spark

    spark = get_spark("contam_scale_probe")

    # corpus: deterministic pseudo-random UNIT vectors via md5 coords —
    # unit norm matters: the BIGINT ε-test at scale=10³ assumes
    # embedding-like inputs (‖v‖ ≈ 1 → n2 ≈ 10⁶, dot²·den² ≤ ~10¹⁶);
    # un-normalized ±1-per-dim vectors overflow the long at dim 64
    def vec_expr(seed_col):
        raw = F.array(
            *[
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(seed_col.cast("string"), F.lit(f"-{d}")).cast("binary")),
                            1,
                            6,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 2001
                    - 1000
                ).cast("double")
                / 1000.0
                for d in range(DIM)
            ]
        )
        norm = F.sqrt(
            F.aggregate(
                F.transform(raw, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        )
        return F.transform(raw, lambda x: F.round(x / norm, 6))

    # MATERIALIZE the synthetic frames to parquet before the operator:
    # the md5-derived normalized array is a huge expression tree that
    # CollapseProject would otherwise inline into EVERY downstream
    # reference (the documented ~30x recompute trap) — a parquet
    # round-trip severs the lineage so the operator sees plain columns.
    import tempfile

    tmp = tempfile.mkdtemp(prefix="contam_probe_")
    spark.range(N_CORPUS).select(
        F.col("id").alias("vec_id"), vec_expr(F.col("id")).alias("embedding")
    ).write.mode("overwrite").parquet(f"{tmp}/corpus")
    corpus = spark.read.parquet(f"{tmp}/corpus")

    # eval: planted = corpus seeds 0..2499 with one coordinate nudged by
    # 0.002 (cos stays ~1); far = fresh md5 directions (expected cos ~ 0
    # against everything in 64-dim)
    plants = corpus.filter(F.col("vec_id") < N_EVAL_PLANT).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.when(i == F.pmod(F.col("vec_id"), F.lit(DIM)), 0.002).otherwise(0.0),
        ).alias("embedding"),
    )
    far = spark.range(N_EVAL_FAR).select(
        (F.col("id") + 20_000_000).alias("vec_id"),
        vec_expr(F.col("id") + 77_000_000).alias("embedding"),
    )
    plants.unionByName(far).write.mode("overwrite").parquet(f"{tmp}/eval")
    ev = spark.read.parquet(f"{tmp}/eval")

    t0 = time.time()
    out = similarity.semantic_contamination(
        corpus,
        ev,
        n_centroids=16,
        lloyd_iters=2,
        n_probe=4,
        tau_num=95,
        tau_den=100,
    ).persist()
    n_contam = out.filter(F.col("status") == "contaminated").count()
    wall = time.time() - t0
    seeds_flagged = out.filter(
        (F.col("vec_id") < N_EVAL_PLANT) & (F.col("status") == "contaminated")
    ).count()
    spurious = out.filter(
        (F.col("vec_id") >= N_EVAL_PLANT) & (F.col("status") == "contaminated")
    ).count()
    print(
        f"CONTAM: corpus={N_CORPUS:,} eval={N_EVAL_PLANT + N_EVAL_FAR:,} "
        f"wall={wall:.1f}s contaminated={n_contam:,} "
        f"planted_seeds_flagged={seeds_flagged:,}/{N_EVAL_PLANT:,} "
        f"spurious_beyond_seeds={spurious:,}",
        flush=True,
    )
    assert seeds_flagged == N_EVAL_PLANT, "planted eval probe missed its seed"
    out.unpersist()


if __name__ == "__main__":
    main()
