"""100×-tier probe for the STREAMING visual dedup tier (round 11).

Same protocol as tools/stream_minhash_probe.py but over the
perceptual-hash pipeline: 10 file-fed micro-batches of 100k planted
64-bit hashes each (hasher=identity — decode cost is the multimodal
codec's business; this probes the dedup/state/index machinery). Each
batch after the first plants 5,000 bit-flipped copies (^1) of hashes
KEPT in the prior batch (→ corpus_dup through the accumulated raw-hash
index) and 2,000 within-batch flipped pairs (→ batch_dup).

``max_hamming=1`` keeps accidental proximity between independent
md5-derived 60-bit hashes structurally negligible (P ≈ 61/2⁶⁰ per
pair), so the planted counts are exact by construction.

Run: python tools/stream_phash_probe.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

N_BATCHES = 10
BATCH = 100_000
PLANT_PRIOR = 5_000
PLANT_INTRA = 2_000


def main() -> None:
    sys.path.insert(0, ".")
    from cloudtrace_exporter_spark.session import get_spark
    from cloudtrace_exporter_spark.streaming.pipeline import stream_phash_dedup

    spark = get_spark("stream_phash_probe")
    work = tempfile.mkdtemp(prefix="sph_probe_")
    src, ck, idx = f"{work}/src", f"{work}/ck", f"{work}/idx"
    os.makedirs(src)

    def hash_expr(seed):
        return F.conv(
            F.substring(F.md5(seed.cast("string").cast("binary")), 1, 15), 16, 10
        ).cast("long")

    t_gen = time.time()
    for b in range(N_BATCHES):
        base = spark.range(BATCH).select(
            (F.col("id") + b * 1_000_000).alias("doc_id"),
            hash_expr(F.col("id") + b * 1_000_000).alias("ahash"),
        )
        frames = [base]
        if b > 0:
            frames.append(
                spark.range(PLANT_PRIOR).select(
                    (F.col("id") + b * 1_000_000 + 500_000).alias("doc_id"),
                    hash_expr(F.col("id") + (b - 1) * 1_000_000)
                    .bitwiseXOR(F.lit(1))
                    .alias("ahash"),
                )
            )
            frames.append(
                spark.range(PLANT_INTRA).select(
                    (F.col("id") + b * 1_000_000 + 600_000).alias("doc_id"),
                    hash_expr(F.col("id") + b * 1_000_000)
                    .bitwiseXOR(F.lit(1))
                    .alias("ahash"),
                )
            )
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        stage = f"{work}/stage"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.move(
            glob.glob(f"{stage}/part-*.parquet")[0], f"{src}/b{b:02d}.parquet"
        )
    print(f"GEN: {N_BATCHES} batches written in {time.time() - t_gen:.1f}s", flush=True)

    stream = (
        spark.readStream.schema("doc_id long, ahash long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    walls: list[float] = []
    stats: list[tuple[int, int, int, int]] = []
    last = [time.time()]

    def on_batch(batch_id, verdicts):
        agg = {
            r["status"]: r["n"]
            for r in verdicts.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        walls.append(time.time() - last[0])
        last[0] = time.time()
        stats.append(
            (batch_id, agg.get("kept", 0), agg.get("corpus_dup", 0), agg.get("batch_dup", 0))
        )
        print(
            f"BATCH {batch_id}: wall={walls[-1]:.1f}s kept={agg.get('kept', 0):,} "
            f"corpus_dup={agg.get('corpus_dup', 0):,} batch_dup={agg.get('batch_dup', 0):,}",
            flush=True,
        )

    q = stream_phash_dedup(
        stream, ck, idx, max_hamming=1, hasher=lambda df: df, on_batch=on_batch
    )
    q.awaitTermination()

    assert len(stats) == N_BATCHES, f"expected {N_BATCHES} batches, saw {len(stats)}"
    for bid, kept, cdup, bdup in stats:
        if bid == 0:
            assert cdup == 0 and bdup == 0, stats[0]
        else:
            assert cdup == PLANT_PRIOR, (bid, cdup)
            assert bdup == PLANT_INTRA, (bid, bdup)
            assert kept == BATCH, (bid, kept)
    tail = sum(walls[-3:]) / 3
    head = sum(walls[1:4]) / 3
    print(
        f"DONE: 1M hashes + plants in {sum(walls):.1f}s; per-batch wall "
        f"early={head:.1f}s late={tail:.1f}s (growth x{tail / head:.2f} "
        f"while the index grew {N_BATCHES}x)",
        flush=True,
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
