"""100×-tier probe for the STREAMING MinHash near-dup tier (round 11).

10 file-fed micro-batches of 100k synthetic documents each (1M total).
Each batch after the first plants 5,000 exact copies of documents KEPT
in earlier batches (→ must come back corpus_dup via the accumulated
banded index) plus 2,000 within-batch copy pairs (→ batch_dup). Checks:

- planted cross-batch copies are all flagged corpus_dup (the index
  state actually accumulates across batches);
- planted within-batch copies all collapse (kept/batch_dup);
- per-batch wall stays near-flat as the index grows (the probe's
  scale-shape claim: per-batch cost is the bucket join against the
  partition-pruned index scan, not an index rebuild).

Docs are ~20-token unique texts (md5-derived words), so non-planted
collisions are structurally absent at threshold 0.5.

Run: python tools/stream_minhash_probe.py
"""

from __future__ import annotations

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
    from cloudtrace_exporter_spark.streaming.pipeline import stream_minhash_dedup

    spark = get_spark("stream_minhash_probe")
    work = tempfile.mkdtemp(prefix="smh_probe_")
    src, ck, idx = f"{work}/src", f"{work}/ck", f"{work}/idx"
    os.makedirs(src)

    # 20 md5-derived words per doc keyed off a GLOBAL doc ordinal so
    # texts are unique across the whole stream except the plants
    def text_expr(seed):
        return F.concat_ws(
            " ",
            *[
                F.substring(
                    F.md5(F.concat(seed.cast("string"), F.lit(f"w{w}")).cast("binary")),
                    1,
                    10,
                )
                for w in range(20)
            ],
        )

    t_gen = time.time()
    for b in range(N_BATCHES):
        base = spark.range(BATCH).select(
            (F.col("id") + b * 1_000_000).alias("doc_id"),
            text_expr(F.col("id") + b * 1_000_000).alias("text"),
        )
        frames = [base]
        if b > 0:
            # copies of docs from batch b-1 (kept there: originals are
            # unique, so every base doc of a prior batch was kept)
            frames.append(
                spark.range(PLANT_PRIOR).select(
                    (F.col("id") + b * 1_000_000 + 500_000).alias("doc_id"),
                    text_expr(F.col("id") + (b - 1) * 1_000_000).alias("text"),
                )
            )
            # intra-batch copy pairs: duplicate the batch's own first
            # PLANT_INTRA texts under higher ids
            frames.append(
                spark.range(PLANT_INTRA).select(
                    (F.col("id") + b * 1_000_000 + 600_000).alias("doc_id"),
                    text_expr(F.col("id") + b * 1_000_000).alias("text"),
                )
            )
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        # the file STREAM source lists top-level files, so each batch
        # must be one parquet FILE, not a directory: stage + move
        import glob as _glob

        stage = f"{work}/stage"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.move(
            _glob.glob(f"{stage}/part-*.parquet")[0], f"{src}/b{b:02d}.parquet"
        )
    print(f"GEN: {N_BATCHES} batches written in {time.time() - t_gen:.1f}s", flush=True)

    stream = (
        spark.readStream.schema("doc_id long, text string")
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

    q = stream_minhash_dedup(stream, ck, idx, on_batch=on_batch)
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
        f"DONE: 1M docs + plants in {sum(walls):.1f}s; per-batch wall "
        f"early={head:.1f}s late={tail:.1f}s (growth x{tail / head:.2f} "
        f"while the index grew {N_BATCHES}x)",
        flush=True,
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
