"""Training-data export sink — sharded JSONL + integrity manifest.

The last mile of a curation pipeline: ship the curated corpus as a
bounded set of right-sized JSONL shards plus a manifest recording each
shard's byte size, SHA-256, and line count, so a downstream trainer can
verify transfer integrity and plan its data loader without re-reading
the corpus.

Scale posture: the shard write is one round-robin repartition (bounded
file count, even sizes); the manifest is computed DISTRIBUTIVELY by
re-reading the shards through the ``binaryFile`` source and hashing
executor-side with ``sha2`` — the driver only collects one metadata row
per shard, never content.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_jsonl_shards(
    df: DataFrame, out_dir: str, *, n_shards: int = 8
) -> list[dict]:
    """Write ``df`` as ``n_shards`` JSONL files under ``out_dir`` and a
    ``MANIFEST.json`` beside them; returns the manifest entries
    (path, bytes, sha256, n_lines), sorted by path."""
    spark = df.sparkSession
    df.repartition(n_shards).write.mode("overwrite").json(out_dir)
    manifest = _build_manifest(spark, out_dir)
    with open(os.path.join(out_dir, "MANIFEST.json"), "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def _build_manifest(spark: SparkSession, out_dir: str) -> list[dict]:
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*.json")
        .load(out_dir)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("shard"),
            F.col("length").alias("bytes"),
            F.sha2("content", 256).alias("sha256"),
            # JSONL: one trailing \n per record → line count == newline count
            (F.length(F.col("content").cast("string"))
             - F.length(F.regexp_replace(F.col("content").cast("string"), "\n", ""))
             ).cast("long").alias("n_lines"),
        )
        .orderBy("shard")
    )
    return [r.asDict() for r in shards.collect()]


def import_jsonl_shards(spark: SparkSession, in_dir: str, schema) -> DataFrame:
    """Manifest-verified ingest — the read half of export_jsonl_shards.

    Recomputes every shard's (bytes, sha256, n_lines) executor-side via
    binaryFile and compares against MANIFEST.json BEFORE any row is
    parsed: corpora ship with manifests precisely so a truncated rsync
    or bit-rotted shard fails the load loudly instead of silently
    training on a short corpus. Raises ValueError naming the first
    mismatching shards; on success returns the schema-enforced FAILFAST
    JSONL read of the shard glob."""
    with open(os.path.join(in_dir, "MANIFEST.json"), encoding="utf-8") as fh:
        expected = {e["shard"]: e for e in json.load(fh)}
    actual = {e["shard"]: e for e in _build_manifest(spark, in_dir)}
    problems = []
    for shard in sorted(expected.keys() | actual.keys()):
        if shard not in actual:
            problems.append(f"{shard}: missing")
        elif shard not in expected:
            problems.append(f"{shard}: not in manifest")
        elif any(expected[shard][k] != actual[shard][k] for k in ("bytes", "sha256", "n_lines")):
            problems.append(f"{shard}: checksum/size mismatch")
    if problems:
        raise ValueError("shard manifest verification failed: " + "; ".join(problems[:5]))
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("pathGlobFilter", "part-*.json")
        .json(in_dir)
    )
