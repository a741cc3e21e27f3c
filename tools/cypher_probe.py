"""Cypher-sink throughput probe (round-8 verdict item #5).

Measures the ENGINE-SIDE half of batched UNWIND delivery — the
executor-side chunk loop of ``_neo4j_partition_writer`` (Row→dict
conversion, chunk assembly, per-transaction dispatch) — against a
transaction-counting fake driver, across a ``rows_per_tx`` sweep at
1× and 10× the sf0.1 event volume. No database ships in this image,
so the wire time is out of scope BY CONSTRUCTION; what the sweep
certifies is (a) the engine-side loop is never the bottleneck at any
batch size, and (b) the network-round-trip amortization each batch
size buys vs the reference's 1-transaction-per-event writer
(/root/reference/pkg/neo4j/client.go:51-55): at B rows/tx a batch of n
rows costs ceil(n/B) round trips instead of n.

Usage: python tools/cypher_probe.py [sf_dir]
Prints one JSON line per (tier, rows_per_tx) with rows/s and tx counts.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from cloudtrace_exporter_spark.session import get_spark  # noqa: E402
from cloudtrace_exporter_spark.sources.tables import load_table  # noqa: E402
from cloudtrace_exporter_spark.streaming import cypher_sink  # noqa: E402


class _FakeTx:
    """tx.run(cypher, rows=...) sink that validates shape and counts."""

    def __init__(self, acc_tx, acc_rows) -> None:
        self.acc_tx = acc_tx
        self.acc_rows = acc_rows

    def run(self, cypher: str, rows=None) -> None:
        assert cypher.startswith("UNWIND $rows AS row"), "wrong statement"
        assert rows and isinstance(rows[0], dict), "rows must be dict params"
        self.acc_tx.add(1)
        self.acc_rows.add(len(rows))


class _FakeSession:
    def __init__(self, acc_tx, acc_rows) -> None:
        self.tx = _FakeTx(acc_tx, acc_rows)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def execute_write(self, fn) -> None:
        fn(self.tx)


class _FakeDriver:
    def __init__(self, acc_tx, acc_rows) -> None:
        self.acc_tx = acc_tx
        self.acc_rows = acc_rows

    def session(self, database: str = "neo4j") -> _FakeSession:
        return _FakeSession(self.acc_tx, self.acc_rows)

    def close(self) -> None:
        pass


def counting_driver_factory(acc_tx, acc_rows):
    """Picklable factory: closes over two Spark accumulators so executor
    workers report transaction/row counts back to the driver."""

    def _factory(uri, auth):
        return _FakeDriver(acc_tx, acc_rows)

    return _factory


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("cypher_probe")
    sc = spark.sparkContext

    from pyspark.sql import functions as F

    from cloudtrace_exporter_spark.operators import normalize

    def rows_for(ev):
        traces = normalize.events_as_traces(ev)
        ne = normalize.normalize_traces(
            traces, source="https://cts.probe", region="eu-de",
            domain="d1", tenant="p1",
        )
        return cypher_sink.events_to_cypher_rows(ne)

    base = rows_for(load_table(spark, sf_dir, "events"))

    for tier in ("1x", "10x"):
        if tier == "1x":
            rows_df = base
        else:
            ev10 = load_table(spark, sf_dir, "events")
            ev10 = (
                ev10.crossJoin(spark.range(10).select(F.col("id").alias("__c")))
                .withColumn("event_id", F.col("event_id") * 10 + F.col("__c"))
                .drop("__c")
            )
            rows_df = rows_for(ev10)
        rows_df = rows_df.cache()
        n = rows_df.count()
        for rows_per_tx in (1, 50, 200, 1000, 5000):
            acc_tx = sc.accumulator(0)
            acc_rows = sc.accumulator(0)
            writer = cypher_sink._neo4j_partition_writer(
                "bolt://probe", None, "neo4j", rows_per_tx,
                counting_driver_factory(acc_tx, acc_rows),
            )
            t0 = time.time()
            rows_df.foreachPartition(writer)
            wall = time.time() - t0
            assert acc_rows.value == n, (acc_rows.value, n)
            print(json.dumps({
                "tier": tier,
                "rows": n,
                "rows_per_tx": rows_per_tx,
                "transactions": acc_tx.value,
                "amortization_vs_ref": round(n / max(1, acc_tx.value), 1),
                "wall_sec": round(wall, 2),
                "rows_per_sec": int(n / wall) if wall > 0 else None,
            }))
        rows_df.unpersist()


if __name__ == "__main__":
    main()
