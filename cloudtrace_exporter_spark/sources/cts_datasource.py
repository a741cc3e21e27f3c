"""CTS pages as a custom Python Data Source (Spark 4 DataSource API).

`cts_pages.py` reads the page landing directory through the generic
JSON file source; this module is the fully idiomatic Spark-4 form of
the reference's REST ingest (pkg/adapter/adapter.go:106-130): a
registered ``spark.read.format("cts_pages")`` source whose input
partitions ARE the response pages, so the pagination the reference
walks serially becomes executor-parallel page reads with a declared
schema — no inference, no driver-side loop.

Scale notes: one InputPartition per landed page file keeps partition
count proportional to pages (roll pages per file upstream to bound it);
a malformed page line is skipped, not fatal (the reference's nil-deref
on a bad response is deliberately not reproduced); the reader never
buffers more than one response line at a time.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from cloudtrace_exporter_spark.schemas import TRACE_SCHEMA

_FIELDS = tuple(TRACE_SCHEMA.fieldNames())


class PageFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CtsPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("cts_pages source requires .option('path', <pages_dir>)")
        self.path = path

    def partitions(self):
        files = sorted(
            f
            for pattern in ("part-*.json", "*.jsonl")
            for f in glob.glob(os.path.join(self.path, pattern))
        )
        return [PageFilePartition(f) for f in files]

    def read(self, partition: PageFilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    page = json.loads(line)
                except json.JSONDecodeError:
                    continue  # malformed page: tolerated, mirrors A15 posture
                for trace in page.get("traces") or []:
                    yield tuple(trace.get(f) for f in _FIELDS)


class CtsPagesDataSource(DataSource):
    """``spark.read.format("cts_pages").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "cts_pages"

    def schema(self):
        return TRACE_SCHEMA

    def reader(self, schema):
        return CtsPagesReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(CtsPagesDataSource)
