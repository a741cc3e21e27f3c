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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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
        return [PageFilePartition(f) for f in _sorted_pages(self.path)]

    def read(self, partition: PageFilePartition):
        yield from _read_page_file(partition.path)


def _sorted_pages(path: str) -> list[str]:
    return sorted(
        f
        for pattern in ("part-*.json", "*.jsonl")
        for f in glob.glob(os.path.join(path, pattern))
    )


def _read_page_file(path: str):
    with open(path, encoding="utf-8") as fh:
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


class CtsPagesStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the marker-chain poll (A2+A15): the offset is
    the count of landed page files consumed, in sorted filename order.

    The landing dir is append-only (pages arrive with monotonically
    increasing part numbers, like the reference's marker chain), so an
    offset range identifies an exact file slice — which is what makes
    ``readBetweenOffsets`` an exact REPLAY after a crash: Spark persists
    (start, end) in the checkpoint WAL and re-requests the same slice,
    giving the at-least-once-input/exactly-once-state contract the
    reference approximates with overlap windows + MERGE (adapter.go:
    266-271 + client.go:10-21). Each micro-batch reads only files
    [start, end) — O(new pages), never a rescan.
    """

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("cts_pages source requires .option('path', <pages_dir>)")
        self.path = path
        # backpressure knob: cap pages consumed per micro-batch (the
        # reference's page-size bound, applied per trigger). Non-zero BY
        # DEFAULT: Simple stream readers materialize each batch's rows
        # driver-side into the checkpoint WAL, so an unbounded first batch
        # over a large backlog is a driver-memory hazard; pass 0 to opt
        # out explicitly.
        raw = options.get("max_pages_per_batch")
        self.max_pages = 100 if raw is None else int(raw)

    def initialOffset(self) -> dict:
        return {"page_idx": 0, "last_file": None}

    def _check_append_only(self, files: list[str], start: dict) -> None:
        """Offsets are positional in sorted-filename order; that is only
        an exact slice id while the dir stays append-only. Guard it: the
        offset records the last consumed filename, and any file landing
        BEFORE it in sort order would silently shift the slice — fail
        loudly instead of replaying wrong data."""
        lo, last = start["page_idx"], start.get("last_file")
        if lo > 0 and last is not None:
            actual = os.path.basename(files[lo - 1]) if lo <= len(files) else None
            if actual != last:
                raise ValueError(
                    f"cts_pages landing dir violated the append-only contract: "
                    f"offset {lo} was committed after consuming {last!r}, but the "
                    f"file at that position is now {actual!r} (a page landed with "
                    f"a name sorting before already-consumed files)"
                )

    def read(self, start: dict):
        files = _sorted_pages(self.path)
        self._check_append_only(files, start)
        lo = start["page_idx"]
        hi = min(lo + self.max_pages, len(files)) if self.max_pages else len(files)
        # materialized THEN wrapped in iter(): the rows of a Simple stream
        # reader are prefetched driver-side and pickled into the WAL —
        # bounded by the pages-per-batch cap above — but the API contract
        # is Tuple[Iterator, dict], and the query-restart replay path
        # calls next() on it directly (a bare list works for a fresh
        # query and then breaks the SECOND Trigger.Once run over the
        # same checkpoint with "'list' object is not an iterator")
        rows = [r for f in files[lo:hi] for r in _read_page_file(f)]
        last = os.path.basename(files[hi - 1]) if hi > 0 else start.get("last_file")
        return iter(rows), {"page_idx": hi, "last_file": last}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _sorted_pages(self.path)
        self._check_append_only(files, start)
        for f in files[start["page_idx"] : end["page_idx"]]:
            yield from _read_page_file(f)

    def commit(self, end: dict) -> None:
        pass  # nothing to release; the landing dir is the durable log


class CtsPagesDataSource(DataSource):
    """``spark.read.format("cts_pages").option("path", dir).load()`` and
    ``spark.readStream.format("cts_pages")…`` (micro-batch offsets =
    consumed page count)."""

    @classmethod
    def name(cls) -> str:
        return "cts_pages"

    def schema(self):
        return TRACE_SCHEMA

    def reader(self, schema):
        return CtsPagesReader(self.options)

    def simpleStreamReader(self, schema):
        return CtsPagesStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(CtsPagesDataSource)
