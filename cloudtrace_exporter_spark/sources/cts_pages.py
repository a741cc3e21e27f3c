"""CTS paged-response source — the reference's REST ingest as a Spark
file source.

The reference polls the CTS v2 ``ListTraces`` endpoint page by page
(/root/reference/pkg/adapter/querier.go:30-37: one call; pagination loop
re-issuing with ``Next=marker`` until the marker is empty at
/root/reference/pkg/adapter/adapter.go:106-130, page size 50 per
``tracesLowerBound``, querier.go:15). SURVEY §4's design decision: the
poller lands each raw response page as a file, and the engine reads the
landing directory as a (streaming) file source — checkpointable,
replayable, and partition-parallel, unlike the in-memory channel chain.

File format: JSON Lines, one ``ListTracesResponse`` object per line —
exactly one REST response body per line: a ``traces`` array plus
``meta_data {count, marker}`` (response shape per adapter.go:112,116,125
and the public OTC CTS v2 API). The schema is declared, never inferred
(SURVEY §1.3).

Scale note: pages are small (≤200 traces by API cap); at high volume the
landing layout should roll many pages per file (the writer here does —
one jsonl file per partition) so the scan is not dominated by file-open
overhead, and partitioned by landing date for pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cloudtrace_exporter_spark.schemas import TRACE_SCHEMA

#: One REST response page (adapter.go:112-129): traces + paging metadata.
LIST_TRACES_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("traces", T.ArrayType(TRACE_SCHEMA), True),
        T.StructField(
            "meta_data",
            T.StructType(
                [
                    T.StructField("count", T.LongType(), True),
                    T.StructField("marker", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Reference page size (querier.go:15); API max is 200 (querier.go:16).
DEFAULT_PAGE_SIZE = 50


def write_trace_pages(traces: DataFrame, out_dir: str, *, page_size: int = DEFAULT_PAGE_SIZE) -> None:
    """Land TRACE_SCHEMA rows as paged ``ListTracesResponse`` JSON — the
    simulator for the reference's poller (what its HTTP layer would have
    written had it landed responses as files).

    Pages are deterministic (ordered by ``trace_id``); each page carries
    the reference's paging contract: ``count`` = page row count,
    ``marker`` = last trace id of the page when another page follows,
    empty when it is the final page (the loop-termination condition at
    adapter.go:125-129).
    """
    # [WindowExec: No Partition Defined — BENIGN HERE] pages are globally
    # ordered BY CONTRACT (the reference's marker chain is a total order
    # over trace ids), so the fixture page-writer's numbering is an
    # inherent global sort. This is test harness/simulator code — the
    # production ingest never writes pages, it reads them.
    by_id = Window.orderBy("trace_id")
    paged = traces.withColumn(
        "__page", ((F.row_number().over(by_id) - F.lit(1)) / page_size).cast("long")
    )
    whole = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pages = (
        paged.groupBy("__page")
        .agg(F.sort_array(F.collect_list(F.struct(*TRACE_SCHEMA.fieldNames()))).alias("traces"))
        .withColumn("__last", F.max("__page").over(whole))
        .select(
            "traces",
            F.struct(
                F.size("traces").cast("long").alias("count"),
                F.when(F.col("__page") < F.col("__last"), F.element_at("traces", -1)["trace_id"])
                .otherwise(F.lit(""))
                .alias("marker"),
            ).alias("meta_data"),
        )
    )
    # one response body per file (maxRecordsPerFile=1): the faithful
    # landing pattern for "one page per HTTP request", and what makes
    # page-count offsets (cts_datasource.CtsPagesStreamReader) exact
    pages.write.option("maxRecordsPerFile", 1).mode("overwrite").json(out_dir)


def read_trace_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """Batch scan of a page landing directory → TRACE_SCHEMA rows.

    Declared schema, permissive parse: a malformed page (truncated
    response, partial write) yields a null ``traces`` array and is
    dropped — counted rows only, never a crash (the A15 error-path
    semantics; the reference's nil-deref on transform error,
    adapter.go:187-195, is deliberately not reproduced).
    """
    pages = spark.read.schema(LIST_TRACES_RESPONSE_SCHEMA).json(pages_dir)
    return _explode_pages(pages)


def read_trace_pages_stream(
    spark: SparkSession, pages_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan: each micro-batch picks up newly-landed page files.

    ``maxFilesPerTrigger`` is the pagination/backpressure analog of the
    reference's page-size cap (A2) — bounds per-trigger work exactly the
    way ``Limit`` bounds per-request work.
    """
    reader = spark.readStream.schema(LIST_TRACES_RESPONSE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _explode_pages(reader.json(pages_dir))


def _explode_pages(pages: DataFrame) -> DataFrame:
    return (
        pages.filter(F.col("traces").isNotNull())
        .select(F.explode("traces").alias("t"))
        .select("t.*")
    )
