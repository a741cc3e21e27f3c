"""cloudtrace_exporter_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
``akyriako/cloudtrace-exporter`` reference (a Go CTS-audit-trace →
CloudEvents → Neo4j-graph pipeline) on Apache Spark: declarative
DataFrame/SQL plans optimized by Catalyst, Structured Streaming for
the micro-batch ingest path, and set-oriented graph materialization
instead of record-at-a-time writes.

Layout
------
- :mod:`~cloudtrace_exporter_spark.session`   — SparkSession factory (AQE, UTC, Arrow).
- :mod:`~cloudtrace_exporter_spark.schemas`   — explicit StructTypes; no inference.
- :mod:`~cloudtrace_exporter_spark.sources`   — fixture table loaders + CTS-style micro-batch source.
- :mod:`~cloudtrace_exporter_spark.operators` — normalize / graph / analytics / dedup /
  similarity / text / multimodal operator families.
- :mod:`~cloudtrace_exporter_spark.streaming` — Structured Streaming pipelines + sinks.

Everything here derives from the public reference repo (cited per
``file:line`` in docstrings), the public PySpark API, and published
papers — nothing else.
"""

__version__ = "0.1.0"
