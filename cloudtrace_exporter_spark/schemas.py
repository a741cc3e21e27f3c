"""Canonical explicit schemas — nothing is inferred at runtime.

The reference's schemas are compile-time Go structs (SURVEY §1.3): the
CTS trace record (``/root/reference/pkg/adapter/adapter.go:220-254``,
upstream ``traces.Traces``) and the CloudEvent envelope
(``adapter.go:220-264``). We declare the Spark equivalents once here and
reuse them everywhere; fixture schemas mirror the driver parquet files
byte-for-byte (verified against the files, see FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# CloudTrace domain (reference fidelity)
# --------------------------------------------------------------------------

#: Raw CTS trace record — SURVEY §1.1a; field set per the reference's
#: dereferences in /root/reference/pkg/adapter/adapter.go:220-254.
TRACE_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), False),
        T.StructField("service_type", T.StringType(), True),
        T.StructField("trace_type", T.StringType(), True),
        T.StructField("resource_type", T.StringType(), True),
        T.StructField("trace_name", T.StringType(), True),
        T.StructField("resource_id", T.StringType(), True),
        T.StructField("resource_name", T.StringType(), True),  # may be blank/whitespace
        T.StructField("time", T.LongType(), True),  # epoch millis (adapter.go:242)
        T.StructField("trace_status", T.StringType(), True),  # normal|warning|incident
        T.StructField("code", T.StringType(), True),
    ]
)

#: Normalized, flattened CloudEvent envelope — SURVEY §1.1b / §1.3.
#: One row per event; extensions flattened to top-level columns.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),  # = trace_id (adapter.go:222)
        T.StructField("source", T.StringType(), True),  # endpoint URL (adapter.go:224)
        T.StructField("type", T.StringType(), True),  # derived (adapter.go:226-234)
        T.StructField("subject", T.StringType(), True),  # blank-coalesce (adapter.go:236-240)
        T.StructField("event_time", T.TimestampType(), True),  # UnixMilli (adapter.go:242)
        T.StructField("status", T.StringType(), True),  # ext (adapter.go:249)
        T.StructField("code", T.StringType(), True),  # ext (adapter.go:250)
        T.StructField("resource_id", T.StringType(), True),  # ext (adapter.go:251)
        T.StructField("region", T.StringType(), True),  # ext from context (adapter.go:252)
        T.StructField("domain", T.StringType(), True),  # ext from context (adapter.go:253)
        T.StructField("tenant", T.StringType(), True),  # ext from context (adapter.go:254)
        T.StructField("data", T.StringType(), True),  # full trace as JSON (adapter.go:244)
    ]
)

# --------------------------------------------------------------------------
# Driver fixture tables (/root/testdata/sf*/ — TESTDATA.md, FIXTURES.md §1)
# --------------------------------------------------------------------------

REGION_SCHEMA = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART_SCHEMA = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

# The driver parquet stores ts as plain TIMESTAMP(MICROS) — a native
# Spark TimestampType read, no legacy flags (footer verified at every sf).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON payload (≈ CE data)
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION_SCHEMA,
    "nation": NATION_SCHEMA,
    "customer": CUSTOMER_SCHEMA,
    "supplier": SUPPLIER_SCHEMA,
    "part": PART_SCHEMA,
    "orders": ORDERS_SCHEMA,
    "lineitem": LINEITEM_SCHEMA,
    "events": EVENTS_SCHEMA,
    "documents": DOCUMENTS_SCHEMA,
    "embeddings": EMBEDDINGS_SCHEMA,
}

# --------------------------------------------------------------------------
# Graph layer (SURVEY §1.1d; /root/reference/pkg/neo4j/client.go:10-20)
# --------------------------------------------------------------------------

#: Node labels → key columns. TENANT has a composite key (client.go:13).
NODE_KEYS: dict[str, list[str]] = {
    "regions": ["name"],
    "statuses": ["id"],
    "subjects": ["id"],
    "tenants": ["tenant_id", "domain_id"],
    "resources": ["id"],
    "actions": ["id"],
}

#: Edge types → (src key cols, dst key cols) per the Cypher MERGE template.
EDGE_ENDPOINTS: dict[str, tuple[str, str]] = {
    "applied_on": ("action_id", "resource_id"),  # client.go:15,18
    "located_at": ("tenant_id", "region_name"),  # client.go:16
    "member_of": ("resource_id", "tenant_id"),  # client.go:17
    "with_status": ("action_id", "status_id"),  # client.go:19
    "performed_by": ("action_id", "subject_id"),  # client.go:20
}
