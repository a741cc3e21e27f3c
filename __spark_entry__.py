"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship star-join smoke query at sf0.001.
``queries()`` — one callable per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted for ops that
aren't exactly SQL-expressible → driver does a rows-only check).

Cross-engine conventions (see operators/analytics.py docstring):
every computed column aliased identically on both sides; double
aggregates rounded; timestamps formatted to ``yyyy-MM-dd HH:mm:ss``
strings; integer sums cast to BIGINT in DuckDB (its integer SUM returns
HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrace_exporter_spark.operators import analytics, graph, normalize
from cloudtrace_exporter_spark.sources.tables import load_table

# Auth-context constants for the normalize chain (the reference takes these
# from the OTC client context, /root/reference/pkg/adapter/adapter.go:224,252-254).
CTX = {
    "source": "https://cts.example",
    "region": "eu-de",
    "domain": "domain-1",
    "tenant": "tenant-1",
}

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Full 4-hop star join (lineitem⋈orders⋈customer⋈nation⋈region — the
    ACTION→RESOURCE→TENANT→REGION graph walk, SURVEY §1.1d) + revenue
    rollup per region.
    """
    t = {n: load_table(spark, SMOKE_SF_DIR, n) for n in ("lineitem", "orders", "customer", "nation", "region")}
    return analytics.star_join_revenue(t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"])


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _normalized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture → TRACE_SCHEMA → normalized EVENT_SCHEMA (Part A chain)."""
    ev = load_table(spark, sf_dir, "events")
    return normalize.normalize_traces(normalize.events_as_traces(ev), **CTX)


def _ts_s(col: str, alias: str) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss").alias(alias)


# --------------------------------------------------------------------------
# B-I: event-pipeline relational core (SURVEY §2 B2-B8)
# --------------------------------------------------------------------------


def q_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    windowed = normalize.time_window_filter(ev, "ts", "2024-01-05 00:00:00", "2024-01-15 00:00:00")
    return windowed.select("event_id", _ts_s("ts", "ts_s"), "event_type", "user_id", "value")


def q_normalize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ne = _normalized_events(spark, sf_dir)
    return ne.select(
        "event_id",
        "source",
        "type",
        "subject",
        _ts_s("event_time", "event_time_s"),
        "status",
        "code",
        "resource_id",
        "region",
        "domain",
        "tenant",
    )


def q_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: literal enrichment then K_CE_OVERRIDES merge — last writer wins
    (adapter.go:256-261): region is overridden, a new column appends."""
    ne = _normalized_events(spark, sf_dir)
    overridden = normalize.apply_overrides(ne, {"region": "eu-nl", "priority": "high"})
    return overridden.select("event_id", "region", "domain", "tenant", "priority")


def q_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: at-least-once → effectively-once. Simulates the reference's
    overlapping poll windows (adapter.go:266-271) by unioning the stream
    with itself, then dedups by event id (MERGE idempotency, client.go)."""
    ev = load_table(spark, sf_dir, "events")
    doubled = ev.union(ev)
    deduped = normalize.dedup_events(doubled, "event_id")
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: JSON payload field extraction (inverse of A9's to_json)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select((k % 10).alias("k_mod10"), k.alias("k"))
        .groupBy("k_mod10")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
        .orderBy("k_mod10")
    )


def q_status_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: value → normal/warning/incident buckets (README.md:44 enum)."""
    ev = load_table(spark, sf_dir, "events")
    classified = normalize.classify_status(ev, "value", "status")
    return (
        classified.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 2).alias("avg_value"))
        .orderBy("status")
    )


def q_count_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: tumbling-window batch counts (A12's per-cycle count, set at hour
    grain via date_trunc so it is batch- and oracle-expressible)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(_ts_s("hour_ts", "hour_s"), "n", "sum_value")
    )


# --------------------------------------------------------------------------
# B-II: graph materialization + analytics (B9-B25)
# --------------------------------------------------------------------------


def q_nodes_resource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: RESOURCE node extraction — distinct dim from the event stream
    (MERGE (resource:RESOURCE{id}), client.go:14)."""
    nodes = graph.build_nodes(_normalized_events(spark, sf_dir))
    return nodes["resources"]


def q_nodes_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: ACTION node (fact) extraction with attrs (client.go:15)."""
    nodes = graph.build_nodes(_normalized_events(spark, sf_dir))
    return nodes["actions"].select("id", _ts_s("timestamp", "ts_s"), "source", "type")


def q_edges_applied_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: ACTION-[:APPLIED_ON]->RESOURCE edge table (client.go:15,18)."""
    edges = graph.build_edges(_normalized_events(spark, sf_dir))
    return edges["applied_on"]


def q_edges_performed_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: ACTION-[:PERFORMED_BY]->SUBJECT edge table (client.go:20)."""
    edges = graph.build_edges(_normalized_events(spark, sf_dir))
    return edges["performed_by"]


def q_join_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in ("lineitem", "orders", "customer")}
    return analytics.join_2hop(t["lineitem"], t["orders"], t["customer"])


def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in ("lineitem", "orders", "customer", "nation", "region")}
    return analytics.star_join_revenue(t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"])


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.semi_join_incident(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.anti_join_no_incident(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def q_left_join_zero_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.left_join_zero_actions(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def q_agg_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.agg_by_status(load_table(spark, sf_dir, "lineitem"))


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.count_distinct_subjects(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.approx_count_distinct_subjects(load_table(spark, sf_dir, "orders"))


def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in ("orders", "customer", "nation", "region")}
    return analytics.rollup_region_nation(t["orders"], t["customer"], t["nation"], t["region"])


def q_topk_resources(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.topk_resources(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part"), k=10
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.window_rank(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders"), k=3
    )


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.window_lag_lead(load_table(spark, sf_dir, "events"))


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.running_sum(load_table(spark, sf_dir, "events"))


def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.global_sort(load_table(spark, sf_dir, "orders"), n=1000)


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.set_ops_union(load_table(spark, sf_dir, "orders"))


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.set_ops_intersect(load_table(spark, sf_dir, "orders"))


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.set_ops_except(load_table(spark, sf_dir, "orders"))


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.asof_join_daily(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.scalar_funcs(load_table(spark, sf_dir, "part"))


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_time_window": q_time_window,
        "q_normalize_events": q_normalize_events,
        "q_enrich_events": q_enrich_events,
        "q_dedup_events": q_dedup_events,
        "q_json_extract": q_json_extract,
        "q_status_classify": q_status_classify,
        "q_count_per_window": q_count_per_window,
        "q_nodes_resource": q_nodes_resource,
        "q_nodes_action": q_nodes_action,
        "q_edges_applied_on": q_edges_applied_on,
        "q_edges_performed_by": q_edges_performed_by,
        "q_join_2hop": q_join_2hop,
        "q_join_star": q_join_star,
        "q_semi_join": q_semi_join,
        "q_anti_join": q_anti_join,
        "q_left_join_zero_actions": q_left_join_zero_actions,
        "q_agg_by_status": q_agg_by_status,
        "q_count_distinct": q_count_distinct,
        "q_approx_count_distinct": q_approx_count_distinct,
        "q_rollup_region_nation": q_rollup_region_nation,
        "q_topk_resources": q_topk_resources,
        "q_window_rank": q_window_rank,
        "q_window_lag_lead": q_window_lag_lead,
        "q_running_sum": q_running_sum,
        "q_global_sort": q_global_sort,
        "q_union": q_union,
        "q_intersect": q_intersect,
        "q_except": q_except,
        "q_asof_join": q_asof_join,
        "q_scalar_funcs": q_scalar_funcs,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

# DuckDB mirror of normalize.events_as_traces + normalize.normalize_traces —
# keep in lockstep with those functions.
EVENTS_AS_TRACES_SQL = """
  traces AS (
    SELECT
      CAST(event_id AS VARCHAR) AS trace_id,
      'cts' AS service_type,
      event_type AS trace_type,
      'res' AS resource_type,
      CASE WHEN event_type = 'view' THEN '' ELSE event_type END AS trace_name,
      'r' || CAST(user_id AS VARCHAR) AS resource_id,
      CASE WHEN value < 100 THEN '' ELSE 'res-' || CAST(user_id AS VARCHAR) END AS resource_name,
      epoch_ms(ts) AS t_ms,
      CASE WHEN value < 100 THEN 'normal' WHEN value < 300 THEN 'warning' ELSE 'incident' END AS trace_status,
      json_extract_string(props, '$.k') AS code
    FROM events
  ),
  norm AS (
    SELECT
      trace_id AS event_id,
      'https://cts.example' AS source,
      rtrim(lower(concat_ws('.', service_type, trace_type, resource_type, trace_name)), '.') AS type,
      CASE WHEN regexp_replace(resource_name, '^\s+|\s+$', '', 'g') <> '' THEN resource_name ELSE resource_id END AS subject,
      epoch_ms(t_ms) AS event_time,
      trace_status AS status,
      code,
      resource_id,
      'eu-de' AS region,
      'domain-1' AS domain,
      'tenant-1' AS tenant
    FROM traces
  )
"""


def oracle_sql() -> dict[str, str]:
    rev = "l_extendedprice * (1 - l_discount)"
    return {
        "q_time_window": """
            SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type, user_id, value
            FROM events
            WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-15 00:00:00'
        """,
        "q_normalize_events": f"""
            WITH {EVENTS_AS_TRACES_SQL}
            SELECT event_id, source, type, subject,
                   strftime(event_time, '%Y-%m-%d %H:%M:%S') AS event_time_s,
                   status, code, resource_id, region, domain, tenant
            FROM norm
        """,
        "q_enrich_events": f"""
            WITH {EVENTS_AS_TRACES_SQL}
            SELECT event_id, 'eu-nl' AS region, domain, tenant, 'high' AS priority
            FROM norm
        """,
        "q_dedup_events": """
            SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
            FROM (SELECT DISTINCT * FROM (SELECT * FROM events UNION ALL SELECT * FROM events))
            GROUP BY event_type
        """,
        "q_json_extract": """
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10,
                   count(*) AS n,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "q_status_classify": """
            SELECT CASE WHEN value < 100 THEN 'normal' WHEN value < 300 THEN 'warning' ELSE 'incident' END AS status,
                   count(*) AS n, round(avg(value), 2) AS avg_value
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "q_count_per_window": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1
        """,
        "q_nodes_resource": f"""
            WITH {EVENTS_AS_TRACES_SQL}
            SELECT DISTINCT resource_id AS id FROM norm
        """,
        "q_nodes_action": f"""
            WITH {EVENTS_AS_TRACES_SQL}
            SELECT event_id AS id, strftime(event_time, '%Y-%m-%d %H:%M:%S') AS ts_s, source, type
            FROM norm
        """,
        "q_edges_applied_on": f"""
            WITH {EVENTS_AS_TRACES_SQL}
            SELECT DISTINCT event_id AS src, resource_id AS dst FROM norm
        """,
        "q_edges_performed_by": f"""
            WITH {EVENTS_AS_TRACES_SQL}
            SELECT DISTINCT event_id AS src, subject AS dst FROM norm
        """,
        "q_join_2hop": """
            SELECT c_mktsegment, count(*) AS n_items, round(sum(l_extendedprice), 2) AS gross
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "q_join_star": f"""
            SELECT r_name, count(*) AS n_items, round(sum({rev}), 2) AS revenue,
                   round(avg(l_quantity), 2) AS avg_qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
                          JOIN nation ON c_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "q_semi_join": """
            SELECT o_orderstatus, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "q_anti_join": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q_left_join_zero_actions": """
            WITH per_cust AS (
              SELECT c_custkey, c_nationkey, count(o_orderkey) AS n_orders
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey, c_nationkey
            )
            SELECT c_nationkey, count(*) AS n_customers,
                   CAST(sum(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
            FROM per_cust GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "q_agg_by_status": f"""
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum({rev}), 2) AS sum_disc_price,
                   round(sum({rev} * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 2) AS avg_qty,
                   round(avg(l_extendedprice), 2) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_count_distinct": """
            SELECT n_regionkey, count(DISTINCT o_custkey) AS n_subjects
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_regionkey ORDER BY n_regionkey
        """,
        # q_approx_count_distinct: HLL values are engine-specific → rows-only.
        "q_rollup_region_nation": """
            SELECT r_name, n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
                        JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "q_topk_resources": """
            SELECT p_partkey, p_name, n_actions, qty FROM (
              SELECT p_partkey, p_name, count(*) AS n_actions, round(sum(l_quantity), 2) AS qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY p_partkey, p_name
            ) ORDER BY n_actions DESC, p_partkey ASC LIMIT 10
        """,
        "q_window_rank": """
            SELECT c_nationkey, o_custkey, spend, rnk FROM (
              SELECT c_nationkey, o_custkey, spend,
                     row_number() OVER (PARTITION BY c_nationkey ORDER BY spend DESC, o_custkey ASC) AS rnk
              FROM (
                SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
                FROM orders GROUP BY o_custkey
              ) JOIN customer ON o_custkey = c_custkey
            ) WHERE rnk <= 3 ORDER BY c_nationkey, rnk
        """,
        "q_window_lag_lead": """
            SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                   lag(event_id) OVER w AS prev_event_id,
                   lead(event_id) OVER w AS next_event_id,
                   CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "q_running_sum": """
            SELECT event_id, user_id,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS errors_so_far,
                   round(sum(value)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value_so_far
            FROM events
        """,
        "q_global_sort": """
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate, o_totalprice
            FROM orders ORDER BY odate ASC, o_orderkey ASC LIMIT 1000
        """,
        "q_union": """
            SELECT o_orderstatus, count(*) AS n FROM (
              SELECT DISTINCT o_orderkey, o_orderstatus FROM (
                SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100000.0
              )
            ) GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "q_intersect": """
            SELECT count(*) AS n_common FROM (
              SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
              INTERSECT
              SELECT o_orderkey FROM orders WHERE o_totalprice > 100000.0
            )
        """,
        "q_except": """
            SELECT count(*) AS n_only_f FROM (
              SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
              EXCEPT ALL
              SELECT o_orderkey FROM orders WHERE o_totalprice > 100000.0
            )
        """,
        "q_asof_join": """
            WITH daily AS (
              SELECT o_orderdate, count(*) AS n_orders, max(o_orderkey) AS last_orderkey
              FROM orders GROUP BY o_orderdate
            ),
            ship AS (SELECT DISTINCT l_shipdate FROM lineitem)
            SELECT strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_s,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS asof_s,
                   n_orders, last_orderkey
            FROM ship ASOF LEFT JOIN daily ON l_shipdate >= o_orderdate
        """,
        "q_scalar_funcs": """
            SELECT p_partkey,
                   lower(p_brand) AS brand_lc,
                   trim(concat_ws('/', p_brand, p_type)) AS brand_type,
                   regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
                   substring(p_type, 1, 5) AS type5,
                   round(abs(p_retailprice - 1000.0), 2) AS price_dev,
                   round(ln(p_retailprice + 1.0), 6) AS log_price,
                   round(pow(CAST(p_size AS DOUBLE), 2.0), 2) AS size_sq
            FROM part
        """,
    }
