"""Graph materialization tests — MERGE idempotency semantics (SURVEY §2 A14)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from cloudtrace_exporter_spark.operators import graph
from cloudtrace_exporter_spark.schemas import EVENT_SCHEMA


def _event(**kw) -> Row:
    base = dict(
        event_id="e1",
        source="https://cts.example",
        type="ecs.apicall.ecs.create",
        subject="server-a",
        event_time=dt.datetime(2024, 1, 1, 12, 0, 0),
        status="normal",
        code="200",
        resource_id="r1",
        region="eu-de",
        domain="d1",
        tenant="p1",
        data="{}",
    )
    base.update(kw)
    return Row(**base)


def _events(spark, rows):
    return spark.createDataFrame(rows, schema=EVENT_SCHEMA)


def test_node_labels_complete(spark):
    nodes = graph.build_nodes(_events(spark, [_event()]))
    assert set(nodes) == {"regions", "statuses", "subjects", "tenants", "resources", "actions"}


def test_edge_types_complete(spark):
    edges = graph.build_edges(_events(spark, [_event()]))
    assert set(edges) == {"applied_on", "located_at", "member_of", "with_status", "performed_by"}


def test_merge_idempotency_duplicate_events(spark):
    # re-delivery of the same actionId is a no-op (client.go MERGE semantics)
    ev = _events(spark, [_event(), _event()])
    nodes, edges = graph.build_graph(ev)
    assert nodes["actions"].count() == 1
    assert edges["applied_on"].count() == 1


def test_dimension_dedup_across_events(spark):
    ev = _events(
        spark,
        [
            _event(event_id="e1", resource_id="r1"),
            _event(event_id="e2", resource_id="r1"),  # same resource
            _event(event_id="e3", resource_id="r2", status="warning"),
        ],
    )
    nodes, edges = graph.build_graph(ev)
    assert nodes["actions"].count() == 3
    assert nodes["resources"].count() == 2
    assert nodes["statuses"].count() == 2
    assert nodes["regions"].count() == 1
    assert edges["applied_on"].count() == 3
    # single tenant → single located_at edge regardless of event count
    assert edges["located_at"].count() == 1


def test_tenant_composite_key(spark):
    ev = _events(
        spark,
        [
            _event(event_id="e1", tenant="p1", domain="d1"),
            _event(event_id="e2", tenant="p1", domain="d2"),  # same tenant id, different domain
        ],
    )
    nodes = graph.build_nodes(ev)
    assert nodes["tenants"].count() == 2  # composite (tenantId, domainId) key — client.go:13


def test_upsert_nodes_anti_join_semantics(spark):
    existing = graph.build_nodes(_events(spark, [_event(event_id="e1")]))["actions"]
    incoming = graph.build_nodes(
        _events(spark, [_event(event_id="e1"), _event(event_id="e2")])
    )["actions"]
    merged = graph.upsert_nodes(existing, incoming, ["id"])
    assert merged.count() == 2
    # re-upserting the same batch changes nothing (idempotent)
    merged2 = graph.upsert_nodes(merged, incoming, ["id"])
    assert merged2.count() == 2


def test_summarize_graph_matches_built_tables(spark):
    # single-scan multi-distinct summary == build every table and count it
    ev = _events(
        spark,
        [
            _event(),
            _event(),  # duplicate delivery
            _event(event_id="e2", resource_id="r2", status="incident"),
            _event(event_id="e3", tenant="p2", region="eu-nl", subject="server-b"),
        ],
    )
    got = {r["table"]: r["n"] for r in graph.summarize_graph(ev).collect()}
    nodes, edges = graph.build_graph(ev)
    want = {f"node:{k}": df.count() for k, df in nodes.items()}
    want.update({f"edge:{k}": df.count() for k, df in edges.items()})
    assert got == want


def test_summarize_graph_counts_null_keys_like_dropduplicates(spark):
    # a null MERGE-key component still forms a group (struct wrap), exactly
    # as dropDuplicates would keep the null row in the built table
    ev = _events(spark, [_event(), _event(event_id="e2", subject=None)])
    got = {r["table"]: r["n"] for r in graph.summarize_graph(ev).collect()}
    nodes, edges = graph.build_graph(ev)
    assert got["node:subjects"] == nodes["subjects"].count() == 2
    assert got["edge:performed_by"] == edges["performed_by"].count() == 2


# --------------------------------------------------------------------------
# degree distribution + pagerank
# --------------------------------------------------------------------------


def test_degree_distribution_counts_nodes_per_degree(spark):
    edges = spark.createDataFrame(
        [(1, "r1"), (2, "r1"), (3, "r1"), (4, "r2"), (5, "r2"), (6, "r3")],
        ["src", "dst"],
    )
    got = {r["degree"]: r["n_nodes"] for r in graph.degree_distribution(edges).collect()}
    assert got == {3: 1, 2: 1, 1: 1}


def test_pagerank_symmetric_cycle_is_uniform(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {r["id"]: r["pagerank"] for r in graph.pagerank(edges, n_iter=5).collect()}
    assert got == {"a": 0.5, "b": 0.5}
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_sink_hub_ranks_highest(spark):
    # three spokes all point at the hub; hub points back at one spoke
    edges = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        ["src", "dst"],
    )
    got = {r["id"]: r["pagerank"] for r in graph.pagerank(edges, n_iter=20).collect()}
    assert got["hub"] == max(got.values())
    assert got["s1"] > got["s2"] == got["s3"]


def test_pagerank_scaled_tracks_float_pagerank(spark):
    # the integer-scaled oracle twin must agree with the float method to
    # ~1e-9 relative (scale 1e12, floor-div error per round is O(1/scale))
    # and preserve its ranking on the same hub graph
    edges = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        ["src", "dst"],
    )
    # 20 rounds: the hub/spoke cycle still oscillates at 10 (the scaled
    # trajectory tracks the float one exactly either way — the ordering
    # assertions below need the converged state the float test pins)
    flt = {r["id"]: r["pagerank"] for r in graph.pagerank(edges, n_iter=20).collect()}
    scl = {
        r["id"]: r["pagerank_scaled"]
        for r in graph.pagerank_scaled(edges, n_iter=20).collect()
    }
    assert set(flt) == set(scl)
    for k in flt:
        assert abs(scl[k] / 1e12 - flt[k]) < 1e-6, (k, scl[k], flt[k])
    assert scl["hub"] == max(scl.values())
    assert scl["s1"] > scl["s2"] == scl["s3"]


def test_bfs_distances_path_graph(spark):
    # path a-b-c-d-e plus disconnected f-g: exact hop counts, unreachable absent
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "g")], ["src", "dst"]
    )
    src = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["dist"] for r in graph.bfs_distances(edges, src).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4}


def test_bfs_distances_multi_source_takes_min(spark):
    # sources at both ends of the path: middle node settles at the nearer one
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"]
    )
    src = spark.createDataFrame([("a",), ("e",)], ["node"])
    got = {r["node"]: r["dist"] for r in graph.bfs_distances(edges, src).collect()}
    assert got == {"a": 0, "e": 0, "b": 1, "d": 1, "c": 2}


def test_bfs_distances_respects_max_hops(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    src = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["dist"] for r in graph.bfs_distances(edges, src, max_hops=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}  # d is 3 hops out -> not settled


def test_kcore_peels_tail_keeps_triangle(spark):
    from cloudtrace_exporter_spark.operators import graph as g

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r["id"]: r["core_degree"] for r in g.kcore(edges, k=2).collect()}
    # the 3-4-5 tail peels away (5 has degree 1, then 4); the triangle stays
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_fixpoint_invariant_on_fixture_graph(spark, sf_dir):
    from cloudtrace_exporter_spark.operators import dedup
    from cloudtrace_exporter_spark.operators import graph as g
    from cloudtrace_exporter_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = dedup.jaccard_pairs(docs, threshold=0.9).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    core = g.kcore(pairs, k=2)
    rows = core.collect()
    # fixpoint invariant: every surviving node keeps degree >= k INSIDE the core
    assert all(r["core_degree"] >= 2 for r in rows)
    # idempotence: re-running on the induced subgraph changes nothing
    ids = {r["id"] for r in rows}
    induced = pairs.filter(F.col("src").isin(ids) & F.col("dst").isin(ids))
    again = {r["id"]: r["core_degree"] for r in g.kcore(induced, k=2).collect()}
    assert again == {r["id"]: r["core_degree"] for r in rows}


def test_neighbor_jaccard_counts_shared_destinations(spark):
    # a and b share parts {p1, p2}; c shares only p1 with them
    edges = spark.createDataFrame(
        [("a", "p1"), ("a", "p2"), ("a", "p3"),
         ("b", "p1"), ("b", "p2"),
         ("c", "p1"), ("c", "p4")],
        ["src", "dst"],
    )
    got = {
        (r["src_a"], r["src_b"]): r
        for r in graph.neighbor_jaccard(edges, min_shared=2).collect()
    }
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert (r["shared"], r["deg_a"], r["deg_b"]) == (2, 3, 2)
    assert r["jaccard"] == round(2 / 3, 6)  # 2 / (3 + 2 - 2)


def test_label_propagation_separates_planted_communities(spark):
    # two dense stars sharing no edges: every member must adopt its
    # star's label, and the two communities must stay distinct
    from cloudtrace_exporter_spark.operators.graph import label_propagation

    edges = []
    for leaf in ["a1", "a2", "a3", "a4"]:
        edges.append(("hubA", leaf))
    for leaf in ["b1", "b2", "b3", "b4"]:
        edges.append(("hubB", leaf))
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["id"]: r["community"] for r in label_propagation(df, n_rounds=4).collect()}
    a = {out[n] for n in ["hubA", "a1", "a2", "a3", "a4"]}
    b = {out[n] for n in ["hubB", "b1", "b2", "b3", "b4"]}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_label_propagation_tie_breaks_to_smallest_label(spark):
    # a single edge: self-inclusive voting ties own-vs-neighbor label
    # everywhere, the smallest label wins, and the pair converges to
    # ONE community named by the smaller node — stable from round 1 on
    from cloudtrace_exporter_spark.operators.graph import label_propagation

    df = spark.createDataFrame([("x", "y")], "src string, dst string")
    for rounds in (1, 2, 4):
        out = {
            r["id"]: r["community"]
            for r in label_propagation(df, n_rounds=rounds).collect()
        }
        assert out == {"x": "x", "y": "x"}


def test_triangle_counts_planted_clique_and_chain(spark):
    """4-clique: every node in C(3,2)=3 triangles; a disjoint 3-chain
    (path, not closed) contributes none; reversed/duplicate edges are
    normalized."""
    from cloudtrace_exporter_spark.operators import graph as g

    clique = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    chain = [(10, 11), (12, 11)]  # one edge reversed on purpose
    edges = spark.createDataFrame(clique + chain + clique, "doc_a long, doc_b long")
    out = {r.doc_id: r.n_triangles for r in g.triangle_counts(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_global_sum_matches_census(spark, sf_dir):
    """Per-node participation sums to 3x the global 3-clique census on
    the same edge set (each triangle touches three nodes)."""
    from cloudtrace_exporter_spark.operators import dedup
    from cloudtrace_exporter_spark.operators import graph as g
    from cloudtrace_exporter_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = dedup.jaccard_pairs(docs, 0.95).select("doc_a", "doc_b")
    per_node = g.triangle_counts(pairs)
    total = per_node.agg(F.sum("n_triangles")).collect()[0][0] or 0
    census = dedup.similarity_triangles(pairs).collect()[0][0]
    assert total == 3 * census


def test_degree_assortativity_star_and_clique(spark):
    """A star K{1,3} is perfectly disassortative (r = -1: hubs only link
    to leaves); a clique has zero degree variance (NULL, not a crash);
    duplicate/reversed edges are normalized first."""
    from cloudtrace_exporter_spark.operators import graph as g

    star = spark.createDataFrame(
        [(0, 1), (2, 0), (0, 3), (1, 0)], "doc_a long, doc_b long"
    )
    r = g.degree_assortativity(star).collect()[0]
    assert (r.n_edges, r.n_nodes, r.assortativity) == (3, 4, -1.0)
    clique = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "doc_a long, doc_b long"
    )
    c = g.degree_assortativity(clique).collect()[0]
    assert c.n_edges == 3 and c.assortativity is None
