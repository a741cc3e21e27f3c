"""Tests for pivot, bivariate stats, and deterministic hash sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudtrace_exporter_spark.operators import analytics
from cloudtrace_exporter_spark.sources.tables import load_table


def test_hex_threshold_clamps_full_fraction():
    # 1.0 must sort after EVERY 8-char hex prefix, not encode as 9 chars
    assert analytics._hex_threshold(1.0) == "g"
    assert "ffffffff" < "g"
    assert analytics._hex_threshold(0.2) == "33333333"
    assert analytics._hex_threshold(0.0) == "00000000"


def test_hash_sample_deterministic_and_unbiased(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = analytics.hash_sample(docs, key_col="doc_id", fraction=0.5)
    s2 = analytics.hash_sample(docs, key_col="doc_id", fraction=0.5)
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # reproducible
    n = docs.count()
    assert 0.3 * n <= len(ids1) <= 0.7 * n  # roughly the asked fraction


def test_hash_sample_is_nested(spark, sf_dir):
    # a 10% sample is a subset of the 50% sample — same hash, lower bar
    docs = load_table(spark, sf_dir, "documents")
    small = {r.doc_id for r in analytics.hash_sample(docs, key_col="doc_id", fraction=0.1).collect()}
    big = {r.doc_id for r in analytics.hash_sample(docs, key_col="doc_id", fraction=0.5).collect()}
    assert small <= big


def test_stratified_sample_keeps_default_strata_whole(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = analytics.stratified_hash_sample(
        docs, key_col="doc_id", strata_col="lang", fractions={"en": 0.25}, default_fraction=1.0
    )
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in total.items():
        if lang == "en":
            assert by_lang.get(lang, 0) < n
        else:
            assert by_lang.get(lang) == n  # fraction 1.0 ⇒ nothing dropped


def test_pivot_counts_match_groupby(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    piv = {
        r["o_orderpriority"]: (r["n_open"], r["n_finished"], r["n_pending"])
        for r in analytics.pivot_status_by_priority(orders).collect()
    }
    flat = {
        (r["o_orderpriority"], r["o_orderstatus"]): r["n"]
        for r in orders.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for prio, (o, f, p) in piv.items():
        assert o == flat.get((prio, "O"), 0)
        assert f == flat.get((prio, "F"), 0)
        assert p == flat.get((prio, "P"), 0)


def test_corr_stats_bounded(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    for r in analytics.corr_stats(li).collect():
        assert -1.0 <= r["corr_qty_price"] <= 1.0
        assert r["sd_qty"] >= 0 and r["sd_price"] >= 0
