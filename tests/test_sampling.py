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


# --------------------------------------------------------------------------
# unpivot / arg-max / daily spine / PII redaction
# --------------------------------------------------------------------------


def test_unpivot_triples_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    assert analytics.unpivot_measures(li).count() == 3 * li.count()


def test_top_user_arg_max_breaks_ties_by_user_id(spark):
    ev = spark.createDataFrame(
        [(1, "click", 5.0), (2, "click", 5.0), (3, "click", 1.0)],
        ["user_id", "event_type", "value"],
    )
    rows = analytics.top_user_per_event_type(ev).collect()
    assert len(rows) == 1
    # users 1 and 2 tie on total=5.0 → fieldwise struct max picks user_id 2
    assert rows[0]["user_id"] == 2 and rows[0]["total"] == 5.0


def test_daily_spine_fills_gaps_with_zeros(spark):
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10), 2.0),
            (2, dt.datetime(2024, 1, 4, 12), 3.0),
        ],
        ["event_id", "ts", "value"],
    )
    rows = {r["day_s"]: (r["n"], r["sum_value"]) for r in analytics.daily_spine(ev).collect()}
    assert rows == {
        "2024-01-01": (1, 2.0),
        "2024-01-02": (0, 0.0),
        "2024-01-03": (0, 0.0),
        "2024-01-04": (1, 3.0),
    }


def test_interpolate_daily_gaps_linear_and_edge_fill(spark):
    import datetime as dt

    # series "a": observed on days 1, 4, 5 → days 2,3 interpolate the
    # 10→40 ramp at 1/3 and 2/3; series "b": missing the FIRST day →
    # leading-edge carry of the next observation.
    ev = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 1), 10.0),
            ("a", dt.datetime(2024, 1, 4, 1), 40.0),
            ("a", dt.datetime(2024, 1, 5, 1), 50.0),
            ("b", dt.datetime(2024, 1, 2, 1), 7.0),
            ("b", dt.datetime(2024, 1, 5, 1), 13.0),
        ],
        ["event_type", "ts", "value"],
    )
    out = analytics.interpolate_daily_gaps(ev)
    rows = {(r["series"], r["day_s"]): (r["observed"], r["filled"]) for r in out.collect()}
    assert len(rows) == 10  # 2 series × 5-day global spine
    assert rows[("a", "2024-01-02")] == (False, 10.0 + 30.0 * (1 / 3))
    assert rows[("a", "2024-01-03")] == (False, 10.0 + 30.0 * (2 / 3))
    assert rows[("a", "2024-01-04")] == (True, 40.0)
    assert rows[("b", "2024-01-01")] == (False, 7.0)   # leading-edge carry
    assert rows[("b", "2024-01-03")] == (False, 7.0 + 6.0 * (1 / 3))
    # trailing edge: series observed at its last day stays observed
    assert rows[("b", "2024-01-05")] == (True, 13.0)


def test_redact_pii_planted(spark):
    from cloudtrace_exporter_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@example.org or see https://x.io/p?q=1 ref 1234567 ok 123")],
        ["doc_id", "text"],
    )
    out = text_ops.redact_pii(df).collect()[0]["redacted"]
    assert out == "mail me at <EMAIL> or see <URL> ref <NUM> ok 123"


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact = {r["o_orderpriority"]: (r["p50"], r["p99"]) for r in analytics.percentiles(orders).collect()}
    approx = {
        r["o_orderpriority"]: (r["p50_approx"], r["p99_approx"])
        for r in analytics.approx_percentiles(orders).collect()
    }
    for prio, (p50, p99) in exact.items():
        a50, a99 = approx[prio]
        assert abs(a50 - p50) / p50 < 0.02
        assert abs(a99 - p99) / p99 < 0.02


def test_value_histogram_shares_sum_to_one(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = analytics.value_histogram(ev, width=50.0).collect()
    assert sum(r["n"] for r in rows) == ev.count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_char_entropy_orders_degenerate_below_diverse(spark):
    from cloudtrace_exporter_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "aaaaaaaaaa"), (2, "abcdefghij")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["char_entropy"] for r in text_ops.char_entropy(df).collect()}
    assert got[1] == 0.0            # single-symbol text has zero entropy
    assert abs(got[2] - 2.302585) < 1e-5  # ln(10) for 10 uniform symbols


def test_rolling_window_uses_time_not_rows(spark):
    import datetime as dt

    # three events: two within 7 days, one 30 days earlier — the range
    # frame must exclude the old one even though it's an adjacent row
    ev = spark.createDataFrame(
        [
            (1, 7, dt.datetime(2024, 1, 1), 1.0),
            (2, 7, dt.datetime(2024, 1, 28), 10.0),
            (3, 7, dt.datetime(2024, 2, 1), 100.0),
        ],
        ["event_id", "user_id", "ts", "value"],
    )
    got = {r["event_id"]: (r["n_trailing"], r["sum_trailing"]) for r in
           analytics.rolling_window_sum(ev, days=7).collect()}
    assert got[1] == (1, 1.0)
    assert got[2] == (1, 10.0)       # Jan 1 is outside the 7-day frame
    assert got[3] == (2, 110.0)      # Jan 28 is inside


def test_event_transitions_counts_ordered_pairs(spark):
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 1, 1), "a", 0.0),
            (2, 1, dt.datetime(2024, 1, 1, 2), "b", 0.0),
            (3, 1, dt.datetime(2024, 1, 1, 3), "a", 0.0),
            (4, 2, dt.datetime(2024, 1, 1, 1), "b", 0.0),
            (5, 2, dt.datetime(2024, 1, 1, 2), "a", 0.0),
        ],
        ["event_id", "user_id", "ts", "event_type", "value"],
    )
    got = {(r["prev_type"], r["next_type"]): r["n_transitions"]
           for r in analytics.event_transitions(ev).collect()}
    assert got == {("a", "b"): 1, ("b", "a"): 2}


def test_funnel_orders_and_monotone(spark):
    import datetime as dt

    d = dt.datetime
    ev = spark.createDataFrame(
        [
            # user 1: full ordered funnel
            (1, 1, d(2024, 1, 1), "view", 0.0),
            (2, 1, d(2024, 1, 2), "click", 0.0),
            (3, 1, d(2024, 1, 3), "purchase", 0.0),
            # user 2: purchase BEFORE click → not an ordered conversion
            (4, 2, d(2024, 1, 1), "view", 0.0),
            (5, 2, d(2024, 1, 2), "purchase", 0.0),
            (6, 2, d(2024, 1, 3), "click", 0.0),
            # user 3: only view
            (7, 3, d(2024, 1, 1), "view", 0.0),
        ],
        ["event_id", "user_id", "ts", "event_type", "value"],
    )
    got = {r["step"]: r["n_users"] for r in analytics.funnel_conversion(ev).collect()}
    assert got == {"1_view": 3, "2_click": 2, "3_purchase": 1}


def test_cohort_retention_day_zero_covers_all_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = analytics.cohort_retention(ev).collect()
    day0 = sum(r["n_users"] for r in rows if r["day_offset"] == 0)
    assert day0 == ev.select("user_id").distinct().count()
    assert all(r["day_offset"] >= 0 for r in rows)


def test_profile_table_single_scan_and_values(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    prof = analytics.profile_table(
        orders, numeric_cols=["o_totalprice"], key_cols=["o_orderkey"]
    )
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1  # one pass over the table
    rows = {r["column"]: r for r in prof.collect()}
    assert rows["o_orderkey"]["n_distinct"] == orders.count()  # unique key
    assert rows["o_orderkey"]["n_nulls"] == 0
    assert rows["o_totalprice"]["min_val"] <= rows["o_totalprice"]["max_val"]


def test_mad_outliers_flags_planted_spike(spark):
    import datetime as dt

    rows = [(i, 1, dt.datetime(2024, 1, 1), "click", float(10 + (i % 3))) for i in range(20)]
    rows.append((99, 1, dt.datetime(2024, 1, 1), "click", 1000.0))  # the spike
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type", "value"])
    got = analytics.mad_outliers(ev, k=3.0).collect()
    assert [r["event_id"] for r in got] == [99]
    assert got[0]["mad_score"] > 100


def test_scd2_intervals_contiguous_and_versioned(spark):
    import datetime as dt

    # user 1: click → click → view → click ; user 2: view only
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0), "click"),
        (2, 1, dt.datetime(2024, 1, 1, 1), "click"),   # same run, no new interval
        (3, 1, dt.datetime(2024, 1, 1, 2), "view"),
        (4, 1, dt.datetime(2024, 1, 1, 3), "click"),
        (5, 2, dt.datetime(2024, 1, 1, 0), "view"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    got = analytics.scd2_intervals(ev).orderBy("user_id", "version").collect()
    assert [(r.user_id, r.event_type, r.version) for r in got] == [
        (1, "click", 1), (1, "view", 2), (1, "click", 3), (2, "view", 1),
    ]
    # intervals tile: each valid_to equals the next version's valid_from
    u1 = [r for r in got if r.user_id == 1]
    for cur, nxt in zip(u1, u1[1:]):
        assert cur.valid_to == nxt.valid_from
    assert u1[-1].valid_to is None and got[-1].valid_to is None  # open current rows


def test_range_join_binned_equals_naive_interval_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    binned = analytics.range_join_binned(ev, minutes=5)
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("hi"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(F.col("ts").alias("p_ts"))
    naive = (
        err.crossJoin(pur)
        .filter((F.col("p_ts") >= F.col("lo")) & (F.col("p_ts") <= F.col("hi")))
        .groupBy("error_id")
        .agg(F.count("*").alias("n_purchases"))
    )
    assert sorted(map(tuple, binned.collect())) == sorted(map(tuple, naive.collect()))


def test_hll_rollup_merge_matches_direct_sketch_and_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rolled = {
        (r.event_type, r.month): r.est_users for r in analytics.hll_rollup(ev).collect()
    }
    direct = {
        (r.event_type, r.month): r.est for r in ev.groupBy(
            "event_type", F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month")
        ).agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")).collect()
    }
    exact = {
        (r.event_type, r.month): r.n for r in ev.groupBy(
            "event_type", F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month")
        ).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert rolled == direct  # merging daily sketches == sketching the month
    for k, est in rolled.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k])  # ~2% HLL error bound


def test_global_row_number_matches_naive_single_partition_window(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    got = analytics.global_row_number(docs, [F.desc("n_chars"), F.asc("doc_id")], num_partitions=7)
    naive = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))).cast("long")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    rns = sorted(r.rn for r in got.collect())
    assert rns == list(range(1, len(rns) + 1))  # contiguous, 1-based, no gaps


def test_heavy_hitters_superset_guarantee(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = analytics.heavy_hitters(ev, cols=["event_type"], support=0.1).collect()[0]
    candidates = set(row["event_type_freqItems"])
    n = ev.count()
    truly_frequent = {
        r["event_type"]
        for r in ev.groupBy("event_type").count().collect()
        if r["count"] >= 0.1 * n
    }
    # no false negatives: every truly-frequent item is in the sketch output
    assert truly_frequent <= candidates
    assert truly_frequent  # fixture has 5 types at ~20% each


def test_rolling_active_users_counts_trailing_window(spark):
    import datetime as dt

    rows = [
        (1, 100, dt.datetime(2024, 1, 1, 5), "click", 1.0),
        (2, 200, dt.datetime(2024, 1, 3, 5), "click", 1.0),
        (3, 200, dt.datetime(2024, 1, 12, 5), "click", 1.0),  # > 7d after day 1
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type", "value"])
    got = {r.wday: r.wau for r in analytics.rolling_active_users(ev, days=7).collect()}
    assert got["2024-01-01"] == 1          # only user 100 so far
    assert got["2024-01-03"] == 2          # both users within the window
    assert got["2024-01-07"] == 2          # day-1 activity still inside 7d
    assert got["2024-01-08"] == 1          # day-1 aged out, day-3 remains
    assert got["2024-01-12"] == 1          # far gap: only user 200
    assert max(got) == "2024-01-12"        # trailing bound: no wdays past max day


def test_weighted_sample_biased_toward_heavy_rows_and_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s1 = analytics.weighted_sample(docs, key_col="doc_id", weight_col="n_chars", k=100)
    s2 = analytics.weighted_sample(docs, key_col="doc_id", weight_col="n_chars", k=100)
    ids1 = sorted(r.doc_id for r in s1.collect())
    assert ids1 == sorted(r.doc_id for r in s2.collect())  # reproducible
    assert len(ids1) == 100
    # inclusion probability ∝ n_chars: sampled docs skew longer on average
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = s1.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean


def test_distribution_drift_flags_shifted_type_only(spark):
    import datetime as dt

    rows = []
    eid = 0
    for day, base in [(1, 0.0), (20, 0.0)]:        # 'stable': same distribution both halves
        for i in range(200):
            rows.append((eid, 1, dt.datetime(2024, 1, day), "stable", base + float(i % 100)))
            eid += 1
    for day, base in [(1, 0.0), (20, 400.0)]:      # 'shifted': values jump after the split
        for i in range(200):
            rows.append((eid, 1, dt.datetime(2024, 1, day), "shifted", base + float(i % 100)))
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type", "value"])
    got = {r.event_type: r.psi for r in analytics.distribution_drift(ev, split="2024-01-15").collect()}
    assert abs(got["stable"]) < 0.01     # identical halves: PSI ~ 0
    assert got["shifted"] > 1.0          # disjoint buckets: large PSI


def test_cohort_retention_hand_computed_grid(spark):
    # verdict r1 #4: pin one hand-computed cohort cell.
    # u1 first seen Jan 1, active Jan 1 + Jan 3 → (01-01, 0) and (01-01, 2)
    # u2 first seen Jan 1, active Jan 1 + Jan 3 → same cells
    # u3 first seen Jan 3, active Jan 3 only   → (01-03, 0)
    import datetime as dt

    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 9), "view"),
        (2, 1, dt.datetime(2024, 1, 3, 23, 59, 59), "click"),
        (3, 2, dt.datetime(2024, 1, 1, 0), "view"),
        (4, 2, dt.datetime(2024, 1, 3, 1), "view"),
        (5, 3, dt.datetime(2024, 1, 3, 12), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in analytics.cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 2,
        ("2024-01-03", 0): 1,
    }


def test_range_join_binned_boundary_inclusivity(spark):
    # verdict r1 #4: pin the ±5min bin boundaries. Purchases exactly AT
    # lo and hi are included (BETWEEN is closed); 1µs outside are not —
    # including a boundary probe that lands in a DIFFERENT bin than the
    # error event (hi = ts+5min crosses the 5-min bin edge).
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 2, 30)
    us = dt.timedelta(microseconds=1)
    five = dt.timedelta(minutes=5)
    rows = [
        (1, 1, t0, "error"),
        (10, 1, t0 - five, "purchase"),       # == lo, adjacent bin → counted
        (11, 1, t0 + five, "purchase"),       # == hi, adjacent bin → counted
        (12, 1, t0 - five - us, "purchase"),  # 1µs early → excluded
        (13, 1, t0 + five + us, "purchase"),  # 1µs late → excluded
        (14, 1, t0, "purchase"),              # same instant → counted
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    got = analytics.range_join_binned(ev, minutes=5).collect()
    assert [(r.error_id, r.n_purchases) for r in got] == [(1, 3)]


def test_session_timezone_pinned_utc_and_formats_agree(spark):
    # verdict r1 #5: the ts-string convention (date_format 'yyyy-MM-dd
    # HH:mm:ss' vs DuckDB strftime) only matches when the session tz is
    # UTC — assert the pin and one known instant end-to-end.
    import datetime as dt

    import duckdb

    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    instant = dt.datetime(2024, 6, 30, 23, 59, 59)
    s = (
        spark.createDataFrame([(instant,)], "ts timestamp")
        .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s"))
        .first()["s"]
    )
    d = duckdb.sql("SELECT strftime(TIMESTAMP '2024-06-30 23:59:59', '%Y-%m-%d %H:%M:%S')").fetchone()[0]
    assert s == d == "2024-06-30 23:59:59"


def test_assign_splits_disjoint_exhaustive_consistent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = analytics.assign_splits(docs, key_col="doc_id")
    n = docs.count()
    # exhaustive: every row gets exactly one label
    assert got.count() == n
    counts = {r["split"]: r["n"] for r in got.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n
    # ~0.8/0.1/0.1 within loose tolerance at 500 docs
    assert counts["train"] / n > 0.7
    # keyed consistency: embeddings sharing the id space land in the
    # same split as their documents
    emb = load_table(spark, sf_dir, "embeddings").withColumnRenamed("vec_id", "doc_id")
    emb_split = analytics.assign_splits(emb, key_col="doc_id").select("doc_id", "split")
    doc_split = got.select("doc_id", "split")
    assert emb_split.join(doc_split, "doc_id").filter(
        emb_split.split != doc_split.split
    ).count() == 0
    # deterministic across invocations
    again = analytics.assign_splits(docs, key_col="doc_id").select("doc_id", "split")
    assert doc_split.exceptAll(again).count() == 0


def test_asof_ranged_carries_across_empty_buckets(spark):
    # right side only has rows in January; left rows in March (two empty
    # buckets later) must still match January's LATEST right row, and a
    # left row BEFORE any right row gets nulls (left-join semantics).
    import datetime as dt

    left = spark.createDataFrame(
        [
            (100, dt.datetime(2024, 1, 20)),   # in-bucket match
            (101, dt.datetime(2024, 3, 15)),   # carry across feb (empty)
            (102, dt.datetime(2024, 1, 2)),    # before first right row → null
        ],
        "lid long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 5), 50),
            (dt.datetime(2024, 1, 18), 60),
        ],
        "rts timestamp, val long",
    )
    got = {
        r["lid"]: (r["asof_ts"], r["val"])
        for r in analytics.asof_join_ranged(
            left, right, "lts", "rts", ["lid"], ["val"], bucket="month"
        ).collect()
    }
    import datetime as dt2

    assert got[100] == (dt2.datetime(2024, 1, 18), 60)
    assert got[101] == (dt2.datetime(2024, 1, 18), 60)
    assert got[102] == (None, None)


def test_trend_fit_recovers_planted_slope(spark):
    import datetime

    # series A: y = 10 + 2x exactly (one event/day); B: flat at 7
    rows = []
    for d in range(30):
        ts = datetime.datetime(2024, 1, 1, 12) + datetime.timedelta(days=d)
        rows.append((d, ts, 1, "A", 10.0 + 2.0 * d, "{}"))
        rows.append((1000 + d, ts, 1, "B", 7.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["series"]: r for r in analytics.trend_fit(ev).collect()}
    assert got["A"]["n_days"] == 30
    assert abs(got["A"]["slope"] - 2.0) < 1e-9
    assert abs(got["A"]["intercept"] - 10.0) < 1e-9
    assert abs(got["B"]["slope"]) < 1e-9
    assert abs(got["B"]["intercept"] - 7.0) < 1e-9


def test_rendezvous_shard_minimal_movement(spark):
    keys = spark.range(2000).withColumnRenamed("id", "doc_id")
    four = analytics.rendezvous_shard(keys, ["s0", "s1", "s2", "s3"])
    five = analytics.rendezvous_shard(keys, ["s0", "s1", "s2", "s3", "s4"])
    a = {r["doc_id"]: r["shard"] for r in four.collect()}
    b = {r["doc_id"]: r["shard"] for r in five.collect()}
    moved = [k for k in a if a[k] != b[k]]
    # HRW guarantee: every moved key moved TO the new shard, nothing
    # reshuffled among the old shards
    assert all(b[k] == "s4" for k in moved)
    # ~1/5 of keys move (binomial around 400/2000); modulo routing would
    # move ~4/5
    assert 250 < len(moved) < 550
    # roughly balanced across shards
    from collections import Counter

    c = Counter(a.values())
    assert min(c.values()) > 300


def test_consistent_ring_shard_minimal_movement(spark):
    keys = spark.range(2000).withColumnRenamed("id", "doc_id")
    shards = [f"shard-{i}" for i in range(4)]
    four = analytics.consistent_ring_shard(keys, shards, n_vnodes=16)
    a = {r["doc_id"]: r["shard"] for r in four.collect()}
    # removing one shard: ONLY its keys move (ring guarantee — the
    # other shards' arcs are untouched), and they scatter to survivors
    three = analytics.consistent_ring_shard(keys, shards[:3], n_vnodes=16)
    b = {r["doc_id"]: r["shard"] for r in three.collect()}
    for k in a:
        if a[k] != "shard-3":
            assert b[k] == a[k], k
        else:
            assert b[k] in shards[:3]
    # vnodes keep the load roughly balanced (single-point rings can be
    # 3-4x skewed; 16 vnodes bound it)
    from collections import Counter

    c = Counter(a.values())
    assert min(c.values()) > 250
    # adding a shard moves only ~1/5 of keys (vs ~4/5 for modulo)
    five = analytics.consistent_ring_shard(
        keys, shards + ["shard-4"], n_vnodes=16
    )
    d = {r["doc_id"]: r["shard"] for r in five.collect()}
    moved = [k for k in a if a[k] != d[k]]
    assert all(d[k] == "shard-4" for k in moved)
    assert len(moved) < 800


def test_temperature_sampling_plan_flattens_toward_rare(spark):
    # 3 langs with 1:4:16 token mass; alpha=0.5 rates must be
    # 1 : 1/2 : 1/4 (sqrt flattening), rarest at exactly 1.0
    rows = []
    i = 0
    for lang, n in (("aa", 1), ("bb", 4), ("cc", 16)):
        for _ in range(n):
            rows.append((i, "w1 w2 w3 w4", lang))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from cloudtrace_exporter_spark.operators import curate

    got = {r["stratum"]: r for r in curate.temperature_sampling_plan(docs).collect()}
    assert got["aa"]["sample_rate"] == 1.0
    assert got["bb"]["sample_rate"] == 0.5
    assert got["cc"]["sample_rate"] == 0.25
    assert got["cc"]["p"] == round(16 / 21, 6)
    assert got["aa"]["expected_tokens"] == 4.0
    assert got["cc"]["expected_tokens"] == 16.0  # 64 tokens * 0.25


def test_seasonal_profile_dow_and_ratios(spark):
    import datetime

    # Mondays carry value 20, all other days 10 — ratio must peak on dow 1
    rows = []
    for d in range(28):
        dt = datetime.date(2024, 1, 1) + datetime.timedelta(days=d)  # 2024-01-01 is a Monday
        v = 20.0 if dt.isoweekday() == 1 else 10.0
        rows.append((d, datetime.datetime.combine(dt, datetime.time(9)), 1, "A", v, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["dow"]: r for r in analytics.seasonal_profile(ev).collect()}
    assert set(got) == set(range(1, 8))  # ISO: 1=Mon .. 7=Sun
    assert got[1]["avg_value"] == 20.0 and got[2]["avg_value"] == 10.0
    overall = (20.0 + 6 * 10.0) / 7
    assert abs(got[1]["ratio_to_mean"] - round(20.0 / overall, 4)) < 1e-9
    assert all(got[d]["n_events"] == 4 for d in range(1, 8))


def test_ewma_chart_flags_planted_spike(spark):
    import datetime

    # steady series at 10, one 10x spike on day 20
    rows = []
    for d in range(30):
        ts = datetime.datetime(2024, 3, 1, 9) + datetime.timedelta(days=d)
        v = 100.0 if d == 20 else 10.0
        rows.append((d, ts, 1, "A", v, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = sorted(analytics.ewma_chart(ev).collect(), key=lambda r: r["day"])
    by_day = {r["day"].day if hasattr(r["day"], "day") else r["day"]: r for r in got}
    spike = [r for r in got if r["y"] == 100.0][0]
    assert spike["out_of_band"] is True
    assert abs(spike["ewma"] - 10.0) < 1e-6  # baseline unpolluted by the spike itself
    # steady days well after the spike settle back in-band
    assert got[-1]["out_of_band"] is False
    # first row has no history: baseline is NULL, never flagged
    assert got[0]["ewma"] is None and got[0]["out_of_band"] is False


def test_benford_audit_digits_and_shares(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (0, ts, 1, "A", 123.45, "{}"),   # digit 1
        (1, ts, 1, "A", 19.99, "{}"),    # digit 1
        (2, ts, 1, "A", 0.92, "{}"),     # digit 9 (92 cents)
        (3, ts, 1, "A", 0.005, "{}"),    # excluded: below a cent
        (4, ts, 1, "A", -5.0, "{}"),     # excluded: non-positive
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["digit"]: r for r in analytics.benford_audit(ev).collect()}
    assert set(got) == {1, 9}
    assert got[1]["n"] == 2 and got[9]["n"] == 1
    assert abs(got[1]["share"] - round(2 / 3, 4)) < 1e-9
    import math

    assert abs(got[1]["benford"] - round(math.log10(2), 4)) < 1e-9


def test_audit_referential_counts_orphans(spark):
    child = spark.createDataFrame([(1, 10), (2, 10), (3, 99)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (11,)], "pk long")
    out = analytics.audit_referential([("child.fk", child, "fk", parent, "pk")]).collect()
    assert len(out) == 1
    assert out[0]["relation"] == "child.fk"
    assert out[0]["n_rows"] == 3 and out[0]["n_orphans"] == 1


def test_rollup_partials_merge_equals_direct(spark, sf_dir):
    # the two-level rollup must equal aggregating the raw rows directly
    # (up to the daily 4-decimal rounding boundary)
    ev = load_table(spark, sf_dir, "events")
    merged = {r["series"]: r for r in analytics.rollup_partials(ev).collect()}
    direct = {
        r["series"]: r
        for r in ev.groupBy(
            F.col("event_type").alias("series"),
            F.date_trunc("month", "ts").alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for s in merged:
        assert merged[s]["n_events"] == direct[s]["n_events"]
        assert abs(merged[s]["sum_value"] - direct[s]["sum_value"]) < 0.01
        assert abs(merged[s]["min_value"] - round(direct[s]["min_value"], 4)) < 1e-9
        assert abs(merged[s]["max_value"] - round(direct[s]["max_value"], 4)) < 1e-9


def test_association_rules_hand_computed(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    # baskets: u1={a,b}, u2={a,b}, u3={a}, u4={b,c}
    rows = []
    for i, (u, t) in enumerate(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "b"), (4, "c")]
    ):
        rows.append((i, ts, u, t, 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {(r["ante"], r["cons"]): r for r in analytics.association_rules(ev, min_support=0.0).collect()}
    # P(a∧b)=2/4, P(a)=3/4, P(b)=3/4 → conf(a→b)=2/3, lift=(0.5)/(0.75·0.75)
    r = got[("a", "b")]
    assert r["n_xy"] == 2
    assert abs(r["support"] - 0.5) < 1e-9
    assert abs(r["confidence"] - round(2 / 3, 4)) < 1e-9
    assert abs(r["lift"] - round(0.5 / (0.75 * 0.75), 4)) < 1e-9
    # direction matters: conf(b→a) = 2/3 as well here, but b→c = 1/3
    assert abs(got[("b", "c")]["confidence"] - round(1 / 3, 4)) < 1e-9
    # symmetric metrics agree both directions
    assert got[("a", "b")]["lift"] == got[("b", "a")]["lift"]


def test_activity_streaks_islands(spark):
    import datetime

    def ev(i, u, day):
        return (i, datetime.datetime(2024, 2, day, 12), u, "x", 1.0, "{}")

    # u1: days 1,2,3, 7,8, 20 → 3 streaks, longest 3, 6 active days
    # u2: day 5 only (two events same day collapse) → 1 streak of 1
    rows = [ev(0, 1, 1), ev(1, 1, 2), ev(2, 1, 3), ev(3, 1, 7), ev(4, 1, 8),
            ev(5, 1, 20), ev(6, 2, 5), ev(7, 2, 5)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["user_id"]: r for r in analytics.activity_streaks(df).collect()}
    assert got[1]["n_active_days"] == 6
    assert got[1]["n_streaks"] == 3
    assert got[1]["longest_streak"] == 3
    assert got[2]["n_active_days"] == 1 and got[2]["n_streaks"] == 1


def test_winsorized_stats_caps_outlier_influence(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    # 99 values at 10, one wild outlier at 10000
    rows = [(i, ts, 1, "A", 10.0, "{}") for i in range(99)] + [(99, ts, 1, "A", 10000.0, "{}")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = analytics.winsorized_stats(ev).collect()[0]
    raw_mean = (99 * 10.0 + 10000.0) / 100  # ≈ 109.9
    assert r["n"] == 100
    assert r["wins_mean"] < raw_mean / 2  # outlier influence capped at p95
    assert r["fence_hi"] < 10000.0
    assert r["fence_lo"] == 10.0


def test_kmv_distinct_exact_below_k_and_bounded_above(spark):
    rows = [(i, "small" if i < 20 else "big") for i in range(5000)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        r["event_type"]: r
        for r in analytics.kmv_distinct(
            df, group_col="event_type", key_col="user_id", k=64
        ).collect()
    }
    # below k distinct: the sketch IS the exact count
    assert got["small"]["n_exact"] == 20
    assert got["small"]["kmv_estimate"] == 20.0
    assert got["small"]["rel_err"] == 0.0
    # above k: (k-1)/frac(kth) lands within the ~1/sqrt(k) band
    assert got["big"]["n_exact"] == 4980
    assert got["big"]["rel_err"] < 0.4


def test_bloom_audit_never_false_negative(spark):
    members = spark.createDataFrame([(i,) for i in range(200)], "mk long")
    probes = spark.createDataFrame([(i,) for i in range(1000)], "pk long")
    rows = analytics.bloom_membership_audit(
        members, probes, member_col="mk", probe_col="pk", m=4096, n_hashes=3
    ).collect()
    grid = {(r["is_member"], r["bloom_says_member"]): r["n"] for r in rows}
    # every true member must pass the filter — (True, False) cannot exist
    assert (True, False) not in grid
    assert grid[(True, True)] == 200
    # FP rate near the analytic (1 - e^(-3*200/4096))^3 ~ 0.25%; allow head-room
    fp = grid.get((False, True), 0)
    assert fp / 800 < 0.05


def test_cdc_apply_matches_full_recompute_and_retracts_empty_groups(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)], "id long, g string, v double"
    )
    ins = spark.createDataFrame([(4, "a", 1.5), (5, "c", 2.0)], "id long, g string, v double")
    dels = spark.createDataFrame([(3, "b", 5.0)], "id long, g string, v double")
    got = {
        r["g"]: (r["n"], r["sum_value"])
        for r in analytics.cdc_apply(base, ins, dels, group_col="g", value_col="v").collect()
    }
    # incremental == full recompute over (base \ dels) ∪ ins
    assert got == {"a": (3, 31.5), "c": (1, 2.0)}
    # group b retracted to zero rows → dropped from the view entirely
    assert "b" not in got


def test_seasonal_residual_outliers_flags_planted_spike(spark):
    import datetime as dt

    # 28 days: linear trend 100+2d, Mondays +50, plus one +900 spike on
    # day 17 — the screen must flag exactly that day
    rows = []
    eid = 0
    for d in range(28):
        day = dt.datetime(2024, 1, 1, 9) + dt.timedelta(days=d)
        v = 100.0 + 2.0 * d + (50.0 if day.isoweekday() == 1 else 0.0)
        if d == 17:
            v += 900.0
        rows.append((eid, day, 1, "A", v, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["day_s"]: r for r in analytics.seasonal_residual_outliers(ev).collect()}
    assert len(got) == 28
    flagged = [d for d, r in got.items() if r["is_outlier"]]
    assert flagged == ["2024-01-18"]  # day index 17
    assert got["2024-01-18"]["mad_score"] > 3
    # a plain Monday is NOT an outlier — the dow effect absorbed it
    assert not got["2024-01-08"]["is_outlier"]


def test_kmv_state_merge_equals_sketch_of_union(spark):
    # THE KMV property: merging per-batch sketches == sketching the
    # union — what makes it a streaming/foreachBatch partial aggregate
    left = spark.createDataFrame([(i, "t") for i in range(0, 3000)], "user_id long, event_type string")
    right = spark.createDataFrame([(i, "t") for i in range(1500, 4500)], "user_id long, event_type string")
    whole = left.unionByName(right)
    merged = analytics.kmv_merge(
        analytics.kmv_state(left, group_col="event_type", key_col="user_id"),
        analytics.kmv_state(right, group_col="event_type", key_col="user_id"),
    )
    direct = analytics.kmv_state(whole, group_col="event_type", key_col="user_id")
    assert sorted(r["hv"] for r in merged.collect()) == sorted(
        r["hv"] for r in direct.collect()
    )
    # and the estimate read off the merged state equals the batch
    # operator's estimate on the union
    est_m = analytics.kmv_estimate_from_state(merged).collect()[0]["kmv_estimate"]
    est_d = {
        r["event_type"]: r["kmv_estimate"]
        for r in analytics.kmv_distinct(whole, group_col="event_type", key_col="user_id").collect()
    }["t"]
    assert est_m == est_d


def test_histogram_percentiles_close_to_exact(spark, sf_dir):
    # the 256-bin estimator must land within range/bins of the exact
    # interpolated percentile per group
    orders = load_table(spark, sf_dir, "orders")
    exact = {r["o_orderpriority"]: (r["p50"], r["p99"], r["lo"], r["hi"]) for r in analytics.percentiles(orders).collect()}
    hist = {
        r["o_orderpriority"]: (r["p50_hist"], r["p99_hist"])
        for r in analytics.histogram_percentiles(orders).collect()
    }
    for prio, (p50, p99, lo, hi) in exact.items():
        # p50 sits in a dense region (≤2 bins); the p99 tail bin is
        # sparse, where the uniform-within-bin assumption costs up to
        # ~3 bins — the documented accuracy envelope of the estimator
        h50, h99 = hist[prio]
        bin_w = (hi - lo) / 256
        assert abs(h50 - p50) <= 2 * bin_w, (prio, h50, p50)
        assert abs(h99 - p99) <= 3 * bin_w, (prio, h99, p99)


def test_cms_never_underestimates_and_bounds_overestimate(spark):
    rows = [(i % 50, "t") for i in range(5000)]  # 50 keys x 100 each
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = analytics.cms_frequency_audit(df, key_col="user_id").collect()
    assert len(got) == 50
    for r in got:
        assert r["n_exact"] == 100
        assert r["cms_estimate"] >= r["n_exact"]  # CMS one-sided guarantee
        # width 1024 >> 50 keys: collisions are rare, overestimate small
        assert r["overestimate"] <= 300


def test_autocorr_lag7_detects_weekly_cycle(spark):
    import datetime as dt
    import math

    # series "W": strong weekly sinusoid → lag-7 autocorr ≈ 1;
    # series "R": alternating ramp noise with period 2 → lag-7 (odd lag)
    # anti-correlates
    rows = []
    eid = 0
    for d in range(28):
        day = dt.datetime(2024, 1, 1, 9) + dt.timedelta(days=d)
        rows.append((eid, day, 1, "W", 100.0 + 50.0 * math.sin(2 * math.pi * d / 7), "{}")); eid += 1
        rows.append((eid, day, 1, "R", 100.0 + (25.0 if d % 2 == 0 else -25.0), "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["series"]: r for r in analytics.autocorr_lag(ev, lag=7).collect()}
    assert got["W"]["n_pairs"] == 21
    assert got["W"]["autocorr_lag7"] > 0.99
    assert got["R"]["autocorr_lag7"] < -0.99  # odd lag flips the parity wave
