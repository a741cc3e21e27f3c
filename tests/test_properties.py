"""Property-based tests (hypothesis) for the normalize-chain edge
semantics cited in SURVEY §5.3 — the reference behaviors a hand-picked
example suite can miss: trailing-dot trimming over arbitrary blank
combinations, blank-aware subject coalescing over arbitrary whitespace,
and epoch-millis round-trips at boundary values.

One SparkSession round-trip per property batch (collect once over a
generated frame), so the suite stays fast.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from cloudtrace_exporter_spark.operators import normalize

_part = st.text(alphabet="abcXYZ 0", min_size=0, max_size=4)
_ws = st.text(alphabet=" \t\n", min_size=0, max_size=3)


def _one_row(spark, cols: dict[str, object], expr, out_type: str = "string"):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} {out_type}" for k in cols)
    )
    return df.select(expr.alias("out")).first()["out"]


@given(parts=st.tuples(_part, _part, _part, _part))
@settings(max_examples=15, deadline=None)
def test_event_type_never_ends_with_dot_and_is_lower(spark_prop, parts):
    out = _one_row(
        spark_prop,
        {"a": parts[0], "b": parts[1], "c": parts[2], "d": parts[3]},
        normalize.derive_event_type("a", "b", "c", "d"),
    )
    assert not out.endswith(".")
    assert out == out.lower()
    # reference parity: lower(join('.')) then strip trailing dots only
    expected = ".".join(parts).lower().rstrip(".")
    assert out == expected


@given(name_core=_part, lead=_ws, trail=_ws, rid=st.text(alphabet="abc123", min_size=1, max_size=6))
@settings(max_examples=15, deadline=None)
def test_subject_blank_coalesce_matches_go_trimspace(spark_prop, name_core, lead, trail, rid):
    name = lead + name_core + trail
    out = _one_row(
        spark_prop,
        {"resource_name": name, "resource_id": rid},
        normalize.derive_subject("resource_name", "resource_id"),
    )
    # Go: if strings.TrimSpace(name) != "" → UNtrimmed name, else id
    assert out == (name if name.strip() else rid)


@given(ms=st.integers(min_value=0, max_value=4102444800000))  # 1970..2100
@settings(max_examples=15, deadline=None)
def test_epoch_millis_roundtrip(spark_prop, ms):
    df = spark_prop.createDataFrame([(ms,)], "ms long")
    back = df.select(
        normalize.timestamp_to_millis(normalize.millis_to_timestamp("ms")).alias("out")
    ).first()["out"]
    assert back == ms


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.floats(0, 500, allow_nan=False)), min_size=1, max_size=20
    )
)
@settings(max_examples=15, deadline=None)
def test_dedup_idempotent_under_redelivery(spark_prop, rows):
    # at-least-once invariant: dedup(x ∪ x) == dedup(x) keyed by event id
    df = spark_prop.createDataFrame(rows, "event_id int, value double")
    once = normalize.dedup_events(df, "event_id").count()
    twice = normalize.dedup_events(df.union(df), "event_id").count()
    assert once == twice == df.select("event_id").distinct().count()


# --------------------------------------------------------------------------
# properties of the curation / clustering primitives
# --------------------------------------------------------------------------


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=10, deadline=None)
def test_connected_components_matches_union_find(spark_prop, edges):
    from cloudtrace_exporter_spark.operators import dedup

    # reference union-find on the driver
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {x: find(x) for x in parent}

    pairs = spark_prop.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()}
    assert got == expected


@given(
    fr_small=st.floats(0.05, 0.45),
    fr_big=st.floats(0.5, 1.0),
)
@settings(max_examples=8, deadline=None)
def test_hash_sample_nesting_property(spark_prop, fr_small, fr_big):
    from cloudtrace_exporter_spark.operators import analytics
    from cloudtrace_exporter_spark.sources.tables import load_table

    docs = load_table(spark_prop, "/root/testdata/sf0.001", "documents")
    small = {r["doc_id"] for r in analytics.hash_sample(docs, key_col="doc_id", fraction=fr_small).collect()}
    big = {r["doc_id"] for r in analytics.hash_sample(docs, key_col="doc_id", fraction=fr_big).collect()}
    assert small <= big  # thresholds nest, so samples must nest


@given(n_words=st.integers(1, 40), chunk=st.integers(2, 12), overlap=st.integers(0, 5))
@settings(max_examples=12, deadline=None)
def test_chunk_coverage_property(spark_prop, n_words, chunk, overlap):
    from hypothesis import assume
    from cloudtrace_exporter_spark.operators import text as text_ops

    assume(overlap < chunk)
    words = [f"w{i}" for i in range(n_words)]
    df = spark_prop.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = text_ops.chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    covered = [w for r in sorted(rows, key=lambda r: r["chunk_idx"]) for w in r["chunk_text"].split()]
    assert set(covered) == set(words)          # nothing lost
    assert all(r["n_chunk_tokens"] <= chunk for r in rows)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),       # user
            st.integers(min_value=0, max_value=20),       # day offset
            st.sampled_from(["a", "b", "c"]),             # type
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_rolling_wau_dominates_dau_and_is_monotone_in_window(spark_prop, events):
    """For every day, trailing-7d distinct users ≥ that day's distinct
    users, and a 1-day 'window' equals exact DAU — the two boundary
    invariants of the dedupe-then-explode windowed-DISTINCT recipe."""
    import datetime as dt

    from cloudtrace_exporter_spark.operators import analytics

    rows = [
        (i, u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), t, 1.0)
        for i, (u, d, t) in enumerate(events)
    ]
    ev = spark_prop.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type", "value"])
    wau = {r.wday: r.wau for r in analytics.rolling_active_users(ev, days=7).collect()}
    dau = {r.wday: r.wau for r in analytics.rolling_active_users(ev, days=1).collect()}
    exact_dau = {
        r.d: r.n
        for r in ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert dau == exact_dau                      # window=1 degenerates to exact DAU
    for day, n in exact_dau.items():
        assert wau[day] >= n                     # the window can only add users


@given(
    seq=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.sampled_from(["x", "y"])),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_scd2_versions_partition_the_timeline(spark_prop, seq):
    """SCD2 invariants on arbitrary event sequences: per user, versions
    are 1..n with no gaps, exactly one open interval (valid_to NULL),
    and consecutive intervals share their boundary."""
    import datetime as dt

    from cloudtrace_exporter_spark.operators import analytics

    rows = [
        (i, u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), t)
        for i, (u, t) in enumerate(seq)
    ]
    ev = spark_prop.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    got = analytics.scd2_intervals(ev).collect()
    by_user: dict = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(1 for r in ivs if r.valid_to is None) == 1
        assert ivs[-1].valid_to is None
        for cur, nxt in zip(ivs, ivs[1:]):
            assert cur.valid_to == nxt.valid_from


@given(
    lefts=st.lists(st.integers(min_value=0, max_value=5_000_000), min_size=1, max_size=12),
    rights=st.lists(st.integers(min_value=0, max_value=5_000_000), min_size=0, max_size=8, unique=True),
)
@settings(max_examples=10, deadline=None)
def test_asof_ranged_matches_naive_asof(spark_prop, lefts, rights):
    """asof_join_ranged ≡ the naive per-left-row argmax(right.ts ≤ left.ts)
    on arbitrary second-offset series — including empty right sides,
    bucket gaps, and exact boundary collisions."""
    import datetime as dt

    from cloudtrace_exporter_spark.operators import analytics

    base = dt.datetime(2024, 1, 1)
    left = spark_prop.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(lefts)],
        "lid long, lts timestamp",
    )
    right = spark_prop.createDataFrame(
        [(base + dt.timedelta(seconds=s), s) for s in rights],
        "rts timestamp, val long",
    ) if rights else spark_prop.createDataFrame([], "rts timestamp, val long")

    got = {
        r["lid"]: (r["asof_ts"], r["val"])
        for r in analytics.asof_join_ranged(
            left, right, "lts", "rts", ["lid"], ["val"], bucket="hour"
        ).collect()
    }
    rt = sorted(rights)
    for i, s in enumerate(lefts):
        at_or_before = [x for x in rt if x <= s]
        want = (base + dt.timedelta(seconds=at_or_before[-1]), at_or_before[-1]) if at_or_before else (None, None)
        assert got[i] == want, f"lid={i} s={s}: {got[i]} != {want}"


def test_asof_ranged_duplicate_right_ts_is_deterministic(spark_prop):
    """r2 advice: with duplicate right timestamps, the in-bucket merge and
    the carry-in path must pick the SAME winner (the struct-max payload —
    __r is the merge window's final sort key, and the carry map is
    max(__r)), so results are deterministic and path-independent."""
    import datetime as dt

    from cloudtrace_exporter_spark.operators import analytics

    base = dt.datetime(2024, 1, 1, 0, 30)
    right = spark_prop.createDataFrame(
        [(base, 1), (base, 9), (base, 4)], "rts timestamp, val long"
    )
    # lid 0: same hour-bucket as the duplicates (in-bucket merge path);
    # lid 1: three buckets later with empty buckets between (carry path)
    left = spark_prop.createDataFrame(
        [(0, base + dt.timedelta(minutes=5)), (1, base + dt.timedelta(hours=3))],
        "lid long, lts timestamp",
    )
    for _ in range(3):  # determinism across repeated runs
        got = {
            r["lid"]: r["val"]
            for r in analytics.asof_join_ranged(
                left, right, "lts", "rts", ["lid"], ["val"], bucket="hour"
            ).collect()
        }
        assert got == {0: 9, 1: 9}


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=6
    )
)
@settings(max_examples=10, deadline=None)
def test_classifier_logit_bounded_by_weight_range(spark_prop, texts):
    """|logit| = |mean of int weights in [-8, 8]| can never exceed 8, and
    empty documents score exactly 0."""
    from cloudtrace_exporter_spark.operators.text import classifier_quality_score

    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in classifier_quality_score(df).collect():
        assert -8.0 <= r["logit"] <= 8.0
        if r["n_tokens"] == 0:
            assert r["logit"] == 0.0 and r["w_sum"] == 0


@given(
    budgets=st.tuples(st.integers(1, 30), st.integers(31, 200)),
    sizes=st.lists(st.integers(1, 12), min_size=1, max_size=8),
)
@settings(max_examples=8, deadline=None)
def test_token_budget_sample_monotone_in_budget(spark_prop, budgets, sizes):
    """A bigger budget can only ADD documents (prefix property of the
    md5-priority order), and every kept cum_tokens fits the budget."""
    from cloudtrace_exporter_spark.operators.curate import token_budget_sample

    lo, hi = budgets
    df = spark_prop.createDataFrame(
        [(i, "s", " ".join("w" for _ in range(n))) for i, n in enumerate(sizes)],
        "doc_id long, source string, text string",
    )
    small = {r["doc_id"] for r in token_budget_sample(df, budget_tokens=lo).collect()}
    big_rows = token_budget_sample(df, budget_tokens=hi).collect()
    big = {r["doc_id"] for r in big_rows}
    assert small <= big
    assert all(r["cum_tokens"] <= hi for r in big_rows)


@given(
    chunks=st.lists(st.sampled_from(["A", "B", "C"]), min_size=1, max_size=8),
)
@settings(max_examples=10, deadline=None)
def test_intra_doc_dedup_idempotent(spark_prop, chunks):
    """Deduping an already-deduped document is the identity: rebuild the
    cleaned text from the first-occurrence order and re-apply."""
    import hashlib

    from cloudtrace_exporter_spark.operators.dedup import dedup_intra_doc

    k = 4
    blocks = {c: " ".join(f"{c.lower()}{i}" for i in range(k)) for c in "ABC"}
    text = " ".join(blocks[c] for c in chunks)
    df = spark_prop.createDataFrame([(1, text)], "doc_id long, text string")
    r1 = dedup_intra_doc(df, chunk_tokens=k).first()
    seen, order = set(), []
    for c in chunks:
        if c not in seen:
            seen.add(c)
            order.append(c)
    clean = " ".join(blocks[c] for c in order)
    assert r1["n_chunks"] == len(chunks) and r1["n_kept"] == len(order)
    assert r1["clean_fp"] == hashlib.md5(clean.encode()).hexdigest()
    r2 = dedup_intra_doc(
        spark_prop.createDataFrame([(1, clean)], "doc_id long, text string"), chunk_tokens=k
    ).first()
    assert r2["n_chunks"] == r2["n_kept"] == len(order)
    assert r2["clean_fp"] == r1["clean_fp"]


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    n_merges=st.integers(0, 4),
)
@settings(max_examples=10, deadline=None)
def test_bpe_encode_piece_count_bounds(spark_prop, words, n_merges):
    """For ANY corpus and merge count: n_words ≤ bpe_tokens ≤ total
    characters, and piece counts never increase as merges are added."""
    from cloudtrace_exporter_spark.operators import text as T

    docs = spark_prop.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    row = T.bpe_encode_counts(docs, n_merges=n_merges).first()
    assert row["n_words"] == len(words)
    assert len(words) <= row["bpe_tokens"] <= sum(len(w) for w in words)
    more = T.bpe_encode_counts(docs, n_merges=n_merges + 1).first()
    assert more["bpe_tokens"] <= row["bpe_tokens"]


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=12), min_size=2, max_size=6
    ),
    max_dist=st.integers(0, 6),
)
@settings(max_examples=10, deadline=None)
def test_fuzzy_prefix_join_threshold_monotone(spark_prop, texts, max_dist):
    """Raising the edit-distance bound can only ADD pairs, and every
    reported distance respects its bound."""
    from cloudtrace_exporter_spark.operators import dedup as D

    docs = spark_prop.createDataFrame(
        [(i, "en", t) for i, t in enumerate(texts)], "doc_id long, lang string, text string"
    )
    tight = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in D.fuzzy_prefix_join(docs, max_dist=max_dist).collect()
    }
    loose = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in D.fuzzy_prefix_join(docs, max_dist=max_dist + 3).collect()
    }
    assert set(tight) <= set(loose)
    assert all(d <= max_dist for d in tight.values())
    for p, d in tight.items():
        assert loose[p] == d  # distances don't depend on the bound


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=5, max_size=14), min_size=2, max_size=10
    ),
    d=st.integers(1, 3),
)
@settings(max_examples=8, deadline=None)
def test_passjoin_equals_brute_force_on_adversarial_strings(spark_prop, texts, d):
    """PassJoin completeness under hypothesis: a 2-letter alphabet makes
    near-collisions (and segment-bucket collisions) maximally common —
    the pigeonhole candidate set must still reproduce the brute-force
    pair set exactly, insertions/deletions/substitutions alike."""
    from cloudtrace_exporter_spark.operators import dedup as _dedup

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark_prop.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in _dedup.passjoin_edit_pairs(
            df, max_dist=d, prefix_chars=20, min_len=4
        ).collect()
    }
    kept = [(i, t) for i, t in enumerate(texts) if len(t[:20]) >= 4]
    want = set()
    for x in range(len(kept)):
        for y in range(x + 1, len(kept)):
            (ia, ta), (ib, tb) = kept[x], kept[y]
            dist = _lev(ta[:20], tb[:20])
            if dist <= d:
                want.add((min(ia, ib), max(ia, ib), dist))
    assert got == want


@given(
    vals=st.lists(st.integers(0, 8), min_size=6, max_size=24),
)
@settings(max_examples=6, deadline=None)
def test_rank_tests_invariant_under_monotone_transform(spark_prop, vals):
    """Mann–Whitney U and KS depend on the data only through ranks/ECDFs,
    so a strictly monotone transform (x → exp(x/3)) must leave U, D, and
    both verdicts bit-identical — the property that separates the rank
    machinery from a means-based test (whose z DOES move)."""
    from datetime import datetime

    from cloudtrace_exporter_spark.operators import analytics as _an

    def frame(xs):
        rows = [
            (i, datetime(2024, 1, 1), i, "s", float(v), "{}")
            for i, v in enumerate(xs)
        ]
        return spark_prop.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )

    import math

    raw = frame(vals)
    xfm = frame([math.exp(v / 3.0) for v in vals])
    u1 = _an.mann_whitney(raw).collect()[0]
    u2 = _an.mann_whitney(xfm).collect()[0]
    assert (u1.u2_a, u1.n_a, u1.n_b, u1.significant_05) == (
        u2.u2_a, u2.n_a, u2.n_b, u2.significant_05,
    )
    k1 = _an.ks_test(raw).collect()[0]
    k2 = _an.ks_test(xfm).collect()[0]
    assert (k1.d_num, k1.d, k1.significant_05) == (k2.d_num, k2.d, k2.significant_05)


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=1, max_size=25
    )
)
@settings(max_examples=12, deadline=None)
def test_pareto_front_equals_brute_force_dominance(spark_prop, pts):
    """The sort-scan skyline must equal the O(n²) dominance definition
    on arbitrary integer point sets (ties in cost and gain included)."""
    from cloudtrace_exporter_spark.operators import analytics

    rows = [
        (i, 1, float(g), float(c), 0.0, 0.0, "A", "F", "1994-01-01")
        for i, (c, g) in enumerate(pts)
    ]
    li = spark_prop.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    )
    got = {(r.cost, r.gain) for r in analytics.pareto_front(li).collect()}
    # brute force over the per-cost max-gain grid
    grid = {}
    for c, g in pts:
        grid[float(c)] = max(grid.get(float(c), float("-inf")), float(g))
    expect = {
        (c, g)
        for c, g in grid.items()
        if not any(c2 <= c and g2 >= g and (c2 < c or g2 > g) for c2, g2 in grid.items())
    }
    assert got == expect


@given(
    sizes=st.lists(st.integers(1, 40), min_size=1, max_size=8),
    den=st.sampled_from([4, 10, 20]),
)
@settings(max_examples=10, deadline=None)
def test_quota_split_hamilton_invariants(spark_prop, sizes, den):
    """Hamilton apportionment invariants on arbitrary strata: the global
    val count is EXACTLY floor(N/den); every stratum gets base or base+1;
    the split is exhaustive and disjoint."""
    from cloudtrace_exporter_spark.operators import curate

    rows, did = [], 0
    for s, n in enumerate(sizes):
        for _ in range(n):
            rows.append((did, "x", f"lang{s}", "src", 1))
            did += 1
    docs = spark_prop.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = curate.exact_quota_split(docs, val_num=1, val_den=den).collect()
    assert len(out) == sum(sizes)
    n_val = sum(1 for r in out if r.split == "val")
    assert n_val == sum(sizes) // den
    by = {}
    for r in out:
        if r.split == "val":
            by[r.stratum] = by.get(r.stratum, 0) + 1
    for s, n in enumerate(sizes):
        got = by.get(f"lang{s}", 0)
        assert got in (n // den, n // den + 1)


@given(toks=st.lists(st.integers(0, 50), min_size=1, max_size=30))
@settings(max_examples=10, deadline=None)
def test_pack_layout_offsets_are_cumulative_and_bins_consistent(spark_prop, toks):
    """Offsets are the exclusive prefix sum in id order for arbitrary
    token-count sequences (zeros included); bin/pos always satisfy
    offset = bin*L + pos."""
    from cloudtrace_exporter_spark.operators import curate

    rows = [(i, " ".join(["w"] * n), "en", "s", n) for i, n in enumerate(toks)]
    docs = spark_prop.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = sorted(curate.pack_layout(docs, context_len=16).collect(), key=lambda r: r.doc_id)
    run = 0
    for r, n in zip(out, toks):
        assert r.tok_offset == run and r.n_tokens == n
        assert r.tok_offset == r.bin * 16 + r.pos_in_bin
        run += n


# --------------------------------------------------------------------------
# round-9 text operators vs independent pure-Python models (a third
# implementation besides Spark and the DuckDB oracle)
# --------------------------------------------------------------------------

_word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "tiny", "ox", "a", "zz", "omega"]
)
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)


@given(docs=st.lists(_doc, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None)
def test_zipf_fit_matches_python_model(spark_prop, docs):
    import math
    from collections import Counter

    from cloudtrace_exporter_spark.operators import text as text_ops

    df = spark_prop.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = text_ops.zipf_fit(df).collect()[0]
    freq = Counter(w for d in docs for w in d.split(" ") if w != "")
    if not freq:
        assert got["n_vocab"] == 0
        return
    assert got["n_vocab"] == len(freq)
    assert got["n_tokens"] == sum(freq.values())
    assert got["n_hapax"] == sum(1 for c in freq.values() if c == 1)
    assert got["hapax_rate"] == got["n_hapax"] / len(freq)
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (math.log10(i + 1), math.log10(c)) for i, (_, c) in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    den = n * sxx - sx * sx
    if den == 0:
        assert got["zipf_slope"] is None and got["zipf_intercept"] is None
    else:
        slope = (n * sxy - sx * sy) / den
        assert math.isclose(got["zipf_slope"], slope, abs_tol=2e-6)
        assert math.isclose(
            got["zipf_intercept"], (sy - slope * sx) / n, abs_tol=2e-6
        )


@given(docs=st.lists(_doc, min_size=1, max_size=5))
@settings(max_examples=8, deadline=None)
def test_textrank_matches_python_integer_model(spark_prop, docs):
    from collections import defaultdict

    from cloudtrace_exporter_spark.operators import text as text_ops

    df = spark_prop.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = [
        (r["word"], r["pagerank_scaled"])
        for r in text_ops.textrank_keywords(df, top_k=50).collect()
    ]
    # model: same graph build + the pagerank_scaled BIGINT trajectory
    edges = set()
    for d in docs:
        kept = [w for w in d.split(" ") if len(w) >= 4]
        for a, b in zip(kept, kept[1:]):
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    if not nodes:
        assert got == []
        return
    scale, n = 10**12, len(nodes)
    tp = (scale * 15) // (100 * n)
    out_deg = defaultdict(int)
    for a, _ in edges:
        out_deg[a] += 1
    rank = {v: scale // n for v in nodes}
    for _ in range(10):
        s = defaultdict(int)
        for a, b in edges:
            s[b] += rank[a] // out_deg[a]
        rank = {v: tp + (85 * s[v]) // 100 for v in nodes}
    want = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == want
