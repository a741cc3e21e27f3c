"""End-to-end corpus curation pipeline (driver north_star composition).

Chains the individually-verified operators into the shape a real
pretraining-data run takes — quality filter → exact dedup (survivor
selection) → stratified language rebalancing — and reports the funnel:
how many documents survive each stage.

Scale shape: quality and sampling are inline narrow filters (no flag
frame joined back); dedup survivor-selection is a min-over-fingerprint
window — ONE full-row shuffle for the whole pipeline, vs. the groupBy +
semi-join formulation which shuffles the narrow (fp, id) pairs AND the
full rows again for the join. The funnel report aggregates each stage
to one row; callers at 100 TB can persist the quality stage to pay its
regex scan once across the stage counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloudtrace_exporter_spark.operators import analytics, text


def _quality_kept(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.filter(text.quality_keep(text_col))


def _dedup_survivors(docs: DataFrame, text_col: str = "text") -> DataFrame:
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    w = Window.partitionBy("__fp")
    return (
        docs.withColumn("__fp", F.md5(normalized))
        .withColumn("__min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__min_id"))
        .drop("__fp", "__min_id")
    )


def quality_calibrated(docs: DataFrame, *, keep_frac: float = 0.5) -> DataFrame:
    """Per-source quality calibration: a single global quality cutoff is
    source-biased (boilerplate-heavy sources score systematically lower,
    so a global threshold silently drops whole sources), so the keep
    decision here is a PERCENTILE WITHIN SOURCE — every source
    contributes its best ``keep_frac`` of documents regardless of its
    absolute score distribution. The source-debiasing step of published
    curation pipelines, composed from the verified quality_features.

    Scale shape: one narrow quality scan + one window partitioned by
    source. Source cardinality is usually small-but-skewed; at 100 TB
    replace the exact percent_rank with per-source percentile_approx
    thresholds (two tiny aggregates, no per-source total ordering) —
    the keep set converges to the same fraction. percent_rank is
    emitted raw (exact integer ratio — rounding would reintroduce
    HALF_UP/HALF_EVEN ties).
    """
    feats = text.quality_features(docs).select("doc_id", "quality_score")
    w = Window.partitionBy("source").orderBy("quality_score")
    return (
        docs.select("doc_id", "source")
        .join(feats, "doc_id")
        .withColumn("pr", F.percent_rank().over(w))
        .withColumn("keep", F.col("pr") >= 1.0 - keep_frac)
        .select("doc_id", "source", "quality_score", "pr", "keep")
    )


def curated_docs(docs: DataFrame, *, en_fraction: float = 0.25) -> DataFrame:
    """Final curated corpus ids after quality → dedup → stratified sample.

    Stage order matters and mirrors production practice: drop junk before
    paying the dedup shuffle; dedup before sampling so survivors are
    chosen from clean data and the sample rate applies to unique docs.
    """
    kept = _dedup_survivors(_quality_kept(docs))
    return analytics.stratified_hash_sample(
        kept,
        key_col="doc_id",
        strata_col="lang",
        fractions={"en": en_fraction},
        default_fraction=1.0,
    ).select("doc_id", "lang")


def curation_funnel(docs: DataFrame, *, en_fraction: float = 0.25) -> DataFrame:
    """Per-stage survivor counts: (stage, n_docs) for raw → quality →
    dedup → sampled. The curation audit artifact — the first thing to
    check when a 100 TB run produces a suspicious corpus size."""
    quality = _quality_kept(docs)
    deduped = _dedup_survivors(quality)
    sampled = curated_docs(docs, en_fraction=en_fraction)

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    return (
        stage("1_raw", docs)
        .unionByName(stage("2_quality", quality))
        .unionByName(stage("3_dedup", deduped))
        .unionByName(stage("4_sampled", sampled))
    )


def temperature_sampling_plan(
    docs: DataFrame,
    *,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-smoothed multilingual sampling plan (the α-smoothed
    multinomial of mBERT/XLM-R/mT5, α = 0.5): per stratum, the natural
    token share p_l is flattened to q_l ∝ p_l^α, which makes the
    per-document sampling rate r_l ∝ q_l / p_l ∝ 1/sqrt(tokens_l);
    scaled so the rarest stratum samples at 1.0 this collapses to the
    closed form r_l = sqrt(min_tokens / tokens_l) — the standard
    low-resource-language rebalancing artifact a pretraining mixture
    run is driven by, plus each stratum's expected token yield.

    Engine-exactness is designed in: α is fixed at 1/2 so the smoothing
    power is ``sqrt`` (IEEE-exact everywhere; a free-α ``pow`` differs
    in the last ulp per libm), and every aggregate is an INTEGER sum
    (order-independent) — the only float ops are one division and one
    sqrt per row, so no cross-engine summation-order noise exists to
    round away. One stratum-keyed aggregation with map-side partials;
    the min/total ride on an unpartitioned window over the
    |strata|-row profile. Emits (stratum, n_docs, n_tokens, p,
    sample_rate, expected_tokens), rounded to 6/1.
    """
    prof = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count(text_col)).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    p = F.col("n_tokens") / F.sum("n_tokens").over(w)
    rate = F.sqrt(F.min("n_tokens").over(w) / F.col("n_tokens"))
    return prof.select(
        "stratum",
        "n_docs",
        "n_tokens",
        F.round(p, 6).alias("p"),
        F.round(rate, 6).alias("sample_rate"),
        F.round(rate * F.col("n_tokens"), 1).alias("expected_tokens"),
    )


def corpus_datacard(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """The one-row corpus datacard — the summary block every dataset
    release ships: size (docs/tokens/chars), diversity (languages,
    sources), duplication (1 − distinct normalized fingerprints / docs),
    quality pass rate (the quality_keep predicate inline), and mean
    document length. ONE scan, one multi-aggregate (countDistincts
    expand map-side like the graph summary); every ratio is a single
    division of integer aggregates — engine-exact.
    """
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    agg = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count(text_col)).cast("long").alias("n_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(F.md5(normalized)).alias("__n_fp"),
        F.sum(text.quality_keep(text_col).cast("long")).alias("__n_quality"),
    )
    # rate columns are NULL (not a crash, not 0/0) on an EMPTY corpus —
    # reference A12: an empty batch is a normal state of the pipeline
    nonempty = F.col("n_docs") > 0
    return agg.select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_langs",
        "n_sources",
        F.when(nonempty, F.round(F.col("n_tokens") / F.col("n_docs"), 4)).alias(
            "mean_doc_tokens"
        ),
        F.when(nonempty, F.round(1.0 - F.col("__n_fp") / F.col("n_docs"), 6)).alias(
            "dup_rate"
        ),
        F.when(nonempty, F.round(F.col("__n_quality") / F.col("n_docs"), 6)).alias(
            "quality_pass_rate"
        ),
    )


def pretraining_mix(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """The capstone composition: the FINAL pretraining-mix report a data
    run signs off on — quality filter → aggressive (CCNet) normalization
    dedup → α=0.5 temperature rebalancing, reported per language as
    surviving docs/tokens, the sampling rate, and the expected yield.
    Every stage is an independently-verified operator (quality_keep,
    dedup.aggressive_norm_key, temperature_sampling_plan's closed-form
    rate); this query is their composition, and its oracle replays the
    whole funnel.

    Scale shape: quality is an inline narrow filter, dedup survivorship
    is one uniform-md5-key window (the curated_docs posture), the mix
    math runs on the |langs|-row profile. Integer sums + one sqrt per
    row — no float-summation parity risk.
    """
    from cloudtrace_exporter_spark.operators import dedup

    kept = docs.filter(text.quality_keep(text_col))
    w = Window.partitionBy("__nk")
    survivors = (
        kept.withColumn("__nk", dedup.aggressive_norm_key(text_col))
        .withColumn("__min", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__min"))
    )
    prof = survivors.groupBy(F.col("lang").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count(text_col)).cast("long").alias("n_tokens"),
    )
    wall = Window.partitionBy()
    rate = F.sqrt(F.min("n_tokens").over(wall) / F.col("n_tokens"))
    return prof.select(
        "stratum",
        "n_docs",
        "n_tokens",
        F.round(rate, 6).alias("sample_rate"),
        F.round(rate * F.col("n_docs"), 1).alias("expected_docs"),
        F.round(rate * F.col("n_tokens"), 1).alias("expected_tokens"),
    )


def cluster_safe_splits(
    assignment: DataFrame,
    *,
    splits: dict[str, float] | None = None,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: split by near-dup CLUSTER,
    not by document. Hashing raw doc ids (``analytics.assign_splits``)
    scatters the members of a near-duplicate cluster across splits, so
    a test document's near-copy sits in train — the classic
    train/eval-contamination path that whole-document dedup was supposed
    to close. Keying the md5 split hash on the cluster representative
    instead lands every member of a cluster in the SAME split (singletons
    key on their own id, so the marginal split fractions are preserved
    over the cluster-representative population).

    ``assignment`` is a (doc_id, component) frame from
    ``dedup.dedup_clusters`` — the connected-components table every
    near-dup pipeline already materializes; splitting is then a pure
    narrow map over it (zero additional shuffles, engine-portable md5
    thresholds, stable under retries and repartitioning).
    """
    out = analytics.assign_splits(assignment, key_col="component", splits=splits)
    return out.select("doc_id", "component", "split")


def mixture_resample(
    docs: DataFrame,
    mixture: dict[str, float],
    *,
    group_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministically resample the corpus to a target domain/language
    mixture — the "data recipe" step of a training pipeline (e.g. 30% en,
    20% zh, …) run as a pure filter.

    The largest feasible corpus honoring the mixture keeps every row of
    the binding group (the one with the smallest n_g/frac_g) and
    downsamples the rest: T = min_g(n_g/frac_g), keep-rate_g = frac_g·T /
    n_g. Sampling is the md5-prefix threshold (hash_sample): reproducible
    across engines/retries/repartitioning, and the threshold is computed
    IN-PLAN from the group counts (a KB-sized broadcast), so no driver
    round-trip. Groups absent from ``mixture`` are dropped — a recipe is
    exhaustive by definition.

    One tiny group-count aggregation + one broadcast join + narrow
    filter; the corpus itself never shuffles.
    """
    frac = None
    for g, f in mixture.items():
        frac = (
            F.when(F.col(group_col) == g, F.lit(float(f)))
            if frac is None
            else frac.when(F.col(group_col) == g, F.lit(float(f)))
        )
    counts = (
        docs.groupBy(group_col)
        .agg(F.count("*").alias("n_g"))
        .withColumn("frac", frac)
        .filter(F.col("frac").isNotNull())
    )
    total = counts.agg(F.min(F.col("n_g") / F.col("frac")).alias("t"))
    rates = counts.crossJoin(F.broadcast(total)).select(
        group_col,
        (F.col("frac") * F.col("t") / F.col("n_g")).alias("rate"),
    )
    thr = F.when(F.col("rate") >= 1.0, F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long")), 8, "0"))
    )
    keyed = F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 8)
    return (
        docs.join(F.broadcast(rates.select(group_col, thr.alias("__thr"))), group_col)
        .filter(keyed < F.col("__thr"))
        .select(key_col, group_col)
    )


def curated_docs_v2(
    docs: DataFrame,
    *,
    max_chunk_dup_ratio: float = 0.5,
    mixture: dict[str, float] | None = None,
) -> DataFrame:
    """The round-3 full-pipeline composition: quality filter →
    cross-document chunk-overlap cap (paragraph-level partial-copy
    screen; see dedup.chunk_dup_census) → exact-dedup survivors →
    target-mixture resample. Every stage is individually oracle-verified
    and the composition carries its own full oracle (q_curated_docs_v2).

    Stage order mirrors production: junk out before paying the chunk
    fingerprint pass; partial copies out before whole-doc dedup (their
    survivors would distort mixture counts); the recipe is applied to
    the clean, unique corpus so rates mean what the recipe says.
    """
    from cloudtrace_exporter_spark.operators import dedup as dedup_ops

    mixture = mixture or {"en": 0.3, "zh": 0.2, "es": 0.2, "de": 0.15, "fr": 0.15}
    # The chunk-ratio screen reads quality twice (census + per-doc pass)
    # and the mixture stage reads the deduped set three times (counts,
    # feasible-total, final filter). Truncate lineage at both fan-out
    # points (localCheckpoint, the same posture as the iterative graph
    # ops): without it the regex-heavy quality subtree is re-executed AND
    # re-analyzed once per downstream branch (~6×; 16 s → ~4 s at
    # sf0.01, measured). Eager: the pipeline is always fully consumed.
    quality = _quality_kept(docs).localCheckpoint(eager=True)
    low_dup_ids = (
        dedup_ops.chunk_overlap_ratio(quality)
        .filter(F.col("dup_ratio") <= max_chunk_dup_ratio)
        .select("doc_id")
    )
    low_dup = quality.join(low_dup_ids, "doc_id", "left_semi")
    deduped = _dedup_survivors(low_dup).localCheckpoint(eager=True)
    return mixture_resample(deduped, mixture).select("doc_id", "lang")


def token_budget_sample(
    docs: DataFrame,
    *,
    budget_tokens: int = 600,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source TOKEN-budget sampling: each source contributes documents
    in md5-priority order until its token budget is spent — the mixture
    primitive when the recipe is specified in tokens (how pretraining
    mixtures are actually written: "30B tokens of web, 5B of code"),
    rather than the per-document rates of mixture_resample.

    Deterministic and engine-portable: priority is md5(doc_id) (same
    family as hash_sample), the running total is an integer cumulative
    sum over a ROWS window, and a document is kept iff the cumulative
    count INCLUDING it fits the budget — so the selection is a pure
    function of the corpus, reproducible across runs, engines, and
    repartitioning. ONE window shuffle keyed by source (low cardinality
    → AQE skew split is the 100 TB guard; at extreme skew pre-salt the
    source and merge budgets downstream).
    """
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        text.token_count(text_col).cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__pri"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("__pri"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


def contrastive_pairs(
    docs: DataFrame,
    *,
    threshold: float = 0.95,
    n_pos: int = 2,
    n_neg: int = 3,
    pool_n: int = 1024,
    oversample: int = 4,
    pairs: DataFrame | str = "lsh",
    pool: list | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contrastive training-pair construction: for every document with at
    least one near-duplicate, emit its positives (the near-dup partners)
    and up to ``n_neg`` deterministic negatives — the (anchor, positive,
    negatives) triples contrastive embedding training consumes, built
    entirely from operators this repo already verifies.

    Positives DEFAULT to the banded MinHash-LSH candidate source
    (``pairs="lsh"`` → ``dedup.minhash_lsh_pairs``) — the scale-true
    path, so no caller can silently get the quadratic one. The exact
    token-Jaccard ε-graph is an EXPLICIT opt-in (``pairs="exact"``,
    fixture-scale ground truth for the oracle twin), and any prebuilt
    pair DataFrame (doc_a, doc_b) injects directly — the construction
    is pair-source-agnostic, like ``dedup.dedup_clusters``. Negatives are LINEAR in the anchor count:
    a fixed-size pool (the ``pool_n`` smallest-md5(id) documents — a
    deterministic uniform sample, fetched once via TakeOrdered and
    inlined as a literal array, the same bounded-collect precedent as
    the IVF centroid literals) is probed with ``n_neg·oversample``
    indexed hash picks per anchor (md5(anchor:j) mod |pool|); the
    anchor's own positives (and itself) are anti-joined out and the
    survivors ranked by md5(anchor:candidate). Reproducible across
    runs, engines, and retries — unlike rand()-based negative sampling.
    Oversampling absorbs pick collisions and positive hits; an anchor
    short of ``n_neg`` negatives keeps the survivors it has (in-batch
    sampling semantics). The round-5 shape ranked anchors × pool with a
    FRACTION-sized pool — O(n²/8), which the 10× probe measured at
    385 s with one straggler task; this path is |anchors|·n_neg·
    oversample rows through one anti-join + a bounded per-anchor
    top-k, linear and skew-free (every anchor carries the same pick
    count).

    Output long-format rows (anchor_id, partner_id, role, rnk): role
    'pos' rows carry the pair rank by partner id; 'neg' rows the md5
    priority rank.
    """
    from cloudtrace_exporter_spark.operators import dedup

    if isinstance(pairs, str):
        if pairs == "lsh":
            pairs = dedup.minhash_lsh_pairs(docs, text_col=text_col, id_col=id_col)
        elif pairs == "exact":
            pairs = dedup.jaccard_pairs(docs, threshold, text_col, id_col)
        else:
            raise ValueError(f"pairs must be 'lsh', 'exact', or a DataFrame: {pairs!r}")
    # the pair frame feeds THREE consumers (positive ranking, the anchor
    # set, and the negative anti-join): materialize it once or the
    # pair-generation subtree (quadratic for the exact source) replays
    # per consumer — same fan-out treatment as the BPE vocab
    both = (
        pairs.select(F.col("doc_a").alias("anchor_id"), F.col("doc_b").alias("partner_id"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("anchor_id"), F.col("doc_a").alias("partner_id"))
        )
        .localCheckpoint()
    )
    w_pos = Window.partitionBy("anchor_id").orderBy("partner_id")
    pos = (
        both.select(
            "anchor_id",
            "partner_id",
            F.lit("pos").alias("role"),
            F.row_number().over(w_pos).cast("long").alias("rnk"),
        )
        # cap positives per anchor: a giant near-dup cluster would
        # otherwise contribute cluster² training rows
        .filter(F.col("rnk") <= n_pos)
    )
    anchors = both.select("anchor_id").distinct()
    # fixed-size deterministic pool: the pool_n smallest md5(id) docs.
    # TakeOrdered (never a global sort), then a bounded collect — ≤pool_n
    # ids become a literal array, so the per-anchor pick below is a pure
    # projection: no join, no shuffle, no skew. ``pool`` injects a
    # FROZEN pool (round 11 — the train-once/serve-many artifact
    # lifecycle of the LSH/BM25 caches: the pool is a deterministic
    # function of the corpus, so serving under a session-frozen pool is
    # identical to recollecting it per call).
    pool_ids = pool if pool is not None else [
        r["cand"]
        for r in docs.select(
            F.col(id_col).alias("cand"),
            F.md5(F.col(id_col).cast("string").cast("binary")).alias("h"),
        )
        .orderBy("h", "cand")
        .limit(int(pool_n))
        .collect()
    ]
    if not pool_ids:
        return pos
    pool_arr = F.array(*[F.lit(c) for c in pool_ids])
    m = int(n_neg) * int(oversample)
    idx = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("anchor_id").cast("string"), F.lit(":"), F.col("j").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(len(pool_ids))
    )
    picks = (
        anchors.select(
            "anchor_id", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j")
        )
        .select("anchor_id", F.element_at(pool_arr, (idx + 1).cast("int")).alias("cand"))
        .filter(F.col("cand") != F.col("anchor_id"))
        # two picks may hash to the same pool slot — collapse before ranking
        .distinct()
    )
    pri = F.md5(
        F.concat(
            F.col("anchor_id").cast("string"), F.lit(":"), F.col("cand").cast("string")
        ).cast("binary")
    )
    w_neg = Window.partitionBy("anchor_id").orderBy("pri", "cand")
    negs = (
        # anti-join the anchor's own positives out; both sides are keyed
        # on (anchor_id, cand) — AQE broadcasts whichever side is small,
        # and at corpus scale this is a plain linear hash anti-join
        picks.join(
            F.broadcast(both.withColumnRenamed("partner_id", "cand")),
            ["anchor_id", "cand"],
            "left_anti",
        )
        .withColumn("pri", pri)
        .withColumn("rnk", F.row_number().over(w_neg).cast("long"))
        .filter(F.col("rnk") <= n_neg)
        .select("anchor_id", F.col("cand").alias("partner_id"), F.lit("neg").alias("role"), "rnk")
    )
    return pos.unionByName(negs)


def export_manifest(
    docs: DataFrame,
    *,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Release MANIFEST for a sharded corpus export: per content-hash
    shard — document count, token sum, and an ORDER-INSENSITIVE id
    checksum — the artifact a consumer verifies after copying a 100 TB
    export, and the writer's completeness proof. Shard assignment is
    md5-content-hashed (stable under repartitioning, retries, and
    speculative re-execution — the hash_sample argument), so the
    manifest is a pure function of the corpus, not of the job that
    wrote it.

    The checksum is the plain BIGINT sum of per-id md5-prefix values
    reduced mod 2³¹−1: commutative (file order never matters), and the
    sum stays exact below ~2³² docs per shard — beyond that, shard
    wider. One narrow map + one |shards|-group aggregation; zero joins.
    Full DuckDB oracle (same md5-prefix arithmetic as the portable hash
    family).
    """
    from cloudtrace_exporter_spark.operators import dedup

    hid = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    v = hid % dedup.PORTABLE_P
    return (
        docs.select(
            (v % n_shards).cast("long").alias("shard"),
            v.alias("__v"),
            text.token_count(text_col).cast("long").alias("__nt"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
            F.sum("__v").alias("id_checksum"),
        )
    )


def water_fill_caps(
    docs: DataFrame,
    *,
    budget_num: int = 60,
    budget_den: int = 100,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Max-min fair (water-filling) per-source token allocation: given a
    global token budget B (a ``budget_num/budget_den`` fraction of the
    corpus, so the contract is scale-free), find the cap T such that
    every source keeps min(capacity, T) tokens and the caps sum to the
    budget — the allocation a mixture designer reaches for when the
    instruction is "cap the over-represented feeds, never starve the
    small ones" (the fairness twin of temperature_sampling_plan's
    smoothing: water-filling is temperature → 0 subject to capacity).

    ALL-INTEGER closed form, so the result is a pure function of the
    corpus: sources sorted by capacity ascending, the first position
    where cap·remaining ≥ budget−prefix fixes T = floor-div and a
    remainder r < remaining; because r > 0 forces every capped source's
    capacity strictly above T, the r leftover tokens go +1 each to the
    first r capped sources in source-name order — deterministic,
    engine-portable, no floats anywhere until the reported fill rate.

    Scale shape: ONE source-keyed aggregation with map-side partials
    reduces the corpus to a |sources|-row profile; every window below
    runs on that profile (unpartitioned by design — bounded by source
    cardinality, never data volume). Reference analogy: the reference
    has no mixture planner; this extends the north-star curation
    surface (SURVEY.md §2 B-rows).
    """
    # a source whose docs are all NULL-text has ZERO capacity, not NULL:
    # a NULL capacity would sort NULLS-FIRST in Spark's fill order but
    # NULLS-LAST in DuckDB's, poisoning every downstream allocation
    # (round-8 differential-fuzz find)
    prof = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(text.token_count(text_col)).cast("long"), F.lit(0)).alias(
            "capacity"
        ),
    )
    # [WindowExec: No Partition Defined — BENIGN HERE] every window in
    # this function runs over the |sources|-row profile (single digits
    # to thousands), never the corpus.
    wall = Window.partitionBy()
    budget = F.floor(F.sum("capacity").over(wall) * budget_num / budget_den).cast("long")
    wcap = Window.orderBy(F.asc("capacity"), F.asc("source"))
    prefix_prev = F.coalesce(
        F.sum("capacity").over(wcap.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    rn = F.row_number().over(wcap)
    remaining = F.count(F.lit(1)).over(wall) - rn + 1
    need = budget - prefix_prev
    feasible = F.col("capacity") * remaining >= need
    # floor over a double division is exact while token totals stay
    # below 2^53 ≈ 9e15 (a 100 TB corpus is ~2.5e13 tokens — 360×
    # headroom); the sum/product stays in exact long arithmetic.
    cand = F.when(
        feasible,
        F.struct(
            rn.alias("rn"),
            F.floor(need / remaining).cast("long").alias("t"),
            (need % remaining).cast("long").alias("rem"),
        ),
    )
    # three selects: window results feed later windows, and Spark (like
    # SQL) forbids nesting a window function over another's output in
    # one projection.
    s1 = prof.select(
        "source", "n_docs", "capacity", rn.alias("__rn"), cand.alias("__cand")
    )
    s2 = s1.select(
        "source",
        "n_docs",
        "capacity",
        "__rn",
        F.min("__cand").over(wall).alias("__cap"),
    )
    c = F.col("__cap")
    capped = c.isNotNull() & (F.col("__rn") >= c["rn"])
    s3 = s2.withColumn("__capped", capped)
    wsrc = Window.orderBy(F.asc("source")).rowsBetween(Window.unboundedPreceding, 0)
    rank_capped = F.sum(F.when(F.col("__capped"), 1).otherwise(0)).over(wsrc)
    alloc = (
        F.when(~F.col("__capped"), F.col("capacity"))
        .otherwise(c["t"] + F.when(rank_capped <= c["rem"], 1).otherwise(0))
        .cast("long")
    )
    return s3.select(
        "source",
        "n_docs",
        "capacity",
        alloc.alias("allocated"),
        F.col("__capped").alias("capped"),
        # NULL fill rate for a zero-capacity source (all-empty docs):
        # ANSI aborts on /0, DuckDB's /0 is NULL (round-8 fuzz find)
        F.when(
            F.col("capacity") > 0, F.round(alloc / F.col("capacity"), 6)
        ).alias("fill_rate"),
    ).orderBy("source")


def quantile_normalize(
    docs: DataFrame,
    *,
    value_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source QUANTILE NORMALIZATION (Bolstad et al. 2003, the
    microarray batch-effect fix applied to corpus curation): map every
    document's score onto the GLOBAL score distribution at the same
    within-source quantile, so a single downstream threshold means the
    same thing for every feed — the correction step before a global
    quality cut when feeds score on different scales (one crawler's
    median length is another's p95).

    Deterministic by construction: within-source rank r (value, id
    total order) maps to the global sorted value at 1-based index
    floor((r−1)·(N−1)/(n_s−1)) + 1 — an EXACT ELEMENT of the global
    distribution (the Theil–Sen lower-median argument: element
    selection, never interpolation, so no engine averaging rule can
    split the result); all index arithmetic is integer. A
    single-member source maps to the global lower median.

    Scale shape: the global reference ranking uses global_row_number
    (range-partitioned two-phase numbering — never a single-partition
    window); the per-source rank is one group-keyed window; the lookup
    is an equi-join on the computed global index. Three keyed shuffles
    total, all on narrow (id, value, rank) frames.
    """
    vals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("v"),
    )
    ranked = analytics.global_row_number(
        vals.select("v", "doc_id"), [F.asc("v"), F.asc("doc_id")], with_total=True
    ).select(F.col("rn").alias("gi"), F.col("v").alias("ref_v"), "_n_total")
    wg = Window.partitionBy("grp").orderBy(F.asc("v"), F.asc("doc_id"))
    wn = Window.partitionBy("grp")
    per = vals.select(
        "doc_id",
        "grp",
        "v",
        F.row_number().over(wg).alias("r"),
        F.count(F.lit(1)).over(wn).alias("ns"),
    )
    n_total = ranked.select(F.max("_n_total").alias("N"))
    gi = F.when(
        F.col("ns") > 1,
        F.floor((F.col("r") - 1) * (F.col("N") - 1) / (F.col("ns") - 1)) + 1,
    ).otherwise(F.floor((F.col("N") + 1) / 2)).cast("long")
    keyed = per.join(F.broadcast(n_total)).withColumn("gi", gi)
    # no final global sort: the output is corpus-sized — ordering it
    # would add a full range exchange for presentation only
    return keyed.join(ranked.select("gi", "ref_v"), "gi").select(
        "doc_id",
        F.col("grp").alias(group_col),
        F.col("v").alias("raw_value"),
        F.col("ref_v").alias("normalized_value"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Release-to-release corpus DIFF: per source — documents added,
    removed, changed (same id, different normalized content hash), and
    unchanged, with the net token delta. The review artifact between
    two corpus snapshots (the dynamic twin of export_manifest's static
    checksum): "the new crawl added 2M docs but net-removed tokens from
    src7" is the sentence that stops a bad release.

    Full outer join on doc id with md5 content fingerprints (the
    normalized_dedup hash family), one source-keyed aggregation after —
    two shuffles total, both on narrow (id, fp, tokens) frames; change
    detection never compares text, only hashes. All-integer output.
    """
    def prep(df: DataFrame, side: str) -> DataFrame:
        normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias(f"{side}_source"),
            F.md5(normalized).alias(f"{side}_fp"),
            text.token_count(text_col).cast("long").alias(f"{side}_tok"),
        )

    j = prep(old, "old").join(prep(new, "new"), "doc_id", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("source", F.coalesce("new_source", "old_source"))
        .withColumn("status", status)
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
            .cast("long")
            .alias("n_added"),
            F.sum(F.when(F.col("status") == "removed", 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.sum(F.when(F.col("status") == "changed", 1).otherwise(0))
            .cast("long")
            .alias("n_changed"),
            F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0))
            .cast("long")
            .alias("n_unchanged"),
            F.sum(F.coalesce("new_tok", F.lit(0)) - F.coalesce("old_tok", F.lit(0)))
            .cast("long")
            .alias("token_delta"),
        )
        .orderBy("source")
    )


def purged_time_folds(
    events: DataFrame,
    *,
    k: int = 5,
    embargo_days: int = 3,
    ts_col: str = "ts",
) -> DataFrame:
    """Purged walk-forward cross-validation folds (the time-series CV
    from López de Prado's purged-K-fold, reduced to day granularity) —
    the temporal complement of the hash-keyed ``cluster_safe_splits``:
    that one stops NEAR-DUP leakage across splits, this one stops
    TEMPORAL leakage (training on the future, or on days so close to
    the test window that label horizons overlap).

    Days are ranked in time order and cut into ``k`` contiguous folds
    of balanced size (fold = ⌊k·idx/n⌋ — the exact equi-count split,
    not a sampled approximation). For each EVALUATION fold f, every day
    gets a role: 'test' (inside f), 'embargo' (the ``embargo_days``
    days immediately before f's start — purged because horizon-h labels
    computed there peek into the test window), 'train' (strictly
    earlier), or 'future' (after f — walk-forward never trains on it).
    All integer/date arithmetic; fully oracle-replayable.

    Scale shape: the corpus reduces map-side to the daily grid; the
    rank window runs over that bounded frame ([WindowExec: No Partition
    Defined — BENIGN HERE] |calendar| rows, the daily_spine argument);
    roles come from an explode over the k-row fold sequence — output is
    k·|days| rows, never data-sized.
    """
    daily = events.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    w = Window.orderBy("day")
    ranked = (
        daily.withColumn("day_idx", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn("fold", F.floor(F.col("day_idx") * k / F.col("__n")).cast("long"))
    )
    # fold start indices ride along per row: start(f) = ceil(f*n/k)
    ev = ranked.withColumn("eval_fold", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    start = F.ceil(F.col("eval_fold") * F.col("__n") / k).cast("long")
    role = (
        F.when(F.col("fold") == F.col("eval_fold"), F.lit("test"))
        .when(F.col("fold") > F.col("eval_fold"), F.lit("future"))
        .when(F.col("day_idx") >= start - embargo_days, F.lit("embargo"))
        .otherwise(F.lit("train"))
    )
    return ev.select(
        F.col("eval_fold").cast("long").alias("eval_fold"),
        "day",
        "day_idx",
        "fold",
        role.alias("role"),
        "n_events",
    ).orderBy("eval_fold", "day")


def target_encoding_loo(
    events: DataFrame,
    *,
    smoothing: int = 10,
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing — the
    standard high-cardinality categorical feature for tabular models
    (Micci-Barreca 2001), computed WITHOUT leakage: row i's encoding of
    its category excludes its own label,
    enc_i = (Σ_cat y − y_i + m·prior) / (n_cat − 1 + m), shrunk toward
    the global prior by pseudo-count ``m``. Plain category-mean encoding
    leaks the row's own target into its feature (the classic silent
    overfit); LOO is the drop-in fix.

    Determinism contract: the label is integer (value above the GLOBAL
    lower-median, an exact element selection over the (value, id) total
    order), category sums/counts are exact BIGINTs, the prior is one
    integer ratio, and each encoding is ONE pinned IEEE division —
    numerator and denominator both exact integers scaled by the
    denominator of the prior (so m·prior stays integer:
    enc = (Δ·n_tot + m·succ_tot) / ((n_cat − 1 + m)·n_tot) with
    Δ = Σ_cat y − y_i).

    Scale shape: one global median-rank window, one category
    aggregation broadcast back — the output is row-per-event (a FEATURE
    column, not a report), all narrow after the two shuffles.
    """
    # global lower-median threshold WITHOUT a single-partition window
    # over the fact: the range-partitioned two-phase numbering picks the
    # exact element, and the 1-row threshold broadcasts back (the same
    # total order the naive window would use — values identical)
    # NULL metrics can't vote on the median or be labeled (and Spark ranks
    # NULL values first where DuckDB ranks them last — the threshold element
    # would differ); NULL categories can't be encoded (the cat equi-join
    # would silently drop them while the totals counted them). Both filtered
    # up front on both engines (round-8 differential-fuzz find).
    ranked = analytics.global_row_number(
        events.select(F.col(id_col), F.col(type_col).alias("cat"), F.col(value_col))
        .where(F.col(value_col).isNotNull() & F.col(type_col).isNotNull()),
        [value_col, id_col],
        with_total=True,
    )
    thr = ranked.filter(
        F.col("rn") == F.floor((F.col("_n_total") + 1) / 2)
    ).select(F.col(value_col).alias("__thr"))
    g = (
        ranked.drop("rn", "_n_total")
        .crossJoin(F.broadcast(thr))
        .withColumn("y", (F.col(value_col) > F.col("__thr")).cast("long"))
    )
    cat = g.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("n_cat"),
        F.sum("y").cast("long").alias("succ_cat"),
    )
    tot = cat.agg(
        F.sum("n_cat").cast("long").alias("n_tot"),
        F.sum("succ_cat").cast("long").alias("succ_tot"),
    )
    m = int(smoothing)
    num = (F.col("succ_cat") - F.col("y")) * F.col("n_tot") + m * F.col("succ_tot")
    den = (F.col("n_cat") - 1 + m) * F.col("n_tot")
    return (
        g.join(F.broadcast(cat), "cat")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(id_col),
            "cat",
            "y",
            "n_cat",
            F.round(num / den, 6).alias("enc_loo"),
        )
        .orderBy(id_col)
    )


def woe_iv(
    events: DataFrame,
    *,
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Weight-of-Evidence / Information-Value per category — the other
    classical categorical encoding (credit-scoring lineage; Siddiqi):
    WoE = ln(P(cat|positive) / P(cat|negative)), with the category's IV
    term (pct_pos − pct_neg)·WoE measuring how much separation the
    category carries. The REPORT twin of target_encoding_loo's feature
    column: WoE ranks categories by evidence, IV ranks the whole
    variable's usefulness.

    Exactness: same integer label machinery (global lower-median
    threshold, exact element); each WoE is ONE natural log of an exact
    integer cross-ratio ln((succ_cat·fail_tot)/(fail_cat·succ_tot)) —
    log of a quotient of exact BIGINT products, pinned IEEE; the IV
    term is two integer ratios, one subtraction, one multiply. Degenerate
    categories (no positives or no negatives — infinite WoE) emit NULL,
    the standard "apply Laplace smoothing upstream" signal, never ±inf.

    Scale shape: one global median window + one category aggregation;
    output is |categories| rows.
    """
    # same scale-true global-median selection as target_encoding_loo; NULL
    # metrics are filtered for the same cross-engine NULL-ordering reason
    # (NULL categories stay — no equi-join here, groupBy keeps the NULL
    # group identically on both engines)
    ranked = analytics.global_row_number(
        events.select(F.col(id_col), F.col(type_col).alias("cat"), F.col(value_col))
        .where(F.col(value_col).isNotNull()),
        [value_col, id_col],
        with_total=True,
    )
    thr = ranked.filter(
        F.col("rn") == F.floor((F.col("_n_total") + 1) / 2)
    ).select(F.col(value_col).alias("__thr"))
    g = (
        ranked.drop("rn", "_n_total")
        .crossJoin(F.broadcast(thr))
        .withColumn("y", (F.col(value_col) > F.col("__thr")).cast("long"))
    )
    cat = g.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("n_cat"),
        F.sum("y").cast("long").alias("succ_cat"),
    )
    tots = Window.partitionBy()
    # [WindowExec: No Partition Defined — BENIGN HERE] |categories| rows
    c = (
        cat.withColumn("fail_cat", F.col("n_cat") - F.col("succ_cat"))
        .withColumn("succ_tot", F.sum("succ_cat").over(tots))
        .withColumn("fail_tot", F.sum("fail_cat").over(tots))
    )
    ok = (F.col("succ_cat") > 0) & (F.col("fail_cat") > 0)
    woe = F.log(
        (F.col("succ_cat") * F.col("fail_tot")).cast("double")
        / (F.col("fail_cat") * F.col("succ_tot")).cast("double")
    )
    iv = (
        F.col("succ_cat") / F.col("succ_tot") - F.col("fail_cat") / F.col("fail_tot")
    ) * woe
    return c.select(
        "cat",
        "n_cat",
        "succ_cat",
        "fail_cat",
        F.when(ok, F.round(woe, 6)).alias("woe"),
        F.when(ok, F.round(iv, 6)).alias("iv_term"),
    ).orderBy("cat")


def pack_layout(
    documents: DataFrame,
    *,
    context_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window PACKING layout — the concat-and-split plan every
    LLM pretraining loader materializes: documents are laid end-to-end
    in a deterministic total order (ingestion id), each receives its
    global token offset, and the context window that offset falls in.
    ``straddles`` marks documents split across a window boundary — the
    packing loss knob next to padding_waste's padded-cost report (this
    layout is what eliminates padding; straddle rate is its price).

    Exactness strategy: token counts are integers; the global offset is
    an exclusive integer prefix sum in the (doc_id) total order
    (analytics.global_running_sum — the distributed scan primitive);
    bin/position are floor-div/mod. Nothing floats.

    Scale shape: one cached range exchange + one balanced pid-window
    exchange (the irreducible prefix-sum scan) — never a
    single-partition window over the corpus; the bin arithmetic is
    narrow. Output is one row per document.
    """
    toks = documents.select(
        F.col(id_col).alias("doc_id"), text.token_count(text_col).cast("long").alias("n_tokens")
    )
    pref = analytics.global_running_sum(toks, ["doc_id"], "n_tokens")
    off = F.col("_prefix")
    return pref.select(
        "doc_id",
        "n_tokens",
        off.alias("tok_offset"),
        F.floor(off / context_len).cast("long").alias("bin"),
        (off % context_len).cast("long").alias("pos_in_bin"),
        (
            (F.col("n_tokens") > 0)
            & (F.floor((off + F.col("n_tokens") - 1) / context_len) > F.floor(off / context_len))
        ).alias("straddles"),
    ).orderBy("doc_id")


def exact_quota_split(
    documents: DataFrame,
    *,
    val_num: int = 1,
    val_den: int = 10,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT-count stratified validation split — largest-remainder
    (Hamilton) apportionment: the global validation set has EXACTLY
    ⌊N·frac⌋ documents, allocated across strata by integer base quotas
    plus bonus seats to the largest fractional remainders, and filled
    within each stratum by md5 priority. The complement of
    ``assign_splits``' hash-interval split: that one is cross-table
    consistent but only approximately proportioned; this one hits the
    quota to the document — what a fixed-budget eval set requires.

    Exactness strategy: everything is integer arithmetic on counts
    (target = N·num // den; base_s = n_s·num // den; remainders ranked
    by (rem desc, stratum asc) — a total order); within-stratum
    priority is the md5-of-id rank with the id tiebreak (deterministic
    across engines, runs, and repartitioning — the hash_sample rule).

    Scale shape: one stratum-keyed window for the per-document rank
    (the only full-data exchange); the apportionment itself runs on the
    |strata|-row profile (its unpartitioned windows are benign —
    strata-count rows). Broadcast quota join back.
    """
    s = documents.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    # [WindowExec: No Partition Defined — BENIGN HERE] |strata| rows
    tots = Window.partitionBy()
    wrem = Window.orderBy(F.desc("rem"), F.asc("stratum"))
    quotas = (
        s.withColumn("base", F.expr(f"(n_s * {val_num}) DIV {val_den}"))
        .withColumn("rem", (F.col("n_s") * val_num) % val_den)
        .withColumn(
            "target",
            (F.sum("n_s").over(tots) * val_num - (F.sum("n_s").over(tots) * val_num) % val_den)
            / val_den,
        )
        .withColumn("target", F.col("target").cast("long"))
        .withColumn("deficit", F.col("target") - F.sum("base").over(tots))
        .withColumn("seat", F.row_number().over(wrem))
        .select(
            "stratum",
            (F.col("base") + (F.col("seat") <= F.col("deficit")).cast("long")).alias(
                "quota"
            ),
        )
    )
    pr = F.md5(F.col(id_col).cast("string").cast("binary"))
    wdoc = Window.partitionBy("stratum").orderBy(pr.asc(), F.col(id_col).asc())
    return (
        documents.select(F.col(id_col).alias("doc_id"), F.col(strata_col).alias("stratum"))
        .withColumn("rk", F.row_number().over(wdoc).cast("long"))
        .join(F.broadcast(quotas), "stratum")
        .select(
            "doc_id",
            "stratum",
            F.when(F.col("rk") <= F.col("quota"), F.lit("val"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


def source_concentration(
    documents: DataFrame,
    *,
    strata_col: str = "lang",
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Source-concentration report — Herfindahl–Hirschman index of token
    share by source within each stratum, plus the effective source
    count (1/HHI) and the top source's share: the "is this slice of the
    corpus secretly one crawl" diagnostic a mixture designer reads next
    to temperature_sampling_plan.

    Exactness strategy: HHI = Σ t_s² / (Σ t_s)² with per-source token
    sums as exact BIGINTs — ONE raw-double division (the percent_rank
    rule); effective_sources = 1/HHI and top_share are each one more
    pinned op on those exact ratios, rounded to 6.

    Scale shape: one (stratum, source) aggregate with map-side
    partials, then a |groups|-row stratum reduce. No windows over data,
    no joins.
    """
    t = documents.groupBy(
        F.col(strata_col).alias("stratum"), F.col(group_col).alias("grp")
    ).agg(F.sum(text.token_count(text_col)).cast("long").alias("t_s"))
    per = t.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("t_s").cast("long").alias("n_tokens"),
        F.sum(F.col("t_s") * F.col("t_s")).cast("long").alias("__sq"),
        F.max("t_s").cast("long").alias("__top"),
    )
    ok = F.col("n_tokens") > 0
    hhi = F.col("__sq").cast("double") / (F.col("n_tokens") * F.col("n_tokens")).cast(
        "double"
    )
    return per.select(
        "stratum",
        "n_sources",
        "n_tokens",
        F.when(ok, hhi).alias("hhi"),
        F.when(ok, F.round(1.0 / hhi, 6)).alias("effective_sources"),
        F.when(
            ok, F.col("__top").cast("double") / F.col("n_tokens").cast("double")
        ).alias("top_share"),
    ).orderBy("stratum")


def curriculum_schedule(
    docs: DataFrame,
    *,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum schedule for ordered pretraining (Bengio et al. 2009
    applied to corpus feeding): rank every document by an easy→hard
    difficulty key and cut the ranking into ``n_buckets`` equal-count
    difficulty tiers; a progressive curriculum run admits tier k at
    epoch k, so the per-tier token mass and the cumulative corpus
    fraction at each admission step ARE the loader's schedule table.

    Difficulty key = whitespace token count (doc length is the classic
    zero-model difficulty proxy), doc id as the total-order tiebreak.
    Ranking uses analytics.global_row_number (range-partitioned
    two-phase numbering with ``_n_total`` carried from the same tiny
    offsets frame — NO single-partition window over the corpus, no
    second lineage for the count); the tier cut is the exact integer
    NTILE formula bucket = (rank-1)·k DIV n.

    Output (n_buckets rows): bucket, n_docs, n_tokens (BIGINT sums),
    min/max token count per tier, cum_tokens, and cum_token_frac (raw
    integer-ratio double) — everything integer until the single final
    division, so the whole table replays exactly in SQL.
    """
    # NULL text ranks as 0 tokens on BOTH engines (Spark sorts NULLs
    # first ASC, DuckDB last — coalescing before the rank removes the
    # NULL-ordering divergence axis entirely). The coalesce is on the
    # TEXT column, not on size()'s output: under pre-ANSI sizeOfNull
    # configs size(NULL) is -1, not NULL, and an outer coalesce would
    # never fire — pinning the input keeps n_tok=0 engine-config-proof.
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        text.token_count(F.coalesce(F.col(text_col), F.lit(""))).alias("n_tok"),
    )
    ranked = analytics.global_row_number(
        toks, [F.col("n_tok"), F.col("doc_id")], with_total=True
    )
    tiered = ranked.select(
        "n_tok",
        F.expr(f"(rn - 1) * {n_buckets} DIV _n_total").alias("bucket"),
    )
    per = tiered.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("n_tok").alias("min_tokens"),
        F.max("n_tok").alias("max_tokens"),
    )
    # cumulative admission mass: a window over the <= n_buckets-row
    # summary frame (never the corpus)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "min_tokens",
        "max_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        (
            F.sum("n_tokens").over(w).cast("double")
            / F.sum("n_tokens").over(tot).cast("double")
        ).alias("cum_token_frac"),
    ).orderBy("bucket")


def domain_reweight(
    docs: DataFrame,
    *,
    domain_col: str = "source",
    text_col: str = "text",
    eta_num: int = 1,
    eta_den: int = 2,
    rounds: int = 4,
    scale: int = 10**6,
) -> DataFrame:
    """Excess-loss DOMAIN REWEIGHTING (round 11), ORACLE-EXACT — the
    DoReMi-shaped mixture tilt (Xie et al. 2023): domains whose mean
    per-document loss exceeds the corpus mean get UP-weighted (hard
    domains earn more sampling mass), easy domains down-weighted, by a
    multiplicative-weights update applied ``rounds`` times. True DoReMi
    re-measures excess loss under a proxy model per step; this is the
    static-corpus tilt a data pipeline can actually compute — the same
    update rule with the excess fixed at its measured value, so the
    weight is w_d ∝ (1 + η·excess_d)^rounds, the standard
    multiplicative-weights posture with ``rounds`` as tilt strength.

    Loss proxy here is the whitespace token count (length — the classic
    compute-cost proxy); swap in any INTEGER per-doc loss by adapting
    the aggregation. Engine-exactness discipline: every aggregate is a
    BIGINT sum; means and the relative excess (parts-per-``scale``) use
    truncate-toward-zero division (Spark ``div`` == DuckDB ``//``); the
    per-round factor is clamped at 0 (a domain more than 1/η below the
    mean pins to weight 0 rather than going negative); the ONLY floats
    are the final normalized fractions. One domain-keyed aggregation
    with map-side partials + a |domains|-row window — corpus-scale work
    is a single groupBy.

    Emits (domain, n_docs, mean_loss, excess_ppm, weight_raw,
    weight_frac), ordered by domain.
    """
    prof = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(text.token_count(text_col)).cast("long").alias("sum_loss"),
    )
    w = Window.partitionBy()
    prof = prof.select(
        "domain",
        "n_docs",
        "sum_loss",
        F.sum("sum_loss").over(w).alias("__ts"),
        F.sum("n_docs").over(w).alias("__tn"),
    ).select(
        "domain",
        "n_docs",
        F.expr("sum_loss div n_docs").alias("mean_loss"),
        F.expr(
            f"((sum_loss div n_docs) - (__ts div __tn)) * {scale}"
            " div greatest(__ts div __tn, 1)"
        ).alias("excess_ppm"),
    )
    factor = f"greatest({eta_den * scale} + {eta_num} * excess_ppm, 0)"
    w_sql = str(scale)
    for _ in range(rounds):
        w_sql = f"(({w_sql}) * ({factor}) div {eta_den * scale})"
    out = prof.withColumn("weight_raw", F.expr(w_sql).cast("long"))
    return out.select(
        "domain",
        "n_docs",
        "mean_loss",
        "excess_ppm",
        "weight_raw",
        F.round(
            F.col("weight_raw") / F.sum("weight_raw").over(w), 6
        ).alias("weight_frac"),
    ).orderBy("domain")
