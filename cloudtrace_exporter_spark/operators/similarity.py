"""Embedding similarity search (SURVEY §2 B34 + driver north_star).

Two tiers:

- **Brute-force cosine top-k** — the exactness baseline. The query set is
  broadcast (it's small by definition); the corpus scan stays partitioned,
  each partition scores its vectors against every query and a
  TakeOrdered-style window keeps k per query. Exact, embarrassingly
  parallel, O(|corpus|·|queries|·d) — correct up to ~10⁴ queries.
- **Hyperplane-LSH bucketed ANN** — the 100 TB path. Sign-bit sketches
  against a fixed random hyperplane family coarse-quantize the corpus;
  neighbors are searched only within matching buckets (optionally
  multi-probe by flipping low-confidence bits). Recall<1, cost ~O(n/2^bits
  per bucket). An IVF variant would swap the hash for k-means centroids —
  same join shape.

All vector math is built-in higher-order functions (zip_with/aggregate),
JVM-side, over ``array<double>`` — no UDF in either path.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cloudtrace_exporter_spark.session import cache_once


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to core count before compute-bound scoring (see
    dedup._spread: byte-sized scan partitions under-parallelize small
    files; vector scoring is CPU-bound, not IO-bound). Skipped when the
    input already has ≥ the session's parallelism — at corpus scale an
    unconditional round-robin would be a gratuitous full shuffle."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    from cloudtrace_exporter_spark.session import rdd_partitions

    if rdd_partitions(df) >= parallelism:
        return df
    return df.repartition(parallelism)


def _as_double(vec_col: str) -> F.Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _safe_cosine(cv: F.Column, qv: F.Column) -> F.Column:
    """6-rounded cosine with the ZERO-VECTOR guard: NULL when either norm
    is zero (a zero embedding has no direction; under ANSI mode the raw
    division would abort the whole job on one bad row — round-8
    differential-fuzz find). NULL cosines rank LAST under the DESC
    ranking on both engines (Spark desc and DuckDB default are both
    NULLS LAST for DESC), so top-k semantics stay engine-identical."""
    cn, qn = _norm(cv), _norm(qv)
    return F.when((cn > 0.0) & (qn > 0.0), F.round(_dot(cv, qv) / (cn * qn), 6))


def _matrix_lit(vectors: list[list[float]]) -> F.Column:
    """A list of double vectors as ONE parser-built nested array literal.

    Building plane/centroid matrices element-by-element with ``F.lit``
    costs a py4j round-trip per element (~4000 for 16×64 planes ×2 sides
    — measured ~3 s of pure driver time before any action) and leaves
    Catalyst a 1000-literal tree to re-analyze per call. One ``F.expr``
    string parses in milliseconds and constant-folds to the same doubles:
    ``repr(x)`` round-trips to the identical IEEE double the SQL parser
    produces for ``<repr>D``.
    """
    return F.expr(_matrix_sql(vectors))


def _matrix_sql(vectors: list[list[float]]) -> str:
    """The nested-array literal of _matrix_lit as SQL text, for call
    sites that embed it in a larger selectExpr string."""
    rows = ",".join("array(" + ",".join(repr(x) + "D" for x in v) + ")" for v in vectors)
    return f"array({rows})"


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    ``queries`` is broadcast; the corpus-side scan never shuffles until
    the final per-query top-k (a window over query_id — cardinality
    |queries|, so the shuffle is tiny). Ties break by corpus id for
    determinism. Self-matches (same id) are excluded.
    """
    c = _spread(corpus).select(F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            _safe_cosine(F.col("cv"), F.col("qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cosine", "rnk")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    positive_threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: per
    query, the top-k HIGHEST-cosine vectors that are NOT positives
    (cosine < ``positive_threshold``) — the near-but-not-duplicate
    examples that teach a model the decision boundary, vs the easy
    random negatives of contrastive_pairs. The standard mining pass
    (DPR/Sentence-BERT recipe) run against the corpus itself.

    Same plan as cosine_topk (broadcast queries, corpus scan never
    shuffles until the tiny per-query ranking window) with the positive
    band filtered out BEFORE ranking — exact at fixture scale; at 100 TB
    feed candidates from lsh_topk and apply the same band filter.
    Fully oracle-able (the threshold cuts on the 6-rounded cosine, so
    both engines cut identically).
    """
    c = _spread(corpus).select(F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            _safe_cosine(F.col("cv"), F.col("qv")).alias("cosine"),
        )
        .filter(F.col("cosine") < positive_threshold)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cosine", "rnk")
    )


def truncated_dim_recall(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    dims: tuple[int, ...] = (8, 16, 32),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style truncation evaluation: recall@k of cosine top-k
    computed on only the FIRST ``d`` embedding dimensions, against the
    full-dimension top-k, per (d, query) — the measurement behind
    shipping truncatable embeddings (store 8/16 dims hot, full dims
    cold) and behind choosing an IVF/PQ coarse dimension. Answers "how
    many dims does THIS corpus actually need?" as a query.

    ONE broadcast-scored pass computes EVERY probe dim's cosine plus
    the full-dim truth per (corpus, query) row — the cosines for all
    dims explode into (dim_tag, cosine) rows and a single window
    partitioned by (dim_tag, query_id) ranks them all at once (the
    independent-pass formulation cost 4 corpus scans, 4 windows, and a
    sort-merge join against the unsized truth frame — 21 exchanges;
    this shape is 1 scan + 1 window + broadcast joins). The recall
    join runs on top-k-sized frames (KBs), truth side broadcast. Exact
    and fully oracle-able (list slicing + the shared rounded-cosine
    ranking in both engines).
    """
    def cos(cv: Column, qv: Column) -> Column:
        return F.round(_dot(cv, qv) / (_norm(cv) * _norm(qv)), 6)

    vec = _as_double(vec_col)
    c = _spread(corpus).select(F.col(id_col).alias("corpus_id"), vec.alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), vec.alias("qv"))
    per_dim = [
        F.struct(
            F.lit(d).cast("long").alias("dim"),
            cos(F.slice(F.col("cv"), 1, d), F.slice(F.col("qv"), 1, d)).alias("cosine"),
        )
        for d in dims
    ] + [
        F.struct(
            F.lit(0).cast("long").alias("dim"),  # 0 tags the full-dim truth
            cos(F.col("cv"), F.col("qv")).alias("cosine"),
        )
    ]
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", F.explode(F.array(*per_dim)).alias("s"))
        .select("query_id", "corpus_id", F.col("s.dim").alias("dim"), F.col("s.cosine").alias("cosine"))
    )
    w = Window.partitionBy("dim", "query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    # materialize the (|dims|+1)·|queries|·k-row survivors once: the
    # probes and truth branches would otherwise each replay the whole
    # scoring pass (the contrastive_pairs fan-out precedent)
    topk = (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("dim", "query_id", "corpus_id")
        .localCheckpoint()
    )
    truth = topk.filter(F.col("dim") == 0).select(
        "query_id", "corpus_id", F.lit(1).alias("__rel")
    )
    return (
        topk.filter(F.col("dim") != 0)
        .join(F.broadcast(truth), ["query_id", "corpus_id"], "left")
        .groupBy("dim", "query_id")
        .agg(F.sum(F.coalesce("__rel", F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "dim",
            "query_id",
            "n_hits",
            F.round(F.col("n_hits") / F.lit(float(k)), 6).alias("recall"),
        )
    )


def hyperplane_planes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """Fixed random hyperplane family (unit Gaussians, seeded) — shipped to
    executors as literals, so every task hashes identically."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_bits):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def hyperplane_bucket(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-bit sketch: bucket id = Σ (dot(v, plane_i) > 0) << i."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec, p) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def _sq_dist(a: F.Column, b: F.Column) -> F.Column:
    d = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)


def build_ivf_index(
    corpus: DataFrame,
    *,
    n_centroids: int = 16,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) index: k-means-style centroids + per-vector
    cell assignment, all DataFrame ops.

    Seeding is deterministic (the ``n_centroids`` lowest ids), refined by
    ``lloyd_iters`` Lloyd steps: assign each vector to its nearest
    centroid (broadcast centroids — they are tiny by construction), then
    recompute centroids as per-cell means via posexplode + groupBy —
    one shuffle of (cell, pos, val) triples per iteration, never a
    collect of vectors.

    Returns ``(assigned, centroids)``: the corpus with a ``cell`` column,
    and the centroid table ``(cell, centroid)``. At 100 TB the index
    build is a few passes over the data; the per-query probe then touches
    ``n_probe/n_centroids`` of the corpus (see ivf_topk).
    """
    v = _spread(corpus).select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    spark = corpus.sparkSession
    seed = (
        v.orderBy("id").limit(n_centroids)
        .select(F.row_number().over(Window.orderBy("id")).alias("cell"), F.col("v").alias("centroid"))
    )
    # Centroids are collected per round (n_centroids × dim doubles —
    # kilobytes by construction; NEVER the vectors). Iterative algorithms
    # must truncate lineage per round, or every iteration's plan stacks
    # under the next; re-entering the centroids as literals also turns
    # per-vector assignment into a narrow map (no join, no window, no
    # shuffle of the corpus) — the standard Spark k-means shape.
    cent_rows = seed.collect()
    if not cent_rows:
        # EMPTY corpus — reference A12 semantics: the index of an empty
        # corpus is an empty assignment + empty centroid table, not an
        # error (the first batch of a new tenant has no vectors yet)
        empty_assigned = v.withColumn("cell", F.lit(1)).select("id", "v", "cell")
        return empty_assigned, spark.createDataFrame(
            [], schema="cell int, centroid array<double>"
        )
    for _ in range(lloyd_iters):
        assigned = v.withColumn("cell", _nearest_cell(F.col("v"), cent_rows))
        cent_rows = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("mean_val"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean_val"))),
                    lambda s: s["mean_val"],
                ).alias("centroid")
            )
            .collect()
        )
    assigned = v.withColumn("cell", _nearest_cell(F.col("v"), cent_rows)).select("id", "v", "cell")
    centroids = spark.createDataFrame(cent_rows, schema="cell int, centroid array<double>")
    return assigned, centroids


def _nearest_cell(v: F.Column, cent_rows) -> F.Column:
    """Nearest-centroid cell id as a pure narrow expression: the centroid
    table rides in as a literal matrix (see _matrix_lit), distances via
    one transform, argmin via array_sort on (dist, cell) structs — ties
    break on the lower cell id, matching the previous window-based
    row_number ordering."""
    rows = sorted(cent_rows, key=lambda r: r["cell"])
    m = _matrix_lit([list(r["centroid"]) for r in rows])
    cells = F.expr("array(" + ",".join(str(int(r["cell"])) for r in rows) + ")")
    ranked = F.array_sort(
        F.zip_with(
            F.transform(m, lambda c: _sq_dist(v, c)),
            cells,
            lambda d, c: F.struct(d.alias("d"), c.alias("c")),
        )
    )
    return F.element_at(ranked, 1)["c"]


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//`` (and C's
    ``/``) semantics, NOT Python's floor ``//`` (they differ on negative
    numerators; the scaled-IVF oracle replays centroid updates with
    ``//`` in DuckDB, so the driver-side update must truncate too)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _int_sq_dist(a: F.Column, b: F.Column) -> F.Column:
    """Exact BIGINT squared distance between integer-quantized vectors."""
    d = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(d, F.lit(0).cast("long"), lambda acc, x: acc + x * x)


def _ranked_cells_sql(col: str, cents: list[tuple[int, list[int]]]) -> str:
    """SQL string for the distance-ranked centroid array over a literal
    integer centroid matrix: array<struct<d,c>> sorted by (exact BIGINT
    sq-distance, cell id). ``col`` is the quantized BIGINT-array column
    NAME. Built as ONE string because the Column-object version created
    k×dim+k literal Columns through py4j (~0.3–2 s of driver time per
    invocation at k=8..16, dim=64 — round-12 plan-construction audit);
    bare integer literals parse to the same INT/BIGINT types F.lit
    produced, so the expression tree is semantically identical."""
    m = "array(" + ", ".join(
        "array(" + ", ".join(str(int(x)) for x in c) + ")" for _, c in cents
    ) + ")"
    cells = "array(" + ", ".join(str(int(cid)) for cid, _ in cents) + ")"
    dist = (
        f"aggregate(zip_with({col}, c, (x, y) -> x - y), 0L,"
        " (acc, x) -> acc + x * x)"
    )
    return (
        f"array_sort(zip_with(transform({m}, c -> {dist}), {cells},"
        " (d, c) -> named_struct('d', d, 'c', c)))"
    )


def _nearest_scaled(col: str, cents: list[tuple[int, list[int]]]) -> F.Column:
    """Nearest-centroid cell over a literal integer centroid matrix —
    exact BIGINT distances, ties break on the lower cell id (see
    _ranked_cells_sql for the py4j-economy note)."""
    return F.expr(f"element_at({_ranked_cells_sql(col, cents)}, 1).c")


def _probe_cells_scaled(col: str, cents: list[tuple[int, list[int]]], n_probe: int) -> F.Column:
    """The ``n_probe`` nearest cell ids (same ranking as _nearest_scaled)
    as one SQL expression."""
    return F.expr(
        f"transform(slice({_ranked_cells_sql(col, cents)}, 1, {int(n_probe)}), s -> s.c)"
    )


def _scaled_kmeans(
    corpus: DataFrame,
    *,
    n_centroids: int,
    lloyd_iters: int,
    scale: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[int]]] | None = None,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """ORACLE-EXACT integer k-means shared by ivf_topk_scaled and
    semdedup_scaled: deterministic lowest-id seeding, ``lloyd_iters``
    Lloyd rounds over ×``scale``-quantized BIGINT vectors (exact integer
    distance sums, truncating-division centroid updates — the whole
    trajectory replays in DuckDB). Returns (assigned(id, v, cell),
    centroid list). Centroid collects are n_centroids × dim ints — KBs,
    the sanctioned index-artifact collect; assignment is a narrow
    literal-matrix argmin (no join, no corpus shuffle)."""
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    # the quantized corpus is read by the seed collect, EVERY Lloyd
    # round's (cell, pos) aggregation, and the final assignment — one
    # materialization instead of lloyd_iters+2 replays of the upstream
    # corpus plan (Spark MLlib's own k-means caches its input for the
    # same reason; the cached slice is (id, dim longs) per vector)
    v = cache_once(corpus.select(F.col(id_col).alias("id"), qvec.alias("v")))
    if centroids is not None:
        # serve-time path (round 11): the caller holds FROZEN centroids —
        # the train-once/serve-many index-artifact lifecycle of the LSH/
        # PQ/BM25 caches applied to the k-means tier. Assignment is the
        # identical literal-matrix argmin, so results equal a fresh train
        # on the same corpus (centroids are a deterministic function of
        # the data; pinned by test_fast_paths).
        return v.withColumn("cell", _nearest_scaled("v", centroids)), centroids
    seed_rows = v.orderBy("id").limit(n_centroids).collect()
    # EMPTY corpus (A12): one degenerate centroid keeps the literal
    # ranking expressions well-formed; zero rows flow through
    cents = [(i, [int(x) for x in r["v"]]) for i, r in enumerate(seed_rows)] or [
        (0, [0])
    ]
    for _ in range(lloyd_iters):
        assigned = v.withColumn("cell", _nearest_scaled("v", cents))
        sums = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = (r["s"], r["n"])
        # keep the previous centroids when no vector voted (empty corpus)
        cents = [
            (cell, [_trunc_div(*dims[p]) for p in sorted(dims)])
            for cell, dims in sorted(by_cell.items())
        ] or cents
    assigned = v.withColumn("cell", _nearest_scaled("v", cents))
    return assigned, cents


def ivf_topk_scaled(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 8,
    lloyd_iters: int = 2,
    n_probe: int = 4,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLE-EXACT IVF twin: the same seed→Lloyd→probe pipeline as
    build_ivf_index/ivf_topk, run over INTEGER-quantized vectors
    (dims ×1e6 as BIGINTs). Float k-means is engine-private (summation
    order moves centroids by ulps, which can flip a boundary vector's
    cell) — quantized, every distance is an exact BIGINT sum, every
    centroid update an exact integer-sum truncating division, and the
    final cosine divides exact integer dot/norm sums, so the WHOLE
    index build and probe replay bit-exact in DuckDB (the pagerank/
    k-core precedent applied to k-means). Quantization error vs the
    float path is O(1/scale) per dim — cell boundaries land identically
    except at genuine micro-ties.

    Plan shape is identical to the float path: centroids collect per
    round (n_centroids × dim ints — KBs, the sanctioned index-artifact
    collect), assignment is a narrow literal-matrix argmin, the per-dim
    update is one (cell, pos) aggregation; the probe is the same
    literal-ranked cell selection + candidate equi-join.
    """
    assigned, cents = _scaled_kmeans(
        corpus,
        n_centroids=n_centroids,
        lloyd_iters=lloyd_iters,
        scale=scale,
        id_col=id_col,
        vec_col=vec_col,
    )
    return _ivf_probe_scaled(
        assigned, queries, cents, k=k, n_probe=n_probe, scale=scale,
        id_col=id_col, vec_col=vec_col,
    )


def _ivf_probe_scaled(
    assigned: DataFrame,
    queries: DataFrame,
    cents: list[tuple[int, list[int]]],
    *,
    k: int,
    n_probe: int,
    scale: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The probe tail of ivf_topk_scaled, shared with the filtered
    variant: literal-ranked n_probe cell selection per query, candidate
    equi-join on the cell, exact integer dot/norm cosine, (query, rank)
    window top-k."""
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    # probe: same literal ranking over the final centroids
    q = queries.select(F.col(id_col).alias("query_id"), qvec.alias("qv"))
    q_cells = q.select(
        "query_id", "qv", F.explode(_probe_cells_scaled("qv", cents, n_probe)).alias("cell")
    )
    idot = lambda a, b: F.aggregate(  # noqa: E731 — exact BIGINT dot
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    scored = (
        assigned.join(q_cells, "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("corpus_id"),
            F.when(
                (idot(F.col("v"), F.col("v")) > 0) & (idot(F.col("qv"), F.col("qv")) > 0),
                F.round(
                    idot(F.col("v"), F.col("qv"))
                    / (
                        F.sqrt(idot(F.col("v"), F.col("v")))
                        * F.sqrt(idot(F.col("qv"), F.col("qv")))
                    ),
                    6,
                ),
            ).alias("cosine"),  # zero-vector guard (see _safe_cosine)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cosine", "rnk")
    )


def save_ivf_index(assigned: DataFrame, centroids: DataFrame, path: str) -> None:
    """Persist an IVF index: cell-partitioned assigned vectors (so a
    probe reads only its cells' files — partition pruning IS the index
    at rest) + the centroid table. The index lifecycle every production
    ANN service runs: build once, serve many."""
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/assigned")
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    assigned = spark.read.parquet(f"{path}/assigned").select("id", "v", "cell")
    centroids = spark.read.parquet(f"{path}/centroids").select("cell", "centroid")
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF probing: score queries only
    against the ``n_probe`` nearest cells' vectors.

    The probe set is an equi-join on ``cell`` — at scale, the corpus is
    pre-partitioned (or bucketed) by cell, so each query reads
    ``n_probe/n_centroids`` of the data. Recall grows with n_probe;
    n_probe = n_centroids degenerates to exact brute force. Pass a
    prebuilt/loaded ``index`` (see save/load_ivf_index) to skip the
    k-means build — the serve path.
    """
    assigned, centroids = index if index is not None else build_ivf_index(
        corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )
    # the centroid table is kilobytes by construction (sanctioned collect,
    # like the per-round Lloyd collect in build_ivf_index): re-entering it
    # as a literal matrix makes cell-probe selection a narrow map instead
    # of a broadcast join + per-query window
    cent_rows = sorted(centroids.collect(), key=lambda r: r["cell"])
    if not cent_rows:
        # EMPTY index (A12): no cells to probe — an empty, schema-correct
        # top-k, not an error
        return queries.sparkSession.createDataFrame(
            [], schema="query_id long, corpus_id long, cosine double, rnk int"
        )
    m = _matrix_lit([list(r["centroid"]) for r in cent_rows])
    cells = F.expr("array(" + ",".join(str(int(r["cell"])) for r in cent_rows) + ")")
    ranked = F.array_sort(
        F.zip_with(
            F.transform(m, lambda c: _sq_dist(F.col("qv"), c)),
            cells,
            lambda d, c: F.struct(d.alias("d"), c.alias("c")),
        )
    )
    probe_cells = F.transform(F.slice(ranked, 1, n_probe), lambda s: s["c"])
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    q_cells = q.select("query_id", "qv", "qn", F.explode(probe_cells).alias("cell"))
    scored = (
        assigned.withColumnRenamed("id", "corpus_id")
        .withColumn("vn", _norm(F.col("v")))
        .join(F.broadcast(q_cells), "cell")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            F.when(
                (F.col("vn") > 0.0) & (F.col("qn") > 0.0),
                F.round(_dot(F.col("v"), F.col("qv")) / (F.col("vn") * F.col("qn")), 6),
            ).alias("cosine"),  # zero-vector guard (see _safe_cosine)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cosine", "rnk")
    )


def _lsh_hashed(df: DataFrame, keep: str, vcol: str, planes_sql: str, n_bits: int, n_tables: int) -> DataFrame:
    """(id, tbl, bkt) hash rows for one side of the LSH join.

    Staged selects: dots and bits land as bound attributes, so the bucket
    sum's n_tables·n_bits element_at references duplicate a column read,
    not the 16-dot transform chain (CollapseProject only inlines cheap
    expressions). The whole pipeline is emitted as selectExpr SQL text:
    the Column-by-Column formulation cost ~1400 py4j round-trips (~0.5 s
    of driver wall per call, measured at sf0.1 — comparable to the whole
    query's execution); the parser builds the identical trees in
    milliseconds. Value-identical to the previous Column build (same op
    order; shiftleft(x, 0) = x), so persisted indexes and the verified
    oracle replay unchanged."""
    dots = df.selectExpr(
        keep,
        f"transform({planes_sql}, p -> aggregate(zip_with({vcol}, p, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)) AS __dots",
    )
    bits = dots.selectExpr(
        keep,
        "transform(__dots, d -> CASE WHEN d > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        " AS __bits",
    )
    buckets = ", ".join(
        " + ".join(
            f"shiftleft(element_at(__bits, {t * n_bits + i + 1}), {i})" for i in range(n_bits)
        )
        for t in range(n_tables)
    )
    return bits.selectExpr(keep, f"posexplode(array({buckets})) AS (tbl, bkt)")


def build_lsh_index(
    corpus: DataFrame,
    *,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """The LSH index at rest: ``(vecs, hashes)`` — the corpus with
    precomputed L2 norms (``corpus_id, cv, cn``; the norm is computed
    once per vector here instead of once per scored pair) and the
    multi-table hash rows (``corpus_id, tbl, bkt``).

    Like build_ivf_index / minhash_banded_index this is the build-once
    artifact: cache or persist both tables and every query batch pays
    only the bucket probe + candidate scoring.
    """
    tables = [hyperplane_planes(dim, n_bits, seed + 1000 * t) for t in range(n_tables)]
    # one flat (n_tables·n_bits)×dim literal matrix, row j = table j//n_bits,
    # bit j%n_bits — semantically identical to per-plane hyperplane_bucket
    # calls, but the tree is ~50 nodes instead of ~2000 (see _matrix_lit)
    planes_sql = _matrix_sql([p for tbl in tables for p in tbl])
    c = _spread(corpus).select(F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("cv"))
    vecs = c.withColumn("cn", _norm(F.col("cv")))
    hashes = _lsh_hashed(c, "corpus_id", "cv", planes_sql, n_bits, n_tables)
    return vecs, hashes


def lsh_candidate_pairs(
    emb: DataFrame,
    *,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Candidate pairs (ia, ib) from hyperplane-LSH bucket collisions —
    the injectable pair source for pair-source-agnostic consumers
    (``dbscan_embeddings(pairs=...)``, ``curate.contrastive_pairs``):
    two vectors are a candidate iff they share a bucket in ANY of the
    ``n_tables`` plane sets (OR-amplification, same family as lsh_topk).

    Scale shape: the self-join is an equi-join on (tbl, bkt) over
    id+bucket rows only (vectors never ride along), then one distinct —
    at 100 TB that is a co-partitioned hash join on a uniform key, never
    a cross product. Pass a prebuilt ``index`` (build_lsh_index, same
    hyper-params) to skip re-hashing.
    """
    _, hashes = index if index is not None else build_lsh_index(
        emb, n_bits=n_bits, n_tables=n_tables, dim=dim, id_col=id_col,
        vec_col=vec_col, seed=seed,
    )
    a = hashes.select(F.col("corpus_id").alias("ia"), "tbl", "bkt")
    b = hashes.select(
        F.col("corpus_id").alias("ib"), F.col("tbl").alias("tbl_b"), F.col("bkt").alias("bkt_b")
    )
    return (
        a.join(
            b,
            (F.col("tbl") == F.col("tbl_b"))
            & (F.col("bkt") == F.col("bkt_b"))
            & (F.col("ia") < F.col("ib")),
        )
        .select("ia", "ib")
        .distinct()
    )


def sign_block_pairs(
    emb: DataFrame,
    *,
    n_bits: int = 8,
    scale: int = 10**3,
    max_bucket_rows: int | None = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate pairs (ia, ib) from AXIS-ALIGNED hyperplane blocking:
    the bucket key packs the sign bits of the first ``n_bits`` quantized
    coordinates (bit i set iff round(v[i]·scale) > 0) — a degenerate but
    fully INTEGER-EXACT member of the hyperplane-LSH family, so a DuckDB
    oracle can replay the candidate set bit-for-bit (random-plane LSH
    hashes float dots, which no cross-engine hash contract covers).

    Same scale shape as lsh_candidate_pairs: ids+buckets self equi-join,
    one shuffle on the bucket key; recall is traded (a near-dup pair
    whose perturbed coordinate crosses zero lands in different buckets),
    precision is owned by the consumer's exact verify step.

    **Giant-bucket guard (round 11, warn-only):** a bucket holding more
    than ``max_bucket_rows`` ids makes the self-join O(bucket²); unlike
    semdedup_scaled there is no finer key to escalate to without changing
    the operator's certified candidate set, so the guard LOGS a loud
    warning (bucket id, size, projected pair volume, the n_bits remedy)
    instead of silently submitting the join. Costs one bounded agg
    (≤2^n_bits rows) per call; ``None`` disables.
    """
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    bkt = sum(
        (
            F.when(F.element_at("v", i + 1) > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(n_bits)
        ),
        F.lit(0).cast("long"),
    )
    # (id, bkt) is consumed up to three times (guard agg + both join
    # sides); cache it so the quantize/hash chain — and the upstream
    # corpus plan — evaluates once (round 11: sign_block_pairs was the
    # q_dbscan_lsh CPU hotspot purely from recomputing its input)
    hashed = cache_once(
        emb.select(F.col(id_col).alias("id"), qvec.alias("v")).select(
            "id", bkt.alias("bkt")
        )
    )
    if max_bucket_rows is not None:
        top = (
            hashed.groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "bkt")
            .first()
        )
        if top is not None and top["n"] > max_bucket_rows:
            import logging

            logging.getLogger(__name__).warning(
                "sign_block_pairs: bucket %s holds %d vectors (> "
                "max_bucket_rows=%d); the candidate self-join will emit "
                "~%d pairs from this bucket alone — raise n_bits (currently "
                "%d) to split it, or feed a pre-partitioned corpus.",
                top["bkt"],
                top["n"],
                max_bucket_rows,
                top["n"] * (top["n"] - 1) // 2,
                n_bits,
            )
    a = hashed.select(F.col("id").alias("ia"), "bkt")
    b = hashed.select(F.col("id").alias("ib"), F.col("bkt").alias("bkt_b"))
    return a.join(
        b, (F.col("bkt") == F.col("bkt_b")) & (F.col("ia") < F.col("ib"))
    ).select("ia", "ib")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Approximate cosine top-k: multi-table hyperplane-LSH bucket join,
    then exact scoring of the deduplicated candidate set.

    OR-amplification (Indyk-Motwani): ``n_tables`` independent plane
    sets; a corpus vector is a candidate for a query if they collide in
    ANY table. Each table is an equi-join on (table, bucket) — at 100 TB
    a co-partitioned hash join on a uniform key instead of a cross
    product, at the cost of an n_tables× row expansion of the hashed
    corpus (ids + bucket keys only, never the vectors, which ride on the
    single post-dedup scoring pass). Recall tuning: more tables → higher
    recall; more bits → smaller buckets → cheaper but lower per-table
    recall. n_bits=2/n_tables=8 measures ≥0.9 recall vs exact on the
    64-dim fixture.

    Pass a prebuilt ``index`` (see build_lsh_index, same hyper-params) to
    skip re-hashing the corpus — the serve path.
    """
    tables = [hyperplane_planes(dim, n_bits, seed + 1000 * t) for t in range(n_tables)]
    planes_sql = _matrix_sql([p for tbl in tables for p in tbl])
    vecs, ch = index if index is not None else build_lsh_index(
        corpus, n_bits=n_bits, n_tables=n_tables, dim=dim, id_col=id_col, vec_col=vec_col, seed=seed
    )
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    qv = q.withColumn("qn", _norm(F.col("qv")))
    qh = _lsh_hashed(q, "query_id", "qv", planes_sql, n_bits, n_tables).withColumnsRenamed(
        {"tbl": "q_tbl", "bkt": "q_bkt"}
    )
    candidates = ch.join(
        F.broadcast(qh),
        (F.col("tbl") == F.col("q_tbl"))
        & (F.col("bkt") == F.col("q_bkt"))
        & (F.col("corpus_id") != F.col("query_id")),
    ).select("query_id", "corpus_id")
    scored = (
        candidates.join(vecs, "corpus_id")
        .join(F.broadcast(qv), "query_id")
        .selectExpr(
            "query_id",
            "corpus_id",
            "CASE WHEN cn > 0.0 AND qn > 0.0 THEN"
            " round(aggregate(zip_with(cv, qv, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x) / (cn * qn), 6) END AS cosine",  # zero-vector guard
        )
    )
    # Dedup (a pair can collide in several tables) is FUSED into the
    # ranking window instead of a separate dropDuplicates shuffle:
    # duplicates of a pair carry identical (cosine, corpus_id) sort keys,
    # so they land adjacent under this ordering — a lag() flags them and
    # a running sum of non-dups IS the dense pair rank. One exchange by
    # query_id total, at the cost of scoring pre-dedup rows (~2× with 8
    # tables; the dot is cheap next to a second shuffle). Emitted as SQL
    # text (one selectExpr) for the same py4j-round-trip reason as
    # _lsh_hashed; Catalyst collapses the two identically-specced window
    # functions into ONE Window operator exactly as the Column build did.
    over = "OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC"
    dup = f"coalesce(lag(corpus_id) {over}) = corpus_id, false)"
    rank = (
        f"CAST(sum(CASE WHEN {dup} THEN 0 ELSE 1 END) "
        f"{over} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
    )
    return (
        scored.selectExpr(
            "query_id", "corpus_id", "cosine", f"{dup} AS __dup", f"{rank} AS rnk"
        )
        .filter(f"(NOT __dup) AND rnk <= {int(k)}")
        .select("query_id", "corpus_id", "cosine", "rnk")
    )


def embedding_norm_stats(
    emb: DataFrame, *, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label L2-norm profile of the embedding space (count, mean/min/
    max norm, mean dimension count) — the embedding-health monitor of an
    ingest pipeline: un-normalized batches, truncated vectors, and
    encoder drift all surface here before they poison similarity search.

    One narrow map (norm per row) + one small groupBy on the label —
    map-side partials, no vector ever shuffles.
    """
    v = _as_double(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        emb.select(F.col(label_col).alias("label"), norm.alias("__n"), F.size(v).alias("__d"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("__n"), 6).alias("mean_norm"),
            F.round(F.min("__n"), 6).alias("min_norm"),
            F.round(F.max("__n"), 6).alias("max_norm"),
            F.round(F.avg("__d"), 2).alias("mean_dim"),
        )
    )


def label_centroids(emb: DataFrame, *, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid of the embedding space, as (label, dim, mean)
    rows — the class-prototype primitive under IVF seeding, few-shot
    classification, and drift monitoring.

    posexplode → groupBy(label, dim): one shuffle of (label, dim, val)
    triples with full map-side partial aggregation; never collects a
    vector. ``dim`` is 1-based.
    """
    return (
        emb.select(F.col(label_col).alias("label"), F.posexplode(_as_double(vec_col)).alias("pos", "val"))
        .select("label", (F.col("pos") + 1).alias("dim"), "val")
        .groupBy("label", "dim")
        .agg(F.round(F.avg("val"), 6).alias("mean_val"))
    )


def embedding_outliers_scaled(
    emb: DataFrame,
    *,
    k: int = 5,
    scale: int = 10**4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding OUTLIER screen, ORACLE-EXACT: the k vectors
    farthest from their label's centroid — the mislabeled-example /
    poisoned-cluster triage every embedding-supervised pipeline runs
    before trusting its labels. Same integer-quantization recipe as
    ivf_topk_scaled: vectors quantized to BIGINT at ``scale``, centroid
    per dimension by truncating division (exact in both engines), squared
    distance an exact BIGINT (bounded: (2·scale)²·dim ≪ 2⁶³ for unit-ish
    embeddings), ranked per label.

    Scale shape: one (label, pos) aggregation whose result is
    |labels|·dim rows — KBs, collected into a centroid literal table and
    broadcast back (the IVF centroid discipline: collect moves
    centroids, never data rows); distance is then a narrow map and the
    only other shuffle is the per-label top-k window over tiny groups.
    """
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    v = _spread(emb).select(
        F.col(id_col).alias("id"), F.col(label_col).alias("label"), qvec.alias("v")
    )
    sums = (
        v.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cents: dict[int, dict[int, int]] = {}
    for r in sums:
        cents.setdefault(r["label"], {})[r["pos"]] = _trunc_div(int(r["s"]), int(r["n"]))
    cent_rows = [
        (lab, [dims[p] for p in sorted(dims)]) for lab, dims in sorted(cents.items())
    ]
    cdf = emb.sparkSession.createDataFrame(cent_rows, "label int, c array<bigint>")
    d2 = F.aggregate(
        F.zip_with("v", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("label").orderBy(F.desc("dist2"), F.asc("id"))
    return (
        v.join(F.broadcast(cdf), "label")
        .select("label", "id", d2.alias("dist2"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("label", F.col("id").alias("vec_id"), "dist2", "rnk")
    )


def normalize_vectors(
    emb: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """L2-normalize each embedding to a unit vector (elements rounded to
    6 decimals): the precompute that turns every downstream cosine into a
    plain dot product — normalize once at ingest, save a sqrt per scored
    pair forever after. Narrow map, built-ins only; zero vectors pass
    through unchanged rather than dividing by zero.
    """
    v = _as_double(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    unit = F.when(
        norm > 0, F.transform(v, lambda x: F.round(x / norm, 6))
    ).otherwise(F.transform(v, lambda x: F.round(x, 6)))
    return emb.select(F.col(id_col).alias("vec_id"), unit.alias("unit"))


def quantize_int8(
    emb: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale = max|x|/127,
    q_i = round(x_i/scale) ∈ [-127, 127].

    The storage/bandwidth workhorse of large-scale ANN — 4× smaller than
    float32, dot products stay SIMD-friendly, and the scale rides along
    per vector for dequantization (error bound tested against cosine
    drift in tests/test_llm_ops.py). Narrow map; at 100 TB this is the
    difference between shuffling 25 TB and 100 TB of vectors.

    Zero vectors get scale 0 and an all-zero code array.
    """
    v = _as_double(vec_col)
    amax = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = amax / F.lit(127.0)
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale, 0).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.round(scale, 6).alias("scale"),
        q.alias("q"),
    )


def pq_train(
    corpus: DataFrame,
    *,
    m: int = 8,
    k: int = 16,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split each vector into ``m``
    subvectors and k-means each subspace independently —
    ``codebooks[j]`` = ``k`` centroids of dim/m floats for subspace j.

    All m subspace k-means run in ONE aggregation per Lloyd round: the
    corpus explodes to (subspace, sub-position, value) triples keyed by
    the per-row assigned cell, groupBy recomputes every centroid of
    every subspace together, and the driver collects m·k·(dim/m) doubles
    (= one full vector's worth per centroid — KBs). Assignment is a
    narrow map over literal codebook matrices (see _matrix_lit); the
    corpus never shuffles.

    Seeding: subspace j starts from the first ``k`` vectors' j-th
    subvectors (deterministic, like build_ivf_index).
    """
    v = _spread(corpus).select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    first = v.orderBy("id").limit(k).select("v").collect()
    if not first:
        # EMPTY corpus — reference A12 semantics (a normal state, not an
        # error): degenerate 1-wide zero codebooks keep every literal-
        # matrix expression downstream well-formed; encode/top-k over
        # the empty corpus then emit zero rows with the right schema
        return [[[0.0]] * k for _ in range(m)]
    dim = len(first[0]["v"])
    sub = dim // m
    books = [[list(r["v"][j * sub : (j + 1) * sub]) for r in first] for j in range(m)]
    for _ in range(lloyd_iters):
        cells = _pq_cells_expr(books, sub)
        assigned = v.withColumn("cells", cells)
        rows = (
            assigned.select(F.posexplode("v").alias("pos", "val"), "cells")
            .select(
                (F.col("pos") / sub).cast("int").alias("j"),
                (F.col("pos") % sub).alias("sp"),
                F.element_at("cells", (F.col("pos") / sub).cast("int") + 1).alias("cell"),
                "val",
            )
            .groupBy("j", "cell", "sp")
            .agg(F.avg("val").alias("mv"))
            .collect()
        )
        new_books = [[list(c) for c in bk] for bk in books]  # keep empty cells
        for r in rows:
            new_books[r["j"]][r["cell"]][r["sp"]] = r["mv"]
        books = new_books
    return books


def _pq_cells_expr(books: list[list[list[float]]], sub: int) -> F.Column:
    """array<int> of per-subspace nearest-centroid indices (0-based) for
    the bound vector column ``v`` — m argmins over literal codebooks,
    as ONE SQL string (py4j economy, see _ranked_cells_sql)."""
    parts = []
    for j, bk in enumerate(books):
        mlit = _matrix_sql(bk)
        idxs = "array(" + ",".join(str(i) for i in range(len(bk))) + ")"
        subv = f"slice(v, {j * sub + 1}, {sub})"
        dist = (
            f"aggregate(zip_with({subv}, c, (x, y) -> x - y), 0.0D,"
            " (acc, x) -> acc + x * x)"
        )
        parts.append(
            f"element_at(array_sort(zip_with(transform({mlit}, c -> {dist}),"
            f" {idxs}, (d, c) -> named_struct('d', d, 'c', c))), 1).c"
        )
    return F.expr("array(" + ", ".join(parts) + ")")


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — m small ints per vector instead of dim
    floats: dim=64 float32 → 8 codes is a 32× storage/shuffle cut, the
    memory layout every billion-vector ANN serving tier uses."""
    dim = len(books[0][0]) * len(books)
    sub = dim // len(books)
    v = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    return v.select("id", _pq_cells_expr(books, sub).alias("codes"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: each query precomputes its m×k
    table of subspace distances to every codebook centroid ONCE (a
    literal-codebook narrow map on the tiny query side), then scoring a
    corpus code is m table lookups + adds — no vector math per pair, and
    the corpus side touches only the (id, codes) table (pass a prebuilt
    ``codes`` from pq_encode for the serve path).

    Returns (query_id, corpus_id, approx_dist, rnk), rnk by ascending
    approximate L2 distance (ties by corpus id). On L2-normalized
    embeddings ascending L2 ≡ descending cosine.
    """
    mlen = len(books)
    sub = len(books[0][0])
    c = codes if codes is not None else pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    c = c.withColumnRenamed("id", "corpus_id")
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("v"))
    # per-query ADC table: table[j][cell] = ||q_sub_j - books[j][cell]||².
    # arity-1 lambda via closure, NEVER `lambda cent, j=j`: transform()
    # reads a 2-parameter lambda as (element, index) and would silently
    # bind j to the centroid's array position (the seed-vs-index bug
    # class from minhash_signatures)
    def _adc_row_sql(j: int) -> str:
        subq = f"slice(v, {j * sub + 1}, {sub})"
        return (
            f"transform({_matrix_sql(books[j])}, cent -> aggregate(zip_with({subq},"
            " cent, (x, y) -> x - y), 0.0D, (acc, x) -> acc + x * x))"
        )

    table = F.expr("array(" + ", ".join(_adc_row_sql(j) for j in range(mlen)) + ")")
    qt = q.select("query_id", table.alias("__t"))
    dist = F.aggregate(
        F.zip_with("codes", "__t", lambda code, trow: F.element_at(trow, code + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        c.join(F.broadcast(qt), F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", F.round(dist, 6).alias("approx_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "approx_dist", "rnk")
    )


def pq_topk_scaled(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    m: int = 8,
    kc: int = 16,
    lloyd_iters: int = 2,
    k: int = 5,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLE-EXACT product-quantization twin: pq_train + pq_topk over
    INTEGER-quantized vectors — per-subspace k-means with exact BIGINT
    distances and truncating-division centroid updates, ADC as exact
    integer table lookups, approx_dist an exact BIGINT. The ivf_topk_
    scaled recipe applied to PQ, closing the last rows-only ANN family
    without its own verified twin; the float pq_topk stays the
    production path.

    Same plan/collect discipline as the float trainer: codebooks are
    m·kc·(dim/m) ints (KBs) collected per round; assignment/encode/ADC
    are narrow literal-matrix maps; the only shuffle is the per-query
    ranking window.
    """
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    v = _spread(corpus).select(F.col(id_col).alias("id"), qvec.alias("v"))
    first = v.orderBy("id").limit(kc).collect()
    if not first:
        # EMPTY corpus (A12): degenerate 1-wide zero codebooks; zero
        # corpus/query rows flow through to an empty, schema-correct result
        sub = 1
        books = [[[0]] * kc for _ in range(m)]
    else:
        dim = len(first[0]["v"])
        if dim % m != 0:
            raise ValueError(
                f"pq_topk_scaled: embedding dim {dim} is not divisible by m={m} — "
                "leftover positions would index codes out of range (pad the vectors "
                "or pick m | dim)"
            )
        sub = dim // m
        books = [
            [[int(x) for x in r["v"][j * sub : (j + 1) * sub]] for r in first]
            for j in range(m)
        ]

    def cells_expr(bks: list[list[list[int]]]) -> F.Column:
        # one SQL string per invocation instead of m×(k×sub + k) literal
        # Columns (~1,200 py4j round trips ≈ 1.5 s of driver time, and
        # this is built lloyd_iters+1 times per call — round-12
        # plan-construction audit); semantics identical per element
        parts = []
        for j, bk in enumerate(bks):
            mlit = "array(" + ", ".join(
                "array(" + ", ".join(str(int(x)) for x in c) + ")" for c in bk
            ) + ")"
            idxs = "array(" + ", ".join(str(i) for i in range(len(bk))) + ")"
            subv = f"slice(v, {j * sub + 1}, {sub})"
            dist = (
                f"aggregate(zip_with({subv}, c, (x, y) -> x - y), 0L,"
                " (acc, x) -> acc + x * x)"
            )
            parts.append(
                f"element_at(array_sort(zip_with(transform({mlit}, c -> {dist}),"
                f" {idxs}, (d, c) -> named_struct('d', d, 'c', c))), 1).c"
            )
        return F.expr("array(" + ", ".join(parts) + ")")

    for _ in range(lloyd_iters):
        coded = v.withColumn("codes", cells_expr(books))
        sums = (
            coded.select("codes", F.posexplode("v").alias("pos0", "val"))
            .select(
                (F.col("pos0") / sub).cast("int").alias("j"),
                F.pmod("pos0", F.lit(sub)).alias("spos"),
                F.expr(f"codes[CAST(pos0 / {sub} AS INT)]").alias("cell"),
                "val",
            )
            .groupBy("j", "cell", "spos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
        for r in sums:
            acc.setdefault((r["j"], r["cell"]), {})[r["spos"]] = (r["s"], r["n"])
        new_books: list[list[list[int]]] = [
            [list(bk_cell) for bk_cell in bk] for bk in books
        ]
        for (j, cell), dims_ in acc.items():
            new_books[j][cell] = [_trunc_div(*dims_[p]) for p in sorted(dims_)]
        books = new_books
    codes = v.withColumn("codes", cells_expr(books)).select(
        F.col("id").alias("corpus_id"), "codes"
    )

    q = queries.select(F.col(id_col).alias("query_id"), qvec.alias("v"))

    def adc_row_sql(j: int) -> str:
        subq = f"slice(v, {j * sub + 1}, {sub})"
        mlit = "array(" + ", ".join(
            "array(" + ", ".join(str(int(x)) for x in c) + ")" for c in books[j]
        ) + ")"
        return (
            f"transform({mlit}, cent -> aggregate(zip_with({subq}, cent,"
            " (x, y) -> x - y), 0L, (acc, x) -> acc + x * x))"
        )

    table = F.expr("array(" + ", ".join(adc_row_sql(j) for j in range(m)) + ")")
    qt = q.select("query_id", table.alias("__t"))
    dist = F.aggregate(
        F.zip_with("codes", "__t", lambda code, trow: F.element_at(trow, code + 1)),
        F.lit(0).cast("long"),
        lambda acc_, x: acc_ + x,
    )
    scored = codes.join(
        F.broadcast(qt), F.col("corpus_id") != F.col("query_id")
    ).select("query_id", "corpus_id", dist.alias("approx_dist"))
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "approx_dist", "rnk")
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    *,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """The production PQ serving shape: ADC over compressed codes builds a
    ``shortlist`` per query (touching only the 32×-smaller code table),
    then ONLY the shortlisted vectors are fetched and scored exactly —
    the classic two-tier memory layout (codes in RAM, vectors on flash).
    Returns exact cosine over the shortlist, ranked like cosine_topk.

    Recall is bounded by the shortlist hit-rate (quantization error on
    unclustered data caps it — see tests); widen ``shortlist`` to trade
    IO for recall.
    """
    short = pq_topk(
        corpus, queries, books, k=shortlist, id_col=id_col, vec_col=vec_col, codes=codes
    ).select("query_id", "corpus_id")
    vecs = corpus.select(F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    scored = (
        short.join(vecs, "corpus_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "corpus_id",
            _safe_cosine(F.col("cv"), F.col("qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cosine", "rnk")
    )


def pq_rerank_scaled(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    m: int = 8,
    kc: int = 16,
    lloyd_iters: int = 2,
    k: int = 5,
    shortlist: int = 50,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLE-EXACT twin of pq_rerank_topk (round-8 verdict item #6):
    the two-tier serving shape with BOTH tiers engine-portable — the
    shortlist comes from pq_topk_scaled's deterministic integer-
    quantized codebooks + exact-BIGINT ADC (so DuckDB replays the
    training and the shortlist identically), and the rerank is the
    exact cosine recipe q_cosine_topk's oracle already certifies
    (float64 dots from parquet values, one division, round 6). The
    float pq_rerank_topk stays the production path; this twin pins its
    plan shape under a full oracle.

    Scale shape: identical to pq_rerank_topk — the shortlist join
    fetches only |queries|·shortlist vectors; the corpus is touched
    once by the code scan and once by the shortlist equi-join.
    """
    short = pq_topk_scaled(
        corpus,
        queries,
        m=m,
        kc=kc,
        lloyd_iters=lloyd_iters,
        k=shortlist,
        scale=scale,
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "corpus_id")
    vecs = corpus.select(F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    scored = (
        short.join(vecs, "corpus_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "corpus_id",
            _safe_cosine(F.col("cv"), F.col("qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cosine", "rnk")
    )


def save_pq_index(codes: DataFrame, books: list[list[list[float]]], path: str) -> None:
    """Persist a PQ index: the encoded corpus (the 32×-compressed table a
    serving tier actually scans) + the codebooks as a (subspace, code,
    centroid) relation — build once, serve many (the pq twin of
    save_ivf_index)."""
    codes.write.mode("overwrite").parquet(f"{path}/codes")
    spark = codes.sparkSession
    rows = [(j, c, list(bk[c])) for j, bk in enumerate(books) for c in range(len(bk))]
    spark.createDataFrame(rows, "j int, c int, centroid array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/books")


def load_pq_index(spark, path: str) -> tuple[list[list[list[float]]], DataFrame]:
    """(books, codes) back from save_pq_index — the codebooks are KBs and
    re-enter plans as literals (sanctioned collect)."""
    rows = spark.read.parquet(f"{path}/books").collect()
    m = 1 + max(r["j"] for r in rows)
    k = 1 + max(r["c"] for r in rows)
    books: list[list[list[float]]] = [[None] * k for _ in range(m)]  # type: ignore[list-item]
    for r in rows:
        books[r["j"]][r["c"]] = list(r["centroid"])
    codes = spark.read.parquet(f"{path}/codes").select("id", "codes")
    return books, codes


def cosine_topk_chunked(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_chunks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for query sets too big to broadcast at once:
    queries split into ``n_chunks`` deterministic hash chunks, each chunk
    broadcast-scored against the full corpus independently, results
    unioned. A query lives in exactly one chunk, so its per-chunk top-k
    IS its global top-k — bit-identical to cosine_topk (same oracle),
    while peak broadcast memory drops n_chunks× and the chunk scans
    pipeline in parallel. This removes the exact path's ~10⁴-query cap:
    scale n_chunks with |queries|; at cluster scale each chunk is one
    bounded stage over the (cached/pre-partitioned) corpus.
    """
    # ONE spread corpus child shared by every chunk branch (identical
    # subplan → ReusedExchange; the per-branch cosine_topk formulation
    # re-exchanged the corpus AND re-windowed per chunk: BNLJ:4 with 8
    # data shuffles, the only plan the repo's own audit flagged). The
    # corpus norm is projected once below the shared exchange. A query
    # lives in exactly one chunk, so fusing the per-chunk top-k into a
    # SINGLE ranking window over the unioned scores is value-identical —
    # and leaves 2 data shuffles total (spread + window) regardless of
    # n_chunks.
    c = _spread(corpus).select(
        F.col(id_col).alias("corpus_id"),
        _as_double(vec_col).alias("cv"),
    )
    c = c.select("corpus_id", "cv", _norm(F.col("cv")).alias("cn"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    chunked = q.withColumn("__chunk", F.pmod(F.xxhash64("query_id"), F.lit(n_chunks)))
    parts = []
    for i in range(n_chunks):
        qi = chunked.filter(F.col("__chunk") == i).select(
            "query_id", "qv", _norm(F.col("qv")).alias("qn")
        )
        parts.append(
            c.join(F.broadcast(qi), F.col("corpus_id") != F.col("query_id")).select(
                "query_id",
                "corpus_id",
                F.when(
                    (F.col("cn") > 0.0) & (F.col("qn") > 0.0),
                    F.round(_dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6),
                ).alias("cosine"),  # zero-vector guard (see _safe_cosine)
            )
        )
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cosine", "rnk")
    )


def save_lsh_index(vecs: DataFrame, hashes: DataFrame, path: str) -> None:
    """Persist the hyperplane-LSH index (see build_lsh_index): hash rows
    partitioned by table so a probe's per-table bucket lookups prune
    files, plus the norm-carrying vector table — the at-rest twin of
    save_ivf_index/save_pq_index (the plane family itself is
    seed-deterministic, so only the hyper-params need to travel)."""
    hashes.write.mode("overwrite").partitionBy("tbl").parquet(f"{path}/hashes")
    vecs.write.mode("overwrite").parquet(f"{path}/vecs")


def load_lsh_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    vecs = spark.read.parquet(f"{path}/vecs").select("corpus_id", "cv", "cn")
    hashes = spark.read.parquet(f"{path}/hashes").select("corpus_id", "tbl", "bkt")
    return vecs, hashes


def semantic_dedup(
    corpus: DataFrame,
    *,
    threshold: float = 0.92,
    n_bits: int | None = None,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    target_bucket: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023 shape): prune
    embedding-space near-duplicates, but only ever compare vectors that
    collide in a hash bucket — O(n·bucket) candidate pairs instead of the
    O(n²) sweep of embedding_near_dups.

    The clustering here is the seeded hyperplane-LSH family (multi-table
    OR-amplification, same planes as lsh_topk) rather than k-means cells:
    recall-equivalent for the near-dup radius, and ENGINE-PORTABLE — the
    whole pipeline (bucket join → exact cosine verify → survivor rule)
    replays in the DuckDB oracle, which a float k-means clustering cannot.
    Swap ``index`` for (vecs, hashes) from build_ivf/lsh_index at serve
    time.

    Survivor rule: a vector is dropped iff SOME lower-id vector collides
    with it and matches at ``cosine ≥ threshold`` — deterministic,
    chain-independent, and join-shaped (no iterative components pass;
    near-dup groups at this radius are cliques in practice, where the
    rule equals keep-min-id).

    SIZING RULE (the scale knob): candidate pairs grow with the SQUARE
    of bucket occupancy n/2^n_bits, so ``n_bits`` must grow with the
    corpus — hold occupancy constant via n_bits ≈ log2(n / target_bucket)
    (mirroring SemDeDup's clusters ∝ corpus). A fixed n_bits at growing n
    re-quadratizes the pair join: the 10× scale probe measures 27× wall
    at frozen n_bits=2 vs ~linear once bits scale (tools/scale_probe.py).
    The rule is now the DEFAULT: ``n_bits=None`` sizes the table from
    the corpus count (one scalar count job — the sanctioned kind), so
    callers get the occupancy-constant path unless they pin bits
    explicitly (the oracle config does, for replayability).

    Returns every corpus id with its verdict: (vec_id, keep).
    """
    if n_bits is None:
        if index is not None:
            raise ValueError("pass n_bits explicitly when supplying a prebuilt index")
        import math

        n = corpus.count()
        n_bits = max(1, round(math.log2(max(2.0, n / float(target_bucket)))))
    vecs, hashes = index if index is not None else build_lsh_index(
        corpus, n_bits=n_bits, n_tables=n_tables, dim=dim,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    a = hashes.withColumnsRenamed({"corpus_id": "id_a"})
    b = hashes.withColumnsRenamed({"corpus_id": "id_b"})
    cand = (
        a.join(b, ["tbl", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vecs.select(F.col("corpus_id").alias("id_a"), F.col("cv").alias("av"), F.col("cn").alias("an"))
    vb = vecs.select(F.col("corpus_id").alias("id_b"), F.col("cv").alias("bv"), F.col("cn").alias("bn"))
    pruned = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .selectExpr(
            "id_b",
            "round(aggregate(zip_with(av, bv, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x) / (an * bn), 6) AS cosine",
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_b")
        .distinct()
    )
    return (
        vecs.select(F.col("corpus_id").alias(id_col))
        .join(pruned.withColumnRenamed("id_b", id_col), id_col, "left_anti")
        .withColumn("keep", F.lit(True))
        .unionByName(
            pruned.select(F.col("id_b").alias(id_col), F.lit(False).alias("keep"))
        )
    )


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    *,
    k: int = 60,
    item_col: str = "doc_id",
) -> DataFrame:
    """Hybrid-retrieval fusion via reciprocal-rank fusion (RRF,
    Cormack et al. 2009): merge a sparse (BM25) and a dense (cosine/ANN)
    ranking into one list per query, scoring each item
    1/(k + rank_sparse) + 1/(k + rank_dense) with a missing rank
    contributing 0 — the standard rank-space combiner that needs no
    score calibration between the two retrievers.

    Inputs are (query_id, <item>, rnk) frames — exactly what bm25_topk
    and cosine_topk/lsh_topk emit. Both are top-k-sized (rows ≤
    |queries|·k), so fusion is KB-scale at ANY corpus size: the heavy
    lifting happened inside the retrievers. Expressed as union +
    groupBy-sum rather than a full-outer join — same semantics (a
    missing rank contributes nothing), no join at all, and since at
    most TWO terms meet per (query, item), float addition's
    commutativity makes the sum bit-identical regardless of engine
    aggregation order — emitted raw, no rounding needed.
    """
    from pyspark.sql import Window

    def _terms(df: DataFrame) -> DataFrame:
        return df.select(
            "query_id",
            F.col(item_col).alias("item"),
            (F.lit(1.0) / (F.lit(k) + F.col("rnk"))).alias("term"),
        )

    fused = (
        _terms(sparse)
        .unionByName(_terms(dense))
        .groupBy("query_id", "item")
        .agg(F.sum("term").alias("rrf"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("item"))
    return fused.select(
        "query_id",
        F.col("item").alias(item_col),
        "rrf",
        F.row_number().over(w).cast("long").alias("fused_rnk"),
    )


def ndcg_at_k(sys_ranking: DataFrame, truth_ranking: DataFrame, *, k: int = 5) -> DataFrame:
    """Retrieval-quality metric: per-query nDCG@k of a system ranking
    against a ground-truth ranking (binary relevance — a system row is
    relevant iff the (query, corpus) pair appears in the truth top-k).
    The eval harness half of the ANN surface: measure the LSH/IVF/PQ
    serving path against the exact ranking as a QUERY, not just a
    test assertion.

    The DCG is an UNROLLED fixed-order chain of k rank-weight terms
    (1/log2(i+1) as python-double literals), not a SUM over rows — float
    addition order is pinned, so both engines produce the identical
    double before the final rounding. Inputs are top-k-sized frames;
    the whole metric is KB-scale.
    """
    import math

    weights = [1.0 / math.log2(i + 1) for i in range(1, k + 1)]
    idcg = 0.0
    for w in weights:
        idcg = idcg + w
    hits = sys_ranking.select("query_id", "corpus_id", "rnk").join(
        F.broadcast(
            truth_ranking.select("query_id", "corpus_id", F.lit(1).alias("__rel"))
        ),
        ["query_id", "corpus_id"],
        "left",
    )
    terms = [
        F.max(
            F.when(
                (F.col("rnk") == i) & F.col("__rel").isNotNull(), F.lit(w)
            ).otherwise(F.lit(0.0))
        )
        for i, w in enumerate(weights, start=1)
    ]
    dcg = None
    for t in terms:
        dcg = t if dcg is None else dcg + t
    return hits.groupBy("query_id").agg(
        F.round(dcg / F.lit(idcg), 6).alias("ndcg")
    )


def retrieval_metrics_at_k(
    sys_ranking: DataFrame, truth_ranking: DataFrame, *, k: int = 5
) -> DataFrame:
    """Companion eval metrics to ndcg_at_k: per-query recall@k (hit
    fraction of the truth top-k) and MRR@k (reciprocal rank of the
    FIRST relevant system result; 0 when none). Reciprocal-rank values
    1/i are single exact divisions — engine-identical; recall is an
    integer ratio. Same KB-scale top-k join shape as ndcg_at_k.

    Like ndcg_at_k, ranks beyond k are ignored: sys_ranking is bounded
    to rnk <= k before the join, so a wider-than-k system frame can't
    push recall@k past 1.0 or credit MRR hits below the cutoff.
    """
    sys_ranking = sys_ranking.filter(F.col("rnk") <= k)
    hits = sys_ranking.select("query_id", "corpus_id", "rnk").join(
        F.broadcast(
            truth_ranking.select("query_id", "corpus_id", F.lit(1).alias("__rel"))
        ),
        ["query_id", "corpus_id"],
        "left",
    )
    first_hit = F.min(F.when(F.col("__rel").isNotNull(), F.col("rnk")))
    return hits.groupBy("query_id").agg(
        F.round(
            F.count(F.when(F.col("__rel").isNotNull(), F.lit(1))) / F.lit(float(k)), 6
        ).alias("recall"),
        F.round(
            F.coalesce(F.lit(1.0) / first_hit, F.lit(0.0)), 6
        ).alias("mrr"),
    )


def label_separation_matrix(
    emb: DataFrame,
    *,
    scale: int = 10**4,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding CLASS-SEPARATION matrix, ORACLE-EXACT: cosine between
    every pair of label centroids — the one-page answer to "are my
    classes actually separated in this embedding space" before anyone
    trains on the labels (collapsed pairs ⇒ label noise or a dead
    encoder; the matrix diagonal-block structure is the visual the
    alignment/uniformity literature reads). Same integer-quantization
    recipe as embedding_outliers_scaled: BIGINT centroids by truncating
    division, exact BIGINT dots; the only floats are two IEEE sqrts and
    one division per pair, rounded at the edge.

    Scale shape: one (label, pos) aggregation (map-side partials) whose
    result is |labels|·dim rows — KBs, collected into a centroid frame
    (the IVF discipline: collect moves centroids, never data rows);
    every pairwise step runs on the |labels|-row frame.
    """
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    v = _spread(emb).select(F.col(label_col).alias("label"), qvec.alias("v"))
    sums = (
        v.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cents: dict[int, dict[int, int]] = {}
    counts: dict[int, int] = {}
    for r in sums:
        cents.setdefault(r["label"], {})[r["pos"]] = _trunc_div(int(r["s"]), int(r["n"]))
        counts[r["label"]] = int(r["n"])
    cent_rows = [
        (lab, counts[lab], [dims[p] for p in sorted(dims)])
        for lab, dims in sorted(cents.items())
    ]
    if not cent_rows:
        # EMPTY corpus (A12): no labels, empty matrix — not an error
        return emb.sparkSession.createDataFrame(
            [],
            schema="label_a int, label_b int, n_a long, n_b long, centroid_cosine double",
        )
    # centroids ride as JVM LITERALS (the _matrix_lit discipline), NOT
    # createDataFrame: a Python-rows frame scans through a Python RDD,
    # and the self-join scans it twice — two Python-worker spin-ups for
    # 10 rows (~20 s of pure overhead measured); the literal frame is
    # whole-stage-codegen'd JVM data
    # ONE SQL string instead of |labels|×(dim+2) literal Columns (round
    # 12 py4j economy — ~640 round trips ≈ 0.8 s driver time at 10×64)
    row_lits = F.expr(
        "array("
        + ", ".join(
            f"named_struct('label', CAST({int(lab)} AS INT),"
            f" 'n_vectors', {int(n)}L,"
            " 'c', array(" + ", ".join(f"{int(x)}L" for x in vec) + "))"
            for lab, n, vec in cent_rows
        )
        + ")"
    )
    cdf = (
        emb.sparkSession.range(1)
        .select(F.explode(row_lits).alias("r"))
        .select("r.label", "r.n_vectors", "r.c")
    )
    self_dot = F.aggregate(
        F.zip_with("c", "c", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cd = cdf.withColumn("n2", self_dot)
    a, b = cd.alias("a"), cd.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.c"), F.col("b.c"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.sqrt(F.col("a.n2").cast("double")) * F.sqrt(F.col("b.n2").cast("double")))
    return (
        a.join(b, F.col("a.label") <= F.col("b.label"))
        .select(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            F.col("a.n_vectors").alias("n_a"),
            F.col("b.n_vectors").alias("n_b"),
            F.round(cos, 6).alias("centroid_cosine"),
        )
        .orderBy("label_a", "label_b")
    )


def mutual_nn_pairs(
    emb: DataFrame,
    *,
    label_a: int = 0,
    label_b: int = 1,
    scale: int = 10**4,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Mutual-nearest-neighbor pair mining between two embedding
    groups — the bitext/translation-pair mining criterion (Artetxe &
    Schwenk's margin setting reduced to its mutual-top-1 core): keep
    (a, b) only when b is a's single best match in group B AND a is b's
    best in group A. Mutuality is the classic precision filter — a hub
    vector that is "everyone's neighbor" loses its one-sided pairs, so
    the surviving alignments are high-confidence anchors for parallel-
    corpus construction or cross-modal alignment.

    Exactness strategy: the embedding_outliers/label_separation
    integer-quantization recipe — components quantized to BIGINT at
    ``scale``, dots and self-norms are exact BIGINT sums; cosine is two
    IEEE sqrts and one division per pair, and both argmaxes select by
    the (−cos, partner-id) total order, so the chosen neighbor is an
    exact element selection over bit-identical scores in both engines.

    Scale shape: groups A and B reduce to id+quantized-vector frames;
    the pair scoring is one equi-free join bounded by |A|·|B| — at
    production scale feed group frames pre-filtered by an ANN stage
    (ivf_topk/lsh_topk candidates) and this operator becomes the exact
    mutual-verify tail; the two argmaxes are group-keyed aggregations
    on the scored frame (no windows), and the mutual check is a tiny
    |A|-row ⋈ |B|-row equi-join.
    """
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    self_dot = F.aggregate(
        F.zip_with("v", "v", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    base = emb.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lbl"), qvec.alias("v")
    ).withColumn("n2", self_dot)
    a = base.filter(F.col("lbl") == label_a).select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n2").alias("na")
    )
    b = base.filter(F.col("lbl") == label_b).select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n2").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # materialized once: BOTH argmaxes consume the scored frame — without
    # the cache the |A|·|B| scoring subtree executes twice (the
    # global_row_number materialize-before-fan-out rule)
    scored = cache_once(
        a.join(F.broadcast(b), F.lit(True))
        .withColumn(
            # NULL cosine for zero-norm vectors (ANSI /0 aborts; DuckDB's
            # /0 is NULL — the _safe_cosine contract, round-8 fuzz find)
            "cos",
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                dot
                / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
            ),
        )
        .select("id_a", "id_b", "cos")
        # zero-norm rows have no defined neighbor: drop before the argmax
        # (a NULL cos would sort FIRST inside Spark's struct-min)
        .where(F.col("cos").isNotNull())
    )
    best_ab = scored.groupBy("id_a").agg(
        F.min(F.struct((-F.col("cos")).alias("nc"), F.col("id_b"))).alias("m")
    ).select("id_a", F.col("m.id_b").alias("id_b"), (-F.col("m.nc")).alias("cos"))
    best_ba = scored.groupBy("id_b").agg(
        F.min(F.struct((-F.col("cos")).alias("nc"), F.col("id_a"))).alias("m")
    ).select(F.col("id_b").alias("b_id"), F.col("m.id_a").alias("back_a"))
    return (
        best_ab.join(
            F.broadcast(best_ba),
            (F.col("id_b") == F.col("b_id")) & (F.col("id_a") == F.col("back_a")),
        )
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .orderBy("id_a")
    )


def mmr_rerank(
    emb: DataFrame,
    *,
    n_queries: int = 8,
    n_candidates: int = 20,
    k: int = 5,
    scale: int = 10**4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-marginal-relevance diversity rerank (Carbonell &
    Goldstein 1998) — the serving-side step between "top-k by
    similarity" and "top-k worth SHOWING": greedily pick the candidate
    maximizing relevance minus its similarity to what's already picked,
    so near-duplicate results don't crowd the slate. λ = 1/2, where the
    argmax of λ·rel − (1−λ)·maxsim is EXACTLY the argmax of the integer
    rel − maxsim — no float objective at all.

    Exactness strategy: relevance and candidate-pair similarity are
    exact BIGINT dots of scale-quantized vectors (the label_separation
    recipe); every greedy round is an exact argmax by the
    (−objective, id) total order; the whole trajectory unrolls into a
    DuckDB CTE chain (the label-propagation precedent).

    Scale shape: queries are the ``n_queries`` lowest ids (broadcast);
    candidate generation is the cosine_topk shape (corpus never
    shuffles); everything after round 0 runs on the
    |queries|·n_candidates² pair frame — config-bounded, never corpus-
    sized. The k-round driver loop moves ZERO data rows (pure
    DataFrame composition over the bounded frame, one plan).

    Returns (query_id, pick, doc_id, rel, maxsim) — pick = 1..k in
    selection order; maxsim NULL on the first pick (empty slate).
    """
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    base = emb.select(F.col(id_col).alias("id"), qvec.alias("v"))
    queries = base.orderBy("id").limit(n_queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731 — exact BIGINT dot
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        base.join(F.broadcast(queries), F.col("id") != F.col("query_id"))
        .select("query_id", "id", F.col("v").alias("cv"), dot(F.col("v"), F.col("qv")).alias("rel"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("id"))
    cand = (
        scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_candidates)
        .select("query_id", "id", "cv", "rel")
        .cache()
    )
    sims = (
        cand.alias("a")
        .join(
            cand.alias("b"),
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.id").alias("cid"),
            F.col("b.id").alias("sid"),
            dot(F.col("a.cv"), F.col("b.cv")).alias("sim"),
        )
        .cache()
    )
    flat = cand.select("query_id", "id", "rel")
    # round 1: pure relevance argmax (empty slate)
    pick = flat.groupBy("query_id").agg(
        F.min(F.struct((-F.col("rel")).alias("no"), F.col("id"))).alias("m")
    ).select(
        "query_id",
        F.lit(1).alias("pick"),
        F.col("m.id").alias("doc_id"),
        (-F.col("m.no")).alias("rel"),
        F.lit(None).cast("long").alias("maxsim"),
    )
    selected = pick
    for r in range(2, k + 1):
        rem = flat.join(
            selected.select("query_id", F.col("doc_id").alias("id")),
            ["query_id", "id"],
            "left_anti",
        )
        ms = (
            rem.join(
                sims.join(
                    selected.select("query_id", F.col("doc_id").alias("sid")),
                    ["query_id", "sid"],
                ).select("query_id", F.col("cid").alias("id"), "sim"),
                ["query_id", "id"],
            )
            .groupBy("query_id", "id")
            .agg(F.max("sim").alias("maxsim"))
        )
        nxt = (
            rem.join(ms, ["query_id", "id"])
            .groupBy("query_id")
            .agg(
                F.min(
                    F.struct(
                        (F.col("maxsim") - F.col("rel")).alias("no"),
                        F.col("id"),
                        F.col("rel"),
                        F.col("maxsim"),
                    )
                ).alias("m")
            )
            .select(
                "query_id",
                F.lit(r).alias("pick"),
                F.col("m.id").alias("doc_id"),
                F.col("m.rel").alias("rel"),
                F.col("m.maxsim").alias("maxsim"),
            )
        )
        # flatten lineage per round (the graph-iteration discipline):
        # without this, round r's plan embeds every earlier round's
        # union/anti-join chain and Catalyst analysis dominates the wall
        # (measured 60-100 s for 5 rounds; ~3 s flattened). The frame is
        # |queries|·r rows — checkpointing moves nothing.
        selected = selected.unionByName(nxt).localCheckpoint(eager=False)
    return selected.orderBy("query_id", "pick")


def _dbscan_roles_local(pair_rows, *, min_pts: int) -> list[tuple]:
    """Exact driver-side body of dbscan_embeddings' small-graph fast
    path: role/cluster assembly over a bounded collected ε-pair list —
    the same integer logic as the distributed deg/core/CC/border join
    chain (degree = incident pair count, core ⟺ deg+1 ≥ min_pts,
    clusters = min-id connected components of the core-core subgraph,
    border = min core-neighbor cluster). Returns (id, role, cluster)
    for core and border nodes ONLY — noise is the caller's left-join
    coalesce, exactly like the distributed shape. Requires min_pts ≥ 2
    (at min_pts ≤ 1 isolated nodes are core, which a pair list cannot
    see)."""
    deg: dict = {}
    for a, b in pair_rows:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    core = {i for i, d in deg.items() if d + 1 >= min_pts}
    # min-id union-find over the core-core subgraph (the
    # connected_components contract: component label = min node id)
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pair_rows:
        if a in core and b in core:
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
    cluster = {i: (find(i) if i in parent else i) for i in core}
    labels = [(i, "core", cluster[i]) for i in sorted(core)]
    border: dict = {}
    for a, b in pair_rows:
        if a in core and b not in core:
            c = border.get(b)
            border[b] = cluster[a] if c is None else min(c, cluster[a])
        elif b in core and a not in core:
            c = border.get(a)
            border[a] = cluster[b] if c is None else min(c, cluster[b])
    labels.extend((i, "border", border[i]) for i in sorted(border))
    return labels


def dbscan_embeddings(
    emb: DataFrame,
    *,
    cos_num: int = 95,
    cos_den: int = 100,
    min_pts: int = 4,
    scale: int = 10**3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pairs: DataFrame | None = None,
    small_graph_pairs: int = 200_000,
) -> DataFrame:
    """DBSCAN density clustering over an embedding set (Ester et al.
    1996) — the clustering family's missing member next to the k-means
    inside IVF: k-means forces every point into one of k spherical
    cells; DBSCAN finds arbitrarily-shaped dense regions AND names the
    points that belong to none (noise) — the artifact that answers "is
    there structure here at all" before anyone picks a k.

    Roles: CORE = ≥ min_pts neighbors within the cosine radius
    (self included); BORDER = non-core with a core neighbor (assigned
    its smallest core-neighbor's cluster); NOISE = neither. Clusters =
    connected components of the core-core graph, labeled by min core id
    (dedup.connected_components — the same min-label machinery as text
    dedup clusters).

    Exactness strategy: the ε-test never touches a sqrt —
    cos(a,b) ≥ num/den ⟺ dot ≥ 0 ∧ dot²·den² ≥ num²·‖a‖²·‖b‖², all
    exact BIGINTs at ``scale``=10³ quantization (dot ≤ 6.4e7 here, so
    dot²·den² ≤ ~4e17 < 2⁶³). Components replay in SQL as a recursive
    reachability CTE taking min over reached ids.

    Scale shape: the all-pairs ε-graph is the fixture-scale ground
    truth (broadcast self-join on the bounded slice, the default when
    ``pairs`` is None); at 100 TB inject ``pairs`` — a candidate-pair
    frame whose first two columns are vector ids (e.g.
    ``similarity.lsh_candidate_pairs`` buckets or IVF same-cell pairs).
    Injected candidates are still verified by the EXACT integer ε-test
    below, so injection trades recall (a candidate generator may miss a
    true ε-pair) but never precision — role logic and CC are
    pair-source-agnostic, the dedup_clusters argument.
    """
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    self_dot = F.aggregate(
        F.zip_with("v", "v", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # base is fanned out 4× (both join sides, the degree frame, the final
    # all-points join): cache it so the quantize/self-dot HOF chain is
    # evaluated once, not once per consumer (plan-size + codegen win —
    # the cached slice is (id, 64 longs, long): KBs per thousand rows).
    base = cache_once(
        emb.select(F.col(id_col).alias("id"), qvec.alias("v")).withColumn(
            "n2", self_dot
        )
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    a = base.select(F.col("id").alias("ia"), F.col("v").alias("va"), F.col("n2").alias("na"))
    b = base.select(F.col("id").alias("ib"), F.col("v").alias("vb"), F.col("n2").alias("nb"))
    if pairs is None:
        cand = a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
    else:
        ca, cb = pairs.columns[:2]
        norm = (
            pairs.select(
                F.least(F.col(ca), F.col(cb)).alias("ia"),
                F.greatest(F.col(ca), F.col(cb)).alias("ib"),
            )
            .filter(F.col("ia") < F.col("ib"))
            .distinct()
        )
        cand = norm.join(a, "ia").join(b, "ib")
    pairs = cache_once(
        cand.withColumn("__dot", dot)
        .filter(
            (F.col("__dot") >= 0)
            & (
                F.col("__dot") * F.col("__dot") * (cos_den * cos_den)
                >= F.lit(cos_num * cos_num) * F.col("na") * F.col("nb")
            )
        )
        .select("ia", "ib")
    )
    id_type = dict(base.dtypes)["id"]
    if (
        small_graph_pairs
        and min_pts >= 2
        and id_type in ("tinyint", "smallint", "int", "bigint")
    ):
        # Small-graph fast path (round 11): the ε-verified pair list is
        # the ONLY input the deg/core/CC/border chain reads, so when it
        # is bounded (≤ small_graph_pairs rows of two ids — the same
        # few-MB collect discipline as connected_components' union-find
        # tier) the whole role/cluster assembly runs as one driver-side
        # pass and re-enters the plan as a broadcast LocalRelation. The
        # distributed chain spends ~8 join/agg jobs plus the CC
        # machinery on a graph that is bounded metadata at fixture
        # scale; values are identical because every step is integer
        # set/min logic replayed verbatim (see _dbscan_roles_local).
        # Data-scale work (candidate generation + ε-verify) stays
        # distributed; corpora whose ε-graph outgrows the bound take
        # the unchanged join path below. 0 disables (tests).
        probe = pairs.limit(small_graph_pairs + 1).collect()
        if len(probe) <= small_graph_pairs:
            lbl = _dbscan_roles_local(
                [(r[0], r[1]) for r in probe], min_pts=min_pts
            )
            lbl_df = emb.sparkSession.createDataFrame(
                lbl, f"id {id_type}, role string, cluster {id_type}"
            )
            return (
                base.select("id")
                .join(F.broadcast(lbl_df), "id", "left")
                .select(
                    F.col("id").alias("vec_id"),
                    F.coalesce("role", F.lit("noise")).alias("role"),
                    F.col("cluster").cast("long").alias("cluster"),
                )
                .orderBy("vec_id")
            )
    und = pairs.union(pairs.select(F.col("ib"), F.col("ia"))).toDF("id", "nb_id")
    deg = und.groupBy("id").agg(F.count(F.lit(1)).alias("__deg"))
    nodes = base.select("id").join(deg, "id", "left").select(
        "id", F.coalesce("__deg", F.lit(0)).alias("__deg")
    )
    core = cache_once(nodes.filter(F.col("__deg") + 1 >= min_pts).select("id"))
    core_edges = (
        pairs.join(core.withColumnRenamed("id", "ia"), "ia", "left_semi")
        .join(core.withColumnRenamed("id", "ib"), "ib", "left_semi")
        .select(F.col("ia").alias("doc_a"), F.col("ib").alias("doc_b"))
    )
    from . import dedup as _dedup

    comp = _dedup.connected_components(core_edges).withColumnRenamed("id", "cid")
    core_lbl = core.join(comp, core["id"] == comp["cid"], "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("cluster")
    )
    border = (
        nodes.join(core_lbl.select(F.col("id").alias("__c")), nodes["id"] == F.col("__c"), "left_anti")
        .join(und, "id")
        .join(core_lbl.select(F.col("id").alias("nb_id"), "cluster"), "nb_id")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    out = (
        core_lbl.withColumn("role", F.lit("core"))
        .unionByName(border.withColumn("role", F.lit("border")))
    )
    return (
        base.select("id")
        .join(out, "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.coalesce("role", F.lit("noise")).alias("role"),
            F.col("cluster").cast("long").alias("cluster"),
        )
        .orderBy("vec_id")
    )


def power_iteration_vector(
    emb: DataFrame,
    *,
    rounds: int = 8,
    scale: int = 10**3,
    wscale: int = 10**6,
    dim: int = 64,
    vec_col: str = "embedding",
) -> list[int]:
    """The raw power-iteration loop behind dominant_direction — returns
    the BIGINT direction vector (scaled by ``wscale``) so composing
    operators (anisotropy_report) can reuse the SAME deterministic
    rounds; see dominant_direction for the exactness contract."""
    import math

    qvec = F.transform(_as_double(vec_col), lambda v: F.round(v * scale).cast("long"))
    x = cache_once(emb.select(qvec.alias("x")))
    w = [wscale] * dim
    for _ in range(rounds):
        # round 12: each round's expressions are built as TWO SQL strings
        # instead of ~400 Column objects (64 w literals + 64 sum exprs ×
        # py4j round trips ≈ 0.8 s of DRIVER time per round — the whole
        # 8-round loop spent ~6 s constructing plans and ~1 s executing
        # them). Semantics identical: SQL x[i] is 0-based ↔
        # element_at(x, i+1); 0L seed, integer sums, NULL→0 on empty.
        arr = ", ".join(f"{int(c)}L" for c in w)
        dot_sql = (
            f"aggregate(zip_with(x, array({arr}), (a, b) -> a * b), 0L,"
            " (acc, v) -> acc + v)"
        )
        y_sql = (
            "array("
            + ", ".join(f"cast(sum(x[{i}] * d) as bigint)" for i in range(dim))
            + ")"
        )
        row = (
            x.select(F.expr(dot_sql).alias("d"), "x")
            .agg(F.expr(y_sql).alias("y"))
            .collect()[0]
        )
        y = [v if v is not None else 0 for v in row["y"]]
        m = max(abs(v) for v in y)
        if m == 0:
            return [0] * dim
        # Round BOTH operands to double BEFORE dividing — the oracle computes
        # CAST(y AS DOUBLE)/CAST(m AS DOUBLE); Python bigint true division
        # v/m is correctly rounded from the exact rational and can differ by
        # an ulp once |y| > 2^53, flipping floor(+0.5) (round-8 advice fix).
        w = [int(math.floor(float(v) / float(m) * wscale + 0.5)) for v in y]
    return w


def dominant_direction(
    emb: DataFrame,
    *,
    rounds: int = 8,
    scale: int = 10**3,
    wscale: int = 10**6,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Dominant principal direction of the (uncentered) embedding gram
    matrix XᵀX by distributed POWER ITERATION — the one-component PCA
    that answers "is this embedding space collapsing onto a single
    axis" (anisotropy is the standard failure mode of contrastive
    embedding runs; its complement lives in embedding_norm_stats).

    Exactness strategy (the IVF/BPE driver-round pattern, made
    bit-portable): vectors quantize to BIGINT at ``scale``; each round
    computes y = X·(X·w) with ALL-INTEGER dots (w itself is a BIGINT
    vector at ``wscale``), then renormalizes w ← floor(y/max|y|·wscale
    + 0.5) — the only float ops are one exactly-defined BIGINT→DOUBLE
    conversion pair, one division, one multiply, and a floor(+0.5)
    half-up rounding that both engines implement identically (F.round
    HALF_UP vs DuckDB HALF_EVEN is the known tie-splitter — floor(x+.5)
    sidesteps it). The oracle unrolls the same ``rounds`` CTE rounds.

    Integer-overflow budget: |x·w| ≤ dim·(scale·max|v|)·wscale and each
    y term multiplies by another x_i — Σ|x_i·(x·w)| must stay < 2⁶³:
    with 64-dim unit-ish vectors that caps at ~10⁵ rows at these
    scales; larger corpora drop ``wscale`` to 10⁵/10⁴ (documented knob,
    same contract).

    Scale shape: ONE cached quantized frame; per round ONE aggregation
    pass (64 integer sums, map-side partials) and 64 scalars crossing
    the driver — the sanctioned bounded collect (centroid/BPE
    precedent). No shuffle beyond the aggregate's.
    """
    w = power_iteration_vector(
        emb, rounds=rounds, scale=scale, wscale=wscale, dim=dim, vec_col=vec_col
    )
    spark = emb.sparkSession
    rows = [(i + 1, int(w[i])) for i in range(dim)]
    out = spark.createDataFrame(rows, "component int, w_scaled long")
    return out.select(
        "component",
        "w_scaled",
        (F.col("w_scaled").cast("double") / F.lit(float(wscale))).alias("weight"),
    ).orderBy("component")


def anisotropy_report(
    emb: DataFrame,
    *,
    rounds: int = 8,
    scale: int = 10**3,
    wscale: int = 10**3,
    dim: int = 64,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding ANISOTROPY — what fraction of each label's
    vector energy lies OFF the dominant principal axis (Mu & Viswanath's
    "all-but-the-top" diagnostic): off_axis_frac → 0 means the label's
    vectors have collapsed onto one direction (the classic contrastive-
    training failure); → 1 means isotropic. The measurement behind the
    standard remove-top-PC post-processing step.

    Exactness strategy: the direction comes from the SAME deterministic
    power iteration as dominant_direction (``wscale`` 10³ here so every
    per-row quantity stays BIGINT: x·w ≤ 6.4e7, (x·w)² and ‖x‖²·‖w‖²
    ≤ 4e15); per-row off-axis energy num = ‖x‖²·‖w‖² − (x·w)² is EXACT
    Cauchy–Schwarz-nonnegative integer arithmetic; the per-label sums
    ride DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so they cannot
    overflow or lose exactness; ONE division per label at the end,
    round(·, 6) absorbing the ≤few-ulp big-integer→double conversion
    slack.

    Scale shape: `rounds` bounded-collect iterations (the
    dominant_direction contract) + one label-keyed aggregate.
    """
    w = power_iteration_vector(
        emb, rounds=rounds, scale=scale, wscale=wscale, dim=dim, vec_col=vec_col
    )
    ww = sum(int(c) * int(c) for c in w)
    qvec = F.transform(_as_double(vec_col), lambda v: F.round(v * scale).cast("long"))
    w_lit = F.expr("array(" + ", ".join(f"{int(c)}L" for c in w) + ")")
    n2 = F.aggregate(
        F.zip_with("x", "x", lambda a, b: a * b), F.lit(0).cast("long"), lambda s, v: s + v
    )
    xw = F.aggregate(
        F.zip_with("x", w_lit, lambda a, b: a * b), F.lit(0).cast("long"), lambda s, v: s + v
    )
    rows = emb.select(F.col(label_col).alias("label"), qvec.alias("x")).select(
        "label", n2.alias("n2"), xw.alias("xw")
    )
    num = (
        F.col("n2").cast("decimal(38,0)") * F.lit(ww).cast("decimal(38,0)")
        - F.col("xw").cast("decimal(38,0)") * F.col("xw").cast("decimal(38,0)")
    )
    per = rows.select("label", F.col("n2"), num.alias("num")).groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("n2").cast("decimal(38,0)").alias("__sn2"),
        F.sum("num").alias("__snum"),
    )
    den = F.col("__sn2") * F.lit(ww).cast("decimal(38,0)")
    ok = (F.col("n_vecs") > 0) & (den > 0)
    return per.select(
        "label",
        "n_vecs",
        F.col("__sn2").cast("long").alias("sum_n2"),
        F.when(
            ok, F.round(F.col("__snum").cast("double") / den.cast("double"), 6)
        ).alias("off_axis_frac"),
    ).orderBy("label")


def semdedup_scaled(
    corpus: DataFrame,
    *,
    n_centroids: int = 8,
    lloyd_iters: int = 2,
    tau_num: int = 95,
    tau_den: int = 100,
    scale: int = 10**3,
    block_bits: int = 0,
    max_cell_rows: int | None = 25_000,
    guard_block_bits: int = 12,
    small_graph_pairs: int = 200_000,
    centroids: list[tuple[int, list[int]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023) — ORACLE-EXACT:
    k-means cluster the embedding space, then WITHIN each cluster drop
    all but one representative of every semantic-duplicate group
    (pairwise cos ≥ tau), keeping the min-id member. The semantic tier
    of the dedup funnel: exact/MinHash dedup catches copies of the same
    TEXT; SemDeDup catches re-phrasings and near-identical content with
    different surface forms — the pair LSH text dedup can't see.

    Composition of three already-verified substrates, so the whole
    pipeline replays in DuckDB: (1) the integer k-means of
    ivf_topk_scaled (``_scaled_kmeans`` — exact BIGINT distances,
    truncating-division updates, lowest-id seeding); (2) the DBSCAN
    ε-test (cos ≥ num/den ⟺ dot ≥ 0 ∧ dot²·den² ≥ num²·‖a‖²·‖b‖², all
    BIGINTs at ×10³ quantization — never a sqrt); (3)
    dedup.connected_components for within-cluster dup groups (semantic
    dups chain: A≈B≈C with cos(A,C) < tau must still collapse to one
    representative — pairwise-only keep rules double-keep the chain's
    ends).

    Scale shape: the pair join is equi on the CELL (cluster-bounded
    candidate volume — the paper's own trick for web-scale corpora; at
    100 TB raise n_centroids so cells stay bucket-sized), the ε-verify
    streams in-partition, and the CC rounds touch only ε-pairs.
    ``block_bits`` > 0 adds axis-aligned sign-block SUB-bucketing inside
    each cell (the sign_block_pairs key: bit i ⟺ round(v[i]·scale) > 0)
    — the candidate join key becomes (cell, bucket), so a giant cell
    costs O(Σ bucket²), not O(cell²). The standard LSH trade: recall
    only (a dup pair whose low-index coordinate crosses zero splits
    buckets — perturb-robust when dups differ on higher coordinates),
    never precision (the exact ε-test verifies every candidate). The
    100 TB posture is n_centroids ↑ AND block_bits ≥ 12.

    **Giant-cell guard (round 11 — default ON):** with ``block_bits=0``
    the candidate join is equi on the cell alone — O(cell²) when k-means
    collapses a skewed corpus (near-duplicate-heavy crawls, exactly
    where SemDeDup is deployed) into one giant cell. After assignment
    the per-cell histogram (one ``n_centroids``-row agg over the
    already-cached frame) is checked: if ``max(cell_count) >
    max_cell_rows``, the candidate key AUTO-ESCALATES to (cell, bucket)
    with ``guard_block_bits`` sign bits, and a loud warning names the
    offending cell and its projected candidate volume.
    Sizing rule: the threshold caps quadratic work per cell at
    ~threshold²/2 candidate ε-tests. The 25k default ≈ 3×10⁸ pairs —
    under a minute on one 32-thread box, subsecond spread across a
    cluster; raise it on big clusters if bucket-boundary recall inside
    merely-large cells matters more than the worst-case join (measured:
    an 87.8k-row cell that slipped UNDER the original 100k default cost
    1,190 s single-box while a 447k-row cell that escalated finished in
    194 s — the sub-threshold regime was the remaining hazard,
    SCALE.md r11). The decision is a
    deterministic function of the data (cell counts), so a DuckDB oracle
    replays it exactly — "no silent caps" applied to candidate volume.
    ``max_cell_rows=None`` disables the guard (ground-truth runs).
    Escalation has a documented blind spot: sign-blocking splits a cell
    only where member signs vary, so a tight blob deep in one orthant
    stays in ONE (cell, bucket) group — the escalated path therefore
    re-checks the (cell, bucket) histogram and warns loudly when the
    escalation was ineffective, naming the remedy (raise
    ``n_centroids``; subdividing dense mass with more centroids is the
    SemDeDup paper's own posture).

    Output: (vec_id, cell, component, keep) per corpus vector —
    component = min id of the vector's within-cluster dup group (own id
    for singletons), keep = (component == vec_id). All integers/bools.
    """
    from . import dedup as _dedup

    assigned, _ = _scaled_kmeans(
        corpus,
        n_centroids=n_centroids,
        lloyd_iters=lloyd_iters,
        scale=scale,
        id_col=id_col,
        vec_col=vec_col,
        centroids=centroids,
    )
    self_dot = F.aggregate(
        F.zip_with("v", "v", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # the assigned frame fans out three ways (both pair sides + the final
    # all-vectors join): one materialization, KBs per thousand rows
    base = cache_once(assigned.withColumn("n2", self_dot))
    eff_bits = block_bits
    if not eff_bits and max_cell_rows is not None:
        # giant-cell guard (round 11): one bounded agg (n_centroids rows)
        # over the already-cached frame; the escalation decision is a
        # deterministic function of the cell histogram so the oracle
        # replays it
        top = (
            base.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "cell")
            .first()
        )
        if top is not None and top["n"] > max_cell_rows:
            import logging

            logging.getLogger(__name__).warning(
                "semdedup_scaled: cell %s holds %d vectors (> max_cell_rows=%d); "
                "projected candidate volume ~%d pairs — auto-escalating the "
                "candidate key to (cell, bucket) with guard_block_bits=%d. "
                "Recall within the giant cell is now bucket-local (precision "
                "unchanged: every candidate still passes the exact ε-test).",
                top["cell"],
                top["n"],
                max_cell_rows,
                top["n"] * (top["n"] - 1) // 2,
                guard_block_bits,
            )
            eff_bits = guard_block_bits
            _guard_escalated = True
        else:
            _guard_escalated = False
    else:
        _guard_escalated = False
    if eff_bits:
        bkt = sum(
            (
                F.when(
                    F.element_at("v", i + 1) > 0, F.lit(1 << i).cast("long")
                ).otherwise(F.lit(0).cast("long"))
                for i in range(eff_bits)
            ),
            F.lit(0).cast("long"),
        )
        # a projection over the cached frame — the sign bits are computed
        # from the cached quantized vectors, not a re-derivation
        base = base.withColumn("bkt", bkt)
        if _guard_escalated:
            # escalation-effectiveness re-check (round 11): sign-block
            # bucketing splits a cell only where member signs VARY — a
            # tight blob deep in one orthant (every member positive on
            # the first eff_bits coords) lands in ONE bucket and the
            # escalated join is still O(cell²). "No silent caps" again:
            # one more bounded agg on the escalated path; if the largest
            # (cell, bucket) group still exceeds the threshold, say so
            # loudly and name the remedy that actually splits dense mass
            # — more centroids (the SemDeDup paper's own posture).
            top_b = (
                base.groupBy("cell", "bkt")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), "cell", "bkt")
                .first()
            )
            if top_b is not None and top_b["n"] > max_cell_rows:
                import logging

                logging.getLogger(__name__).warning(
                    "semdedup_scaled: escalation to (cell, bucket) is "
                    "INEFFECTIVE — (cell %s, bucket %s) still holds %d "
                    "vectors (> max_cell_rows=%d): the cell's members "
                    "share their leading signs, so sign-blocking cannot "
                    "split it. The candidate join remains ~%d pairs; "
                    "raise n_centroids to subdivide the dense region.",
                    top_b["cell"],
                    top_b["bkt"],
                    top_b["n"],
                    max_cell_rows,
                    top_b["n"] * (top_b["n"] - 1) // 2,
                )
    join_keys = ["cell", "bkt"] if eff_bits else ["cell"]
    a = base.select(
        *join_keys, F.col("id").alias("ia"), F.col("v").alias("va"), F.col("n2").alias("na")
    )
    b = base.select(
        *join_keys, F.col("id").alias("ib"), F.col("v").alias("vb"), F.col("n2").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = cache_once(
        a.join(b, join_keys)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("__dot", dot)
        .filter(
            (F.col("__dot") >= 0)
            & (
                F.col("__dot") * F.col("__dot") * F.lit(tau_den * tau_den)
                >= F.lit(tau_num * tau_num) * F.col("na") * F.col("nb")
            )
        )
        .select("ia", "ib")
    )
    # Small-graph fast path (round 11): the ε-pair list is canonical
    # (ia < ib, one cell per vector ⇒ distinct), so when it is bounded
    # the dup-group labels come from ONE driver-side union-find over the
    # collected pairs (the connected_components fast-path body without
    # its persist/symmetrize/count scaffolding jobs — ~5 fewer scheduled
    # jobs per run) and re-enter as a LocalRelation. Identical labels by
    # construction (union-by-min-id = the CC min-label contract);
    # anything larger takes connected_components unchanged.
    id_type = dict(base.dtypes)["id"]
    probe = pairs.limit(small_graph_pairs + 1).collect() if small_graph_pairs else []
    if (
        small_graph_pairs
        and len(probe) <= small_graph_pairs
        and id_type in ("tinyint", "smallint", "int", "bigint")
    ):
        comp = F.broadcast(
            corpus.sparkSession.createDataFrame(
                _dedup._union_find([(r[0], r[1]) for r in probe]),
                f"cid {id_type}, comp {id_type}",
            )
        )
    else:
        comp = _dedup.connected_components(pairs, src="ia", dst="ib").withColumnRenamed(
            "id", "cid"
        )
    return (
        base.select("id", "cell")
        .join(comp, base["id"] == comp["cid"], "left")
        .select(
            F.col("id").alias("vec_id"),
            F.col("cell").cast("long").alias("cell"),
            F.coalesce("comp", F.col("id")).alias("component"),
            (F.coalesce("comp", F.col("id")) == F.col("id")).alias("keep"),
        )
        .orderBy("vec_id")
    )


def ivf_topk_scaled_filtered(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    allowed_labels: list[int],
    k: int = 5,
    n_centroids: int = 8,
    lloyd_iters: int = 2,
    n_probe: int = 4,
    scale: int = 10**6,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FILTERED vector search, ORACLE-EXACT (round 10): IVF top-k where
    corpus candidates must satisfy a metadata predicate (label ∈
    ``allowed_labels``) — the retrieval-with-constraints serving shape
    every RAG/vector-store deployment needs (tenant, language, license,
    recency filters).

    Design point this operator pins: the filter is PRE-scoring — the
    index is built over the FULL corpus (real systems index everything
    and filter at query time), candidates from the probed cells are
    label-filtered BEFORE the cosine ranking, so every query still gets
    its full k from the allowed subset (cells permitting). The naive
    post-filter (top-k first, filter after) silently underfills k when
    the filter is selective — the classic filtered-ANN bug; it is NOT
    what this does.

    Same integer-exact substrate as ivf_topk_scaled (shared
    _scaled_kmeans + _ivf_probe_scaled), so the whole pipeline —
    including the filter — replays in DuckDB. Scale shape: one extra
    broadcast-sized equi-join of (id → label) onto the probed
    candidates; the label table prunes with the same cell partitioning.
    """
    assigned, cents = _scaled_kmeans(
        corpus,
        n_centroids=n_centroids,
        lloyd_iters=lloyd_iters,
        scale=scale,
        id_col=id_col,
        vec_col=vec_col,
    )
    meta = corpus.select(F.col(id_col).alias("id"), F.col(label_col).alias("__lbl"))
    allowed = assigned.join(meta, "id").filter(
        F.col("__lbl").isin([int(x) for x in allowed_labels])
    ).select("id", "v", "cell")
    return _ivf_probe_scaled(
        allowed, queries, cents, k=k, n_probe=n_probe, scale=scale,
        id_col=id_col, vec_col=vec_col,
    )


def semdedup_incremental(
    new: DataFrame,
    corpus: DataFrame,
    *,
    n_centroids: int = 8,
    lloyd_iters: int = 2,
    tau_num: int = 95,
    tau_den: int = 100,
    scale: int = 10**3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """STEADY-STATE semantic dedup (round 10) — the embedding-space twin
    of dedup.incremental_dedup: the corpus was semdeduped once; each
    incoming batch is (a) assigned to the CORPUS-trained centroids (a
    narrow literal-matrix map — serving posture, no retrain per batch),
    (b) dropped if it ε-links (cos ≥ tau) to ANY corpus vector in its
    cell, and (c) collapsed within-batch via connected components over
    the survivors' ε-pairs. Nothing ever re-touches or re-scores corpus
    vectors beyond the same-cell candidate join.

    Semantic choice, documented: a new vector linked only to a DROPPED
    new vector (not to the corpus) stays kept — the single-pass
    steady-state contract of the text twin ("nothing re-touches corpus
    text"); run the batch through full semdedup_scaled first if
    chain-transitivity through dropped vectors matters.

    Output: one row per NEW vector — (vec_id, cell, component, status),
    status ∈ {'kept', 'corpus_dup', 'batch_dup'}; component = min id of
    the vector's within-batch survivor group (own id for corpus_dups —
    they never join a batch group). All integers/strings, replays in
    DuckDB end-to-end (corpus k-means CTE + assignment + two ε-pair
    joins + reach CC).
    """
    from . import dedup as _dedup

    _, cents = _scaled_kmeans(
        corpus,
        n_centroids=n_centroids,
        lloyd_iters=lloyd_iters,
        scale=scale,
        id_col=id_col,
        vec_col=vec_col,
    )
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    self_dot = F.aggregate(
        F.zip_with("v", "v", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    def prep(df: DataFrame) -> DataFrame:
        base = df.select(F.col(id_col).alias("id"), qvec.alias("v"))
        return cache_once(
            base.withColumn("cell", _nearest_scaled("v", cents)).withColumn(
                "n2", self_dot
            )
        )

    nb, cb = prep(new), prep(corpus)
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    def eps_pairs(a: DataFrame, b: DataFrame, strict: bool) -> DataFrame:
        aa = a.select(
            "cell", F.col("id").alias("ia"), F.col("v").alias("va"),
            F.col("n2").alias("na"),
        )
        bb = b.select(
            "cell", F.col("id").alias("ib"), F.col("v").alias("vb"),
            F.col("n2").alias("nb"),
        )
        j = aa.join(bb, "cell")
        if strict:
            j = j.filter(F.col("ia") < F.col("ib"))
        return (
            j.withColumn("__dot", dot)
            .filter(
                (F.col("__dot") >= 0)
                & (
                    F.col("__dot") * F.col("__dot") * F.lit(tau_den * tau_den)
                    >= F.lit(tau_num * tau_num) * F.col("na") * F.col("nb")
                )
            )
            .select("ia", "ib")
        )

    corpus_dups = eps_pairs(nb, cb, strict=False).select(F.col("ia").alias("id")).distinct()
    survivors = nb.join(corpus_dups, "id", "left_anti")
    batch_pairs = eps_pairs(survivors, survivors, strict=True)
    comp = _dedup.connected_components(batch_pairs, src="ia", dst="ib").withColumnRenamed(
        "id", "cid"
    )
    lbl = survivors.select("id", "cell").join(
        comp, survivors["id"] == comp["cid"], "left"
    ).select(
        "id", "cell", F.coalesce("comp", F.col("id")).alias("component")
    )
    out = nb.select("id", "cell").join(
        lbl.select(F.col("id").alias("lid"), F.col("component")),
        F.col("id") == F.col("lid"),
        "left",
    )
    return out.select(
        F.col("id").alias("vec_id"),
        F.col("cell").cast("long").alias("cell"),
        F.coalesce("component", F.col("id")).alias("component"),
        F.when(F.col("lid").isNull(), F.lit("corpus_dup"))
        .when(F.col("component") == F.col("id"), F.lit("kept"))
        .otherwise(F.lit("batch_dup"))
        .alias("status"),
    ).orderBy("vec_id")


def semantic_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    *,
    n_centroids: int = 8,
    lloyd_iters: int = 2,
    n_probe: int = 4,
    tau_num: int = 95,
    tau_den: int = 100,
    scale: int = 10**3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level DECONTAMINATION (round 11), ORACLE-EXACT: flag
    every corpus vector lying within cos ≥ tau of ANY eval-set vector —
    the semantic tier of benchmark decontamination. The n-gram tier
    (text.ngram_contamination) catches verbatim/near-verbatim eval
    leakage; this catches PARAPHRASED leakage the lexical test can't
    see — the step current data cards (FineWeb, Dolma, Llama-3) run
    before training, and the one a lexical-only pipeline silently skips.

    Direction matters and is pinned: the output is per-CORPUS-vector
    (training docs are the thing you delete); eval vectors are the
    probes. Scale shape is IVF serving, not SemDeDup clustering: cells
    are trained on the CORPUS once (`_scaled_kmeans` — the bounded
    centroid collect), the corpus never shuffles, and each eval vector
    probes its ``n_probe`` nearest cells (the q_ivf_topk literal-ranked
    cell selection) — cost O(|eval| · n_probe · cell_size) candidate
    rows, linear in the corpus at fixed eval size, never |corpus|·|eval|.
    The eval side is benchmark-sized (10³–10⁵ rows), so its exploded
    probe frame is broadcast-sized; recall is the standard IVF trade
    (an ε-pair is missed only if the eval vector's n_probe cells miss
    the corpus vector's cell), bought deliberately instead of the exact
    BroadcastNestedLoop whose per-row cost is |eval| dot products.

    The ε-test is the shared BIGINT quantized form (dot ≥ 0 ∧
    dot²·den² ≥ num²·‖a‖²·‖b‖² at ×10³) — the whole pipeline (k-means
    trajectory, probing, test) replays bit-exact in DuckDB. Inputs are
    embedding-like by contract: ‖v‖ ≈ 1, so quantized n2 ≈ scale² and
    dot²·den² stays ~10¹⁶ ≪ 2⁶³; vectors with norms ≫ 1 (or a larger
    ``scale``) overflow the long ε-test — normalize first (ANSI mode
    fails loudly rather than wrapping).

    Returns one row per corpus vector: (vec_id, status ∈
    {'contaminated', 'clean'}, eval_hits = #distinct eval vectors
    ε-matching, first_eval = min matching eval id, −1 when clean).
    """
    assigned, cents = _scaled_kmeans(
        corpus,
        n_centroids=n_centroids,
        lloyd_iters=lloyd_iters,
        scale=scale,
        id_col=id_col,
        vec_col=vec_col,
    )
    corp = cache_once(assigned.withColumn("n2", _self_dot_long()))
    ev_cells = _contam_eval_probe(
        eval_set, cents, n_probe=n_probe, scale=scale, id_col=id_col, vec_col=vec_col
    )
    return _contam_verdicts(corp, ev_cells, tau_num=tau_num, tau_den=tau_den)


def _self_dot_long(col: str = "v") -> F.Column:
    """Exact BIGINT self-dot of a quantized vector column."""
    return F.aggregate(
        F.zip_with(col, col, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _contam_eval_probe(
    eval_set: DataFrame,
    cents: list[tuple[int, list[int]]],
    *,
    n_probe: int,
    scale: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The eval-side probe table of semantic_contamination — one row per
    (eval vector, probed cell): quantized vector, BIGINT self-norm, and
    the n_probe literal-ranked nearest corpus-trained cells. Build once,
    persist/broadcast, probe forever (the streaming prep artifact)."""
    qvec = F.transform(_as_double(vec_col), lambda x: F.round(x * scale).cast("long"))
    ev = eval_set.select(F.col(id_col).alias("eid"), qvec.alias("ev"))
    return ev.select(
        "eid",
        "ev",
        _self_dot_long("ev").alias("en2"),
        F.explode(_probe_cells_scaled("ev", cents, n_probe)).alias("cell"),
    )


def _contam_verdicts(
    corp: DataFrame, ev_cells: DataFrame, *, tau_num: int, tau_den: int
) -> DataFrame:
    """The verdict tail of semantic_contamination: broadcast the probe
    table onto the corpus side's (id, v, cell, n2) frame, apply the
    BIGINT ε-test, aggregate per corpus vector. Shared by the batch
    operator and the streaming per-batch body."""
    dot = F.aggregate(
        F.zip_with("ev", "v", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    hits = (
        corp.join(F.broadcast(ev_cells), "cell")
        .withColumn("__dot", dot)
        .filter(
            (F.col("__dot") >= 0)
            & (
                F.col("__dot") * F.col("__dot") * F.lit(tau_den * tau_den)
                >= F.lit(tau_num * tau_num) * F.col("n2") * F.col("en2")
            )
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("eval_hits"),
            F.min("eid").alias("first_eval"),
        )
    )
    return (
        corp.select("id")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.when(F.col("eval_hits").isNotNull(), F.lit("contaminated"))
            .otherwise(F.lit("clean"))
            .alias("status"),
            F.coalesce("eval_hits", F.lit(0).cast("long")).alias("eval_hits"),
            F.coalesce("first_eval", F.lit(-1).cast("long")).alias("first_eval"),
        )
        .orderBy("vec_id")
    )


def semantic_contam_index(
    corpus: DataFrame,
    eval_set: DataFrame,
    *,
    n_centroids: int = 8,
    lloyd_iters: int = 2,
    n_probe: int = 4,
    scale: int = 10**3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """One-time prep for STREAMING decontamination (the
    `semdedup_stream_index` analog): train cells on the existing corpus,
    build the eval probe table. Returns (ev_cells, cents) — feed both to
    ``streaming.stream_semantic_contamination`` so each arriving corpus
    batch is screened with EXACTLY the batch operator's rule."""
    _, cents = _scaled_kmeans(
        corpus,
        n_centroids=n_centroids,
        lloyd_iters=lloyd_iters,
        scale=scale,
        id_col=id_col,
        vec_col=vec_col,
    )
    ev_cells = _contam_eval_probe(
        eval_set, cents, n_probe=n_probe, scale=scale, id_col=id_col, vec_col=vec_col
    )
    return ev_cells, cents
