"""Similarity search over an embedding column (array<float>).

  - brute_force_topk: exact cosine top-k per query — broadcast the (small)
    query set against the (huge) corpus; one shuffle for the per-query top-k
    window. The exact/correctness baseline: cost is O(|queries| * corpus),
    so it is only viable at full corpus scale for small query sets — at
    10^12 rows the ANN paths below are the production route; this one
    exists to ground-truth their recall.
  - lsh_bucket_topk: random-hyperplane LSH variant — corpus and queries are
    bucketed by sign bits of dot products with R fixed hyperplanes; only
    same-bucket candidates are scored. The scale path: candidate count drops
    by ~2^R with recall controlled by R (multi-probe = union of buckets at
    Hamming distance <= 1, so near-boundary vectors are not lost).
  - embedding_near_dup_pairs: within-block pairwise cosine >= threshold.

Dot products are `F.aggregate(F.zip_with(...))` over double-cast arrays —
JVM-side, strict left-to-right summation, so DuckDB's list_dot_product /
list_cosine_similarity on the same doubles are exact twins (verified in
tests). Hyperplanes are seeded Python constants inlined into both the Spark
plan and the oracle SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI DIVIDE_BY_ZERO error) when either vector has zero
    norm — a web corpus has empty pages, and their embedding is the zero
    vector; a NULL cosine falls out of every >= threshold filter and sorts
    after real scores in a top-k window (desc puts nulls last).

    try_divide, NOT ``x / nullif(d, 0)``: NULLIF expands to
    ``CASE WHEN d = 0 THEN NULL ELSE d`` which evaluates the divisor — two
    interpreted array folds here — twice per pair (measured as the round-4
    embedding_near_dup 1.5x regression). try_divide evaluates it once and
    yields the same NULL-on-zero result.

    Prefer :func:`cosine_pre` on pairwise (join) callers: norms depend on
    ONE row, so computing them per pair is O(pairs) folds where O(rows)
    suffices."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with the two norms already materialized as per-row columns
    (project ``norm(v)`` on each join INPUT, below the exchange, so each
    row's norm folds once instead of once per pair). Bit-identical to
    :func:`cosine`: same dot, same ``norm(a)*norm(b)`` product of the same
    doubles, same NULL-on-zero division."""
    return F.try_divide(dot(a, b), na * nb)


def round6(x: Column) -> Column:
    """Tie-robust 6-dp rounding: floor(x*1e6 + 0.5)/1e6, NOT F.round.

    Spark rounds HALF_UP on the exact BigDecimal expansion of the double;
    DuckDB rounds through a float multiply — on half-ulp ties they disagree
    in the last digit (hit for real by quality_score at gen-sf0.1, see
    ops/text.py). Both engines evaluating this identical float procedure
    agree bit-for-bit whenever the input double is identical, which it is
    here (both sides sum the dot product in index order). For negative
    cosines this is round-half-toward-+inf on exact ties — identically so
    in both engines, which is all the oracle needs."""
    return F.floor(x * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes, rounded so they inline exactly into
    SQL text for the oracle."""
    rng = np.random.Generator(np.random.Philox(seed))
    return [
        [round(float(x), 6) for x in rng.standard_normal(dim)]
        for _ in range(n_planes)
    ]


def bucket_of(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id = sign-bit integer over the hyperplane dot products."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(w) for w in plane])) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank): exact top-k neighbors per
    query (self-matches excluded). The query side is broadcast.

    This is the EXACT path, O(|corpus| x |queries|): viable only while the
    query batch is small (recall oracle, spot checks). At 10^12-row corpus
    scale, any real query load must go through the LSH/IVF paths below —
    this function exists as their correctness baseline, not as a
    production route."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            round6(
                cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 7,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose LSH bucket is
    within Hamming distance <= 1 of the query's bucket (multiprobe)."""
    planes = hyperplanes(dim, n_planes, seed)
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("cv"),
        )
        .withColumn("bucket", bucket_of(F.col("cv"), planes))
        .withColumn("cn", norm(F.col("cv")))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
        )
        .withColumn("qbucket", bucket_of(F.col("qv"), planes))
        # norm BEFORE the multiprobe explode: one fold per query, carried
        # through the 1+n_planes probe rows instead of recomputed per probe.
        .withColumn("qn", norm(F.col("qv")))
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
        q = q.select(
            "query_id", "qv", "qn", F.explode(probes).alias("bucket")
        )
    else:
        q = q.withColumnRenamed("qbucket", "bucket")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            round6(
                cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.select("query_id", "neighbor_id", "cos_sim")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 20,
    iters: int = 5,
    sample_cap: int = 100_000,
) -> list[list[float]]:
    """Spherical k-means coarse quantizer, trained the way FAISS trains one:
    on a bounded deterministic sample pulled to the driver, with the
    assignment stage staying fully distributed afterwards.

    - Sample: rows with the smallest ids up to ``sample_cap`` (deterministic
      — no RNG, no partition-order dependence). At 10^12 rows the sample is
      still ``sample_cap`` vectors (~100k x 64 doubles = 50 MB), so this
      never becomes a driver bottleneck.
    - Init: stride over the sorted sample (the previous stride quantizer IS
      the initialization).
    - Lloyd iterations on L2-normalized vectors (spherical k-means matches
      the cosine assignment used downstream); empty clusters re-seeded from
      the worst-assigned points. Centroids rounded to 6 dp so they inline
      exactly into plans as literals.

    Exact-SQL-oracle note: trained centroids are data-dependent floats
    whose means depend on summation order, so unlike the stride quantizer
    this variant has no bit-exact DuckDB twin; the driver records a
    rows-only check for queries built on it (ann_ivf keeps the fully
    oracle-checked stride path).
    """
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n = len(Xn)
    k = min(n_centroids, n)
    C = Xn[:: max(n // k, 1)][:k].copy()
    for _ in range(iters):
        sims = Xn @ C.T  # (n, k) cosine (all rows unit)
        assign = sims.argmax(axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members) == 0:
                # re-seed from the point worst-served by current centroids
                C[j] = Xn[sims.max(axis=1).argmin()]
            else:
                m = members.mean(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return [[round(float(x), 6) for x in c] for c in C]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int = 25,
    nprobe: int = 3,
    max_centroids: int = 4096,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: the scale path for huge corpora.

    Coarse quantizer: every ``centroid_stride``-th vector (by id), capped
    at ``max_centroids`` — deterministic, broadcastable, and expressible
    identically in the SQL oracle (a trained k-means only shifts centroid
    quality, not the operator shape). The cap keeps the assignment stage
    O(n * max_centroids) — without it the centroid count grows with the
    corpus and assignment goes quadratic. Corpus vectors are assigned to
    their nearest centroid's inverted list (one shuffle by centroid id);
    each query probes its ``nprobe`` nearest lists, so only
    ~|corpus| * nprobe / n_lists candidates are scored instead of the
    full cross join.

    ``centroids`` (e.g. from :func:`kmeans_centroids`) replaces the stride
    sample with a trained quantizer — same operator shape, better lists on
    clustered data.
    """
    if centroids is not None:
        spark = corpus.sparkSession
        cents = spark.createDataFrame(
            [(i, v) for i, v in enumerate(centroids)],
            "cid long, centv array<double>",
        )
    else:
        cents = corpus.where(
            ((F.col(id_col) % centroid_stride) == 0)
            & (F.col(id_col) < centroid_stride * max_centroids)
        ).select(
            F.col(id_col).alias("cid"),
            _as_double(F.col(vec_col)).alias("centv"),
        )
    # Per-row norms below every join: norms depend on one row, so the
    # n_centroids-way crossJoin and the list self-join pay one dot fold per
    # pair instead of three (plus NULLIF's divisor re-eval; VERDICT r4).
    cents = cents.withColumn("centn", norm(F.col("centv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.desc("csim"), F.asc("cid")
    )
    assign = (
        c.crossJoin(F.broadcast(cents))
        .withColumn(
            "csim",
            round6(
                cosine_pre(
                    F.col("cv"), F.col("centv"), F.col("cn"), F.col("centn")
                )
            ),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("neighbor_id", "cv", "cn", "cid")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("csim"), F.asc("cid")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "csim",
            round6(
                cosine_pre(
                    F.col("qv"), F.col("centv"), F.col("qn"), F.col("centn")
                )
            ),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qv", "qn", "cid")
    )
    scored = (
        assign.join(F.broadcast(probes), "cid")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            round6(
                cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.select("query_id", "neighbor_id", "cos_sim")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    materialize: bool = True,
    block_cap: int | None = 10_000,
) -> DataFrame:
    """Within-block pairwise cosine >= threshold (embedding near-dup).

    ``block_cap`` (default 10_000, the simhash guard's cap): blocks with
    more members are EXCLUDED from the quadratic self-join — countable
    via :func:`embedding_block_stats`, never silent. Pass None for
    uncapped all-pairs semantics on corpora whose blocks are known
    bounded (the oracle fixtures).

    ``materialize`` (default True) localCheckpoints the projected
    (block, id, vector, norm) frame before it feeds BOTH sides of the
    self-join — without it an expensive upstream (e.g. embed_corpus's
    per-token fold) is recomputed twice, once per side (the round-4
    ``embed_near_dup_text`` 22.5 s finding). eager=False: the checkpoint
    runs at the first action and is reused by both branches. Norms are
    per-row columns computed before the join (O(rows) folds, not O(pairs));
    see :func:`cosine_pre`.
    """
    g = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_n", norm(F.col("_v")))
    if materialize:
        g = g.localCheckpoint(eager=False)
    if block_cap is not None:
        # Same skew discipline as simhash_near_pairs / dedup_minhash_lsh:
        # the self-join is quadratic in BLOCK size, and this op trusts the
        # caller's block_col cardinality — a hot block (one mega-host, one
        # boilerplate cluster) must not go quadratic silently. Over-cap
        # blocks are excluded from the join; the loss is countable via
        # :func:`embedding_block_stats` (never silent).
        sizes = g.groupBy("_blk").agg(F.count("*").alias("_bsz"))
        g = g.join(
            sizes.where(F.col("_bsz") <= block_cap).drop("_bsz"), "_blk"
        )
    a = g.select(
        "_blk",
        F.col("_id").alias("id_1"),
        F.col("_v").alias("v1"),
        F.col("_n").alias("n1"),
    )
    b = g.select(
        "_blk",
        F.col("_id").alias("id_2"),
        F.col("_v").alias("v2"),
        F.col("_n").alias("n2"),
    )
    return (
        a.join(b, "_blk")
        .where(F.col("id_1") < F.col("id_2"))
        # interpreted per-pair dot products: force compute parallelism
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism,
            F.xxhash64("id_1", "id_2"),
        )
        .withColumn(
            "cos_sim",
            round6(
                cosine_pre(F.col("v1"), F.col("v2"), F.col("n1"), F.col("n2"))
            ),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("id_1", "id_2", "cos_sim")
    )


def embedding_block_stats(
    df: DataFrame, block_col: str = "label", block_cap: int = 10_000
) -> DataFrame:
    """Counted lineage for :func:`embedding_near_dup_pairs`'s block_cap
    skew guard: how many blocks / member vectors the cap would exclude
    (mirrors dedup.simhash_block_stats)."""
    sizes = (
        df.select(F.col(block_col).alias("_blk"))
        .groupBy("_blk")
        .agg(F.count("*").alias("bsz"))
    )
    return sizes.agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.when(F.col("bsz") > block_cap, 1).otherwise(0)).alias(
            "n_blocks_dropped"
        ),
        F.sum(
            F.when(F.col("bsz") > block_cap, F.col("bsz")).otherwise(0)
        ).alias("n_vecs_in_dropped"),
    )
