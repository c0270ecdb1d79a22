"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

The operator the paper runs over web corpora before LLM training:
embed every document, coarse-cluster the embeddings (k-means), and
inside each cluster drop all but one member of every epsilon-ball
(cosine >= threshold). The quadratic comparison is confined to a
cluster — that bound is the entire scale story, and the cluster count
is the provisioning knob (the paper used ~110k clusters at LAION
scale; here the frozen 24-centroid quantizer matches the fixture
corpus, see ops/semdedup_frozen.py).

Composition: vectors come from ops.embeddings.embed_corpus (raw text
-> feature-hashed integer vectors, zero-shuffle), the cluster
assignment broadcasts the frozen centroids (map-side, one row_number
window keyed by id), and the within-cluster pass is a self-join on the
cluster id — one shuffle whose largest key is a CLUSTER, never the
corpus. Representative choice is deterministic: a document is dropped
iff some LOWER-id document in its cluster sits within the epsilon-ball
(the survivor of every ball chain is its minimum id — no iterative
connected components needed, so the whole op is closed-form SQL and
carries a full DuckDB value-hash twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .embeddings import DEFAULT_DIM, embed_corpus
from .similarity import _as_double, cosine_pre, kmeans_centroids, norm, round6


def provision_cluster_count(
    n_docs: int,
    target_cluster_size: int = 500,
    min_clusters: int = 8,
    max_clusters: int = 200_000,
) -> int:
    """SemDeDup cluster-count provisioning rule: k = n_docs / target size.

    The within-cluster pass is QUADRATIC in cluster size, so per-cluster
    cost is held constant by scaling k linearly with the corpus — the
    paper's own regime (Abbas et al. 2023 used ~110k clusters for LAION's
    ~4e8 embeddings, i.e. a few thousand per cluster; this rule lands at
    110k clusters for 55M docs at the default target, and the
    ``max_clusters`` ceiling mirrors FAISS guidance that training k-means
    much past sample_cap/39 points per centroid is wasteful). Cost model
    per doc: assignment O(k) via the broadcast crossJoin + comparison
    O(target_cluster_size); pick ``target_cluster_size`` where the two
    terms balance for your k."""
    return int(
        min(max_clusters, max(min_clusters, round(n_docs / target_cluster_size)))
    )


def train_centroids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    n_clusters: int | None = None,
    target_cluster_size: int = 500,
    sample_cap: int = 100_000,
    iters: int = 5,
    embed_impl: str = "expr",
) -> list[list[float]]:
    """TRAIN stage of the SemDeDup train/assign split (same shape as the
    IVF quantizer's): embed the corpus (zero-shuffle map), pull a bounded
    deterministic sample (smallest ids, <= ``sample_cap`` rows — never a
    driver bottleneck at any corpus size), run spherical k-means on it,
    and return 6-dp-rounded centroid literals ready to broadcast into
    :func:`assign_clusters` / :func:`semantic_dedup` — or to freeze as
    constants (tools/freeze_semdedup_centroids.py) for bit-reproducible
    oracle runs.

    ``n_clusters`` defaults to :func:`provision_cluster_count` of the
    corpus row count — the knob that keeps the within-cluster quadratic
    bounded as the corpus grows."""
    if n_clusters is None:
        n_clusters = provision_cluster_count(
            df.count(), target_cluster_size=target_cluster_size
        )
    emb = embed_corpus(
        df, id_col=id_col, text_col=text_col, dim=dim, impl=embed_impl
    )
    return kmeans_centroids(
        emb,
        id_col=id_col,
        vec_col="embedding",
        n_centroids=n_clusters,
        iters=iters,
        sample_cap=sample_cap,
    )


def assign_clusters(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, v, vn): nearest-centroid assignment against broadcast
    literals — ties broken on the smaller centroid id, exactly as the
    SQL twin's (cos desc, cid asc) ordering. ``vn`` is the row's vector
    norm, folded once here (below the centroid crossJoin, so it is NOT
    recomputed per centroid) and carried so the downstream within-cluster
    pair pass never folds a norm per pair."""
    spark = emb.sparkSession
    cents = spark.createDataFrame(
        [(i, v) for i, v in enumerate(centroids)],
        "cid long, centv array<double>",
    ).withColumn("centn", norm(F.col("centv")))
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cid"))
    return (
        emb.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("vn", norm(F.col("v")))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "csim",
            round6(
                cosine_pre(
                    F.col("v"), F.col("centv"), F.col("vn"), F.col("centn")
                )
            ),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col(id_col), "cid", "v", "vn")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    embed_impl: str = "expr",
) -> DataFrame:
    """(id, cid, max_sim_lower, kept): per-document SemDeDup decision.

    ``max_sim_lower`` is the document's highest cosine to any LOWER-id
    member of its cluster (-1.0 when it is the cluster's minimum id);
    ``kept`` is false iff that neighbor is inside the epsilon-ball
    (cosine >= threshold). Downstream keeps ``where kept`` rows; the
    drop mass per cluster is the curation report's input.
    """
    # embed_impl="arrow" is the production choice at dim >= 256 (identical
    # vectors, O(tokens + dim)/row — see ops/embeddings.embed_corpus).
    emb = embed_corpus(
        df, id_col=id_col, text_col=text_col, dim=dim, impl=embed_impl
    )
    assign = assign_clusters(emb, centroids, id_col=id_col)
    # `assign` (per-token embed fold + 24-centroid crossJoin + row_number
    # window) feeds THREE plan branches: both self-join sides and the final
    # keep/drop join. Per the measured materialization rule (see
    # ops/dedup.py) an expensive subtree with >=2 readers is checkpointed
    # once — without this the whole assignment pipeline ran 3x (VERDICT r4
    # finding 4). eager=False keeps construction job-free.
    assign = assign.localCheckpoint(eager=False)
    a = assign.select(F.col(id_col), F.col("cid"), F.col("v"), F.col("vn"))
    b = assign.select(
        F.col("cid"),
        F.col(id_col).alias("_oid"),
        F.col("v").alias("_ov"),
        F.col("vn").alias("_ovn"),
    )
    sims = (
        a.join(b, "cid")
        .where(F.col("_oid") < F.col(id_col))
        .withColumn(
            "_cos",
            round6(
                cosine_pre(
                    F.col("v"), F.col("_ov"), F.col("vn"), F.col("_ovn")
                )
            ),
        )
        .groupBy(id_col, "cid")
        .agg(F.max("_cos").alias("max_sim_lower"))
    )
    return (
        assign.select(id_col, "cid")
        .join(sims.select(id_col, "max_sim_lower"), id_col, "left")
        .select(
            F.col(id_col),
            F.col("cid"),
            F.coalesce(F.col("max_sim_lower"), F.lit(-1.0)).alias(
                "max_sim_lower"
            ),
            (
                F.coalesce(F.col("max_sim_lower"), F.lit(-1.0))
                < F.lit(threshold)
            ).alias("kept"),
        )
    )
