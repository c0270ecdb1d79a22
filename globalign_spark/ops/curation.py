"""One-job LLM-corpus curation: lang-ID -> quality gate -> exact dedup ->
MinHash-LSH near-dup drop.

Composes the library ops (`text.add_lang_id`, `text.add_quality_score`,
`dedup.dedup_minhash_lsh`) into the canonical training-data pass a user
would run over a web corpus before tokenization. Every stage stays
JVM-side/codegen except the MinHash gram hashing already inside
`dedup_minhash_lsh`; no collect, no per-row Python.

Scale notes (100 TB): the quality/lang stages are narrow column
expressions (no shuffle); exact dedup is one hash-partitioned groupBy on
md5(text) followed by a semi-join on doc_id; the near-dup stage inherits
`dedup_minhash_lsh`'s banded bucket join with its finite `bucket_cap`
skew guard (default 500 — pass a larger cap explicitly only for
oracle-parity runs, see __spark_entry__.ORACLE_UNCAPPED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globalign_spark.ops import dedup
from globalign_spark.ops import text as text_ops


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.3,
    tokens_min: int = 10,
    k: int = 5,
    num_perm: int = 16,
    num_bands: int = 4,
    bucket_cap: int = 500,
    band_perm: int | None = None,
    screen_min_eq: int | None = None,
    dup_line_frac_max: float | None = None,
    top_bigram_frac_max: float | None = None,
    rep_line_width: int = 5,
    rep_use_newlines: bool = False,
) -> DataFrame:
    """Curated corpus: rows of ``df`` that survive all four gates.

    Near-dup policy is deterministic keep-smallest-id: a doc is dropped iff
    it appears as the larger id of an LSH candidate pair. Output columns:
    (id_col, pred_lang, n_tokens, quality_score).

    ``band_perm``/``screen_min_eq`` pass through to
    :func:`ops.dedup.dedup_minhash_lsh`: with the signature screen on, a
    doc is dropped only when its signature actually agrees with a
    smaller-id doc's on >= screen_min_eq positions — without it, ANY band
    collision (including the background collisions that go quadratic on
    boilerplate-dense corpora) counts as a near-dup and over-drops.
    """
    # Optional repetition gate (Gopher shape) BEFORE the hash stages: a doc
    # dominated by repeated lines or one bigram is boilerplate/spam, and
    # dropping it here also starves the LSH stage of the boilerplate
    # buckets that go quadratic. Off by default (the oracle-twinned
    # corpus_curation query pins the 4-stage policy).
    if dup_line_frac_max is not None or top_bigram_frac_max is not None:
        rep = text_ops.add_repetition_features(
            df, text_col=text_col, id_col=id_col,
            line_width=rep_line_width, use_newlines=rep_use_newlines,
        ).select(id_col, "dup_line_frac", "top_bigram_frac")
        # anti-join on the FAILING set: a doc the repetition pass cannot
        # measure (no lines on the newline path) must be KEPT — the
        # contract is "drop iff a fraction exceeds its max", not "drop if
        # unmeasurable".
        fail = F.lit(False)
        if dup_line_frac_max is not None:
            fail |= F.col("dup_line_frac") > dup_line_frac_max
        if top_bigram_frac_max is not None:
            fail |= F.col("top_bigram_frac") > top_bigram_frac_max
        df = df.join(rep.where(fail).select(id_col), id_col, "left_anti")
    d = text_ops.add_quality_score(text_ops.add_lang_id(df, text_col), text_col)
    filt = d.where(
        (F.col("quality_score") >= quality_min)
        & (F.col("n_tokens") >= tokens_min)
        & (F.col("pred_lang") != "und")
    )
    # Exact dedup: each md5 group's min id is unique, so a semi-join on the
    # id alone keeps exactly one representative per distinct text.
    reps = (
        filt.groupBy(F.md5(text_col).alias("text_md5"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    exact_kept = filt.join(reps, id_col, "left_semi")
    cand = dedup.dedup_minhash_lsh(
        exact_kept,
        id_col=id_col,
        text_col=text_col,
        k=k,
        num_perm=num_perm,
        num_bands=num_bands,
        bucket_cap=bucket_cap,
        band_perm=band_perm,
        screen_min_eq=screen_min_eq,
    )
    drops = cand.select(F.col("id_2").alias(id_col)).distinct()
    kept = exact_kept.join(drops, id_col, "left_anti")
    return kept.select(
        id_col,
        "pred_lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality_score",
    )
