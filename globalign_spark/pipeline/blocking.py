"""Stages 1-2 — blocking keys and candidate-pair generation.

Two complementary blocking strategies, both shuffle-disciplined for the
10^12-row regime (SURVEY.md §2.4 J1-J3):

1. **MinHash LSH bands** (primary, text-similarity driven). Character
   shingles -> xxhash64 (JVM-side) -> P permutation minima computed in one
   Arrow-vectorized numpy pass -> band hashes -> posexplode -> self-join on
   (band_id, band_hash). Bucket-size capping keeps any band bucket from
   going quadratic; dropped buckets are *counted*, not silently discarded.

2. **Sorted-neighborhood within host** (secondary, URL-structure driven).
   Instead of an all-pairs self-join per host — which explodes on hot hosts
   (Zipfian, top host ~20% of a crawl) — each row pairs with its W
   successors in a per-host sorted order (window + leads). Linear in block
   size: the skew-proof formulation of "block by host".

Plus an explicit salted equi-join utility (J2) for joining a skewed
fact side against a keyed dimension side.

The reference has no joins (single-pair kernel, SURVEY.md §2.4); all of
this layer is new, Spark-idiomatic design.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# Mersenne prime 2^61 - 1: universal-hash modulus for the permutations.
_MERSENNE = (1 << 61) - 1

# Corpus-size guard for broadcasting the 15-bit-truncated signature table
# in the pair screen (see _pair_est_jaccard): ~300 B/doc -> ~600 MB at the
# cap, comfortably inside executor memory; beyond it the screen joins stay
# shuffle-based.
_SIG_BROADCAST_MAX_DOCS = 2_000_000


def shingle_hashes(text, k: int = 5):
    """Distinct k-char shingle hashes of a text column (JVM-side only).

    sequence+transform+xxhash64: no Python, no explode (array stays packed
    per row, so no shuffle amplification before the signature step).
    """
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(F.substr(text, i, F.lit(k))))
    )


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature_col(df: DataFrame, hashes_col: str, num_perm: int = 64,
                          seed: int = 1) -> DataFrame:
    """Append ``signature: array<long>`` (length num_perm) from a column of
    shingle-hash arrays. One Arrow-vectorized pandas pass: for each row,
    sig_j = min_s ((a_j * h_s + b_j) mod M) over its shingle hashes s.
    """
    a, b = _perm_params(num_perm, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def sig(hs: pd.Series) -> pd.Series:
        out = []
        au = a.astype(np.uint64)
        bu = b.astype(np.uint64)
        for h in hs:
            hv = np.asarray(h, dtype=np.uint64)
            if hv.size == 0:
                out.append(np.zeros(num_perm, dtype=np.int64))
                continue
            # (a*h + b) mod M, computed in uint64 with explicit mod to stay
            # exact: reduce h first, then one Barrett-free double mod.
            vals = (hv[None, :] % _MERSENNE) * (au[:, None] % _MERSENNE)
            vals = (vals % _MERSENNE + bu[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return df.withColumn("signature", sig(F.col(hashes_col)))


def band_keys_col(signature, num_bands: int, num_perm: int):
    """array of per-band hashes: band b = xxhash64 over its signature slice
    (array slicing + xxhash64 of an array column — JVM-side)."""
    rows = num_perm // num_bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda bidx: F.xxhash64(bidx, F.slice(signature, bidx * rows + 1, rows)),
    )


def corpus_signatures(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "norm_text",
    shingle_k: int = 5,
    num_perm: int = 64,
    seed: int = 1,
) -> DataFrame:
    """(_id, signature) MinHash signature table for the corpus — the ONE
    shingle+hash+permutation-minima pass every banding scheme derives
    from. The orchestrator checkpoints this as ``s1_signatures`` so the
    main banding pass, its signature screen, AND the singleton-rescue
    re-banding (s4b) all read a parquet scan instead of each re-paying
    the full-corpus map pass — at 10^12 rows, shingling + P permutation
    minima is the most expensive narrow transformation in the pipeline,
    and without sharing it the rescue pass runs it a second time over
    the entire corpus for a probe set that is a few percent of it.
    """
    return minhash_signature_col(
        df.select(F.col(id_col).alias("_id"),
                  shingle_hashes(F.col(text_col), shingle_k).alias("_hs")),
        "_hs", num_perm=num_perm, seed=seed,
    ).select("_id", "signature")


def lsh_candidates(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "norm_text",
    shingle_k: int = 5,
    num_perm: int = 64,
    num_bands: int = 16,
    bucket_cap: int = 200,
    seed: int = 1,
    over_cap_window: int = 8,
    est_jaccard_floor: float = 0.0,
    cache_registry: list | None = None,
    sig_df: DataFrame | None = None,
    n_docs: int | None = None,
    band_width: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Candidate id pairs from banded MinHash LSH.

    ``band_width`` (adaptive banding, :func:`choose_banding`): the number
    of leading signature positions banding consumes — ``num_bands`` bands
    of ``band_width // num_bands`` rows. Defaults to ``num_perm`` (the
    whole signature). The signature screen always estimates on the FULL
    ``num_perm`` width regardless, so a plan that bands on a prefix still
    screens at maximum precision.

    ``cache_registry``: with ``est_jaccard_floor`` > 0 the screened
    candidate frame is lazily persisted so the stats branch and the pairs
    branch share one execution; pass a list to receive that persisted
    frame and ``unpersist()`` it once both branches have run (the
    orchestrator does, right after the stage-1 checkpoint write) —
    otherwise the cache lives until the session ends.

    Returns (pairs, stats): pairs(id_1, id_2) distinct with id_1 < id_2;
    stats is a 1-row frame of bucket/candidate accounting (lineage — nothing
    is silently dropped). Buckets over ``bucket_cap`` contribute
    sorted-neighborhood pairs (window ``over_cap_window``) instead of the
    full quadratic expansion; ``over_cap_window=0`` restores hard drops.

    ``est_jaccard_floor`` > 0 adds a signature screen between bucketing and
    the output: each surviving pair's Jaccard is estimated from the two
    MinHash signatures (share of equal positions — pure JVM ``zip_with``,
    no text, no Python) and pairs under the floor are dropped, with the
    drop count reported in stats. Sensitive banding (rows-per-band 3)
    is what buys recall on ~0.4-Jaccard near-duplicates, but it also
    admits background collisions on shingle-dense corpora; the screen
    keeps the expensive alignment stage's input volume bounded at a cost
    of num_perm longs per comparison instead of a full DP.

    ``sig_df``: a precomputed (_id, signature) frame (usually the re-read
    ``s1_signatures`` checkpoint from :func:`corpus_signatures`); when
    given, the shingle+minhash pass is skipped and banding starts from
    the scan. Signatures must have been built with the SAME shingle_k /
    num_perm / seed — the orchestrator guarantees this by deriving both
    from one config fingerprint.
    """
    with_sig = (
        sig_df.select("_id", "signature")
        if sig_df is not None
        else corpus_signatures(df, id_col, text_col, shingle_k, num_perm, seed)
    )
    bands = with_sig.select(
        "_id",
        F.posexplode(
            band_keys_col(
                F.col("signature"), num_bands, band_width or num_perm
            )
        ).alias("band_id", "band_hash"),
    )
    # Bucket-size accounting; cap protects against degenerate buckets
    # (boilerplate pages) going quadratic.
    sizes = bands.groupBy("band_id", "band_hash").agg(F.count("*").alias("bsz"))
    stats = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("bsz") > bucket_cap, 1).otherwise(0)).alias(
            "n_buckets_over_cap"
        ),
        F.sum(F.when(F.col("bsz") > bucket_cap, F.col("bsz")).otherwise(0)).alias(
            "n_rows_in_over_cap"
        ),
        F.max("bsz").alias("max_bucket"),
    )
    ok = bands.join(
        sizes.where(F.col("bsz") <= bucket_cap).drop("bsz"),
        ["band_id", "band_hash"],
    )
    a = ok.select("band_id", "band_hash", F.col("_id").alias("id_1"))
    b = ok.select("band_id", "band_hash", F.col("_id").alias("id_2"))
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    # Over-cap buckets are REFINED, not dropped (50k-entity evidence run,
    # round 3): generic shingle collisions make bucket sizes grow with the
    # corpus — at ~100k pages, 111 buckets blew past the cap carrying half
    # the corpus and ~11k TRUE pairs, costing 4 points of recall when
    # dropped. A within-bucket sorted-neighborhood pass keeps those
    # buckets O(bsz * w) instead of O(bsz^2): members of one bucket share
    # real content, so true near-dups sort adjacent by text. The
    # over-cap accounting above still reports every such bucket.
    if over_cap_window > 0:
        over = bands.join(
            sizes.where(F.col("bsz") > bucket_cap).drop("bsz"),
            ["band_id", "band_hash"],
        ).join(
            # Sort key is a 64-char text prefix, not the full document:
            # every over-cap member's key is replicated once per over-cap
            # band membership (up to num_bands times) through the shuffle
            # and into the per-bucket window sort, so full texts turn a
            # degenerate bucket into a straggler task moving GBs. A 64-char
            # prefix (id tiebreak in the window's orderBy) preserves SN
            # adjacency — near-duplicates agree on prefixes far longer
            # than 64 — at a fraction of the shuffle volume.
            df.select(
                F.col(id_col).alias("_id"),
                F.substring(F.col(text_col), 1, 64).alias("_txt"),
            ),
            "_id",
        ).select(
            F.concat_ws(
                "#", F.col("band_id"), F.col("band_hash")
            ).alias("_bkt"),
            "_id",
            "_txt",
        )
        refined = sorted_neighborhood_candidates(
            over, id_col="_id", key_col="_bkt", order_col="_txt",
            window=over_cap_window,
        )
        pairs = pairs.union(refined).distinct()
    if est_jaccard_floor > 0:
        est = _pair_est_jaccard(pairs, with_sig, num_perm, cache_registry,
                                n_docs=n_docs)
        # Drop accounting rides on the stats frame (crossJoin of two 1-row
        # aggregates). coalesce: F.sum over an EMPTY frame is NULL, and
        # the lineage contract is a counted zero, not None.
        screen_stats = est.agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("_est_j") < est_jaccard_floor, 1)
                    .otherwise(0)
                ),
                F.lit(0),
            ).alias("n_screened_out"),
        )
        stats = stats.crossJoin(screen_stats)
        pairs = (
            est.where(F.col("_est_j") >= est_jaccard_floor)
            .select("id_1", "id_2")
        )
    else:
        stats = stats.withColumn("n_screened_out", F.lit(0))
    return pairs, stats


def _pair_est_jaccard(
    pairs: DataFrame,
    with_sig: DataFrame,
    num_perm: int,
    cache_registry: list | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """(id_1, id_2) -> (id_1, id_2, _est_j): MinHash-estimated Jaccard of
    each pair, from ``with_sig``'s (_id, signature) columns.

    Estimates on 15-bit truncations of the minhash values, not the full
    64-bit signatures: the estimator only compares positions for EQUALITY,
    and x==y implies trunc(x)==trunc(y), so recall through any downstream
    floor is exact; a false positional match needs a 2^-15 truncation
    collision (expected inflation ~num_perm/32768 of one position —
    invisible at a 0.25 floor). The payoff is shuffle bytes: the pair-sig
    joins ship every candidate pair's attached signature, and smallint
    arrays are ~4x leaner than the long arrays (the full-width version
    filled this box's disk with spill at 400k pages before the screen ever
    finished).

    The result is narrowed to 3 columns BEFORE a lazy MEMORY_AND_DISK
    persist (signature arrays would make cached rows ~100x fatter for no
    reader), so a stats action and a pairs action share one execution of
    the upstream bucket join; pass ``cache_registry`` to receive the
    persisted frame and release it once all readers have run.

    ``n_docs`` (when the caller knows the corpus row count — the
    orchestrator reads it from the s1_signatures manifest, zero extra
    actions): at or under ``_SIG_BROADCAST_MAX_DOCS`` the truncated sig
    table is broadcast, turning both pair-sig joins into map-side hash
    probes with NO pair-row shuffle. Without the hint Spark plans an SMJ
    that shuffles and sorts every candidate pair WITH its two attached
    signatures — measured fatal at 400k docs: the 63x2 rescue banding's
    ~520M collision rows times ~260 B of smallint arrays filled this
    box's 94 GB of usable disk with sort spill (run log
    BENCH/r3/pipeline_200k_rescue_oom.log). The truncated table is
    ~300 B/doc (~600 MB at the 2M-doc guard); past the guard the SMJ is
    the honest plan — at 10^12 rows no corpus-wide table broadcasts, and
    the bucket cap bounds the pair volume per probe instead.
    """
    sigs = with_sig.select(
        "_id",
        F.transform(
            "signature", lambda x: (x.bitwiseAND(F.lit(32767))).cast("smallint")
        ).alias("ssig"),
    )
    if n_docs is not None and n_docs <= _SIG_BROADCAST_MAX_DOCS:
        sigs = F.broadcast(sigs)
    est = (
        pairs
        .join(sigs.select(F.col("_id").alias("id_1"),
                          F.col("ssig").alias("_sig1")), "id_1")
        .join(sigs.select(F.col("_id").alias("id_2"),
                          F.col("ssig").alias("_sig2")), "id_2")
        .withColumn(
            "_est_j",
            F.size(
                F.filter(
                    F.zip_with("_sig1", "_sig2", lambda x, y: x == y),
                    lambda m: m,
                )
            ) / F.lit(float(num_perm)),
        )
        .select("id_1", "id_2", "_est_j")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if cache_registry is not None:
        cache_registry.append(est)
    return est


def rescue_candidates(
    df: DataFrame,
    probe_ids: DataFrame,
    id_col: str = "url",
    text_col: str = "norm_text",
    shingle_k: int = 5,
    num_perm: int = 126,
    rows_per_band: int = 2,
    bucket_cap: int = 500,
    seed: int = 1,
    est_jaccard_floor: float = 0.0,
    top_k: int = 500,
    cache_registry: list | None = None,
    sig_df: DataFrame | None = None,
    n_docs: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Aggressive-banding LSH candidates for a SMALL probe set against the
    whole corpus — the singleton rescue pass.

    Motivation (measured, BENCH/r3/SCALE_EVIDENCE.md §3): pairwise recall
    decays with corpus size — 1.0 (5k) → 0.9962 (50k) → 0.9876 (200k
    entities) — because the per-edge catch probability of the production
    42x3 banding (~0.96 at the base-variant Jaccard p5 of 0.42, ~0.81 at
    the variant-variant p25 of 0.34) meets an ever-longer truth-pair tail:
    a variant whose ONLY edge is missed stays a singleton forever. Fixing
    that corpus-wide by moving to 2-row banding costs ~4x colliding pairs
    on EVERY record — the wrong trade at 10^12 rows.

    This pass instead re-banded only after clustering: the same ``num_perm``
    permutations (same seed → bit-identical signatures to the main pass)
    regrouped into ``num_perm // rows_per_band`` bands of ``rows_per_band``
    rows. At r=2/63 bands the per-edge catch is ~0.9995 at Jaccard 0.34 and
    ~1.0 at 0.42 — but only records in ``probe_ids`` (the post-clustering
    unclustered reps: misses plus true loners, ~30% of reps on the
    synthetic corpus) probe the buckets, so the candidate volume is
    O(|probe| * bucket_cap * bands) — linear in corpus size with a
    cap-bounded constant, vs corpus-wide 2-row banding where EVERY record
    pays the collision mass. The corpus-side cost is one map-only banding
    projection over ``sig_df`` — the checkpointed ``s1_signatures`` table
    the orchestrator passes in (:func:`corpus_signatures`), so the
    shingle+minhash pass itself is NOT re-paid here; without ``sig_df``
    the signatures are recomputed from text (same seed → bit-identical).

    Skew guards, in order:
    - buckets over ``bucket_cap`` are dropped AND counted (never silent);
      the main pass already SN-refined its own over-cap buckets, so a
      rescue probe landing only in mega-buckets gains nothing new there;
    - ``est_jaccard_floor`` screens pairs on signature-estimated Jaccard
      (shared 15-bit-truncation estimator, see ``_pair_est_jaccard``) —
      AFTER the pair distinct, deliberately: 2-row banding collides a
      near-dup in most of its 63 bands, so estimating on the raw join
      output multiplies the (interpreted, 126-position) comparison by the
      band multiplicity — measured 3x slower than distinct-first at a
      100k-page LSH-only run (507.7M distinct collisions). The distinct
      ships only narrow id pairs; the signature joins that follow are
      broadcasts (corpus sigs at 15-bit truncation are ~25 MB per 100k
      docs; at 10^12-row scale the probe-adjacent pair set, not the
      corpus, bounds that join because only ~bands x bucket_cap partners
      per probe survive the cap);
    - ``top_k`` keeps only the best-estimated ``top_k`` partners per probe,
      so one degenerate probe (boilerplate text colliding everywhere)
      cannot flood the alignment stage.

    Returns (pairs, stats): pairs(id_1, id_2) distinct with id_1 < id_2,
    every pair touching >= 1 probe id; stats is a 1-row accounting frame.
    """
    num_bands = num_perm // rows_per_band
    with_sig = (
        sig_df.select("_id", "signature")
        if sig_df is not None
        else corpus_signatures(df, id_col, text_col, shingle_k, num_perm, seed)
    )
    bands = with_sig.select(
        "_id",
        F.posexplode(band_keys_col(F.col("signature"), num_bands, num_perm)).alias(
            "band_id", "band_hash"
        ),
    )
    probes = probe_ids.select(F.col(probe_ids.columns[0]).alias("_id")).distinct()
    # One cheap action up front: |probe| decides the join strategy below
    # (broadcast only when the probe band rows verifiably fit — a
    # degenerate run where the main pass found nothing makes the probe
    # set the whole corpus, and an unconditional broadcast hint would
    # OOM the driver at scale), and lands in stats as lineage.
    n_probes = probes.count()
    probe_bands = bands.join(probes, "_id", "left_semi")
    sizes = (
        bands.select("band_id", "band_hash")
        .groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bsz"))
    )
    stats = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("bsz") > bucket_cap, 1).otherwise(0)).alias(
            "n_buckets_over_cap"
        ),
        F.sum(F.when(F.col("bsz") > bucket_cap, F.col("bsz")).otherwise(0)).alias(
            "n_rows_in_over_cap"
        ),
        F.max("bsz").alias("max_bucket"),
    )
    ok = bands.join(
        sizes.where(F.col("bsz") <= bucket_cap).drop("bsz"),
        ["band_id", "band_hash"],
    )
    # Probe rows keep their identity on the LEFT (id_1 = probe) so the
    # per-probe top-k window below has a key; normalization to
    # (least, greatest) happens after the screen.
    probe_side = probe_bands.select(
        "band_id", "band_hash", F.col("_id").alias("id_1")
    )
    if n_probes * num_bands <= 2_000_000:
        probe_side = F.broadcast(probe_side)
    raw = (
        probe_side
        .join(ok.select("band_id", "band_hash", F.col("_id").alias("id_2")),
              ["band_id", "band_hash"])
        .where(F.col("id_1") != F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    caches: list = []
    est = _pair_est_jaccard(raw, with_sig, num_perm, caches, n_docs=n_docs)
    if cache_registry is not None:
        cache_registry.extend(caches)
    screened = est.where(F.col("_est_j") >= est_jaccard_floor)
    if top_k > 0:
        w = Window.partitionBy("id_1").orderBy(
            F.col("_est_j").desc(), F.col("id_2")
        )
        screened = (
            screened.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= top_k)
        )
    pairs = (
        screened.select(
            F.least("id_1", "id_2").alias("id_1"),
            F.greatest("id_1", "id_2").alias("id_2"),
        )
        .distinct()
    )
    screen_stats = est.agg(
        F.coalesce(F.count("*"), F.lit(0)).alias("n_probe_collisions"),
        F.coalesce(
            F.sum(F.when(F.col("_est_j") < est_jaccard_floor, 1).otherwise(0)),
            F.lit(0),
        ).alias("n_screened_out"),
    ).withColumn("n_probes", F.lit(n_probes))
    return pairs, stats.crossJoin(screen_stats)


# ------------------------------------------------- adaptive banding (r4)
# The measured decay this answers (BENCH/r3/SCALE_EVIDENCE.md §7): blocking
# pair completeness at FIXED 42x3 banding fell 0.9266 (400k pages) ->
# 0.9002 (1M) as the truth-pair tail thickened near the Jaccard floor. The
# fix is provisioning banding from the DATA — the measured truth-pair
# Jaccard histogram — the same way skew_salted_join derives its salt from
# the key histogram, instead of inheriting a constant tuned at 50k.


def banding_catch_prob(s: float, rows: int, bands: int) -> float:
    """P(>=1 band collides) for a pair of Jaccard ``s`` under
    ``bands`` x ``rows`` MinHash banding: 1 - (1 - s^rows)^bands."""
    s = min(max(s, 0.0), 1.0)
    return 1.0 - (1.0 - s**rows) ** bands


class BandingPlan:
    """Chosen banding + the evidence it was chosen from (lineage)."""

    def __init__(self, rows_per_band: int, num_bands: int, **evidence):
        self.rows_per_band = rows_per_band
        self.num_bands = num_bands
        self.num_perm = rows_per_band * num_bands
        self.evidence = evidence

    def as_dict(self) -> dict:
        return {
            "rows_per_band": self.rows_per_band,
            "num_bands": self.num_bands,
            "num_perm": self.num_perm,
            **self.evidence,
        }

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"BandingPlan({self.as_dict()})"


def _select_banding(
    truth_hist: dict[float, float],
    bg_hist: dict[float, float],
    target_completeness: float,
    max_perm: int,
    rows_options: tuple[int, ...] = (2, 3, 4),
    bg_cap: float = 0.4,
    min_truth_mass: float = 30.0,
    default: tuple[int, int] = (3, 42),
    cap_survival: dict[int, float] | None = None,
) -> BandingPlan:
    """Pure driver-side selection from two WEIGHTED estimated-Jaccard
    histograms {est_j_bin: mass} (unit-testable without Spark).

    For each (rows, bands <= max_perm // rows):
      completeness = mass-weighted mean catch prob over the TRUTH hist
      bg_rate      = mass-weighted mean catch prob over the BACKGROUND hist
    Pick the cheapest config that meets the completeness target with
    bg_rate <= bg_cap; if no config meets the target inside the width
    budget, maximize completeness among bg-affordable configs (and say
    so); with too little truth mass to estimate from, keep the default.

    ``cap_survival[r]``: measured P(a colliding band's bucket is under
    the production bucket cap), folded into the per-band catch as
    s^r * cap_survival[r]. Without it the iid positional model
    over-predicts delivered completeness at scale — measured at 400k
    pages: positional catch 0.9475 vs delivered 0.889 at 42x3, the gap
    being truth pairs whose only colliding bands land in over-cap
    (generic-shingle) buckets, a loss that GROWS with corpus size
    (29 over-cap buckets at 5k entities -> 8k at 400k).
    """
    t_mass = sum(truth_hist.values())

    def _fallback(reason: str) -> BandingPlan:
        # Clamp the default to the signature budget: with num_perm < 126
        # the unclamped (3, 42) default's band_width (126) exceeds the
        # signature length, and every out-of-range band slices to the SAME
        # empty array — corpus-wide degenerate buckets (ADVICE r4). The
        # plan must never promise more permutations than the signatures
        # carry.
        r, b = default
        r = min(r, max_perm) if max_perm >= 1 else r
        b = max(1, min(b, max_perm // r))
        return BandingPlan(
            r, b, chosen_by=reason,
            predicted_completeness=None, predicted_bg_rate=None, **base,
        )

    base = {
        "truth_mass": round(t_mass, 1),
        "bg_mass": round(sum(bg_hist.values()), 1),
        "est_floor": (
            round(min(truth_hist), 4) if truth_hist else None
        ),
        "target_completeness": target_completeness,
        "bg_cap": bg_cap,
        "max_perm": max_perm,
        "cap_survival": {
            r: round(v, 4) for r, v in (cap_survival or {}).items()
        },
    }
    if t_mass < min_truth_mass:
        return _fallback("fallback-insufficient-truth-mass")
    t = np.clip(np.array(list(truth_hist), dtype=np.float64), 0.0, 1.0)
    tw = np.array(list(truth_hist.values()), dtype=np.float64)
    tw = tw / tw.sum()
    g = np.clip(np.array(list(bg_hist), dtype=np.float64), 0.0, 1.0)
    gw = np.array(list(bg_hist.values()), dtype=np.float64)
    gw = gw / gw.sum() if gw.sum() > 0 else gw
    candidates = []  # (bg_rate, width, -rows, rows, bands, completeness)
    best_effort = None
    for r in rows_options:
        surv = (cap_survival or {}).get(r, 1.0)
        per_band_t = (t**r) * surv
        per_band_g = (g**r) * surv
        for b in range(1, max_perm // r + 1):
            comp = float(np.sum(tw * (1.0 - (1.0 - per_band_t) ** b)))
            bg = (
                float(np.sum(gw * (1.0 - (1.0 - per_band_g) ** b)))
                if len(g) else 0.0
            )
            if bg > bg_cap:
                break  # bg_rate is monotone in bands: wider only worse
            if comp >= target_completeness:
                candidates.append((bg, r * b, -r, r, b, comp))
                break  # completeness monotone in bands: first b is cheapest
            if best_effort is None or comp > best_effort[0]:
                best_effort = (comp, bg, r, b)
    if candidates:
        bg, _, _, r, b, comp = min(candidates)
        plan = BandingPlan(
            r, b, chosen_by="target-met-min-bg",
            predicted_completeness=round(comp, 4),
            predicted_bg_rate=round(bg, 4), **base,
        )
    elif best_effort is not None:
        comp, bg, r, b = best_effort
        plan = BandingPlan(
            r, b, chosen_by="best-effort-target-unreachable-in-width",
            predicted_completeness=round(comp, 4),
            predicted_bg_rate=round(bg, 4), **base,
        )
    else:
        plan = _fallback("fallback-no-affordable-config")
    assert plan.num_perm <= max_perm, (
        f"banding plan {plan.rows_per_band}x{plan.num_bands} exceeds the "
        f"signature budget max_perm={max_perm}"
    )
    return plan


def choose_banding(
    sig_df: DataFrame,
    num_perm: int,
    norm_df: DataFrame | None = None,
    id_col: str = "url",
    text_col: str = "norm_text",
    target_completeness: float = 0.95,
    dup_threshold: float = 0.25,
    probe_cap: int = 2000,
    bg_anchors: int = 64,
    bucket_cap: int = 500,
    rows_options: tuple[int, ...] = (2, 3, 4),
    bg_cap: float = 0.4,
    n_docs: int | None = None,
    params=None,
    confirm_threshold: float = 0.8,
    align_top_k: int = 5000,
    prod_bucket_cap: int = 200,
) -> BandingPlan:
    """Data-driven (rows_per_band, num_bands) from the corpus itself.

    Estimation (all distributed, all bounded):
      1. PROBE: the ``probe_cap`` docs with the smallest xxhash64(_id) —
         deterministic, order-insensitive, unbiased in content.
      2. COLLISION HISTOGRAM: probe docs are banded against the whole
         corpus at the most sensitive affordable grouping (2 rows/band
         over the full signature — the rescue pass's shape, with the same
         bucket-cap + distinct-first guards), each colliding pair's
         Jaccard is estimated by the shared 15-bit signature estimator,
         and the estimates are binned to 2 dp (the collect is <= 101
         bin counts, never rows).
      3. ALIGNMENT CONFIRMATION: probe collisions at or above
         ``dup_threshold`` (the pipeline's signature-screen floor —
         pairs under it are screened out even when banding catches
         them) are scored by the engine's OWN alignment kernel
         (``scoring.score_pairs``, Myers fast path, banded at
         ``confirm_threshold``); pairs whose normalized similarity
         clears the pipeline's edge threshold are truth, everything
         else is junk. The truth histogram is the est-Jaccard
         distribution of the CONFIRMED pairs. This label source is
         scale-stable: an earlier excess-over-background estimator
         (statistical subtraction) broke down at 1M pages because the
         expected-background term grows with n_docs while the probe's
         truth signal does not — the thickening low-Jaccard truth tail
         vanished into the subtraction and the chooser under-provisioned
         (measured: predicted 0.95, delivered 0.85). Alignment labels
         cost one bounded kernel batch (<= probe_cap * align_top_k
         pairs, per-probe top-k by estimate) and have ~unit precision at
         the 0.8 threshold, so no subtraction is needed.
      4. BACKGROUND HISTOGRAM: probe x ``bg_anchors`` fixed anchor docs
         (broadcast cross join, <= probe_cap * bg_anchors pairs)
         estimate the UNCONDITIONAL random-pair Jaccard distribution,
         which prices each config's collision mass.
      5. ``_select_banding`` picks the cheapest config meeting the
         completeness target within the ``num_perm`` width budget.

    The width budget IS ``num_perm``: signatures are computed once at the
    configured width and banding uses a prefix, so adaptivity costs
    nothing extra per-row — provision ``num_perm`` for the corpus you
    fear, and this function spends only what the data requires (it
    rediscovers 42x3 from the 50k-entity corpus rather than defaulting
    to the widest/most collision-heavy scheme).

    Cost at corpus scale: one banding projection + explode over the
    signature table (the same map-only shape as a rescue pass), a
    bucket-size aggregation keyed by (band, hash), and two bounded
    collects (<= ``truth_collect_cap`` + probe_cap * bg_anchors floats).
    """
    sigs = sig_df.select("_id", "signature")
    rank = F.xxhash64(F.col("_id"))
    probe = (
        sigs.select("_id").orderBy(rank.asc(), F.col("_id"))
        .limit(probe_cap)
    )

    est_bands = num_perm // 2
    bands = sigs.select(
        "_id",
        F.posexplode(
            band_keys_col(F.col("signature"), est_bands, num_perm)
        ).alias("band_id", "band_hash"),
    )
    probe_bands = bands.join(F.broadcast(probe), "_id", "left_semi")
    # Bucket sizes only for keys a probe actually touches: the aggregation
    # shuffles <= probe_cap * est_bands distinct keys, never the corpus's
    # full bucket keyspace.
    probe_keys = probe_bands.select("band_id", "band_hash").distinct()
    sizes = (
        bands.join(F.broadcast(probe_keys), ["band_id", "band_hash"])
        .groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bsz"))
    )
    ok_keys = sizes.where(F.col("bsz") <= bucket_cap).drop("bsz")
    # The probe-collision volume is bounded by probe_cap * est_bands *
    # bucket_cap, but its distinct's hash maps carry two url strings per
    # entry — at 1M docs the session-default partition count left ~500 MB
    # of aggregation state per concurrent task and exhausted the unified
    # pool (measured UNABLE_TO_ACQUIRE at 526k entities). Partition the
    # distinct wide enough that per-task state stays tens of MB
    # regardless of the session default.
    dedup_parts = max(
        sigs.sparkSession.sparkContext.defaultParallelism * 32, 256
    )
    raw = (
        bands.join(F.broadcast(
            probe_bands.join(ok_keys, ["band_id", "band_hash"])
            .select("band_id", "band_hash", F.col("_id").alias("id_1"))
        ), ["band_id", "band_hash"])
        .where(F.col("_id") != F.col("id_1"))
        .select("id_1", F.col("_id").alias("id_2"))
        .repartition(dedup_parts, "id_1", "id_2")
        .distinct()
    )
    # A truth pair whose BOTH members are probes survives the distinct
    # twice — once per orientation (id_1 is always the probe side) — and
    # would be double-weighted in the truth histogram, a measurable bias
    # when probe_cap is a large corpus fraction (ADVICE r4). Keep only the
    # id_1 < id_2 orientation of probe-probe pairs.
    raw = (
        raw.join(
            F.broadcast(
                probe.select(
                    F.col("_id").alias("id_2"), F.lit(True).alias("_p2")
                )
            ),
            "id_2",
            "left",
        )
        .where(F.col("_p2").isNull() | (F.col("id_1") < F.col("id_2")))
        .drop("_p2")
    )
    caches: list = []
    est = _pair_est_jaccard(raw, sigs, num_perm, caches, n_docs=n_docs)
    cand = est.where(F.col("_est_j") >= dup_threshold)
    if align_top_k > 0:
        wtk = Window.partitionBy("id_1").orderBy(
            F.col("_est_j").desc(), F.col("id_2")
        )
        cand = (
            cand.withColumn("_rk", F.row_number().over(wtk))
            .where(F.col("_rk") <= align_top_k)
            .drop("_rk")
        )
    if norm_df is None:
        raise ValueError(
            "choose_banding needs norm_df (id, text) to alignment-confirm "
            "the probe pairs"
        )
    from ..config import unit_cost_params
    from .scoring import score_pairs, with_similarity

    t = norm_df.select(
        F.col(id_col).alias("_jid"), F.col(text_col).alias("_jtext")
    )
    pairs_with_text = (
        cand.join(t.withColumnRenamed("_jid", "id_1"), "id_1")
        .withColumnRenamed("_jtext", "text_1")
        .join(
            t.withColumnRenamed("_jid", "id_2")
            .withColumnRenamed("_jtext", "text_2"),
            "id_2",
        )
        .repartition(
            sigs.sparkSession.sparkContext.defaultParallelism * 2,
            F.xxhash64("id_1", "id_2"),
        )
    )
    scored = with_similarity(
        score_pairs(
            pairs_with_text,
            params or unit_cost_params(),
            sim_threshold=confirm_threshold,
        )
    )
    # persist(), not localCheckpoint(): both frames below are released at
    # the end of this function — a localCheckpoint's blocks are not
    # reachable from DataFrame.unpersist(), so each auto-banding call in a
    # long session would permanently hold block-manager storage (ADVICE
    # r4). The frames are bounded (<= confirmed probe collisions), so
    # keeping lineage costs nothing.
    confirmed = scored.where(
        (~F.col("oversize"))
        & (F.col("similarity") >= confirm_threshold)
    ).select("id_1", "id_2", "_est_j").persist()
    truth_hist = {
        float(r["b"]): float(r["count"])
        for r in confirmed.groupBy(
            F.round("_est_j", 2).alias("b")
        ).count().collect()
    }
    for frame in caches:
        frame.unpersist()

    # Cap-survival measurement: the iid positional model over-predicts
    # DELIVERED completeness because the production pass drops (SN-
    # refines) buckets over its cap, and truth pairs whose only
    # colliding bands land in such generic-shingle mega buckets are
    # lost — a loss that grows with corpus size. For each rows-per-band
    # option, find the confirmed pairs' ACTUAL matching bands (exact
    # slice equality on the signatures, no model), look up those
    # buckets' corpus populations, and measure P(bucket <= production
    # cap | band matches). Corpus cost: one band-explode per rows
    # option, aggregated only over the <= |confirmed| x bands touched
    # keys (broadcast semi-join).
    s_w = sigs.select(
        F.col("_id").alias("id_1"), F.col("signature").alias("_s1")
    )
    s_w2 = sigs.select(
        F.col("_id").alias("id_2"), F.col("signature").alias("_s2")
    )
    with_sigs = (
        confirmed.join(s_w, "id_1").join(s_w2, "id_2").persist()
    )
    cap_survival: dict[int, float] = {}
    for r in rows_options:
        nb_r = num_perm // r
        match_bands = with_sigs.select(
            F.explode(
                F.filter(
                    F.sequence(F.lit(0), F.lit(nb_r - 1)),
                    lambda bi: F.xxhash64(
                        bi, F.slice("_s1", bi * r + 1, r)
                    ) == F.xxhash64(bi, F.slice("_s2", bi * r + 1, r)),
                )
            ).alias("band_id"),
            F.col("_s1").alias("_sig"),
        ).withColumn(
            "band_hash",
            F.xxhash64(
                F.col("band_id"),
                F.expr(f"slice(_sig, band_id * {r} + 1, {r})"),
            ),
        ).select("band_id", "band_hash")
        keys_r = match_bands.distinct()
        bands_r = sigs.select(
            F.posexplode(
                band_keys_col(F.col("signature"), nb_r, nb_r * r)
            ).alias("band_id", "band_hash")
        )
        sizes_r = (
            bands_r.join(F.broadcast(keys_r), ["band_id", "band_hash"])
            .groupBy("band_id", "band_hash")
            .agg(F.count("*").alias("bsz"))
        )
        row = (
            match_bands.join(
                F.broadcast(sizes_r), ["band_id", "band_hash"]
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.when(
                        F.col("bsz") <= prod_bucket_cap, 1
                    ).otherwise(0)
                ).alias("ok"),
            )
            .first()
        )
        cap_survival[r] = (
            row["ok"] / row["n"] if row and row["n"] else 1.0
        )

    anchors = (
        sigs.join(F.broadcast(probe), "_id", "left_semi")
        .orderBy(F.xxhash64(F.col("_id")).asc(), F.col("_id"))
        .limit(bg_anchors)
        .select(F.col("_id").alias("_aid"), F.col("signature").alias("_asig"))
    )
    bg_pairs = (
        sigs.join(F.broadcast(probe), "_id", "left_semi")
        .crossJoin(F.broadcast(anchors))
        .where(F.col("_id") != F.col("_aid"))
        .withColumn(
            "_est_j",
            F.size(
                F.filter(
                    F.zip_with("signature", "_asig", lambda x, y: x == y),
                    lambda m: m,
                )
            ) / F.lit(float(num_perm)),
        )
    )
    bg_hist = {
        float(r["b"]): float(r["count"])
        for r in bg_pairs.groupBy(F.round("_est_j", 2).alias("b"))
        .count().collect()
    }
    confirmed.unpersist()
    with_sigs.unpersist()
    return _select_banding(
        truth_hist, bg_hist, target_completeness, num_perm,
        rows_options=rows_options, bg_cap=bg_cap,
        cap_survival=cap_survival,
    )


def sorted_neighborhood_candidates(
    df: DataFrame,
    id_col: str = "url",
    key_col: str = "host",
    order_col: str = "norm_text",
    window: int = 3,
) -> DataFrame:
    """Linear-cost within-block candidates: sort each block, pair each row
    with its next `window` neighbors. Hot blocks cost O(n·w), never O(n²) —
    this is the explicit skew handling for Zipfian host blocks.
    """
    w = Window.partitionBy(key_col).orderBy(order_col, id_col)
    leads = [F.lead(id_col, i).over(w).alias(f"_n{i}") for i in range(1, window + 1)]
    wide = df.select(F.col(id_col).alias("id_1"), *leads)
    nbrs = F.array_compact(F.array(*[F.col(f"_n{i}") for i in range(1, window + 1)]))
    return (
        wide.select("id_1", F.explode(nbrs).alias("id_2"))
        .select(
            F.least("id_1", "id_2").alias("id_1"),
            F.greatest("id_1", "id_2").alias("id_2"),
        )
        .distinct()
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salt: int = 8
) -> DataFrame:
    """Explicit salted equi-join (J2): append a random-ish salt on the big
    side, explode the small side across all salts, join on (key, salt).
    Deterministic salt (hash of the row) so retries are stable.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salt)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


def skew_salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    target_rows_per_task: int = 100_000,
) -> DataFrame:
    """Data-driven salted equi-join (SURVEY §7.3): salt factors come from
    the big side's key histogram instead of a fixed constant.

    Only HOT keys (count > ``target_rows_per_task``) are salted, each with
    factor ceil(count / target) — so the broadcast factor map holds just
    the hot keys (small by the definition of skew: at 10^12 rows a Zipfian
    host distribution has a handful of keys above any sane target), and
    the small side is replicated only where needed, not n_salt× everywhere
    like the fixed-factor :func:`salted_join`. Cold keys join with salt 0
    on both sides — one extra broadcast-joined column, no row blowup.

    Result equals ``big.join(small, key)`` row-for-row
    (tests/test_ops.py::test_skew_salted_join_equals_plain_join); only the
    physical partitioning changes: no (key) partition exceeds
    ~``target_rows_per_task`` big-side rows.
    """
    hot = (
        big.groupBy(key)
        .agg(F.count("*").alias("_cnt"))
        .where(F.col("_cnt") > target_rows_per_task)
        .select(
            key,
            F.ceil(F.col("_cnt") / F.lit(target_rows_per_task))
            .cast("int")
            .alias("_nf"),
        )
    )
    big2 = (
        big.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_nf").isNotNull(),
                F.pmod(F.xxhash64(*big.columns), F.col("_nf")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_nf")
    )
    small2 = (
        small.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("_nf"), F.lit(1)) - F.lit(1)
                ).cast("array<int>")
            ),
        )
        .drop("_nf")
    )
    return big2.join(small2, [key, "_salt"]).drop("_salt")


def attach_texts(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "norm_text",
    repartition_to: int | None = None,
) -> DataFrame:
    """(id_1, id_2) -> (id_1, text_1, id_2, text_2), repartitioned by pair
    hash so downstream Arrow scoring batches are balanced regardless of how
    skewed the blocking keys were.
    """
    t = df.select(F.col(id_col).alias("_jid"), F.col(text_col).alias("_jtext"))
    out = (
        pairs.join(t.withColumnRenamed("_jid", "id_1"), "id_1")
        .withColumnRenamed("_jtext", "text_1")
        .join(
            t.withColumnRenamed("_jid", "id_2").withColumnRenamed("_jtext", "text_2"),
            "id_2",
        )
        .select("id_1", "text_1", "id_2", "text_2")
    )
    n = repartition_to or out.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return out.repartition(int(n), F.xxhash64("id_1", "id_2"))
