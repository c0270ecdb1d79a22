"""Spark scoring stage == numpy kernel == reference, end to end."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from globalign_spark.config import resolve_params, unit_cost_params
from globalign_spark.kernel import CompiledParams, align_cost_batch
from globalign_spark.pipeline.scoring import score_pairs, with_similarity
from globalign_spark.sources.fixtures import pages_df


def _random_pairs(n, seed=7):
    rng = np.random.Generator(np.random.Philox(seed))
    alpha = "ACGT"
    pairs = []
    for _ in range(n):
        l1 = int(rng.integers(1, 120))
        l2 = int(rng.integers(1, 120))
        s1 = "".join(alpha[i] for i in rng.integers(0, 4, l1))
        s2 = "".join(alpha[i] for i in rng.integers(0, 4, l2))
        pairs.append((s1, s2))
    return pairs


@pytest.mark.parametrize(
    "params",
    [
        resolve_params(alphabet="ACGT"),
        resolve_params(alphabet="ACGT", match_score=3, mismatch_score=-4,
                       gap_open_score=-5, gap_extension_score=-2),
        unit_cost_params("ACGT"),
    ],
    ids=["defaults", "custom-scores", "unit-cost"],
)
def test_spark_scorer_matches_kernel(spark, params):
    pairs = _random_pairs(60)
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "pair_id long, text_1 string, text_2 string",
    ).repartition(4)
    got = {
        r.pair_id: (r.cost, r.score)
        for r in score_pairs(df, params).collect()
    }
    cp = CompiledParams(params)
    exp_cost = align_cost_batch([a for a, _ in pairs], [b for _, b in pairs], cp)
    for i, (a, b) in enumerate(pairs):
        exp_score = cp.final_score(
            exp_cost[i], np.int64(len(a)), np.int64(len(b))
        )
        assert got[i] == (exp_cost[i], exp_score), (a, b)


def test_spark_scorer_matches_reference(spark, reference_align):
    pairs = _random_pairs(25, seed=13)
    params = resolve_params(alphabet="ACGT")
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "pair_id long, text_1 string, text_2 string",
    )
    got = {r.pair_id: (r.cost, r.score) for r in score_pairs(df, params).collect()}
    for i, (a, b) in enumerate(pairs):
        ref = reference_align(seq_1=a, seq_2=b)
        assert got[i] == (ref.cost, ref.score), (a, b)


def test_unit_cost_is_levenshtein(spark):
    """With mismatch=1/gap_open=0/gap_ext=1 the kernel cost IS the classic
    Levenshtein distance — the property the DuckDB oracle relies on."""
    import duckdb

    pairs = _random_pairs(40, seed=99)
    params = unit_cost_params("ACGT")
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "pair_id long, text_1 string, text_2 string",
    )
    got = {r.pair_id: r.cost for r in score_pairs(df, params).collect()}
    for i, (a, b) in enumerate(pairs):
        exp = duckdb.sql(f"select levenshtein('{a}', '{b}')").fetchone()[0]
        assert got[i] == exp


def test_oversize_routed_not_dropped(spark):
    params = unit_cost_params("AB")
    df = spark.createDataFrame(
        [(0, "A" * 3000, "B" * 3000), (1, "AB", "AB")],
        "pair_id long, text_1 string, text_2 string",
    )
    rows = {r.pair_id: r for r in
            score_pairs(df, params, cell_cap=1_000_000,
                        myers_cap_mult=1).collect()}
    assert rows[0].oversize and rows[0].cost is None
    assert not rows[1].oversize and rows[1].cost == 0


def test_similarity_on_fixture_pages(spark):
    """Within-entity variant pairs must score near-identical (sim >= 0.8),
    cross-entity pairs low — the signal the ER threshold relies on."""
    pages = pages_df(spark, n_entities=40, seed=5).cache()
    a = pages.select(F.col("url").alias("url_1"), F.col("text").alias("text_1"),
                     F.col("entity_id").alias("e1"))
    b = pages.select(F.col("url").alias("url_2"), F.col("text").alias("text_2"),
                     F.col("entity_id").alias("e2"))
    cand = a.join(b, F.col("url_1") < F.col("url_2"))
    scored = with_similarity(score_pairs(cand, unit_cost_params()))
    rows = scored.collect()
    same = [r.similarity for r in rows if r.e1 == r.e2]
    diff = [r.similarity for r in rows if r.e1 != r.e2]
    assert same and diff
    assert min(same) > 0.75
    assert max(diff) < 0.6
    pages.unpersist()


def test_fallback_null_text_not_dropped(spark):
    """ADVICE r2: a NULL text_1/text_2 must NOT vanish from
    score_pairs_with_fallback — the all-pairs contract routes it through
    the gotoh branch with similarity 0.0."""
    from globalign_spark.pipeline.scoring import score_pairs_with_fallback

    params = unit_cost_params("AB")
    df = spark.createDataFrame(
        [(0, 10, None, "AB"), (1, 11, "AB", None), (2, 12, None, None),
         (3, 13, "AB", "AB"), (4, 14, "A" * 200, "B" * 200)],
        "id_1 long, id_2 long, text_1 string, text_2 string",
    )
    rows = {r.id_1: r for r in
            score_pairs_with_fallback(df, params, cell_cap=10_000,
                                      myers_cap_mult=1).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}, "no pair may be dropped"
    for i in (0, 1, 2):
        assert rows[i].method == "gotoh" and rows[i].similarity == 0.0
    assert rows[3].similarity == 1.0
    assert rows[4].method == "shingle"


def test_myers_cap_mult_routing(spark):
    """Unit-cost configs admit cell_cap*64 cells exactly (Myers kernel:
    no lattice, ~64 cells/word-op); mult=1 pins the literal cap; non-unit
    configs never get the multiplier."""
    from globalign_spark.pipeline.scoring import (
        effective_cell_cap,
        score_pairs_with_fallback,
    )

    unit = unit_cost_params("AB")
    affine = resolve_params(alphabet="AB", match_score=2, mismatch_score=-3,
                            gap_open_score=-4, gap_extension_score=-2)
    assert effective_cell_cap(unit, 10_000) == 640_000
    assert effective_cell_cap(unit, 10_000, myers_cap_mult=1) == 10_000
    assert effective_cell_cap(affine, 10_000) == 10_000

    # 200x200 = 40k cells: over the 10k literal cap, inside the 640k
    # Myers-effective cap -> exact gotoh route by default for unit cost.
    df = spark.createDataFrame(
        [(0, 1, "AB" * 100, "AB" * 100)],
        "id_1 long, id_2 long, text_1 string, text_2 string",
    )
    row = score_pairs_with_fallback(df, unit, cell_cap=10_000).collect()[0]
    assert row.method == "gotoh" and row.similarity == 1.0
    row = score_pairs_with_fallback(
        df, affine, cell_cap=10_000
    ).collect()[0]
    assert row.method == "shingle"


def test_out_of_alphabet_pair_not_admitted_at_myers_cap(spark):
    """The widened (64x) admission cap only applies to pairs the Myers
    kernel will actually run — both texts in-alphabet. A pair with one
    out-of-alphabet character and cells between the literal and widened
    caps must NOT run the dense sweep at 64x its budget: the fallback
    routes it to the linear shingle branch, and score_pairs marks it
    oversize (NULL + lineage), while in-alphabet neighbors in the same
    chunk keep their exact gotoh route."""
    from globalign_spark.pipeline.scoring import score_pairs_with_fallback

    unit = unit_cost_params("AB")
    good = "AB" * 100          # 200 chars, in-alphabet
    bad = "AB" * 99 + "AZ"     # 200 chars, 'Z' outside {A,B}
    df = spark.createDataFrame(
        [(0, 1, good, good), (2, 3, bad, good)],
        "id_1 long, id_2 long, text_1 string, text_2 string",
    )
    # 200x200 = 40k cells: over the 10k literal cap, inside the 640k
    # Myers-effective cap.
    rows = {
        r.id_1: r
        for r in score_pairs_with_fallback(
            df, unit, cell_cap=10_000
        ).collect()
    }
    assert rows[0].method == "gotoh" and rows[0].similarity == 1.0
    assert rows[2].method == "shingle"

    scored = {
        r.id_1: r
        for r in score_pairs(df, unit, cell_cap=10_000).collect()
    }
    assert scored[0].cost == 0 and not scored[0].oversize
    assert scored[2].cost is None and scored[2].oversize


def test_out_of_alphabet_small_pair_keeps_dense_sentinel_cost(spark):
    """Under the literal cap, an out-of-alphabet pair still runs the
    dense sweep with the reference's absurd-cost sentinel semantics —
    identical costs whether or not its chunkmates take the Myers path."""
    unit = unit_cost_params("AB")
    df = spark.createDataFrame(
        [(0, 1, "ABZ", "ABA"), (2, 3, "ABA", "ABA")],
        "id_1 long, id_2 long, text_1 string, text_2 string",
    )
    rows = {r.id_1: r for r in score_pairs(df, unit).collect()}
    assert rows[2].cost == 0
    cp = CompiledParams(unit)
    expect = align_cost_batch(["ABZ"], ["ABA"], cp)[0]
    assert rows[0].cost == expect
