"""Bit-parity of the numpy kernel vs the reference implementation.

Golden values ported from /root/reference/tests/globaligner_test.py:58-347
(score/cost asserted there at :382-383) plus the tutorial examples
(/root/reference/reference/tutorial.qmd). The fuzz suite imports the
reference itself as the oracle.
"""

import random

import numpy as np
import pytest

from globalign_spark.config import resolve_params, unit_cost_params
from globalign_spark.kernel import (
    CompiledParams,
    _dp_tables,
    align_full,
    align_score_batch,
)

GOLDEN = [
    # seq_1, seq_2, match, mismatch, gap_open, gap_ext, score, cost
    ("TT", "TA", 3, -4, -5, -2, -1, 7),
    ("TAAAGCTAA", "TAGCTC", 2, -3, -5, -2, -9, 24),
    ("TGGATGAGGCTCCACGCACTAA", "GATTGGTGAGGCTCAGCAT", 2, -3, -5, -2, -15, 56),
    ("CGGTCTTAGCATATGTTGGCATAC", "ATTAGCATCATAGTGGA", 2, -3, -5, -2, -21, 62),
    ("CGGTCTTAGCATATGTTGGCATAC", "ATTAGCATCATAGTGGA", 4, -5, -3, -5, -20, 102),
    ("GTAGGCGGTC", "CAGCTGC", 1, -2, -5, -2, -18, 28),
    ("CTGTACCG", "CGGAACAGTCCGAT", 1, -2, -5, -2, -18, 26),
    ("GGAGGACGTT", "GAG", 1, -2, -5, -2, -21, 31),
    # string-typed args (reference accepts str-coercible params)
    ("GGAGGACGTT", "GAG", "1", "-2", "-5", "-2", -21, 31),
]


@pytest.mark.parametrize("s1,s2,ma,mi,go,ge,exp_score,exp_cost", GOLDEN)
def test_golden_scores(s1, s2, ma, mi, go, ge, exp_score, exp_cost):
    p = resolve_params(
        alphabet=sorted(set(s1) | set(s2)),
        match_score=ma, mismatch_score=mi,
        gap_open_score=go, gap_extension_score=ge,
    )
    cost, score = align_score_batch([s1], [s2], p)
    assert cost[0] == exp_cost
    assert score[0] == exp_score


def test_golden_dp_table():
    """Full forward-table golden from /root/reference/tests/globaligner_test.py:6-37."""
    costing = {
        "A": {"A": 0, "G": 3, "-": 3},
        "G": {"A": 3, "G": 0, "-": 3},
        "-": {"A": 2, "G": 2, "-": 0},
    }
    expected = [
        [(0, 7, 7), (6, 3, 9), (5, 5, 11)],
        [(4, 10, 4), (3, 7, 7), (3, 6, 9)],
        [(10, 13, 7), (4, 10, 7), (6, 7, 7)],
    ]

    # Build params with this exact costing matrix via a scoring round-trip.
    from globalign_spark.config import AlignParams, _freeze
    from globalign_spark.matrices import costing_mat_to_scoring_mat

    scoring = costing_mat_to_scoring_mat(costing, max_score=2)
    p = AlignParams(
        scoring_mat=_freeze(scoring), costing_mat=_freeze(costing),
        gap_open_score=-1, gap_open_cost=1, max_score=2,
    )
    M, I, D = _dp_tables("AG", "GA", CompiledParams(p))
    # The reference test hand-initializes the border with arbitrary filler
    # (not make_dp_array's big_num), so compare the interior cells it pins
    # plus the real gap-chain border values.
    for i in (1, 2):
        for j in (1, 2):
            assert (int(M[i][j]), int(I[i][j]), int(D[i][j])) == expected[i][j]
    assert int(I[0][1]) == expected[0][1][1] and int(I[0][2]) == expected[0][2][1]
    assert int(D[1][0]) == expected[1][0][2] and int(D[2][0]) == expected[2][0][2]


def test_tiefree_traceback_strings():
    p = resolve_params(alphabet="ACGT")  # defaults: 2/-3/-4/-2
    r = align_full("ACGT", "AGT", p)
    assert (r["seq_1_aligned"], r["middle_part"], r["seq_2_aligned"]) == (
        "ACGT", "| ||", "A-GT")
    assert r["score"] == 0 and r["cost"] == 7

    p2 = resolve_params(alphabet="ACGT", match_score=1, mismatch_score=-1,
                        gap_open_score=-2, gap_extension_score=-1)
    r2 = align_full("CCTGAA", "GCCGA", p2)
    assert r2["score"] == -2 and r2["cost"] == 8


def test_fuzz_vs_reference(reference_align):
    rng = random.Random(42)
    for t in range(80):
        s1 = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 100)))
        s2 = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 100)))
        mode = rng.choice(["score", "cost", "default"])
        kw = {}
        if mode == "score":
            kw = dict(
                match_score=rng.randint(1, 6),
                mismatch_score=-rng.randint(1, 6),
                gap_open_score=-rng.randint(0, 8),
                gap_extension_score=-rng.randint(1, 6),
            )
        elif mode == "cost":
            kw = dict(
                mismatch_cost=rng.randint(1, 7),
                gap_open_cost=rng.randint(0, 8),
                gap_extension_cost=rng.randint(1, 7),
            )
        ref = reference_align(seq_1=s1, seq_2=s2, **kw)
        p = resolve_params(alphabet="ACGT", **kw)
        cost, score = align_score_batch([s1], [s2], p)
        assert cost[0] == ref.cost and score[0] == ref.score, (t, s1, s2, kw)


def test_blosum62_odd_max_score(reference_align):
    """BLOSUM62 max=11 exercises the floor/ceil delta split."""
    p1 = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"
    p2 = "MKTAYIARQRQISFVKSHFSRQLEERLGLIEV"
    ref = reference_align(seq_1=p1, seq_2=p2, scoring_mat_name="BLOSUM62")
    p = resolve_params(scoring_mat_name="BLOSUM62")
    cost, score = align_score_batch([p1], [p2], p)
    assert cost[0] == ref.cost and score[0] == ref.score


def test_batch_equals_single():
    rng = random.Random(3)
    p = resolve_params(alphabet="ACGT")
    s1s = ["".join(rng.choice("ACGT") for _ in range(rng.randint(1, 250)))
           for _ in range(40)]
    s2s = ["".join(rng.choice("ACGT") for _ in range(rng.randint(1, 250)))
           for _ in range(40)]
    cb, sb = align_score_batch(s1s, s2s, p)
    for i in range(40):
        c1, s1 = align_score_batch([s1s[i]], [s2s[i]], p)
        assert (c1[0], s1[0]) == (cb[i], sb[i])


def test_traceback_cost_consistency():
    """Traceback string must re-price to the reported cost."""
    rng = random.Random(11)
    p = resolve_params(alphabet="ACGT", mismatch_cost=5, gap_open_cost=4,
                       gap_extension_cost=3)
    costing = p.costing_dict()
    for _ in range(25):
        s1 = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 60)))
        s2 = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 60)))
        r = align_full(s1, s2, p)
        a, b = r["seq_1_aligned"], r["seq_2_aligned"]
        assert a.replace("-", "") == s1 and b.replace("-", "") == s2
        total, in_gap1, in_gap2 = 0, False, False
        for x, y in zip(a, b):
            if x == "-":
                total += costing["-"][y] + (0 if in_gap1 else p.gap_open_cost)
                in_gap1, in_gap2 = True, False
            elif y == "-":
                total += costing[x]["-"] + (0 if in_gap2 else p.gap_open_cost)
                in_gap1, in_gap2 = False, True
            else:
                total += costing[x][y]
                in_gap1 = in_gap2 = False
        assert total == r["cost"], (s1, s2, a, b, total, r["cost"])


def test_unit_cost_is_levenshtein():
    import duckdb

    p = unit_cost_params()
    pairs = [("kitten", "sitting"), ("abc", "abc"), ("a", "b"),
             ("spark engine", "sparc enjine"), ("x", "yyyyyy")]
    c, _ = align_score_batch([a for a, _ in pairs], [b for _, b in pairs], p)
    for (a, b), got in zip(pairs, c):
        lev = duckdb.sql(f"select levenshtein('{a}','{b}')").fetchone()[0]
        assert got == lev


def test_banded_exactness_and_certification():
    """Ukkonen-banded batch scoring: exact for every pair whose true cost
    is within band * min_gap_step; certified (> cap) otherwise; never
    below the full-DP cost. Exercises band-edge (|m-n| == band) pairs,
    which once leaked a stale diagonal column."""
    import random

    from globalign_spark.kernel import CompiledParams, align_cost_batch
    from globalign_spark.config import resolve_params

    rng = random.Random(11)

    def mk(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    def mutate(s, edits):
        s = list(s)
        for _ in range(edits):
            op = rng.choice("ids")
            i = rng.randrange(len(s))
            if op == "i":
                s.insert(i, rng.choice("ACGT"))
            elif op == "d" and len(s) > 2:
                del s[i]
            else:
                s[i] = rng.choice("ACGT")
        return "".join(s)

    for params in (
        unit_cost_params(),
        resolve_params(match_score=2, mismatch_score=-3,
                       gap_open_score=-4, gap_extension_score=-2),
    ):
        cp = CompiledParams(params)
        min_step = min(cp.dele_alpha_min, cp.ins_alpha_min)
        s1, s2 = [], []
        for _ in range(150):
            base = mk(rng.randint(20, 200))
            s1.append(base)
            s2.append(mutate(base, rng.randint(0, 40)))
        for _ in range(40):
            s1.append(mk(rng.randint(20, 200)))
            s2.append(mk(rng.randint(20, 200)))
        # band-edge pairs: |m - n| exactly == band for band=10
        for _ in range(10):
            base = mk(rng.randint(40, 120))
            s1.append(base + mk(10))
            s2.append(base)
        full = align_cost_batch(s1, s2, cp)
        for band in (5, 10, 30, 500):
            banded = align_cost_batch(s1, s2, cp, band=band)
            cap = band * min_step
            exact = full <= cap
            assert (banded[exact] == full[exact]).all()
            assert (banded[~exact] > cap).all()
            assert (banded >= full).all()
