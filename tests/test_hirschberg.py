"""Linear-space traceback (hirschberg.py) vs the dense kernel.

Contract (module docstring of hirschberg.py): bit-equal cost/score to
kernel.align_full on every input; the emitted alignment must be VALID
(re-scoring the emitted strings with the independent run-scan evaluator
reproduces exactly that optimal cost). String equality is not asserted
on tie-ambiguous inputs — the reference itself randomizes tie order
(/root/reference/src/globalign/globaligner.py:595-685)."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from globalign_spark.config import resolve_params, unit_cost_params
from globalign_spark.hirschberg import align_full_linear, alignment_cost
from globalign_spark.kernel import align_full

UNIT = unit_cost_params()
# The reference's default DNA scheme (tutorial.qmd): match 2 / mismatch -3 /
# gap open -4 / gap extend -2, score-space -> cost-space transform applied
# by resolve_params.
SCORED = resolve_params(
    match_score=2, mismatch_score=-3, gap_open_score=-4, gap_extension_score=-2
)
# Harsh-open scheme: long gaps cheap to extend, expensive to start —
# exercises the D-run-crossing (DD-join) branch hard. NOTE: with a gap
# open this large relative to (max_cost+1)*max(m,n), the dense kernel's
# big_num sentinel — the reference's exact formula,
# /root/reference/src/globalign/globaligner.py big_num — can undercut the
# true optimum on short pairs, so align_full returns the reference's
# sentinel-contaminated value there while align_full_linear returns the
# mathematical Gotoh optimum. Parity with align_full is therefore
# asserted only when the dense result equals the trusted brute optimum.
GAPPY = resolve_params(
    match_score=1, mismatch_score=-1, gap_open_score=-9, gap_extension_score=-1
)
PARAM_SETS = [UNIT, SCORED, GAPPY]

seq = st.text(alphabet="ACGT", min_size=0, max_size=60)


def _brute_gotoh(a: str, b: str, params) -> int:
    """Trusted O(m*n) Gotoh with true infinities (no sentinel), row-major
    python — slow, only for test sizes."""
    from globalign_spark.kernel import CompiledParams

    cp = CompiledParams(params)
    INF = float("inf")
    go = cp.go
    m, n = len(a), len(b)
    M = [[INF] * (n + 1) for _ in range(m + 1)]
    I = [[INF] * (n + 1) for _ in range(m + 1)]
    D = [[INF] * (n + 1) for _ in range(m + 1)]
    M[0][0] = 0
    acc = go
    for j in range(1, n + 1):
        acc += int(cp.dele[ord(b[j - 1])])
        I[0][j] = acc
    acc = go
    for i in range(1, m + 1):
        acc += int(cp.ins[ord(a[i - 1])])
        D[i][0] = acc
    for i in range(1, m + 1):
        ic = int(cp.ins[ord(a[i - 1])])
        for j in range(1, n + 1):
            dc = int(cp.dele[ord(b[j - 1])])
            sc = int(cp.sub[ord(a[i - 1]), ord(b[j - 1])])
            M[i][j] = min(M[i - 1][j - 1], I[i - 1][j - 1], D[i - 1][j - 1]) + sc
            I[i][j] = min(M[i][j - 1] + go, D[i][j - 1] + go, I[i][j - 1]) + dc
            D[i][j] = min(M[i - 1][j] + go, I[i - 1][j] + go, D[i - 1][j]) + ic
    return int(min(M[m][n], I[m][n], D[m][n]))


def _check(a: str, b: str, params) -> None:
    brute = _brute_gotoh(a, b, params)
    dense = align_full(a, b, params)
    lin = align_full_linear(a, b, params)
    assert lin["cost"] == brute
    # validity: emitted columns reconstruct both inputs ...
    assert lin["seq_1_aligned"].replace("-", "") == a
    assert lin["seq_2_aligned"].replace("-", "") == b
    # ... and re-score independently to exactly the optimal cost.
    assert (
        alignment_cost(lin["seq_1_aligned"], lin["seq_2_aligned"], params)
        == brute
    )
    # Parity with the dense kernel wherever the reference's big_num
    # sentinel does not leak (always true for the engine's production
    # configs; see GAPPY note above).
    if dense["cost"] == brute:
        assert lin["cost"] == dense["cost"]
        assert lin["score"] == dense["score"]


@settings(max_examples=150, deadline=None)
@given(a=st.text(alphabet="ACGT", min_size=1, max_size=60),
       b=st.text(alphabet="ACGT", min_size=1, max_size=60))
def test_linear_matches_dense_unit(a, b):
    _check(a, b, UNIT)


@settings(max_examples=150, deadline=None)
@given(a=st.text(alphabet="ACGT", min_size=1, max_size=60),
       b=st.text(alphabet="ACGT", min_size=1, max_size=60))
def test_linear_matches_dense_affine(a, b):
    _check(a, b, SCORED)


@settings(max_examples=150, deadline=None)
@given(a=st.text(alphabet="ACGT", min_size=1, max_size=60),
       b=st.text(alphabet="AC", min_size=1, max_size=60))
def test_linear_matches_dense_gappy_skewed_alphabet(a, b):
    """Tiny alphabet + harsh opens: many long gap runs, many DD joins."""
    _check(a, b, GAPPY)


def test_linear_seeded_sweep_all_param_sets():
    """Dense seeded sweep across shapes, incl. very unequal lengths —
    the DD-join / tb=te=0 nesting paths need length ratios >= 4 to fire."""
    rng = random.Random(7)
    for params in PARAM_SETS:
        for _ in range(120):
            la = rng.randint(1, 90)
            lb = rng.choice([1, 2, la // 4 + 1, la, la * 3 + 1])
            a = "".join(rng.choice("ACGT") for _ in range(la))
            b = "".join(rng.choice("ACGT") for _ in range(lb))
            _check(a, b, params)


def test_linear_edge_shapes():
    for params in PARAM_SETS:
        _check("A", "A", params)
        _check("A", "T", params)
        _check("A", "TTTTTTTT", params)
        _check("ACGTACGT", "G", params)
        _check("ACGT", "ACGT", params)
        _check("AAAA", "TTTT", params)


def test_linear_long_pair_low_memory():
    """A pair whose dense lattices would be ~0.9 GB (6000x6000 int64 x3)
    aligns in rolling rows; sanity-check cost against the banded dense
    cost-only kernel is skipped (full dense would defeat the point) —
    validity is certified by the independent evaluator instead."""
    rng = random.Random(11)
    base = "".join(rng.choice("ACGT") for _ in range(6000))
    mutated = list(base)
    for _ in range(300):
        p = rng.randrange(len(mutated))
        mutated[p] = rng.choice("ACGT")
    other = "".join(mutated)[100:]  # + a structural 100-char shift
    lin = align_full_linear(base, other, SCORED)
    assert lin["seq_1_aligned"].replace("-", "") == base
    assert lin["seq_2_aligned"].replace("-", "") == other
    assert (
        alignment_cost(lin["seq_1_aligned"], lin["seq_2_aligned"], SCORED)
        == lin["cost"]
    )
    # the alignment must actually be good: <= 300 substitutions' worth of
    # mismatch columns plus the one 100-char gap run.
    assert lin["middle_part"].count("*") <= 300
    assert lin["seq_2_aligned"].count("-") >= 100


def test_api_linear_escape_hatch(monkeypatch):
    """GA_LINEAR_TRACEBACK=1 lifts the reference's 20M-cell admission cap
    in find_global_alignment and routes through hirschberg; default
    behavior (reference parity) still hard-errors."""
    from globalign_spark.api import find_global_alignment

    rng = random.Random(3)
    a = "".join(rng.choice("ACGT") for _ in range(5000))
    b = a[:4500] + "".join(rng.choice("ACGT") for _ in range(500))
    assert len(a) * len(b) >= 20_000_000
    monkeypatch.delenv("GA_LINEAR_TRACEBACK", raising=False)
    with pytest.raises(RuntimeError, match="too long"):
        find_global_alignment(seq_1=a, seq_2=b, match_score=2,
                              mismatch_score=-3, gap_open_score=-4,
                              gap_extension_score=-2)
    monkeypatch.setenv("GA_LINEAR_TRACEBACK", "1")
    res = find_global_alignment(seq_1=a, seq_2=b, match_score=2,
                                mismatch_score=-3, gap_open_score=-4,
                                gap_extension_score=-2)
    assert res.seq_1_aligned.replace("-", "") == a
    assert res.seq_2_aligned.replace("-", "") == b
    assert alignment_cost(res.seq_1_aligned, res.seq_2_aligned, SCORED) == res.cost
    # identical first 4500 chars => at least that many match columns
    assert res.middle_part.count("|") >= 4400


def test_evaluator_rejects_malformed():
    with pytest.raises(ValueError):
        alignment_cost("A-", "A", UNIT)
    with pytest.raises(ValueError):
        alignment_cost("-", "-", UNIT)
