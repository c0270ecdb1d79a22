"""Myers bit-parallel fast path: bit-parity with the Gotoh sweep.

The unit-cost (Levenshtein) configuration — the ER pipeline default —
dispatches align_cost_batch to a blocked Myers bit-vector kernel. These
tests pin that the dispatch fires exactly when it should and that its
results are bit-identical to the general int16 Gotoh sweep (which is
itself fuzzed against the reference implementation in
tests/test_kernel_parity.py, so parity is transitive).
"""

import random

import numpy as np
import pytest

from globalign_spark import kernel
from globalign_spark.config import resolve_params, unit_cost_params
from globalign_spark.kernel import CompiledParams, align_cost_batch

UNIT_CP = CompiledParams(unit_cost_params())
# in-alphabet chars for the default params ('-' is the reserved gap char)
ALPHA = "abcdefghij ACGTxyz.,0123"


def _gotoh(seqs1, seqs2, cp, band=None):
    """The general sweep, with the Myers dispatch forced off."""
    old = kernel._MYERS_ON
    kernel._MYERS_ON = False
    try:
        return align_cost_batch(seqs1, seqs2, cp, band=band)
    finally:
        kernel._MYERS_ON = old


def _rand_seqs(rng, count, max_len, alpha):
    return [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, max_len)))
        for _ in range(count)
    ]


def test_is_unit_cost_detection():
    assert UNIT_CP.is_unit_cost
    scored = CompiledParams(
        resolve_params(
            match_score=2, mismatch_score=-3,
            gap_open_score=-4, gap_extension_score=-2,
        )
    )
    assert not scored.is_unit_cost
    # unit mismatch but with a gap-open surcharge: not plain Levenshtein
    open_pen = CompiledParams(
        resolve_params(mismatch_cost=1, gap_open_cost=2, gap_extension_cost=1)
    )
    assert not open_pen.is_unit_cost


def test_myers_parity_fuzz():
    rng = random.Random(19)
    for trial in range(30):
        B = rng.randint(1, 60)
        s1 = _rand_seqs(rng, B, 300, ALPHA)
        s2 = _rand_seqs(rng, B, 300, ALPHA)
        fast = align_cost_batch(s1, s2, UNIT_CP)
        slow = _gotoh(s1, s2, UNIT_CP)
        assert (fast == slow).all(), trial


def test_myers_word_boundaries():
    """Lengths straddling the 64-bit word edges, both orientations."""
    rng = random.Random(3)
    lens = [1, 2, 63, 64, 65, 127, 128, 129, 191, 192, 193, 300]
    s1, s2 = [], []
    for la in lens:
        for lb in (1, 64, 65, 129, 300):
            s1.append("".join(rng.choice(ALPHA) for _ in range(la)))
            s2.append("".join(rng.choice(ALPHA) for _ in range(lb)))
    assert (align_cost_batch(s1, s2, UNIT_CP) == _gotoh(s1, s2, UNIT_CP)).all()


def test_myers_known_distances():
    s1 = ["kitten", "flaw", "abc", "a", "same"]
    s2 = ["sitting", "lawn", "abc", "b", "same"]
    assert align_cost_batch(s1, s2, UNIT_CP).tolist() == [3, 2, 0, 1, 0]


def test_myers_banded_call_returns_exact():
    """Under the Myers path a banded call returns EXACT costs — strictly
    inside the banded contract (exact in-cap, > cap over-cap)."""
    rng = random.Random(7)
    s1 = _rand_seqs(rng, 40, 200, ALPHA)
    s2 = _rand_seqs(rng, 40, 200, ALPHA)
    full = align_cost_batch(s1, s2, UNIT_CP)
    for band in (5, 30, 500):
        banded = align_cost_batch(s1, s2, UNIT_CP, band=band)
        assert (banded == full).all()


def test_out_of_alphabet_falls_back_to_sentinel_semantics():
    """Chars outside the params alphabet must keep the generic path's
    absurd-cost sentinel behavior, not be silently Levenshtein-scored."""
    params = unit_cost_params(list("ACGT"))
    cp = CompiledParams(params)
    assert cp.is_unit_cost
    s1 = ["ACGT", "ACZT"]  # Z is out-of-alphabet
    s2 = ["ACGA", "ACGT"]
    fast = align_cost_batch(s1, s2, cp)
    slow = _gotoh(s1, s2, cp)
    assert (fast == slow).all()
    # plain Levenshtein would be 1; the absurd-cost sentinel pushes the
    # out-of-alphabet substitution off the optimal path
    assert fast[1] > 1


def test_myers_swapped_orientation():
    """n_max > m_max swaps pattern/text; Levenshtein is symmetric."""
    rng = random.Random(11)
    s1 = _rand_seqs(rng, 30, 50, ALPHA)
    s2 = _rand_seqs(rng, 30, 400, ALPHA)
    assert (align_cost_batch(s1, s2, UNIT_CP) == _gotoh(s1, s2, UNIT_CP)).all()


def test_myers_single_pair_and_empty_batch():
    assert align_cost_batch(["ab"], ["ba"], UNIT_CP)[0] == 2
    assert align_cost_batch([], [], UNIT_CP).shape == (0,)
    with pytest.raises(ValueError):
        align_cost_batch([""], ["a"], UNIT_CP)


def test_score_pairs_chunking_budget_respects_myers():
    """The scorer's chunker uses the bigger budget only on the Myers path."""
    from globalign_spark.pipeline import scoring

    assert scoring.BATCH_CELL_BUDGET == 1 << 24
    # presence check only: the budget branch keys off cp.is_unit_cost and
    # kernel._MYERS_ON; both are exercised end-to-end by the e2e suite.
    rng = random.Random(5)
    t1 = np.array(_rand_seqs(rng, 64, 120, ALPHA), dtype=object)
    t2 = np.array(_rand_seqs(rng, 64, 120, ALPHA), dtype=object)
    cost, score, oversize, over_band = scoring._score_chunk(
        t1, t2, UNIT_CP, cell_cap=1 << 20, sim_threshold=0.2
    )
    ref = align_cost_batch(list(t1), list(t2), UNIT_CP)
    got_ok = ~oversize & ~over_band
    assert (cost[got_ok] == ref[got_ok]).all()
