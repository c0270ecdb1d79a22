"""Property-based kernel invariants (hypothesis).

Complements the seeded fuzz in test_kernel_parity.py: hypothesis explores
adversarial shapes (empty-ish, very unequal lengths, single-char alphabets)
and shrinks failures to minimal cases.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from globalign_spark.config import resolve_params, unit_cost_params
from globalign_spark.kernel import CompiledParams, align_cost_batch

UNIT = unit_cost_params()
UNIT_CP = CompiledParams(UNIT)
SCORED = resolve_params(
    match_score=2, mismatch_score=-3, gap_open_score=-4, gap_extension_score=-2
)
SCORED_CP = CompiledParams(SCORED)

seq = st.text(alphabet="ACGT", min_size=1, max_size=48)


def _plain_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[-1]


@settings(max_examples=200, deadline=None)
@given(a=seq, b=seq)
def test_unit_cost_equals_levenshtein(a, b):
    assert align_cost_batch([a], [b], UNIT_CP)[0] == _plain_levenshtein(a, b)


@settings(max_examples=100, deadline=None)
@given(pairs=st.lists(st.tuples(seq, seq), min_size=1, max_size=12))
def test_batch_equals_singles(pairs):
    """Batching (shared padded lattices) never changes any pair's cost."""
    s1 = [a for a, _ in pairs]
    s2 = [b for _, b in pairs]
    batched = align_cost_batch(s1, s2, SCORED_CP)
    for i, (a, b) in enumerate(pairs):
        assert batched[i] == align_cost_batch([a], [b], SCORED_CP)[0]


@settings(max_examples=100, deadline=None)
@given(a=seq, b=seq, band=st.integers(min_value=1, max_value=60))
def test_banded_invariants(a, b, band):
    """banded >= full always; equal whenever full <= band * min_gap_step;
    certified (> cap) whenever full > cap."""
    cp = UNIT_CP
    full = align_cost_batch([a], [b], cp)[0]
    banded = align_cost_batch([a], [b], cp, band=band)[0]
    cap = band * min(cp.dele_alpha_min, cp.ins_alpha_min)
    assert banded >= full
    if full <= cap:
        assert banded == full
    else:
        assert banded > cap


@settings(max_examples=100, deadline=None)
@given(a=seq, b=seq)
def test_symmetry_of_unit_cost(a, b):
    """Levenshtein configuration is symmetric in its arguments."""
    assert (
        align_cost_batch([a], [b], UNIT_CP)[0]
        == align_cost_batch([b], [a], UNIT_CP)[0]
    )


@settings(max_examples=100, deadline=None)
@given(a=seq, b=seq)
def test_triangle_bounds(a, b):
    """abs(len(a)-len(b)) <= cost <= max(len) under unit costs."""
    c = align_cost_batch([a], [b], UNIT_CP)[0]
    assert abs(len(a) - len(b)) <= c <= max(len(a), len(b))
