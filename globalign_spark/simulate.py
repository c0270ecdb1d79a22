"""Reference-compatible sequence simulators (S6/S7 in SURVEY.md §2.1).

Single-pair, driver-side twins of the reference's random-sequence
generators (/root/reference/src/globalign/start.py:691-867), reproducing
their seeded outputs exactly — they drive CPython's global ``random`` with
the same call sequence, so e.g. ``draw_random_seq(list("ACTG"), 7, 10,
seed=19) == "GTTCGCA"`` matches the reference's own golden tests
(tests/start_test.py:68-115).

The distributed corpus generator (sources/fixtures.py) deliberately does
NOT use these: per-row reproducibility under repartitioning needs
counter-based per-row RNG streams, not a shared global seed (FIXTURES.md).
These exist for API completeness and for generating small labeled pairs
with the reference's exact duplicate-simulation semantics: copy seq_1,
resize to the seq_2 length budget, then add ceil(divergence*len/3) each of
insert/delete/substitute edits, biased toward the ends with probability
(1 - divergence)**(1/k) so low divergence preserves the original as a
subsequence.
"""

from __future__ import annotations

import math
import random


def draw_random_seq(
    alphabet: list[str],
    min_len: int,
    max_len: int,
    seed: int | None = None,
) -> str:
    """Seeded random sequence over ``alphabet`` with length drawn uniformly
    from [min_len, max_len]. Bit-identical to the reference for equal seeds
    (same global-``random`` call sequence: seed -> randint -> choices)."""
    random.seed(seed)
    if min_len < 0:
        print("min_len must be a non-negative integer.")
        raise ValueError
    try:
        k = random.randint(a=min_len, b=max_len)
    except ValueError:
        print(
            "min_len and max_len must be non-negative integers with "
            "max_len >= min_len."
        )
        raise
    try:
        picks = random.choices(population=alphabet, k=k)
    except (IndexError, TypeError):
        print("alphabet must be a non-empty list of strings")
        raise
    return "".join(picks)


def _edit_index(p_ends: float, length: int, insert: bool) -> int:
    """One end-biased edit position, consuming the same random draws as the
    reference: one uniform for the end-vs-middle decision, plus one randint
    when the edit lands in the middle."""
    r = random.random()
    if r < p_ends / 2:
        return 0
    if insert:
        if r < p_ends:
            return length
        return random.randint(a=min(1, length - 1), b=max(1, length - 1))
    if r < p_ends:
        return length - 1
    start = min(1, length - 1)
    return random.randint(a=start, b=max(start, length - 2))


def draw_two_random_seqs(
    alphabet: list,
    min_len_seq_1: int,
    max_len_seq_1: int,
    min_len_seq_2: int,
    max_len_seq_2: int,
    divergence: float,
    seed_1: int | None = None,
    seed_2: int | None = None,
) -> tuple[str, str]:
    """Correlated pair: seq_2 is seq_1 resized to its own length budget
    plus ``ceil(divergence * len_seq_2 / 3)`` extra insertions, deletions,
    and substitutions each, end-biased per the reference's
    ``(1-divergence)**(1/k)`` rule. Deterministic given both seeds except
    for substitution letters (the reference draws those unseeded —
    start.py:836-844 — and we mirror that)."""
    seq_1 = draw_random_seq(alphabet, min_len_seq_1, max_len_seq_1, seed_1)
    work = list(seq_1)

    random.seed(seed_2)
    len_2 = random.randint(a=min_len_seq_2, b=max_len_seq_2)
    delta = len_2 - len(seq_1)
    extra = math.ceil(divergence * len_2 / 3)
    n_ins = max(0, delta) + extra
    n_del = max(0, -delta) + extra
    n_sub = extra

    if n_ins > 0:
        # NOTE: reseeds the global stream with seed_2, as the reference does.
        ins_letters = draw_random_seq(alphabet, n_ins, n_ins, seed_2)
        p_ends = (1 - divergence) ** (1 / n_ins)
        for i in range(n_ins):
            work.insert(_edit_index(p_ends, len(work), insert=True),
                        ins_letters[i])

    if n_del > 0:
        p_ends = (1 - divergence) ** (1 / n_del)
        for _ in range(n_del):
            work.pop(_edit_index(p_ends, len(work), insert=False))

    if n_sub > 0:
        # Unseeded, per the reference: substitution letters are entropy.
        sub_letters = draw_random_seq(alphabet, n_sub, n_sub)
        p_ends = (1 - divergence) ** (1 / n_sub)
        for s in range(n_sub):
            work[_edit_index(p_ends, len(work), insert=False)] = sub_letters[s]

    return seq_1, "".join(work)
