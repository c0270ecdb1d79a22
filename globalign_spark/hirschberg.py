"""Linear-space optimal traceback: Hirschberg bisection with
Myers-Miller affine-gap boundary flags.

Why this exists: ``kernel.align_full`` materializes three
(m+1) x (n+1) int64 lattices — 24*m*n bytes, ~480 MB at the reference's
20M-cell admission cap, which is exactly why the reference hard-errors
above it (/root/reference/src/globalign/start.py:361-376, and cites
linear-space alignment as an aspiration only,
/root/reference/README.md:100-113). This module reconstructs a full
optimal alignment (aligned strings + middle line) in O(m + n) memory:
two rolling cost rows per pass, divide-and-conquer on the seq_1
midpoint. Time stays O(m*n) — the classic ~2x constant over the
cost-only sweep — so the traceback memory wall is gone and only the
time budget caps pair size.

Algorithm: Myers & Miller 1988, "Optimal alignments in linear space"
(CABIOS 4:11-17) — Hirschberg's bisection extended to affine gaps by
carrying two boundary open-costs (``tb``/``te``): a seq_2-gap run
(D-state, consuming seq_1 chars) that crosses the split row must pay
its gap-open exactly once, so the join term is DD_fwd + DD_bwd - go and
the two sub-recursions get their abutting open waived (0) on the shared
edge. Generalized here from the paper's uniform gap(k) = g + h*k model
to this engine's per-character extension costs (a run consuming chars C
costs open + sum of the per-char LUT over C; matrices.py builds the
LUTs), which the derivation permits because extension cost depends only
on the consumed character, never on run position.

Tie-breaking: emits AN optimal alignment, bit-equal in cost/score to
``kernel.align_full``; the gap placement on tie-ambiguous inputs may
differ from align_full's fixed diag>I>D order (both are valid — the
reference itself breaks ties with unseeded random.choice,
/root/reference/src/globalign/globaligner.py:595-685, so cost/score is
the only parity contract). tests/test_hirschberg.py fuzzes cost parity
vs align_full and validates every emitted alignment by independent
re-scoring (``alignment_cost``).

One deliberate semantic difference: this module computes the TRUE
affine-gap optimum with no sentinel arithmetic. ``align_full`` /
``_dp_tables`` reproduce the reference's big_num sentinel formula
bit-for-bit ((max_cost+1)*max(m,n)); when gap_open is large relative to
that bound — possible only on short pairs with extreme open costs, never
in the engine's production configs — the sentinel can undercut the true
optimum and the dense kernel returns the reference's contaminated value.
tests/test_hirschberg.py pins both behaviors (brute-Gotoh equality here,
conditional dense parity there).
"""

from __future__ import annotations

import numpy as np

from .config import AlignParams
from .kernel import CompiledParams, encode


def _fwd_rows(
    a: np.ndarray, b: np.ndarray, cp: CompiledParams, tb: int
) -> tuple[np.ndarray, np.ndarray]:
    """Final Myers-Miller cost rows after consuming all of ``a``.

    Returns (CC, DD), both length len(b)+1:
      CC[j] = min cost of aligning a against b[:j] (any end state);
      DD[j] = same but constrained to end in D-state (a seq_2-gap whose
              last consumed char is a[-1]), gap-open pre-charged.
    ``tb`` replaces the open cost for the D-run hugging column 0 (the
    continuation of a run cut at the caller's split row); every other
    open pays cp.go. Same recurrences as kernel._dp_tables, rolled to
    two rows.
    """
    m, n = len(a), len(b)
    go = np.int64(cp.go)
    sub = cp.sub
    cumc = np.zeros(n + 1, dtype=np.int64)
    if n:
        cumc[1:] = np.cumsum(cp.dele[b])
    CC = np.empty(n + 1, dtype=np.int64)
    CC[0] = 0
    CC[1:] = go + cumc[1:]
    DD = CC + go  # D opening below row 0 at column j pays a fresh go ...
    DD[0] = np.int64(tb)  # ... except the column-0 continuation run: tb.
    ins_a = cp.ins[a].astype(np.int64)
    for i in range(1, m + 1):
        ic = ins_a[i - 1]
        # D: extend the run above, or open from the row-above best.
        DD = np.minimum(DD, CC + go) + ic
        # M: diagonal from the row-above best.
        Mrow = CC[:-1] + sub[a[i - 1], b]
        # I: opens only from M/D of THIS row (opening from I never beats
        # extending I for go >= 0); prefix-min over the row, same trick
        # as kernel._dp_tables.
        X = np.empty(n + 1, dtype=np.int64)
        X[0] = DD[0]  # column 0 is D-only
        if n:
            np.minimum(Mrow, DD[1:], out=X[1:])
        runmin = np.minimum.accumulate(X + go - cumc)
        CC_new = np.empty(n + 1, dtype=np.int64)
        CC_new[0] = DD[0]
        if n:
            II = cumc[1:] + runmin[:-1]
            CC_new[1:] = np.minimum(np.minimum(Mrow, DD[1:]), II)
        CC = CC_new
    return CC, DD


class _Emit:
    """Accumulates alignment columns left to right."""

    __slots__ = ("s1", "mid", "s2")

    def __init__(self):
        self.s1: list[str] = []
        self.mid: list[str] = []
        self.s2: list[str] = []

    def diag(self, x: str, y: str) -> None:
        self.s1.append(x)
        self.mid.append("|" if x == y else "*")
        self.s2.append(y)

    def ins_b(self, y: str) -> None:  # I-state: gap in seq_1
        self.s1.append("-")
        self.mid.append(" ")
        self.s2.append(y)

    def del_a(self, x: str) -> None:  # D-state: gap in seq_2
        self.s1.append(x)
        self.mid.append(" ")
        self.s2.append("-")


def _diff(
    s1: str,
    s2: str,
    a: np.ndarray,
    b: np.ndarray,
    cp: CompiledParams,
    tb: int,
    te: int,
    out: _Emit,
) -> None:
    """Myers-Miller recursion: emit an optimal alignment of s1 vs s2.

    ``tb``/``te``: open cost charged to a D-run abutting the top-left /
    bottom-right corner (0 when that run continues a gap across the
    caller's split; cp.go at the outermost call).
    """
    m, n = len(a), len(b)
    go = cp.go
    if m == 0:
        for j in range(n):
            out.ins_b(s2[j])
        return
    if n == 0:
        for i in range(m):
            out.del_a(s1[i])
        return
    if m == 1:
        # Single seq_1 char: either it pairs with some b_j (two
        # independent horizontal runs around it), or it is deleted (one
        # D-run touching both corners: open = min(tb, te)) alongside one
        # horizontal run covering all of b.
        cumc = np.zeros(n + 1, dtype=np.int64)
        cumc[1:] = np.cumsum(cp.dele[b])
        j_idx = np.arange(1, n + 1)
        left = np.where(j_idx > 1, go + cumc[:-1], 0)
        right = np.where(j_idx < n, go + (cumc[n] - cumc[1:]), 0)
        match_costs = left + cp.sub[a[0], b] + right
        jbest = int(np.argmin(match_costs))
        del_cost = min(tb, te) + int(cp.ins[a[0]]) + go + int(cumc[n])
        if int(match_costs[jbest]) <= del_cost:
            for j in range(jbest):
                out.ins_b(s2[j])
            out.diag(s1[0], s2[jbest])
            for j in range(jbest + 1, n):
                out.ins_b(s2[j])
        elif tb <= te:
            out.del_a(s1[0])
            for j in range(n):
                out.ins_b(s2[j])
        else:
            for j in range(n):
                out.ins_b(s2[j])
            out.del_a(s1[0])
        return

    i1 = m // 2
    CCf, DDf = _fwd_rows(a[:i1], b, cp, tb)
    CCb, DDb = _fwd_rows(a[i1:][::-1], b[::-1], cp, te)
    tot_cc = CCf + CCb[::-1]
    tot_dd = DDf + DDb[::-1] - np.int64(go)
    j_cc = int(np.argmin(tot_cc))
    j_dd = int(np.argmin(tot_dd))
    cc_best = int(tot_cc[j_cc])
    dd_best = int(tot_dd[j_dd])
    # Only the split column survives past this point. Free the six O(n)
    # row arrays BEFORE recursing: held across the ~log2(m) live
    # recursion levels they would make peak memory O(n log m), not the
    # O(m + n) this module exists to provide.
    del CCf, DDf, CCb, DDb, tot_cc, tot_dd
    if cc_best <= dd_best:
        j = j_cc
        _diff(s1[:i1], s2[:j], a[:i1], b[:j], cp, tb, go, out)
        _diff(s1[i1:], s2[j:], a[i1:], b[j:], cp, go, te, out)
    else:
        # The crossing D-run consumes a[i1-1] and a[i1] around the split:
        # emit those two moves explicitly and waive the abutting open on
        # each sub-recursion (the single open was charged by the join).
        j = j_dd
        _diff(s1[: i1 - 1], s2[:j], a[: i1 - 1], b[:j], cp, tb, 0, out)
        out.del_a(s1[i1 - 1])
        out.del_a(s1[i1])
        _diff(s1[i1 + 1:], s2[j:], a[i1 + 1:], b[j:], cp, 0, te, out)


def alignment_cost(s1_aligned: str, s2_aligned: str, params: AlignParams) -> int:
    """Independent evaluator: cost of an explicit alignment (run-scan).

    Used by tests to certify emitted alignments without trusting the DP:
    diagonal columns pay sub[x, y]; each maximal gap run pays go plus the
    per-char LUT over its consumed characters.
    """
    cp = CompiledParams(params)
    if len(s1_aligned) != len(s2_aligned):
        raise ValueError("aligned strings differ in length")
    total = 0
    prev = "M"
    for x, y in zip(s1_aligned, s2_aligned):
        if x == "-" and y == "-":
            raise ValueError("double-gap column")
        if x == "-":  # I: consumes a seq_2 char
            if prev != "I":
                total += cp.go
            total += int(cp.dele[ord(y)])
            prev = "I"
        elif y == "-":  # D: consumes a seq_1 char
            if prev != "D":
                total += cp.go
            total += int(cp.ins[ord(x)])
            prev = "D"
        else:
            total += int(cp.sub[ord(x), ord(y)])
            prev = "M"
    return total


def align_full_linear(seq_1: str, seq_2: str, params: AlignParams) -> dict:
    """Drop-in for ``kernel.align_full`` in O(m+n) memory.

    Same output dict (seq_1_aligned / middle_part / seq_2_aligned /
    cost / score), same optimal cost/score; tie-ambiguous gap placement
    may differ (see module docstring). Use when m*n exceeds the dense
    traceback budget — e.g. two 100k-char web pages (10^10 cells) need
    ~240 GB of lattice dense but ~200 KB of rows here.
    """
    a = encode(seq_1)
    b = encode(seq_2)
    cp = CompiledParams(params)
    out = _Emit()
    _diff(seq_1, seq_2, a, b, cp, cp.go, cp.go, out)
    s1a = "".join(out.s1)
    s2a = "".join(out.s2)
    cost = alignment_cost(s1a, s2a, params)
    score = int(cp.final_score(np.int64(cost), len(seq_1), len(seq_2)))
    return {
        "seq_1_aligned": s1a,
        "middle_part": "".join(out.mid),
        "seq_2_aligned": s2a,
        "cost": cost,
        "score": score,
    }
