"""Reference-compatible single-pair API.

Mirrors the public surface of the reference library so its users can switch:
``find_global_alignment`` with the exact argument list of
/root/reference/src/globalign/globaligner.py:132-146 returning an
``AlignmentResults`` with the fields of
/root/reference/src/globalign/conclude.py:7-17, including the 70-char
line-wrapped printout and stdout/file sinks
(/root/reference/src/globalign/conclude.py:19-151).
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import NamedTuple

from . import matrices as M
from .config import check_seq_lengths, resolve_params
from .kernel import align_full
from .sources.fasta import read_first_2_seqs_from_fasta


class AlignmentResults(NamedTuple):
    seq_1_aligned: str
    middle_part: str
    seq_2_aligned: str
    cost: int
    score: int
    scoring_mat: dict
    costing_mat: dict
    gap_open_score: int
    gap_open_cost: int
    output: Path | None

    def _printout(self, desc_1="seq_1", desc_2="seq_2", chars_per_line=70):
        parts = [desc_1, "\n", desc_2]
        aln_len = len(self.middle_part)
        n_sets = max(1, math.ceil(aln_len / chars_per_line))
        lo = 0
        for _ in range(n_sets):
            hi = lo + chars_per_line
            parts += ["\n\n", self.seq_1_aligned[lo:hi], "\n",
                      self.middle_part[lo:hi], "\n", self.seq_2_aligned[lo:hi]]
            lo = hi
        parts += ["\n\n", f"score: {self.score}\n", f"cost: {self.cost}\n"]
        parts += [
            "###########################################\n"
            "# Settings\n"
            "###########################################\n",
            "scoring_mat:\n", prettify_mat(self.scoring_mat),
            f"\n\ngap_open_score: {self.gap_open_score}\n",
            "\ncosting_mat:\n", prettify_mat(self.costing_mat),
            f"\n\ngap_open_cost: {self.gap_open_cost}\n",
        ]
        return "".join(parts)

    def __str__(self):
        return self._printout()

    def print(self, desc_1="seq_1", desc_2="seq_2", chars_per_line=70):
        print(self._printout(desc_1, desc_2, chars_per_line))

    def write(self, file=None, desc_1="seq_1", desc_2="seq_2", chars_per_line=70):
        """Write to ``file`` / ``self.output`` / stdout ('stdout' sentinel)."""
        target = self.output if file is None else file
        s = self._printout(desc_1, desc_2, chars_per_line)
        if target is None or target == "stdout":
            print(s)
            return
        with open(target, mode="w+") as fh:
            fh.write(s)


def print_nested_list_aligned(nested_list) -> None:
    """Column-aligned pretty-print of a list of equal-length rows
    (reference K5, /root/reference/src/globalign/conclude.py:204-249):
    every column is right-aligned to its widest cell plus one space, one
    trailing newline per row, printed in a single call."""
    cols = list(zip(*[[str(c) for c in row] for row in nested_list]))
    widths = [max(len(c) for c in col) for col in cols]
    rows = zip(*[
        [f"{c:>{w + 1}}" for c in col] for col, w in zip(cols, widths)
    ])
    print("".join("".join(r) + "\n" for r in rows))
    return None


def prettify_mat(mat: dict[str, dict[str, int]]) -> str:
    """Column-width-aligned rendering of a nested-dict matrix."""
    col_headers = list(next(iter(mat.values())).keys())
    widths = [
        max(len(str(h)), *(len(str(mat[r][h])) for r in mat)) for h in col_headers
    ]
    head_w = max(len(str(h)) for h in col_headers)
    lines = [" " * (head_w + 1)
             + "".join(f"{str(h):>{w + 1}}" for h, w in zip(col_headers, widths))]
    for r in mat:
        lines.append(
            f"{str(r):<{head_w + 1}}"
            + "".join(f"{str(mat[r][h]):>{w + 1}}" for h, w in zip(col_headers, widths))
        )
    return "\n".join(lines)


def find_global_alignment(
    input_fasta=None,
    output=None,
    seq_1=None,
    seq_2=None,
    scoring_mat_name=None,
    scoring_mat_path=None,
    match_score=None,
    mismatch_score=None,
    mismatch_cost=None,
    gap_open_score=None,
    gap_open_cost=None,
    gap_extension_score=None,
    gap_extension_cost=None,
) -> AlignmentResults:
    """Optimal global alignment of one pair — reference-compatible entry.

    Same argument semantics and validation as the reference
    (/root/reference/src/globalign/start.py:150-353): mutually-exclusive
    input and matrix option groups, '-' forbidden in sequences, uppercase
    normalization, m*n < 20M admission cap.

    Beyond-reference escape hatch: GA_LINEAR_TRACEBACK=1 switches the
    traceback to the O(m+n)-memory Myers-Miller path (hirschberg.py) and
    lifts the cell cap (which exists to bound the dense lattices' memory;
    time stays O(m*n), so very large pairs are slow but safe). Default
    behavior is byte-identical to the reference.
    """
    if output is not None:
        out = Path(output)
        if out.is_file():
            raise RuntimeWarning(f"Overwriting {out}")
        if not out.parent.exists():
            raise FileNotFoundError("The parent directory of output does not exist.")
    else:
        out = None

    if input_fasta is not None and seq_1 is None and seq_2 is None:
        seq_1, seq_2 = read_first_2_seqs_from_fasta(Path(input_fasta))
    elif (
        (input_fasta is None and seq_2 is None)
        or (input_fasta is not None and seq_1 is not None)
        or (seq_1 is None and seq_2 is not None)
    ):
        raise RuntimeError(
            "The combination of arguments for input_fasta, seq_1, and seq_2 "
            "does not make sense."
        )

    linear = os.environ.get("GA_LINEAR_TRACEBACK", "0") == "1"
    if linear:
        # Linear-space traceback has no lattice-memory wall; keep only the
        # zero-length guard from the reference's admission check.
        check_seq_lengths(seq_1, seq_2, cap=None)
    else:
        check_seq_lengths(seq_1, seq_2)
    if M.GAP in seq_1 or M.GAP in seq_2:
        raise RuntimeError(
            "'-' characters are not allowed in sequences (reserved gap symbol)"
        )
    seq_1 = seq_1.upper()
    seq_2 = seq_2.upper()

    alphabet = sorted(set(seq_1) | set(seq_2))
    params = resolve_params(
        alphabet=alphabet,
        scoring_mat_name=scoring_mat_name,
        scoring_mat_path=scoring_mat_path,
        match_score=match_score,
        mismatch_score=mismatch_score,
        mismatch_cost=mismatch_cost,
        gap_open_score=gap_open_score,
        gap_open_cost=gap_open_cost,
        gap_extension_score=gap_extension_score,
        gap_extension_cost=gap_extension_cost,
    )
    if scoring_mat_name is not None or scoring_mat_path is not None:
        mat_keys = set(dict(params.scoring_mat).keys())
        missing = (set(alphabet) | {M.GAP}) - mat_keys
        if missing:
            raise RuntimeError(
                f"sequences contain letters not in the scoring matrix: {missing}"
            )

    if linear:
        from .hirschberg import align_full_linear

        aln = align_full_linear(seq_1, seq_2, params)
    else:
        aln = align_full(seq_1, seq_2, params)
    return AlignmentResults(
        seq_1_aligned=aln["seq_1_aligned"],
        middle_part=aln["middle_part"],
        seq_2_aligned=aln["seq_2_aligned"],
        cost=aln["cost"],
        score=aln["score"],
        scoring_mat=params.scoring_dict(),
        costing_mat=params.costing_dict(),
        gap_open_score=params.gap_open_score,
        gap_open_cost=params.gap_open_cost,
        output=out,
    )
