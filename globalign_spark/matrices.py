"""Scoring/costing matrices and the exact score<->cost transforms.

Semantics reproduced from the reference (cited for parity checking):
  - score->cost transform: /root/reference/src/globalign/start.py:500-557
  - cost->score transform: /root/reference/src/globalign/start.py:559-612
  - final cost<->score:    /root/reference/src/globalign/conclude.py:154-202
  - simple matrix constructors: /root/reference/src/globalign/start.py:431-468
  - matrix file format:    /root/reference/src/globalign/start.py:378-428
  - symmetry / diagonal validation: /root/reference/src/globalign/start.py:883-939

All matrices are tiny (<= 26x26); they live on the driver as plain dicts and
are closure-captured (broadcast) into the scoring UDF as a 128x128 int64
lookup table — never a join.
"""

from __future__ import annotations

import math
from copy import deepcopy
from pathlib import Path

import numpy as np

GAP = "-"

# Alphabet size for the code-point LUT used by the numpy kernel. Sequences
# are validated to be ASCII before scoring; 128 covers all code points.
LUT_SIZE = 128


def get_max_val(mat: dict[str, dict[str, int]]) -> int:
    """Max value inside a nested dict matrix (reference start.py:488-497)."""
    return max(max(inner.values()) for inner in mat.values())


def deltas(max_score: int) -> tuple[int, int]:
    """(delta_d, delta_i) = (floor(b/2), ceil(b/2)) — the floor/ceil split is
    load-bearing for odd max scores (e.g. BLOSUM62, b=11 -> 5, 6)."""
    return math.floor(max_score / 2), math.ceil(max_score / 2)


def scoring_mat_to_costing_mat(
    scoring_mat: dict[str, dict[str, int]],
    max_score: int,
    delta_d: int | None = None,
    delta_i: int | None = None,
) -> dict[str, dict[str, int]]:
    """Exact transform of a similarity matrix into a distance (cost) matrix.

    cost(a,b)   = -s(a,b) + delta_d + delta_i   (match/mismatch)
    cost('-',b) = -s('-',b) + delta_d           (deletion / horizontal step)
    cost(a,'-') = -s(a,'-') + delta_i           (insertion / vertical step)
    """
    dd, di = deltas(max_score)
    if delta_d is None:
        delta_d = dd
    if delta_i is None:
        delta_i = di
    costing = deepcopy(scoring_mat)
    for a, row in costing.items():
        for b, s in row.items():
            if a == GAP and b != GAP:
                row[b] = -s + delta_d
            elif b == GAP and a != GAP:
                row[b] = -s + delta_i
            else:
                row[b] = -s + delta_d + delta_i
    return costing


def costing_mat_to_scoring_mat(
    costing_mat: dict[str, dict[str, int]],
    max_score: int,
    delta_d: int | None = None,
    delta_i: int | None = None,
) -> dict[str, dict[str, int]]:
    """Inverse of :func:`scoring_mat_to_costing_mat`."""
    dd, di = deltas(max_score)
    if delta_d is None:
        delta_d = dd
    if delta_i is None:
        delta_i = di
    scoring = deepcopy(costing_mat)
    for a, row in scoring.items():
        for b, c in row.items():
            if a == GAP and b != GAP:
                row[b] = delta_d - c
            elif b == GAP and a != GAP:
                row[b] = delta_i - c
            else:
                row[b] = delta_d + delta_i - c
    return scoring


def final_cost_to_score(cost: int, m: int, n: int, max_score: int) -> int:
    """score = n*delta_d + m*delta_i - cost  (m=len(seq_1), n=len(seq_2))."""
    delta_d, delta_i = deltas(max_score)
    return n * delta_d + m * delta_i - cost


def final_score_to_cost(score: int, m: int, n: int, max_score: int) -> int:
    delta_d, delta_i = deltas(max_score)
    return -score + n * delta_d + m * delta_i


def create_scoring_mat(
    alphabet: list[str], match_score: int, mismatch_score: int, gap_extension_score: int
) -> dict[str, dict[str, int]]:
    """diag=match, '-' row/col=gap_ext, else mismatch; '-','-' = match."""
    letters = sorted(set(alphabet)) + [GAP]
    return {
        a: {
            b: (
                match_score
                if a == b
                else gap_extension_score
                if GAP in (a, b)
                else mismatch_score
            )
            for b in letters
        }
        for a in letters
    }


def create_costing_mat(
    alphabet: list[str], mismatch_cost: int, gap_extension_cost: int
) -> dict[str, dict[str, int]]:
    """diag=0, '-' row/col=gap_ext_cost, else mismatch_cost."""
    letters = sorted(set(alphabet)) + [GAP]
    return {
        a: {
            b: (0 if a == b else gap_extension_cost if GAP in (a, b) else mismatch_cost)
            for b in letters
        }
        for a in letters
    }


def _parse_scoring_mat(lines) -> dict[str, dict[str, int]]:
    """Parse whitespace-delimited matrix lines: header row of letters, then
    one row per letter with a leading row label (same format as the
    reference's ``.mtx`` data files)."""
    it = iter(lines)
    letters = next(it, "").upper().split()
    if not all(len(x) == 1 for x in letters):
        raise ValueError("header row must contain single letters")
    mat: dict[str, dict[str, int]] = {}
    for i, line in enumerate(it):
        parts = line.split()
        if not parts:
            continue
        if parts[0] != letters[i]:
            raise ValueError("row headers do not match column headers")
        mat[parts[0]] = {
            letters[j]: int(parts[j + 1]) for j in range(len(letters))
        }
    return mat


def read_scoring_mat(path: str | Path) -> dict[str, dict[str, int]]:
    """Read a whitespace-delimited scoring-matrix file from the filesystem."""
    path = Path(path)
    if not path.is_file():
        raise FileNotFoundError(f"scoring matrix file not found: {path}")
    with path.open() as f:
        return _parse_scoring_mat(f)


def check_symmetric(mat: dict[str, dict[str, int]]) -> bool:
    keys = list(mat.keys())
    for a in keys:
        for b in keys:
            if b not in mat.get(a, {}) or a not in mat.get(b, {}):
                return False
            if mat[a][b] != mat[b][a]:
                return False
    return True


def check_big_main_diag(mat: dict[str, dict[str, int]]) -> bool:
    return all(mat[a][a] == max(mat[a].values()) for a in mat)


def costing_mat_to_luts(
    costing_mat: dict[str, dict[str, int]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compile the nested-dict cost matrix into numpy lookup tables keyed by
    ASCII code point, for the vectorized kernel.

    Returns (sub_lut[128,128], del_lut[128], ins_lut[128]) where
      sub_lut[ord(a), ord(b)] = cost(a, b)        (diagonal step)
      del_lut[ord(b)]         = cost('-', b)      (horizontal step, gap in seq_1)
      ins_lut[ord(a)]         = cost(a, '-')      (vertical step, gap in seq_2)

    Unknown code points are left at a large positive value (2^20: absurd
    versus any real cost, yet int32-safe even when accumulated along a
    sequence) so stray characters surface as absurd costs instead of silent
    wrong answers.
    """
    sub = np.full((LUT_SIZE, LUT_SIZE), 2**20, dtype=np.int64)
    dele = np.full(LUT_SIZE, 2**20, dtype=np.int64)
    ins = np.full(LUT_SIZE, 2**20, dtype=np.int64)
    for a, row in costing_mat.items():
        for b, c in row.items():
            if a == GAP and b == GAP:
                continue
            if a == GAP:
                dele[ord(b)] = c
            elif b == GAP:
                ins[ord(a)] = c
            else:
                sub[ord(a), ord(b)] = c
    return sub, dele, ins


def packaged_matrix_path(name: str) -> Path:
    """Path to a scoring matrix vendored with this package.

    The ``.mtx`` files under ``globalign_spark/data/scoring_matrices/`` are
    public-domain substitution-matrix data (BLOSUM50/BLOSUM62 from NCBI, plus
    a simple nucleotide matrix) in the same whitespace table format the
    reference ships (cf. reference start.py --scoring_mat_name handling).
    The engine has no runtime dependency on the reference checkout.

    Filesystem installs only — under ``spark-submit --py-files
    globalign_spark.zip`` the package has no real ``__file__`` directory;
    use :func:`packaged_scoring_mat` there.
    """
    return Path(__file__).resolve().parent / "data" / "scoring_matrices" / f"{name}.mtx"


def packaged_scoring_mat(name: str) -> dict[str, dict[str, int]]:
    """Load a vendored scoring matrix by name, zip-import-safe.

    Reads through ``importlib.resources`` so it works both from a normal
    checkout and from ``--py-files globalign_spark.zip`` (where
    ``Path(__file__)`` points inside the archive and plain file IO fails).
    """
    from importlib import resources

    res = (
        resources.files("globalign_spark")
        / "data" / "scoring_matrices" / f"{name}.mtx"
    )
    try:
        text = res.read_text()
    except (FileNotFoundError, OSError):
        raise FileNotFoundError(f"no packaged scoring matrix named {name!r}")
    return _parse_scoring_mat(text.splitlines())
