"""Parameter dataclasses mirroring the reference's defaults and validation.

Reference semantics (for parity):
  - scoring defaults/validation: /root/reference/src/globalign/start.py:10-91
  - costing defaults/validation: /root/reference/src/globalign/start.py:93-147
  - gap-open score/cost coupling: /root/reference/src/globalign/start.py:249-262
  - mutually-exclusive option groups: /root/reference/src/globalign/start.py:227-232
  - admission cap (m*n < 20M):   /root/reference/src/globalign/start.py:361-376

The resolved :class:`AlignParams` is a small immutable value that is
closure-captured into the scoring UDF (equivalently a broadcast variable);
it is never represented as Spark data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import matrices as M

# Hard admission cap from the reference: refuse pairs with m*n >= this.
MAX_SEQ_LEN_PROD = 20_000_000

# Engine-side cap for the distributed scoring path: pairs above this go to
# the truncated/windowed path instead of the full dense DP (3 int64 lattices
# at 4M cells ~ 96 MB per in-flight pair; keeps Arrow batches memory-safe).
ENGINE_FULL_DP_CELL_CAP = 4_000_000


def _coerce_int(value, name: str) -> int:
    try:
        return int(value)
    except (TypeError, ValueError) as e:
        raise type(e)(f"{name} must be convertible to an integer") from e


@dataclass
class SimpleScoringSettings:
    """match>0, mismatch<0, gap_open<=0, gap_extension<0 (reference defaults)."""

    match_score: int | str | None = 2
    mismatch_score: int | str | None = -3
    gap_open_score: int | str | None = -4
    gap_extension_score: int | str | None = -2

    def __post_init__(self):
        self.match_score = _coerce_int(
            2 if self.match_score is None else self.match_score, "match_score"
        )
        self.mismatch_score = _coerce_int(
            -3 if self.mismatch_score is None else self.mismatch_score,
            "mismatch_score",
        )
        self.gap_open_score = _coerce_int(
            -4 if self.gap_open_score is None else self.gap_open_score,
            "gap_open_score",
        )
        self.gap_extension_score = _coerce_int(
            -2 if self.gap_extension_score is None else self.gap_extension_score,
            "gap_extension_score",
        )
        if self.match_score <= 0:
            raise ValueError("match_score must be positive")
        if self.mismatch_score >= 0:
            raise ValueError("mismatch_score must be negative")
        if self.gap_open_score > 0:
            raise ValueError("gap_open_score must be non-positive")
        if self.gap_extension_score >= 0:
            raise ValueError("gap_extension_score must be negative")


@dataclass
class SimpleCostingSettings:
    """mismatch>0, gap_open>=0, gap_extension>0 (reference defaults)."""

    mismatch_cost: int | str | None = 5
    gap_open_cost: int | str | None = 4
    gap_extension_cost: int | str | None = 3

    def __post_init__(self):
        mc = 5 if self.mismatch_cost is None else self.mismatch_cost
        go = 4 if self.gap_open_cost is None else self.gap_open_cost
        ge = 3 if self.gap_extension_cost is None else self.gap_extension_cost
        self.mismatch_cost = _coerce_int(mc, "mismatch_cost")
        self.gap_open_cost = _coerce_int(go, "gap_open_cost")
        self.gap_extension_cost = _coerce_int(ge, "gap_extension_cost")
        if self.mismatch_cost <= 0:
            raise ValueError("mismatch_cost must be positive")
        if self.gap_open_cost < 0:
            raise ValueError("gap_open_cost must be non-negative")
        if self.gap_extension_cost <= 0:
            raise ValueError("gap_extension_cost must be positive")


@dataclass(frozen=True)
class AlignParams:
    """Fully-resolved alignment parameters: both matrices + gap-open pair.

    Built once on the driver via :func:`resolve_params`; hashable/immutable
    so it can be safely captured by executor-side UDF closures.
    """

    scoring_mat: tuple = field(repr=False)  # tuple-of-tuples frozen dict
    costing_mat: tuple = field(repr=False)
    gap_open_score: int = -4
    gap_open_cost: int = 4
    max_score: int = 2

    def scoring_dict(self) -> dict[str, dict[str, int]]:
        return {a: dict(row) for a, row in self.scoring_mat}

    def costing_dict(self) -> dict[str, dict[str, int]]:
        return {a: dict(row) for a, row in self.costing_mat}


def _freeze(mat: dict[str, dict[str, int]]) -> tuple:
    # Preserve insertion order (alphabet sorted, '-' last) to match the
    # reference's printed matrix layout.
    return tuple((a, tuple(row.items())) for a, row in mat.items())


def resolve_params(
    alphabet: str | list[str] | None = None,
    scoring_mat_name: str | None = None,
    scoring_mat_path: str | None = None,
    match_score=None,
    mismatch_score=None,
    mismatch_cost=None,
    gap_open_score=None,
    gap_open_cost=None,
    gap_extension_score=None,
    gap_extension_cost=None,
) -> AlignParams:
    """Resolve user parameters to an :class:`AlignParams`.

    Mirrors the reference's four-way branch (named matrix / custom matrix
    file / costs given / score defaults) and the gap-open score/cost
    coupling. ``alphabet`` replaces the reference's per-pair dynamic alphabet
    inference: in the distributed engine the alphabet is fixed per run
    (default: printable ASCII minus '-').
    """
    score_opts = (match_score, mismatch_score, gap_open_score, gap_extension_score)
    cost_opts = (mismatch_cost, gap_open_cost, gap_extension_cost)
    if scoring_mat_name is not None and any(
        x is not None
        for x in (scoring_mat_path, match_score, mismatch_score, mismatch_cost,
                  gap_extension_score, gap_extension_cost)
    ):
        raise RuntimeError("scoring_mat_name conflicts with other score/cost options")
    if scoring_mat_path is not None and any(
        x is not None
        for x in (scoring_mat_name, match_score, mismatch_score, mismatch_cost,
                  gap_extension_score, gap_extension_cost)
    ):
        raise RuntimeError("scoring_mat_path conflicts with other score/cost options")
    if any(x is not None for x in score_opts) and any(x is not None for x in cost_opts):
        raise RuntimeError("scoring and costing options should not both be set")

    scoring_settings = SimpleScoringSettings(
        match_score, mismatch_score, gap_open_score, gap_extension_score
    )
    costing_settings = SimpleCostingSettings(
        mismatch_cost, gap_open_cost, gap_extension_cost
    )
    # gap_open_score and gap_open_cost are always exact opposites; whichever
    # the user gave wins.
    if gap_open_score is not None:
        costing_settings.gap_open_cost = -scoring_settings.gap_open_score
    else:
        scoring_settings.gap_open_score = -costing_settings.gap_open_cost

    if alphabet is None:
        letters = [chr(c) for c in range(32, 127) if chr(c) != M.GAP]
    else:
        letters = sorted(set(alphabet) - {M.GAP})

    if scoring_mat_name is not None or scoring_mat_path is not None:
        scoring = (
            # zip-import-safe: works under spark-submit --py-files too
            M.packaged_scoring_mat(scoring_mat_name)
            if scoring_mat_name is not None
            else M.read_scoring_mat(scoring_mat_path)
        )
        if scoring_mat_path is not None:
            if not M.check_symmetric(scoring):
                raise RuntimeError("scoring matrix is not symmetric")
            if not M.check_big_main_diag(scoring):
                raise RuntimeError("scoring matrix max must sit on the diagonal")
        max_score = M.get_max_val(scoring)
        costing = M.scoring_mat_to_costing_mat(scoring, max_score)
    elif any(x is not None for x in cost_opts):
        costing = M.create_costing_mat(
            letters, costing_settings.mismatch_cost, costing_settings.gap_extension_cost
        )
        max_score = scoring_settings.match_score
        scoring = M.costing_mat_to_scoring_mat(costing, max_score)
    else:
        scoring = M.create_scoring_mat(
            letters,
            scoring_settings.match_score,
            scoring_settings.mismatch_score,
            scoring_settings.gap_extension_score,
        )
        max_score = scoring_settings.match_score
        costing = M.scoring_mat_to_costing_mat(scoring, max_score)

    return AlignParams(
        scoring_mat=_freeze(scoring),
        costing_mat=_freeze(costing),
        gap_open_score=scoring_settings.gap_open_score,
        gap_open_cost=costing_settings.gap_open_cost,
        max_score=max_score,
    )


def unit_cost_params(alphabet: str | list[str] | None = None) -> AlignParams:
    """Plain Levenshtein: mismatch=1, gap_open=0, gap_extend=1.

    With these costs the kernel's final cost equals the classic unweighted
    edit distance — used as the DuckDB-`levenshtein` correctness oracle.
    """
    return resolve_params(
        alphabet=alphabet, mismatch_cost=1, gap_open_cost=0, gap_extension_cost=1
    )


def check_seq_lengths(
    seq_1: str, seq_2: str, cap: int | None = MAX_SEQ_LEN_PROD
) -> None:
    """cap=None keeps only the zero-length guard (linear-space traceback
    has no lattice-memory wall to admit against)."""
    prod = len(seq_1) * len(seq_2)
    if cap is not None and not prod < cap:
        raise RuntimeError(
            f"sequences too long: product of lengths must be < {cap}, "
            f"got {len(seq_1)} x {len(seq_2)}"
        )
    if prod == 0:
        raise RuntimeError("detected a sequence of length 0")
