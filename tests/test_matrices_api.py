"""Matrix transforms, validation predicates, and the reference-compatible
single-pair API surface (FASTA input, sinks, error paths).

Reference behaviors pinned: score<->cost transforms
(/root/reference/src/globalign/start.py:500-612), symmetry/diagonal checks
(:883-939), argument-combination errors (:201-232), '-' rejection (:217-218),
admission cap (:361-376), FASTA reading (:614-688).
"""

import pytest

from tests.conftest import requires_reference

from globalign_spark import matrices as M
from globalign_spark.api import find_global_alignment, prettify_mat
from globalign_spark.config import (
    SimpleCostingSettings,
    SimpleScoringSettings,
    resolve_params,
)


def test_score_cost_transform_roundtrip():
    scoring = M.create_scoring_mat(list("ACGT"), 2, -3, -2)
    costing = M.scoring_mat_to_costing_mat(scoring, max_score=2)
    # match cost = -2 + 1 + 1 = 0; mismatch = 3 + 2 = 5; gap ext = 2 + 1
    assert costing["A"]["A"] == 0
    assert costing["A"]["C"] == 5
    assert costing["-"]["A"] == 2 + 1  # -(-2) + floor(2/2)
    assert costing["A"]["-"] == 2 + 1  # -(-2) + ceil(2/2)
    back = M.costing_mat_to_scoring_mat(costing, max_score=2)
    assert back == scoring


def test_odd_max_score_delta_split():
    # b = 11 -> delta_d = 5, delta_i = 6 (floor/ceil asymmetry)
    assert M.deltas(11) == (5, 6)
    scoring = {"A": {"A": 11, "-": -4}, "-": {"A": -4, "-": 11}}
    costing = M.scoring_mat_to_costing_mat(scoring, 11)
    assert costing["-"]["A"] == 4 + 5   # deletion row: -s + delta_d
    assert costing["A"]["-"] == 4 + 6   # insertion col: -s + delta_i
    assert costing["A"]["A"] == -11 + 11


def test_symmetry_and_diag_checks():
    good = {"A": {"A": 2, "B": -1}, "B": {"A": -1, "B": 2}}
    bad = {"A": {"A": 2, "B": -1}, "B": {"A": 0, "B": 2}}
    diagbad = {"A": {"A": -5, "B": 2}, "B": {"A": 2, "B": 3}}
    assert M.check_symmetric(good)
    assert not M.check_symmetric(bad)
    assert M.check_big_main_diag(good)
    assert not M.check_big_main_diag(diagbad)


def test_read_packaged_matrices():
    for name in ("nucleotide", "BLOSUM50", "BLOSUM62"):
        mat = M.read_scoring_mat(M.packaged_matrix_path(name))
        assert "-" in mat and M.check_symmetric(mat)
    b62 = M.read_scoring_mat(M.packaged_matrix_path("BLOSUM62"))
    assert M.get_max_val(b62) == 11


def test_settings_validation():
    with pytest.raises(ValueError):
        SimpleScoringSettings(match_score=-1)
    with pytest.raises(ValueError):
        SimpleScoringSettings(mismatch_score=3)
    with pytest.raises(ValueError):
        SimpleCostingSettings(mismatch_cost=0)
    with pytest.raises((TypeError, ValueError)):
        SimpleScoringSettings(match_score="abc")
    s = SimpleScoringSettings(match_score="3", mismatch_score=None,
                              gap_open_score=0, gap_extension_score=-1)
    assert s.match_score == 3 and s.mismatch_score == -3


def test_conflicting_option_groups():
    with pytest.raises(RuntimeError):
        resolve_params(scoring_mat_name="BLOSUM62", match_score=2)
    with pytest.raises(RuntimeError):
        resolve_params(match_score=2, mismatch_cost=5)


def test_api_rejects_bad_inputs(tmp_path):
    with pytest.raises(RuntimeError):
        find_global_alignment(seq_1="AC-GT", seq_2="AC")
    with pytest.raises(RuntimeError):
        find_global_alignment(seq_1="ACGT")  # seq_2 missing
    with pytest.raises(RuntimeError):
        find_global_alignment(seq_1="", seq_2="ACGT")
    fasta = tmp_path / "two.fasta"
    fasta.write_text(">a\nACGT\n>b\nAGT\n")
    with pytest.raises(RuntimeError):
        find_global_alignment(input_fasta=str(fasta), seq_1="ACGT")


def test_api_fasta_and_file_sink(tmp_path):
    fasta = tmp_path / "two.fasta"
    fasta.write_text(">a desc\nACG\nT\n>b desc\nAGT\n")
    out = tmp_path / "aln.txt"
    res = find_global_alignment(input_fasta=str(fasta), output=str(out))
    assert res.score == 0 and res.cost == 7
    res.write()
    text = out.read_text()
    assert "score: 0" in text and "cost: 7" in text
    assert "ACGT" in text and "A-GT" in text


def test_api_lowercase_normalization():
    res = find_global_alignment(seq_1="acgt", seq_2="agt")
    assert res.score == 0 and res.cost == 7


def test_prettify_mat_alignment():
    mat = {"A": {"A": 2, "C": -33}, "C": {"A": -33, "C": 2}}
    s = prettify_mat(mat)
    lines = s.split("\n")
    assert len(lines) == 3
    assert all(len(line) == len(lines[0]) for line in lines[1:])


def test_admission_cap():
    with pytest.raises(RuntimeError):
        find_global_alignment(seq_1="A" * 5000, seq_2="C" * 4001)


def test_draw_random_seq_reference_goldens():
    """Seeded outputs are bit-identical to the reference's own golden tests
    (reference tests/start_test.py:68-115)."""
    from globalign_spark.simulate import draw_random_seq

    assert draw_random_seq(["A", "C", "T", "G"], 7, 10, 19) == "GTTCGCA"
    assert draw_random_seq(["A", "C", "T", "G"], 5, 8, 345) == "AGACGAC"
    assert draw_random_seq([""], 7, 10, 19) == ""
    assert draw_random_seq(["the", "fat", "cat"], 7, 10, 19) == (
        "catfatfatfatcatthethe"
    )


def test_draw_random_seq_errors_match_reference():
    import pytest

    from globalign_spark.simulate import draw_random_seq

    with pytest.raises(ValueError):
        draw_random_seq(["A"], -1, 5, 1)
    with pytest.raises(ValueError):
        draw_random_seq(["A"], 7, 5, 1)
    with pytest.raises(IndexError):
        draw_random_seq([], 3, 5, 1)
    with pytest.raises(TypeError):
        draw_random_seq(None, 3, 5, 1)


@requires_reference
def test_draw_two_random_seqs_matches_reference():
    """Deterministic regimes (divergence 0 => no unseeded substitution
    letters) are call-sequence identical to the reference."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    try:
        from globalign.start import draw_two_random_seqs as ref_draw
    finally:
        sys.path.pop(0)
    from globalign_spark.simulate import draw_two_random_seqs

    for seed_1, seed_2, lens in [
        (1, 2, (20, 30, 20, 30)),
        (7, 7, (10, 15, 18, 25)),
        (99, 3, (30, 30, 12, 12)),
    ]:
        ours = draw_two_random_seqs(
            list("ACGT"), *lens, divergence=0.0, seed_1=seed_1, seed_2=seed_2
        )
        theirs = ref_draw(
            list("ACGT"), *lens, divergence=0.0, seed_1=seed_1, seed_2=seed_2
        )
        assert ours == tuple(theirs)
    # divergence > 0: substitution letters are unseeded in the reference,
    # so only structure is checkable: seq_1 deterministic + length budget.
    s1a, s2a = draw_two_random_seqs(
        list("ACGT"), 40, 40, 40, 40, divergence=0.3, seed_1=5, seed_2=6
    )
    s1b, _ = draw_two_random_seqs(
        list("ACGT"), 40, 40, 40, 40, divergence=0.3, seed_1=5, seed_2=6
    )
    assert s1a == s1b and len(s2a) == 40


@requires_reference
def test_print_nested_list_aligned_matches_reference(capsys):
    import sys

    sys.path.insert(0, "/root/reference/src")
    try:
        from globalign.conclude import (
            print_nested_list_aligned as ref_print,
        )
    finally:
        sys.path.pop(0)
    from globalign_spark.api import print_nested_list_aligned

    rows = [[1, "xy", 300], [22, "z", 4], [333, "", 55]]
    print_nested_list_aligned(rows)
    ours = capsys.readouterr().out
    ref_print(rows)
    theirs = capsys.readouterr().out
    assert ours == theirs
