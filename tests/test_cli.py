"""Single-pair CLI (globalign_spark/cli.py) vs the reference console script.

The reference CLI is `globaligner` (console script,
/root/reference/pyproject.toml:29-30); ours is
`python -m globalign_spark.cli` with the identical 13-option surface.
Output comparison is byte-level on tie-free cases (tie-broken traceback
strings are random in the reference — SURVEY.md §2.8 C4).
"""

import subprocess
import sys

import pytest

from tests.conftest import requires_reference

REF_ENV = {"PYTHONPATH": "/root/reference/src"}


def run_ours(args):
    return subprocess.run(
        [sys.executable, "-m", "globalign_spark.cli", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


def run_ref(args):
    """Drive the reference through its library entry. Its console script
    body is exactly find_global_alignment(**argparse_vars) + .write()
    (globaligner.py:120-127), but `python -m globalign.globaligner` dies in
    version('globalign') because the dist isn't pip-installed here — so we
    replicate the two calls with the same kwargs the parser would produce.
    """
    kw = {}
    it = iter(args)
    for a in it:
        key = a.lstrip("-")
        key = {"i": "input_fasta", "o": "output"}.get(key, key)
        kw[key] = next(it)
    script = (
        "from globalign.globaligner import find_global_alignment\n"
        f"r = find_global_alignment(**{kw!r})\n"
        "r.write()\n"
    )
    return subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, env=REF_ENV,
    )


@requires_reference
def test_cli_stdout_matches_reference_bytes():
    args = ["--seq_1", "ACGT", "--seq_2", "AGT"]
    ours, ref = run_ours(args), run_ref(args)
    assert ours.returncode == 0
    assert ref.returncode == 0
    assert ours.stdout == ref.stdout


@requires_reference
def test_cli_named_matrix_and_gap_open():
    args = [
        "--seq_1", "HEAGAWGHEE", "--seq_2", "PAWHEAE",
        "--scoring_mat_name", "BLOSUM50", "--gap_open_score", "-5",
    ]
    ours, ref = run_ours(args), run_ref(args)
    assert ours.returncode == 0 and ref.returncode == 0
    # score/cost lines always match; aligned strings may tie-break apart
    ours_sc = [ln for ln in ours.stdout.splitlines()
               if ln.startswith(("score:", "cost:"))]
    ref_sc = [ln for ln in ref.stdout.splitlines()
              if ln.startswith(("score:", "cost:"))]
    assert ours_sc == ref_sc and len(ours_sc) == 2


@requires_reference
def test_cli_fasta_input_and_file_output(tmp_path):
    fasta = tmp_path / "pairs.fasta"
    fasta.write_text(">a\nACGTACGT\n>b\nACGTCGT\n")
    out_ours = tmp_path / "ours.txt"
    out_ref = tmp_path / "ref.txt"
    assert run_ours(["-i", str(fasta), "-o", str(out_ours)]).returncode == 0
    assert run_ref(["-i", str(fasta), "-o", str(out_ref)]).returncode == 0
    assert out_ours.read_text() == out_ref.read_text()


def test_cli_conflicting_options_error():
    r = run_ours([
        "--seq_1", "ACGT", "--seq_2", "AGT",
        "--match_score", "2", "--mismatch_cost", "5",
    ])
    assert r.returncode != 0


def test_cli_version():
    r = run_ours(["--version"])
    assert r.returncode == 0
    assert r.stdout.strip()
