"""Single-pair CLI with the reference's exact option surface.

Mirrors the reference console script (`globaligner`,
/root/reference/pyproject.toml:29-30 -> globaligner.py:23-129): same 13
options, same defaults, same output rendering (AlignmentResults.write from
globalign_spark.api is byte-identical to the reference's on tie-free
cases). A user of the reference can run

    python -m globalign_spark.cli --seq_1 ACGT --seq_2 AGT
    python -m globalign_spark.cli -i pairs.fasta -o out.txt

with unchanged semantics; the distributed pipeline CLI lives in
globalign_spark.main.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_repo_root = str(Path(__file__).resolve().parent.parent)
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

VERSION = "0.1.0"


def build_parser() -> argparse.ArgumentParser:
    usage = (
        "Perform optimal global alignment of two nucleotide "
        "or amino acid sequences."
    )
    parser = argparse.ArgumentParser(description=usage, prog="globaligner")
    parser.add_argument("--version", action="version", version=VERSION,
                        help="Prints the version and exits.")
    parser.add_argument("-i", "--input_fasta", required=False,
                        help="File path to a FASTA file containing two "
                             "sequences to align. Do not include if seq_1 "
                             "and seq_2 are provided. If the file contains "
                             "more than 2 sequences, only the first 2 will "
                             "be used.")
    parser.add_argument("-o", "--output", required=False,
                        help="Output file path for the alignment; stdout "
                             "if not provided.")
    parser.add_argument("--seq_1", required=False,
                        help="First sequence to align.")
    parser.add_argument("--seq_2", required=False,
                        help="Second sequence to align.")
    parser.add_argument("--scoring_mat_name", required=False,
                        choices=["BLOSUM50", "BLOSUM62"],
                        help="Named scoring matrix.")
    parser.add_argument("--scoring_mat_path", required=False,
                        help="File path to a custom scoring matrix file.")
    parser.add_argument("--match_score", required=False,
                        help="Score for a match (positive). Default: 2.")
    parser.add_argument("--mismatch_score", required=False,
                        help="Score for a mismatch (negative). Default: -3.")
    parser.add_argument("--mismatch_cost", required=False,
                        help="Cost for a mismatch (positive). Default: 5.")
    parser.add_argument("--gap_open_score", required=False,
                        help="Score for opening a gap run (non-positive). "
                             "Default: -4.")
    parser.add_argument("--gap_open_cost", required=False,
                        help="Cost for opening a gap run (non-negative). "
                             "Default: 4.")
    parser.add_argument("--gap_extension_score", required=False,
                        help="Score for extending a gap run (negative). "
                             "Default: -2.")
    parser.add_argument("--gap_extension_cost", required=False,
                        help="Cost for extending a gap run (positive). "
                             "Default: 3.")
    return parser


def main(argv=None):
    from globalign_spark.api import find_global_alignment

    args = build_parser().parse_args(argv)
    results = find_global_alignment(**vars(args))
    results.write()
    return None


if __name__ == "__main__":
    main()
