#!/bin/bash
# VERDICT r2 item 2: adjudicate the r2 closing-bench regressions
# (er_lsh_pipeline +78%, dedup_minhash_lsh +52%, ngram_jaccard +29%,
# dedup_exact +120%) as session/load noise vs real regression.
#
# Method (the only one that survives this box, see BENCH/BASELINE.md):
# paired fresh-session runs of ONLY the suspect queries, interleaving
# the r1 tree (git worktree at the "round 1:" commit) with HEAD,
# >= 3 cycles, same window. Each bench.py invocation is its own
# SparkSession, so per-query numbers are order-unbiased.
#
# Usage: bash tools/ab_regression.sh [cycles] [out_file]
set -u
CYCLES=${1:-3}
OUT=${2:-BENCH/r3/ab_regression.txt}
QUERIES=er_lsh_pipeline,dedup_minhash_lsh,ngram_jaccard,dedup_exact
R1TREE=/tmp/r1tree
if [ ! -f "$R1TREE/bench.py" ]; then
  echo "r1 worktree missing — create it first:" >&2
  echo "  git worktree add $R1TREE \$(git log --format=%h --grep='round 1:' | head -1)" >&2
  exit 1
fi

{
  echo "# A/B adjudication $(date -u +%FT%TZ): r1 (2c4a0ef) vs HEAD ($(git rev-parse --short HEAD))"
  echo "# queries: $QUERIES; interleaved fresh sessions, $CYCLES cycles"
  uptime
  for i in $(seq 1 "$CYCLES"); do
    echo "## cycle $i arm=r1"
    (cd "$R1TREE" && python bench.py --queries "$QUERIES" 2>/dev/null | tail -1)
    echo "## cycle $i arm=head"
    python bench.py --queries "$QUERIES" 2>/dev/null | tail -1
    uptime
  done
} | tee "$OUT"
