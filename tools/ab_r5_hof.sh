#!/bin/bash
# Round-5 verdict item 1 proof: adjudicate the three interpreted-HOF
# double-evaluation fixes (cosine NULLIF, simhash filter-before-project,
# unmaterialized embed/assign reuse) as REAL wins vs the r4 tree, with
# the same paired fresh-session interleave as tools/ab_regression.sh.
#
# Usage: bash tools/ab_r5_hof.sh [cycles] [out_file] [r4_commit]
set -u
CYCLES=${1:-3}
OUT=${2:-BENCH/r5/ab_hof_fixes.txt}
R4SHA=${3:-7be7848}
QUERIES=simhash_near_pairs,embedding_near_dup,embed_near_dup_text,semantic_dedup
R4TREE=/tmp/r4tree
if [ ! -f "$R4TREE/bench.py" ]; then
  git worktree add "$R4TREE" "$R4SHA" || exit 1
fi

{
  echo "# A/B adjudication $(date -u +%FT%TZ): r4 ($R4SHA) vs HEAD ($(git rev-parse --short HEAD))"
  echo "# queries: $QUERIES; interleaved fresh sessions, $CYCLES cycles"
  uptime
  for i in $(seq 1 "$CYCLES"); do
    echo "## cycle $i arm=r4"
    (cd "$R4TREE" && python bench.py --queries "$QUERIES" 2>/dev/null | tail -1)
    echo "## cycle $i arm=head"
    python bench.py --queries "$QUERIES" 2>/dev/null | tail -1
    uptime
  done
} | tee "$OUT"
