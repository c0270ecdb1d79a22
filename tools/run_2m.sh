#!/bin/bash
# Round-3 verdict item 5: push the ER pipeline one more octave (2M pages)
# with a peak-memory + scratch-disk profile alongside.
#
# Samples every 15 s into $OUT.mem.jsonl: JVM RSS (the spark-submit
# process tree), python worker RSS sum, and the Spark scratch-dir disk
# footprint (shuffle + spill + checkpoints) — the per-host numbers the
# "scales per-host with N executors" argument needs as measurements.
#
# Usage: bash tools/run_2m.sh [n_entities] [out_json]
set -u
N=${1:-1052000}
OUT=${2:-BENCH/r4/pipeline_2m.json}
WH=/tmp/er_wh_2m
LOG=/tmp/pipeline_2m.log

sample_loop() {
  while true; do
    ts=$(date +%s)
    jvm_rss=$(ps -o rss= -C java 2>/dev/null | awk '{s+=$1} END {print s+0}')
    py_rss=$(ps axo rss=,command= | grep -E "pyspark.daemon|pyspark.worker" | grep -v grep | awk '{s+=$1} END {print s+0}')
    tmp_kb=$(du -sk /tmp/er_wh_2m /tmp/spark-* /tmp/blockmgr-* 2>/dev/null | awk '{s+=$1} END {print s+0}')
    echo "{\"ts\": $ts, \"jvm_rss_kb\": $jvm_rss, \"pyworker_rss_kb\": $py_rss, \"scratch_kb\": $tmp_kb}"
    sleep 15
  done
}

sample_loop >> "$OUT.mem.jsonl" &
SAMPLER=$!
trap "kill $SAMPLER 2>/dev/null" EXIT

start=$(date +%s)
spark-submit --master "local[32]" --driver-memory 48g \
  /root/repo/globalign_spark/main.py \
  --warehouse "$WH" --n-entities "$N" --evaluate \
  --shuffle-partitions 256 \
  > "$LOG" 2>&1
rc=$?
end=$(date +%s)
echo "spark-submit rc=$rc wall=$((end-start))s"
# main.py prints the summary JSON at the end of its log
python3 - "$LOG" "$OUT" "$((end-start))" <<'EOF'
import json, re, sys
log, out, wall = sys.argv[1], sys.argv[2], int(sys.argv[3])
txt = open(log, errors="replace").read()
m = re.search(r"^\{.*\}\s*$", txt, re.S | re.M)
start = txt.rfind("\n{")
blob = txt[start + 1:] if start != -1 else "{}"
try:
    summary = json.loads(blob)
except Exception:
    summary = {"parse_error": blob[-500:]}
summary["wall_sec_total"] = wall
json.dump(summary, open(out, "w"), indent=2)
print(json.dumps({k: summary.get(k) for k in ("f1", "precision", "recall", "wall_sec_total")}))
EOF
exit $rc
