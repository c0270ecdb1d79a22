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
# periodicGC: shuffle files are only deleted when their RDDs are GC'd on
# the driver; at 1M+ pages the scoring shuffles outlive their stages long
# enough to exhaust the sandbox disk (measured: 80 GB gone in 16 min).
# A 2-min forced driver GC caps live scratch at the working set.
# zstd shuffle compression: the candidate-pair shuffles carry url+text
# strings; zstd packs them ~2x tighter than the lz4 default, and at 1M
# pages that is the difference between ~95 GB of live shuffle (which
# does not fit this sandbox's 80 GB free) and fitting comfortably. CPU
# cost is noise next to the alignment kernel.
spark-submit --master "local[32]" --driver-memory "${DRIVER_MEM:-48g}" \
  --conf spark.cleaner.periodicGC.interval=2min \
  --conf spark.io.compression.codec=zstd \
  /root/repo/globalign_spark/main.py \
  --warehouse "$WH" --n-entities "$N" --evaluate \
  --shuffle-partitions 256 \
  ${EXTRA_ARGS:-} \
  > "$LOG" 2>&1
rc=$?
end=$(date +%s)
echo "spark-submit rc=$rc wall=$((end-start))s"
# main.py prints the summary JSON at the end of its log
python3 - "$LOG" "$OUT" "$((end-start))" <<'EOF'
import json, sys
log, out, wall = sys.argv[1], sys.argv[2], int(sys.argv[3])
txt = open(log, errors="replace").read()
# Brace-match from the LAST line-initial "{": trailing executor-shutdown
# INFO lines after the summary made a naive to-EOF slice unparseable
# (hit for real on the round-5 1M run).
start = txt.rfind("\n{")
summary = {"parse_error": "no JSON found"}
if start != -1:
    blob = txt[start + 1:]
    depth, end = 0, None
    for i, ch in enumerate(blob):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    try:
        summary = json.loads(blob[:end])
    except Exception:
        summary = {"parse_error": blob[:500]}
summary["wall_sec_total"] = wall
json.dump(summary, open(out, "w"), indent=2)
ev = summary.get("eval") or {}
print(json.dumps({"f1": ev.get("f1"), "precision": ev.get("precision"),
                  "recall": ev.get("recall"), "wall_sec_total": wall}))
EOF
exit $rc
