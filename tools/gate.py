"""One-command CI-shape regression gate (round-3 verdict item 8).

Chains the three evidence layers that previously required three hand-run
tools, and emits ONE JSON verdict artifact:

  1. ORACLE GATE  — every __spark_entry__ query vs its DuckDB twin at
                    --sf-dir (rows + schema + value-hash), via the same
                    compare as tools/check_oracles.py.
  2. ISOLATED BENCH — bench.py --isolate --reps N at --bench-sf-dir
                    (fresh JVM per sample, per-query medians).
  3. ADJUDICATION — per-query medians vs a pinned reference bench JSON;
                    queries slower by > --threshold are "suspect". If a
                    git ref is pinned (--baseline-ref), suspects are
                    re-run A/B: interleaved fresh-session cycles of the
                    baseline worktree vs HEAD (the BENCH/BASELINE.md
                    protocol), and each suspect gets a final verdict
                    "regressed" / "noise" from the paired medians.

Usage:
  python tools/gate.py                         # full run, default pins
  python tools/gate.py --quick                 # reps=1, no A/B
  python tools/gate.py --baseline-ref <sha>    # enable phase-3 A/B

Exit code 0 iff the oracle gate is all-green AND no suspect is
adjudicated "regressed".
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

DEFAULT_REF_BENCH = REPO / "BENCH" / "r3" / "bench_isolated_median_sf0.1_42q.json"


def run_gate(sf_dir: str) -> dict:
    import __spark_entry__ as entry
    from check_oracles import compare, duck_conn
    from globalign_spark.session import get_spark

    spark = get_spark("gate", master="local[8]", shuffle_partitions=8)
    con = duck_conn(sf_dir)
    oracles = entry.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        t0 = time.time()
        try:
            msg = compare(name, fn(spark, sf_dir), oracles.get(name), con)
            ok = "FAIL" not in msg
        except Exception as e:  # noqa: BLE001 — record, don't abort the gate
            msg, ok = f"ERROR {type(e).__name__}: {str(e)[:300]}", False
        results[name] = {
            "ok": ok, "detail": msg, "sec": round(time.time() - t0, 1)
        }
        print(f"# gate {name}: {'OK' if ok else 'FAIL'}", file=sys.stderr,
              flush=True)
    spark.stop()
    return {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_fail": sum(1 for r in results.values() if not r["ok"]),
        "queries": results,
    }


def run_isolated_bench(sf_dir: str, reps: int) -> dict:
    cmd = [
        sys.executable, str(REPO / "bench.py"), "--isolate",
        "--reps", str(reps), "--sf-dir", sf_dir,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if proc.returncode != 0:
        return {"error": proc.stderr[-2000:]}
    return json.loads(proc.stdout.strip().splitlines()[-1])


def find_suspects(bench: dict, ref_bench_path: Path, threshold: float) -> dict:
    if not ref_bench_path.is_file():
        return {"error": f"no reference bench at {ref_bench_path}"}
    ref = json.loads(ref_bench_path.read_text())
    ref_q, cur_q = ref.get("queries", {}), bench.get("queries", {})
    rows = {}
    for name, cur in cur_q.items():
        if cur is None:
            rows[name] = {"cur": None, "ref": ref_q.get(name),
                          "status": "failed"}
        elif name not in ref_q or ref_q[name] is None:
            rows[name] = {"cur": cur, "ref": None, "status": "new"}
        else:
            ratio = cur / ref_q[name]
            rows[name] = {
                "cur": cur, "ref": ref_q[name], "ratio": round(ratio, 3),
                "status": "suspect" if ratio > 1 + threshold else "ok",
            }
    return {
        "reference": str(ref_bench_path),
        "threshold": threshold,
        "suspects": [n for n, r in rows.items() if r["status"] == "suspect"],
        "queries": rows,
    }


def run_ab(suspects: list[str], baseline_ref: str, sf_dir: str,
           cycles: int) -> dict:
    """Interleaved fresh-session A/B: baseline worktree vs HEAD."""
    wt = Path(f"/tmp/gate_baseline_{baseline_ref[:12]}")
    if not (wt / "bench.py").is_file():
        proc = subprocess.run(
            ["git", "worktree", "add", "--detach", str(wt), baseline_ref],
            capture_output=True, text=True, cwd=REPO,
        )
        if proc.returncode != 0:
            return {"error": f"worktree add failed: {proc.stderr[-500:]}"}
    # a suspect query may not exist at the baseline ref — drop it from A/B
    probe = subprocess.run(
        [sys.executable, "-c",
         "import __spark_entry__ as e; print('\\n'.join(e.queries()))"],
        capture_output=True, text=True, cwd=wt,
    )
    known = set(probe.stdout.split())
    runnable = [q for q in suspects if q in known]
    out: dict = {"baseline_ref": baseline_ref, "cycles": cycles,
                 "skipped_not_in_baseline": sorted(set(suspects) - known)}
    if not runnable:
        out["verdicts"] = {}
        return out
    qarg = ",".join(runnable)
    samples: dict[str, dict[str, list]] = {
        q: {"baseline": [], "head": []} for q in runnable
    }
    for i in range(cycles):
        for arm, cwd in (("baseline", wt), ("head", REPO)):
            print(f"# ab cycle {i + 1}/{cycles} arm={arm}", file=sys.stderr,
                  flush=True)
            proc = subprocess.run(
                [sys.executable, "bench.py", "--queries", qarg,
                 "--sf-dir", sf_dir],
                capture_output=True, text=True, cwd=cwd,
            )
            if proc.returncode != 0:
                continue
            res = json.loads(proc.stdout.strip().splitlines()[-1])
            for q, t in res["queries"].items():
                samples[q][arm].append(t)
    verdicts = {}
    for q in runnable:
        b, h = samples[q]["baseline"], samples[q]["head"]
        if not b or not h:
            verdicts[q] = {"verdict": "inconclusive", "samples": samples[q]}
            continue
        mb, mh = statistics.median(b), statistics.median(h)
        verdicts[q] = {
            "baseline_median": round(mb, 3),
            "head_median": round(mh, 3),
            "ratio": round(mh / mb, 3),
            "verdict": "regressed" if mh > mb * 1.15 else "noise",
            "samples": samples[q],
        }
    out["verdicts"] = verdicts
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="oracle-gate scale")
    ap.add_argument("--bench-sf-dir", default="/root/testdata/sf0.1",
                    help="isolated-bench scale")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="suspect if median > ref * (1 + threshold)")
    ap.add_argument("--ref-bench", default=str(DEFAULT_REF_BENCH))
    ap.add_argument("--baseline-ref", default=None,
                    help="git ref for phase-3 A/B (omit to skip)")
    ap.add_argument("--ab-cycles", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="reps=1, skip A/B")
    ap.add_argument("--skip-bench", action="store_true",
                    help="oracle gate only")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.quick:
        args.reps, args.baseline_ref = 1, None

    verdict: dict = {"argv": sys.argv[1:]}
    t0 = time.time()
    verdict["gate"] = run_gate(args.sf_dir)

    if not args.skip_bench:
        verdict["bench"] = run_isolated_bench(args.bench_sf_dir, args.reps)
        verdict["adjudication"] = find_suspects(
            verdict["bench"], Path(args.ref_bench), args.threshold
        )
        suspects = verdict["adjudication"].get("suspects", [])
        if suspects and args.baseline_ref:
            verdict["ab"] = run_ab(
                suspects, args.baseline_ref, args.bench_sf_dir,
                args.ab_cycles,
            )

    regressed = [
        q for q, v in verdict.get("ab", {}).get("verdicts", {}).items()
        if v.get("verdict") == "regressed"
    ]
    verdict["summary"] = {
        "gate_green": verdict["gate"]["n_fail"] == 0,
        "suspects": verdict.get("adjudication", {}).get("suspects", []),
        "regressed_confirmed": regressed,
        "wall_sec": round(time.time() - t0, 1),
        "pass": verdict["gate"]["n_fail"] == 0 and not regressed,
    }
    out_path = Path(args.out) if args.out else (
        REPO / "BENCH" / "r4"
        / f"gate_{time.strftime('%Y%m%d_%H%M%S')}.json"
    )
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(verdict, indent=2) + "\n")
    print(json.dumps(verdict["summary"]))
    print(f"# full verdict: {out_path}", file=sys.stderr)
    sys.exit(0 if verdict["summary"]["pass"] else 1)


if __name__ == "__main__":
    main()
