"""Spark-free kernel microbenchmark: aggregate align_cost_batch throughput
at W pinned worker processes.

Usage: python tools/kernel_bench.py [--workers 1,8,32] [--pairs 4000]
       [--len 300] [--secs 10] [--band 0]

Each worker pins itself to one core (os.sched_setaffinity), scores the same
seeded synthetic doc-shaped batch repeatedly for ``--secs`` seconds, and
reports pairs/s; the parent prints per-level aggregate throughput and the
N -> 4N efficiencies. This isolates the DP kernel + chunking from all Spark
plumbing, so kernel-level optimizations can be measured in ~1 min.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pairs(n_pairs: int, length: int, seed: int = 11):
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    base = [
        "".join(rng.choice(alpha) for _ in range(length)) for _ in range(64)
    ]
    s1, s2 = [], []
    for i in range(n_pairs):
        t = base[i % 64]
        # near-dup partner: a few point edits
        chars = list(t)
        for _ in range(rng.randint(0, 8)):
            chars[rng.randrange(len(chars))] = rng.choice(alpha)
        s1.append(t)
        s2.append("".join(chars))
    return s1, s2


def worker(core: int, n_pairs: int, length: int, secs: float, band, q,
           budget: int | None = None):
    os.sched_setaffinity(0, {core})
    from globalign_spark.config import unit_cost_params
    from globalign_spark.kernel import CompiledParams
    from globalign_spark.pipeline import scoring
    from globalign_spark.pipeline.scoring import _score_chunk

    import numpy as np

    if budget:
        scoring.BATCH_CELL_BUDGET = budget
    cp = CompiledParams(unit_cost_params())
    s1, s2 = make_pairs(n_pairs, length, seed=17 + core)
    t1 = np.array(s1, dtype=object)
    t2 = np.array(s2, dtype=object)
    sim = 0.8 if band else None
    # warm-up
    _score_chunk(t1[:256], t2[:256], cp, 10**9, sim)
    done = 0
    t0 = time.time()
    while time.time() - t0 < secs:
        _score_chunk(t1, t2, cp, 10**9, sim)
        done += n_pairs
    q.put((core, done, time.time() - t0))


def run_level(w: int, args, budget: int | None = None) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(
            target=worker,
            args=(c, args.pairs, args.len, args.secs, args.band, q, budget),
        )
        for c in range(w)
    ]
    for p in procs:
        p.start()
    total_pairs = 0
    max_wall = 0.0
    for _ in procs:
        _, done, wall = q.get()
        total_pairs += done
        max_wall = max(max_wall, wall)
    for p in procs:
        p.join()
    return total_pairs / max_wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,8,32")
    ap.add_argument("--pairs", type=int, default=2000)
    ap.add_argument("--len", type=int, default=300)
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--budgets", default=None)
    args = ap.parse_args()
    levels = [int(x) for x in args.workers.split(",")]
    # Interleaved rounds + median: single-shot level timings drift +-15%
    # run-to-run on this box (hypervisor frequency/neighbor noise);
    # alternating the levels within one invocation and taking medians
    # cancels the slow drift out of the efficiency ratio.
    import statistics

    budgets = (
        [int(x) for x in args.budgets.split(",")] if args.budgets else [None]
    )
    samples: dict[tuple, list[float]] = {
        (w, b): [] for w in levels for b in budgets
    }
    for r in range(args.rounds):
        for b in budgets:
            for w in levels:
                tput = run_level(w, args, b)
                samples[(w, b)].append(tput)
                print(
                    f"round={r} budget={b} workers={w:3d}  pairs/s={tput:10.1f}",
                    file=sys.stderr,
                )
    res = {
        f"{w}" + (f"@{b}" if b else ""): round(statistics.median(v), 1)
        for (w, b), v in samples.items()
    }
    out = {
        "levels": res,
        "runs": {
            f"{w}" + (f"@{b}" if b else ""): [round(x, 1) for x in v]
            for (w, b), v in samples.items()
        },
    }
    if len(budgets) == 1:
        res = {w: res[f"{w}" + (f"@{budgets[0]}" if budgets[0] else "")] for w in levels}
    for lo, hi in [(4, 16), (8, 32), (1, 8), (1, 32)]:
        if lo in res and hi in res:
            out[f"eff_{lo}_{hi}"] = round(res[hi] / res[lo] / (hi // lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
