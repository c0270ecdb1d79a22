"""Measure THIS machine's parallel-scaling ceiling, independent of Spark.

Two probes, each run at N and 4N pinned single-threaded worker processes:

- ``compute``: an L1-resident 64x64 float matmul loop — zero shared-memory
  traffic beyond code/stack. Its N -> 4N efficiency is the best ANY
  workload can achieve on this box (it captures frequency scaling,
  hypervisor steal, and scheduler effects only).
- ``stream``: a DRAM-bandwidth-bound int16 streaming min — the worst case,
  showing where bandwidth-bound workloads saturate.

Rationale: the north-rule target (scaling efficiency >= 0.8 from N to 4N
executors) presumes 4N executors bring 4x the memory systems. A single
box's 8 -> 32 cores share one socket's caches, DRAM channels, and turbo
budget, so raw 8 -> 32 efficiency must be read against the measured
compute ceiling, not against 1.0. The probe output is recorded in
BENCH/SCALING.json alongside the engine's own numbers.

Usage: python tools/scaling_ceiling.py [--pairs 4,16 8,32] [--secs 6]
Prints one JSON line: {"compute": {...}, "stream": {...}}.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import statistics
import sys
import time


def worker(core: int, secs: float, mode: str, q) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    if mode == "compute":
        rng = np.random.default_rng(3)
        a = rng.random((64, 64))
        n = 0
        t0 = time.time()
        while time.time() - t0 < secs:
            for _ in range(200):
                a = a @ a * 1e-3
            n += 200
        q.put(n / (time.time() - t0))
    else:
        a = np.zeros(8_000_000, dtype=np.int16)
        b = np.ones_like(a)
        n = 0
        t0 = time.time()
        while time.time() - t0 < secs:
            np.minimum(a, b, out=a)
            n += 1
        q.put(n * a.nbytes * 3 / (time.time() - t0) / 1e9)


def level(w: int, secs: float, mode: str) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(c, secs, mode, q)) for c in range(w)]
    for p in ps:
        p.start()
    tot = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", nargs="*", default=["4,16", "8,32"])
    ap.add_argument("--secs", type=float, default=5.0)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    pairs = [tuple(int(x) for x in p.split(",")) for p in args.pairs]
    levels = sorted({n for p in pairs for n in p})
    out: dict = {}
    for mode in ("compute", "stream"):
        samples = {w: [] for w in levels}
        for _ in range(args.rounds):
            for w in levels:
                samples[w].append(level(w, args.secs, mode))
        med = {w: statistics.median(v) for w, v in samples.items()}
        entry = {f"throughput_{w}": round(med[w], 1) for w in levels}
        for lo, hi in pairs:
            entry[f"eff_{lo}_{hi}"] = round(med[hi] / med[lo] / (hi // lo), 3)
        out[mode] = entry
        print(f"# {mode}: {entry}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
