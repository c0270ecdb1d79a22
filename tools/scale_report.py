"""Per-query scale-up exponents from two bench runs (VERDICT r2 item 1).

Reads two bench.py JSON outputs at sf_lo and sf_hi (same generator,
tools/gen_sf.py, both sides) and prints a markdown table of
  exponent = log(t_hi / t_lo) / log(sf_hi / sf_lo)
per query: 1.0 = linear in corpus size, < 1 = sublinear (fixed overhead
amortizing), > 1 = superlinear (needs a named cause).

Usage: python tools/scale_report.py BENCH/r3/bench_gensf0.1.json \
           BENCH/r3/bench_gensf1.json
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def main() -> None:
    lo, hi = load(sys.argv[1]), load(sys.argv[2])
    r = hi["sf"] / lo["sf"]
    print(f"| query | t@sf{lo['sf']} s | t@sf{hi['sf']} s | exponent |")
    print("|---|---|---|---|")
    rows = []
    for q, t0 in lo["queries"].items():
        t1 = hi["queries"].get(q)
        if t1 is None:
            continue
        exp = math.log(t1 / t0) / math.log(r) if t0 > 0 else float("nan")
        rows.append((exp, q, t0, t1))
    for exp, q, t0, t1 in sorted(rows, reverse=True):
        print(f"| {q} | {t0} | {t1} | {exp:.2f} |")
    # Totals over the INTERSECTION only: a query present in one file but
    # not the other (e.g. renamed between runs) must not skew the overall
    # exponent by inflating one side's total.
    tot0 = sum(t0 for _, _, t0, _ in rows)
    tot1 = sum(t1 for _, _, _, t1 in rows)
    print(
        f"\ntotal {tot0:.1f}s -> {tot1:.1f}s, overall exponent "
        f"{math.log(tot1 / tot0) / math.log(r):.2f} over a {r:.0f}x "
        "corpus-size step"
    )


if __name__ == "__main__":
    main()
