"""Measure the fixture corpus's shingle-Jaccard margins (no Spark).

Samples entities from the deterministic pages fixture and prints the
char-5-shingle Jaccard distribution of three pair classes —
base-variant truth pairs, variant-variant truth pairs, and unrelated
background pairs — plus the per-edge LSH catch probability
1-(1-j^r)^b for candidate bandings. These numbers justify the
PipelineConfig defaults (42 bands x 3 rows, est_jaccard_floor 0.25);
see BENCH/r3/SCALE_EVIDENCE.md §1 layer 2.

Usage: python tools/jaccard_margins.py [n_entities_in_corpus=50000]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from globalign_spark.sources.fixtures import _entity_rows  # noqa: E402


def shingles(t: str, k: int = 5) -> set[str]:
    return {t[i:i + k] for i in range(len(t) - k + 1)}


def jac(a: str, b: str) -> float:
    sa, sb = shingles(a), shingles(b)
    return len(sa & sb) / len(sa | sb)


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    rng = np.random.default_rng(7)
    base_var: list[float] = []
    var_var: list[float] = []
    texts: list[str] = []
    for e in rng.integers(0, n_corpus, 400):
        rows = _entity_rows(42, int(e), 50, 50, 800)
        texts.append(rows[0][3])
        if len(rows) >= 2:
            base_var.extend(jac(rows[0][3], rows[v][3])
                            for v in range(1, len(rows)))
        if len(rows) >= 3:
            var_var.append(jac(rows[1][3], rows[2][3]))

    bg = np.array([
        jac(texts[i], texts[j])
        for i, j in zip(rng.integers(0, len(texts), 300),
                        rng.integers(0, len(texts), 300))
        if i != j
    ])
    bv, vv = np.array(base_var), np.array(var_var)
    for name, arr in [("base-variant", bv), ("variant-variant", vv),
                      ("background-unrelated", bg)]:
        qs = np.percentile(arr, [5, 25, 50, 75, 95])
        print(f"{name}: n={len(arr)} p5={qs[0]:.3f} p25={qs[1]:.3f} "
              f"med={qs[2]:.3f} p75={qs[3]:.3f} p95={qs[4]:.3f}")
    for r, b in [(4, 16), (3, 42), (2, 32)]:
        def p(j: float) -> float:
            return 1 - (1 - j ** r) ** b
        print(f"r={r} b={b}: P(bv_med)={p(float(np.median(bv))):.3f} "
              f"P(bv_p5)={p(float(np.percentile(bv, 5))):.3f} "
              f"P(bg_med)={p(float(np.median(bg))):.4f} "
              f"P(bg_p95)={p(float(np.percentile(bg, 95))):.4f}")


if __name__ == "__main__":
    main()
