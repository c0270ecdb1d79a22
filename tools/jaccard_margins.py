import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from globalign_spark.sources.fixtures import _entity_rows

def shingles(t, k=5):
    return {t[i:i+k] for i in range(len(t)-k+1)}

def jac(a, b):
    sa, sb = shingles(a), shingles(b)
    return len(sa & sb) / len(sa | sb)

rng = np.random.default_rng(7)
base_var = {0.02: [], 0.05: [], 0.1: []}
var_var = []
texts = []
for e in rng.integers(0, 50000, 400):
    rows = _entity_rows(42, int(e), 50, 50, 800)
    texts.append(rows[0][3])
    if len(rows) >= 2:
        # divergence of variant v is deterministic from its rng; recompute j
        for v in range(1, len(rows)):
            j = jac(rows[0][3], rows[v][3])
            # bucket by closest divergence class via j is circular; just collect
        js = [jac(rows[0][3], rows[v][3]) for v in range(1, len(rows))]
        for j in js: var_var.append(None)  # placeholder
        base_var.setdefault('all', []).extend(js)
        if len(rows) >= 3:
            var_var.append(jac(rows[1][3], rows[2][3]))

bv = np.array(base_var['all'])
vv = np.array([x for x in var_var if x is not None])
bg = np.array([jac(texts[i], texts[j]) for i, j in zip(rng.integers(0,len(texts),300), rng.integers(0,len(texts),300)) if i != j])
for name, arr in [("base-variant", bv), ("variant-variant", vv), ("background-unrelated", bg)]:
    print(f"{name}: n={len(arr)} p5={np.percentile(arr,5):.3f} p25={np.percentile(arr,25):.3f} med={np.median(arr):.3f} p75={np.percentile(arr,75):.3f} p95={np.percentile(arr,95):.3f}")
for r, b in [(4,16),(3,42),(2,32)]:
    p = lambda j: 1-(1-j**r)**b
    print(f"r={r} b={b}: P(j=med_bv {np.median(bv):.2f})={p(np.median(bv)):.3f} P(j=p5_bv {np.percentile(bv,5):.2f})={p(np.percentile(bv,5)):.3f} P(j=med_bg {np.median(bg):.2f})={p(np.median(bg)):.4f} P(j=p95_bg)={p(np.percentile(bg,95)):.4f}")
