"""Embedding-path dim-scaling bench (VERDICT r4 item 4).

Measures docs/s of embed_corpus's two implementations — the codegen
column-expression fold ("expr", the SQL-oracle twin, O(tokens x dim) with
a dim-wide array copy per token) and the Arrow-batched np.add.at
scatter-add ("arrow", O(tokens + dim) per row) — at dim 64 / 256 / 768
on the gen_sf documents corpus. Each timing drains the full embed with a
cheap JVM-side aggregate (sum of first vector element) so nothing is
collected and no downstream op pollutes the measurement.

Usage: python tools/embed_bench.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from globalign_spark.ops import embeddings  # noqa: E402
from globalign_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH/r5/embed_dims.json"
    spark = get_spark("embed_bench")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    docs = docs.localCheckpoint()  # scan cost out of the measurement

    results = {}
    for dim in (64, 256, 768):
        for impl in ("expr", "arrow"):
            emb = embeddings.embed_corpus(docs, dim=dim, impl=impl)
            t0 = time.monotonic()
            emb.agg(F.sum(F.element_at("embedding", 1))).collect()
            dt = time.monotonic() - t0
            results[f"dim{dim}_{impl}"] = {
                "sec": round(dt, 3),
                "docs_per_sec": round(n_docs / dt, 1),
            }
            print(f"dim={dim} impl={impl}: {dt:.2f}s "
                  f"({n_docs / dt:,.0f} docs/s)", file=sys.stderr)

    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "master": spark.sparkContext.master,
        "results": results,
        "speedup_arrow_over_expr": {
            f"dim{d}": round(
                results[f"dim{d}_expr"]["sec"]
                / results[f"dim{d}_arrow"]["sec"],
                2,
            )
            for d in (64, 256, 768)
        },
    }
    Path(out_json).parent.mkdir(parents=True, exist_ok=True)
    Path(out_json).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
