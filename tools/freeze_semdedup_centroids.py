"""Train + freeze the SemDeDup coarse clustering centroids.

Runs ops.similarity.kmeans_centroids on the TEXT-DERIVED feature-hashed
vectors of the sf0.01 documents fixture (ops.embeddings.embed_corpus,
dim 64) and writes globalign_spark/ops/semdedup_frozen.py with the
6-dp-rounded centroid literals — the same train-offline / ship-constants
shape as ops/ivf_frozen.py, which is what makes the `semantic_dedup`
query expressible as bit-reproducible ANSI SQL.

Usage: python tools/freeze_semdedup_centroids.py [sf_dir] [n_centroids]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from globalign_spark.ops import embeddings, similarity  # noqa: E402
from globalign_spark.session import get_spark  # noqa: E402

HEADER = '''"""Frozen SemDeDup coarse-clustering centroids.

Trained ONCE by tools/freeze_semdedup_centroids.py:
ops.similarity.kmeans_centroids (spherical k-means, bounded
deterministic sample) on the TEXT-DERIVED feature-hashed vectors
(ops.embeddings.embed_corpus, dim 64) of the sf0.01 documents fixture,
rounded to 6 dp and committed as literals — the FAISS/SemDeDup
deployment shape: cluster assignment ships as constants, stays fully
distributed, and is bit-reproducible in the DuckDB oracle. At corpus
scale the cluster count is a provisioning knob (SemDeDup used ~110k
clusters at LAION scale); re-freeze from a corpus sample when the text
distribution shifts.
"""

SEMDEDUP_CENTROIDS = [
'''


def main() -> None:
    from globalign_spark.ops import semdedup

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # 24 = provision_cluster_count(the sf0.01 fixture's ~500 embedded
    # docs, target ~20/cluster used for the frozen fixture constants);
    # at-scale deployments pass no explicit count and let the
    # provisioning rule size k from the corpus.
    n_centroids = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("freeze-semdedup", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cents = semdedup.train_centroids(
        docs, dim=64, n_clusters=n_centroids, iters=5,
    )
    out = REPO / "globalign_spark" / "ops" / "semdedup_frozen.py"
    with out.open("w") as f:
        f.write(HEADER)
        for c in cents:
            f.write("    [" + ", ".join(str(x) for x in c) + "],\n")
        f.write("]\n")
    print(f"wrote {len(cents)} centroids x {len(cents[0])} dims to {out}")


if __name__ == "__main__":
    main()
