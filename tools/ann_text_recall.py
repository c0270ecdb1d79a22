"""ANN recall on CORPUS-DERIVED vectors (round-3 verdict item 2, last leg).

Round 3 measured IVF recall only on the fixture `embeddings` table, whose
near-isotropic noise understates list quality. This script re-measures
every ANN variant's recall@k against brute-force ground truth on vectors
derived from documents.text by ops/embeddings.embed_corpus (feature
hashing), and on the fixture for comparison, writing one JSON artifact.

Usage: python tools/ann_text_recall.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from globalign_spark.ops import embeddings, similarity  # noqa: E402

K = 10
N_QUERIES = 50
DIM = 64


def recall_of(approx, truth) -> float:
    """Mean fraction of each query's true top-k found by the approx run."""
    t = {}
    for r in truth:
        t.setdefault(r.query_id, set()).add(r.neighbor_id)
    a = {}
    for r in approx:
        a.setdefault(r.query_id, set()).add(r.neighbor_id)
    per_q = [
        len(t[q] & a.get(q, set())) / len(t[q]) for q in t if t[q]
    ]
    return round(sum(per_q) / len(per_q), 4)


def measure(corpus, id_col: str, label: str) -> dict:
    queries = corpus.where(F.col(id_col) < N_QUERIES)
    out: dict = {"corpus": label, "k": K, "n_queries": N_QUERIES}

    t0 = time.time()
    truth = similarity.brute_force_topk(
        corpus, queries, k=K, id_col=id_col, vec_col="embedding"
    ).collect()
    out["brute_force_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    lsh = similarity.lsh_bucket_topk(
        corpus, queries, k=K, id_col=id_col, vec_col="embedding",
        n_planes=6, dim=DIM,
    ).collect()
    out["lsh_multiprobe"] = {
        "recall": recall_of(lsh, truth), "sec": round(time.time() - t0, 2)
    }

    t0 = time.time()
    stride = similarity.ivf_topk(
        corpus, queries, k=K, id_col=id_col, vec_col="embedding",
        centroid_stride=50, nprobe=4, max_centroids=40,
    ).collect()
    out["ivf_stride"] = {
        "recall": recall_of(stride, truth), "sec": round(time.time() - t0, 2)
    }

    t0 = time.time()
    cents = similarity.kmeans_centroids(
        corpus, id_col=id_col, vec_col="embedding",
        n_centroids=40, iters=5,
    )
    train_sec = round(time.time() - t0, 2)
    t0 = time.time()
    trained = similarity.ivf_topk(
        corpus, queries, k=K, id_col=id_col, vec_col="embedding",
        nprobe=4, centroids=cents,
    ).collect()
    out["ivf_trained"] = {
        "recall": recall_of(trained, truth),
        "train_sec": train_sec,
        "assign_sec": round(time.time() - t0, 2),
        "n_centroids": len(cents),
        "nprobe": 4,
    }
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        Path(sys.argv[2]) if len(sys.argv) > 2
        else REPO / "BENCH" / "r4" / "ann_text_recall.json"
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    derived = embeddings.embed_corpus(docs, dim=DIM).cache()
    derived.count()
    res_text = measure(derived, "doc_id", f"text-derived dim={DIM} ({sf_dir})")

    fixture = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    fixture.count()
    res_fix = measure(fixture, "vec_id", f"fixture embeddings ({sf_dir})")

    result = {"text_derived": res_text, "fixture": res_fix}
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
