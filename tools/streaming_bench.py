"""Streaming throughput/latency evidence (round-3 verdict item 4).

Drives ``streaming.stream_incremental_er`` over the gen-sf1 documents
corpus (50k docs) as N micro-batches (one parquet file per batch,
maxFilesPerTrigger=1) and reports, per batch: input rows, wall seconds,
rows/s — then exercises the restart claim at the same scale: the stream
is killed after the first half of the batches, the remaining files
arrive, the query restarts from the SAME checkpoint, and the final
cluster partition must be identical to an uninterrupted reference run
(labels canonicalized to each component's min member id).

Usage: python tools/streaming_bench.py [n_batches] [out.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    LongType, StringType, StructField, StructType,
)

from globalign_spark import streaming  # noqa: E402
from globalign_spark.session import get_spark  # noqa: E402

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def ensure_corpus(spark, gen_dir: Path):
    if not (gen_dir / "documents.parquet").exists():
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "tools" / "gen_sf.py"), "1",
             str(gen_dir), "--docs-only"],
            check=True,
        )
    return spark.read.parquet(str(gen_dir / "documents.parquet"))


def write_batches(docs, drop_dir: Path, n_batches: int, lo: int, hi: int):
    """One parquet file per micro-batch, doc_id-range partitioned
    (deterministic, no shuffle of batch membership between runs)."""
    n = docs.count()
    per = (n + n_batches - 1) // n_batches
    for i in range(lo, hi):
        part = docs.where(
            (F.col("doc_id") >= i * per) & (F.col("doc_id") < (i + 1) * per)
        ).select("doc_id", "text")
        tmp = drop_dir.parent / f"_tmp_b{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        src = next(tmp.glob("part-*.parquet"))
        drop_dir.mkdir(parents=True, exist_ok=True)
        shutil.move(str(src), str(drop_dir / f"batch_{i:03d}.parquet"))
        shutil.rmtree(tmp)
    return per


def run_stream(spark, drop_dir: Path, state_dir: Path, ckpt_dir: Path):
    src = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop_dir))
    )
    t0 = time.time()
    q = streaming.stream_incremental_er(
        src, str(state_dir), str(ckpt_dir),
        id_col="doc_id", text_col="text",
    )
    q.awaitTermination()
    wall = time.time() - t0
    progress = [
        {
            "batch_id": p["batchId"],
            # source rows read during the trigger; with the batch persist
            # in stream_incremental_er this equals the file's row count
            # (without it, every extra action re-reads the source and
            # this doubles)
            "rows": p["numInputRows"],
            "batch_sec": round(p["batchDuration"] / 1000.0, 2),
        }
        for p in (q.recentProgress or [])
        if p.get("numInputRows", 0) > 0
    ]
    return wall, progress


def canonical_partition(spark, state_dir: Path) -> dict[int, int]:
    """id -> min id of its component (label-independent partition)."""
    assign = streaming.latest_assignment(spark, str(state_dir))
    rep = assign.groupBy("component").agg(F.min("id").alias("rep"))
    rows = assign.join(rep, "component").select("id", "rep").collect()
    return {r["id"]: r["rep"] for r in rows}


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = (
        Path(sys.argv[2]) if len(sys.argv) > 2
        else REPO / "BENCH" / "r4" / "streaming_bench.json"
    )
    work = Path("/tmp/streaming_bench")
    if work.exists():
        shutil.rmtree(work)
    spark = get_spark("streaming-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = ensure_corpus(spark, Path("/tmp/gensf1_docs"))
    n_docs = docs.count()

    result: dict = {"n_docs": n_docs, "n_batches": n_batches}

    # Reference run: all batches, uninterrupted.
    ref_drop = work / "ref" / "drop"
    write_batches(docs, ref_drop, n_batches, 0, n_batches)
    wall, progress = run_stream(
        spark, ref_drop, work / "ref" / "state", work / "ref" / "ckpt"
    )
    rows_done = sum(p["rows"] for p in progress)
    result["uninterrupted"] = {
        "wall_sec": round(wall, 1),
        "rows": rows_done,
        "rows_per_sec": round(rows_done / wall, 1),
        "per_batch": progress,
        "max_batch_sec": max(p["batch_sec"] for p in progress),
        "median_batch_sec": sorted(
            p["batch_sec"] for p in progress
        )[len(progress) // 2],
    }
    ref_partition = canonical_partition(spark, work / "ref" / "state")

    # Restart run: first half -> stream drains and terminates
    # (availableNow) -> second half arrives -> SAME checkpoint restarts.
    half = n_batches // 2
    r_drop = work / "restart" / "drop"
    write_batches(docs, r_drop, n_batches, 0, half)
    wall1, prog1 = run_stream(
        spark, r_drop, work / "restart" / "state", work / "restart" / "ckpt"
    )
    write_batches(docs, r_drop, n_batches, half, n_batches)
    wall2, prog2 = run_stream(
        spark, r_drop, work / "restart" / "state", work / "restart" / "ckpt"
    )
    res_partition = canonical_partition(spark, work / "restart" / "state")
    result["restart"] = {
        "first_leg_sec": round(wall1, 1),
        "first_leg_batches": len(prog1),
        "second_leg_sec": round(wall2, 1),
        "second_leg_batches": len(prog2),
        "partition_matches_uninterrupted": res_partition == ref_partition,
        "n_ids": len(res_partition),
        "n_components": len(set(res_partition.values())),
    }

    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
