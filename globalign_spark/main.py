"""spark-submit entry point for the full ER pipeline.

  spark-submit --master local[8] --driver-memory 24g \
      --py-files globalign_spark.zip \
      globalign_spark/main.py --warehouse /tmp/er_wh --n-entities 2000

On a real cluster the same invocation runs with --master yarn/k8s and the
pages table read from Iceberg (--pages-table) instead of the synthetic
generator. Resumability: re-running with the same --warehouse skips every
stage whose checkpoint manifest exists (orchestrator.Checkpointer).

Mirrors the reference CLI's role (console script `globaligner`,
/root/reference/pyproject.toml:29-30 -> globaligner.py:23-129) for the
pipeline surface; the single-pair CLI lives in globalign_spark.api.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# spark-submit puts the script's own directory (globalign_spark/) on
# sys.path, not the repo root; make the package importable either way.
# With --py-files globalign_spark.zip the zip is already on the path.
_repo_root = str(Path(__file__).resolve().parent.parent)
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="globalign-spark-pipeline")
    p.add_argument("--warehouse", required=True,
                   help="checkpoint/output directory (parquet stage tables)")
    p.add_argument("--pages-parquet", default=None,
                   help="existing pages table (url, warc_ts, html, text, lang)")
    p.add_argument("--n-entities", type=int, default=2000,
                   help="synthesize a deterministic corpus of this many entities"
                        " when --pages-parquet is not given")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--similarity-threshold", type=float, default=0.8)
    p.add_argument("--num-perm", type=int, default=126)
    p.add_argument("--num-bands", type=int, default=42)
    p.add_argument("--bucket-cap", type=int, default=200)
    p.add_argument("--over-cap-window", type=int, default=8,
                   help="sorted-neighborhood window for over-cap LSH buckets"
                        " (0 = hard-drop them, pre-round-3 semantics)")
    p.add_argument("--est-jaccard-floor", type=float, default=0.25,
                   help="drop LSH candidate pairs whose MinHash-estimated"
                        " Jaccard is below this before alignment (0 = off)")
    p.add_argument("--sn-window", type=int, default=6,
                   help="sorted-neighborhood window (both text orders)")
    p.add_argument("--no-rescue", action="store_true",
                   help="disable the post-clustering singleton rescue pass"
                        " (2-row re-banding of records with no fuzzy edge)")
    p.add_argument("--rescue-rows-per-band", type=int, default=2)
    p.add_argument("--rescue-bucket-cap", type=int, default=500)
    p.add_argument("--rescue-top-k", type=int, default=50,
                   help="best-estimated-Jaccard partners kept per rescued"
                        " singleton (0 = unlimited)")
    p.add_argument("--auto-banding", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="derive (rows_per_band, num_bands) from the corpus's"
                        " measured truth-pair Jaccard histogram (num_perm"
                        " becomes the signature-width budget; the chosen plan"
                        " is recorded in the s1_candidates manifest)."
                        " DEFAULT on since round 5 (measured: 0.9356 vs"
                        " 0.8984 completeness at 1M pages);"
                        " --no-auto-banding restores the fixed plan")
    p.add_argument("--auto-banding-target", type=float, default=0.95,
                   help="blocking pair-completeness target for --auto-banding")
    p.add_argument("--text-from-html", action="store_true",
                   help="re-extract text from the html column (byte-identical"
                        " invariant path)")
    p.add_argument("--evaluate", action="store_true",
                   help="join against generator ground truth and report F1"
                        " (synthetic corpus only)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from globalign_spark.pipeline.orchestrator import PipelineConfig, run_pipeline
    from globalign_spark.session import get_spark
    from globalign_spark.sources.fixtures import labeled_pairs_df, pages_df

    spark = get_spark(
        "globalign-er-pipeline",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    # Under spark-submit the driver JVM pre-exists, so the session
    # builder's spark.driver.memory is silently ignored — and local-mode
    # runs put every executor thread in that heap. Surface it early.
    heap_gb = spark._jvm.Runtime.getRuntime().maxMemory() / (1 << 30)
    if heap_gb < 4:
        print(
            f"WARNING: driver heap is {heap_gb:.1f} GiB; pass "
            "--driver-memory 24g to spark-submit for local[N] runs "
            "(candidate-join + scorer stages need several GiB at 10k+ "
            "pages)",
            file=sys.stderr,
        )
    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet)
        truth = None
    else:
        pages = pages_df(spark, args.n_entities, seed=args.seed)
        truth = labeled_pairs_df(pages) if args.evaluate else None

    cfg = PipelineConfig(
        warehouse=args.warehouse,
        num_perm=args.num_perm,
        num_bands=args.num_bands,
        bucket_cap=args.bucket_cap,
        over_cap_window=args.over_cap_window,
        est_jaccard_floor=args.est_jaccard_floor,
        sn_window=args.sn_window,
        similarity_threshold=args.similarity_threshold,
        text_from_html=args.text_from_html,
        rescue_singletons=not args.no_rescue,
        rescue_rows_per_band=args.rescue_rows_per_band,
        rescue_bucket_cap=args.rescue_bucket_cap,
        rescue_top_k=args.rescue_top_k,
        auto_banding=args.auto_banding,
        auto_banding_target=args.auto_banding_target,
    )
    summary = run_pipeline(spark, pages, cfg, labeled_pairs=truth)
    sc = spark.sparkContext
    summary["spark"] = {
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        # Block-manager count: driver + one per executor JVM. 1 in
        # local[N] (everything in-process), n_executors + 1 on a real /
        # local-cluster deployment — recorded so a run's multi-executor
        # claim is auditable from its own output.
        "block_managers": sc._jsc.sc().getExecutorMemoryStatus().size(),
    }
    print(json.dumps(summary, indent=1, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
