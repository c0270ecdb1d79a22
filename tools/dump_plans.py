"""Dump formatted physical plans of the headline queries to BENCH/PLANS.md.

Plan hygiene evidence: for each query we record the formatted plan plus a
few automated checks — parquet scans carry pruned ReadSchema / pushed
filters, small dimensions broadcast, and Python appears only as Arrow-
batched ArrowEvalPython / MapInPandas nodes (never row-at-a-time
BatchEvalPython).
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = [
    "align_pairs", "align_pairs_oversize", "er_end_to_end",
    "er_lsh_pipeline", "dedup_exact", "dedup_minhash_lsh",
    "simhash_near_pairs", "ngram_jaccard", "fingerprint_overlap",
    "ann_topk", "ann_lsh", "sorted_neighborhood", "events_window",
    "agg_lineitem", "join_topk", "corpus_curation", "er_incremental",
    "blocking_quality", "cluster_purity", "multi_join", "skew_salted_join",
    "repetition", "line_dedup", "url_dedup", "dup_spans", "pii_redact",
    "corpus_stats", "embed_corpus", "embed_near_dup_text", "ann_text_topk",
    "semantic_dedup",
]


def checks(plan: str) -> list[str]:
    out = []
    scans = plan.count("Scan parquet")
    out.append(f"parquet scans: {scans}")
    rs = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if rs:
        widths = [len(s.split(",")) for s in rs]
        out.append(f"scan column counts (pruning): {widths}")
    if "PushedFilters: [" in plan:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        nonempty = [p for p in pushed if p.strip()]
        out.append(f"pushed filters on {len(nonempty)}/{len(pushed)} scans")
    out.append(
        f"BroadcastHashJoin: {plan.count('BroadcastHashJoin')}, "
        f"SortMergeJoin: {plan.count('SortMergeJoin')}, "
        f"ShuffledHashJoin: {plan.count('ShuffledHashJoin')}"
    )
    # (AQE formatted plans don't print WholeStageCodegen markers; codegen
    # coverage is implied by the node types — Filter/Project/HashAggregate
    # inside exchanges are codegen'd stages.)
    arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
    slow = plan.count("BatchEvalPython")
    out.append(
        f"Python nodes: {arrow} Arrow-batched, {slow} row-at-a-time"
        + (" <-- BAD" if slow else "")
    )
    return out


def main() -> None:
    from globalign_spark.session import get_spark

    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plans", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    sections = []
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        chk = "\n".join(f"- {c}" for c in checks(plan))
        sections.append(
            f"## {name}\n\n{chk}\n\n```\n{plan.strip()}\n```\n"
        )
        print(f"{name}: ok", file=sys.stderr)
    out = REPO / "BENCH" / "PLANS.md"
    out.write_text(
        "# Physical plans (spark explain formatted) — "
        f"sf_dir={sf_dir}\n\n"
        "Checks per query: column-pruned ReadSchema, pushed filters, "
        "join strategies, and that every Python crossing is "
        "Arrow-batched.\n\nNote: `er_end_to_end` / `er_lsh_pipeline` "
        "run their clustering iterations eagerly at plan-construction "
        "time (localCheckpoint-based connected components), so their "
        "printed plan covers only the final components join; the "
        "scoring-stage plan is the one shown under `align_pairs`.\n\n"
        + "\n".join(sections)
    )
    print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
