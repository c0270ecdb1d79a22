"""Deterministic scale-factor fixture generator (sf1 / sf10 evidence runs).

The driver ships read-only fixtures up to sf0.1 (/root/testdata). Scale-up
evidence (VERDICT r2 item 1) needs the SAME ten-table shape at 10-100x the
rows; this generator synthesizes them deterministically (numpy Philox,
seed 42 — no wall clock, no external data) with the driver tables'
schemas, value domains and distributions (verified against sf0.1 via
DuckDB describe/group-by sampling).

Scale rules (relative to the driver's sf0.1 = 1x):
  rows scale linearly with sf for every table, AND so does the number of
  `documents.source` blocks (max(20, 200*sf)): per-block size stays ~250
  docs. That is the 100 TB corpus shape — a web corpus grows by adding
  HOSTS, not by growing each host 10x — and it is what makes blocked
  self-join queries scale linearly in corpus size. A generator that held
  20 sources fixed at sf1 would grow every block 10x and every blocked
  self-join 100x, a shape no real corpus has (and the quadratic would
  measure the fixture, not the engine). The per-query scaling exponents
  reported in BENCH/SCALE_EVIDENCE.md are measured on THIS generator's
  sf0.1 vs sf1 (same generator both sides, no driver-fixture discontinuity).

Usage: python tools/gen_sf.py <sf> <out_dir> [--docs-only]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.42, 0.15, 0.15, 0.14, 0.14]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["blue", "cold", "hot", "large", "new", "small"]
PNOUN = ["anvil", "bolt", "ring", "rod", "widget"]


def rng(tag: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=42, counter=[tag, 0, 0, 0]))


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet")
    print(f"{name}: {table.num_rows} rows", file=sys.stderr)


def gen_documents(out: Path, sf: float) -> None:
    n = int(round(50_000 * sf))
    n_src = max(20, int(round(200 * sf)))
    g = rng(1)
    # word-count per doc: driver texts run 44-577 chars, mean ~297
    n_words = g.integers(8, 110, size=n)
    langs = np.array(LANGS)[
        g.choice(len(LANGS), size=n, p=np.array(LANG_W) / sum(LANG_W))
    ]
    texts = []
    vocab = np.array(VOCAB)
    for i in range(n):
        texts.append(" ".join(vocab[g.integers(0, len(VOCAB), n_words[i])]))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                [f"src{i % n_src}" for i in range(n)], pa.string()
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), pa.int64()
            ),
        }
    )
    _write(out, "documents", tbl)


def gen_embeddings(out: Path, sf: float, dim: int = 64) -> None:
    n = int(round(20_000 * sf))
    # label cardinality scales with the corpus (driver sf0.1 has 10 labels
    # over 2000 vecs = ~200/label): within-label ops (embedding_near_dup)
    # are quadratic in BLOCK size by contract, so a fixed label count at
    # 10x rows would measure the fixture (10x fatter blocks -> 100x
    # pairs), not the engine — same argument as documents.source above.
    n_labels = max(10, int(round(100 * sf)))
    g = rng(2)
    X = (g.random((n, dim), dtype=np.float32) - 0.5) * 0.75
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(g.integers(0, n_labels, n).astype(np.int32)),
        }
    )
    _write(out, "embeddings", tbl)


def gen_tpc(out: Path, sf: float) -> None:
    ts0 = np.datetime64("1995-01-01")
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))

    g = rng(3)
    n_cust = int(round(150_000 * sf))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(g.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(g.uniform(-1000, 10_000, n_cust), 2)),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[g.integers(0, 5, n_cust)]
        ),
    }))

    n_supp = int(round(10_000 * sf))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(g.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(g.uniform(0, 10_000, n_supp), 2)),
    }))

    n_part = int(round(200_000 * sf))
    adj = np.array(PADJ)[g.integers(0, len(PADJ), n_part)]
    noun = np.array(PNOUN)[g.integers(0, len(PNOUN), n_part)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in g.integers(1, 26, n_part)]
        ),
        "p_type": pa.array(np.array(PTYPES)[g.integers(0, 6, n_part)]),
        "p_size": pa.array(g.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(
            np.round(900.0 + np.arange(n_part) * 0.1, 2)
        ),
    }))

    n_ord = int(round(1_500_000 * sf))
    odate = ts0 + g.integers(0, 2400, n_ord).astype("timedelta64[D]")
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(g.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[g.integers(0, 3, n_ord)]
        ),
        "o_totalprice": pa.array(np.round(g.uniform(1000, 400_000, n_ord), 2)),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[g.integers(0, 5, n_ord)]
        ),
    }))

    n_li = int(round(6_000_000 * sf))
    sdate = ts0 + g.integers(1, 2500, n_li).astype("timedelta64[D]")
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(g.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(g.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(g.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(g.integers(1, 8, n_li).astype(np.int32)),
        "l_quantity": pa.array(g.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(g.uniform(900, 100_000, n_li), 2)),
        "l_discount": pa.array(np.round(g.uniform(0, 0.1, n_li), 2)),
        "l_tax": pa.array(np.round(g.uniform(0, 0.08, n_li), 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[g.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(np.array(["F", "O"])[g.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate.astype("datetime64[us]")),
    }))

    n_ev = int(round(1_000_000 * sf))
    n_users = int(round(15_000 * sf))
    ev0 = np.datetime64("2024-01-01T00:00:00")
    # ~30-day window regardless of sf (event RATE grows, not history)
    offs = np.sort(g.integers(0, 30 * 86_400 * 1_000_000, n_ev))
    # zipf-ish user skew like the driver's (hot users exist at every sf)
    u = (g.zipf(1.3, n_ev) - 1) % n_users
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array((ev0 + offs.astype("timedelta64[us]"))),
        "user_id": pa.array(u.astype(np.int64)),
        "event_type": pa.array(np.array(ETYPES)[g.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(g.uniform(0, 560, n_ev), 2)),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in g.integers(0, 100, n_ev)]
        ),
    }))


def main() -> None:
    sf = float(sys.argv[1])
    out = Path(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)
    docs_only = "--docs-only" in sys.argv
    gen_documents(out, sf)
    gen_embeddings(out, sf)
    if not docs_only:
        gen_tpc(out, sf)
    print(f"wrote sf={sf} to {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
