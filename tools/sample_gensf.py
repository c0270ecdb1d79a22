"""Deterministic block-complete sub-slice of a gen_sf corpus (VERDICT r4
item 2: make the DuckDB oracle affordable for the 9 alignment-heavy
queries at gen-sf1 shape).

Why a SLICE and not a smaller sf: the alignment/ER oracle twins cost
DuckDB ~850 levenshtein pairs/s/core, so the full gen-sf1 corpus (50k
docs, 6.25M blocked pairs) needs ~2 h/query single-node — while the
engine needs ~3 min. But gen_sf scales a corpus by adding SOURCES at
~constant block size, so a subset of COMPLETE source blocks preserves
exactly the per-block structure the sf1 corpus has (doc lengths,
truncation-variant tails, within-block pair Jaccard distribution — the
shape that exposed the round-4 simhash block-0 bug). Both engines run on
the identical sliced table, so every value-hash compare is as strict as
the full gate.

Selection is content-deterministic: the ``n_sources`` sources with the
smallest md5(source) hex — no RNG, no partition order, reproducible from
the corpus alone.

Usage: python tools/sample_gensf.py <sf> <out_dir> [n_sources=20]
  writes <out_dir>/documents.parquet (the slice) and prints the doc
  count; the full generated corpus is cached at <out_dir>/_full/.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent))
from gen_sf import gen_documents  # noqa: E402


def main() -> None:
    sf = float(sys.argv[1])
    out = Path(sys.argv[2])
    n_sources = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    full = out / "_full"
    full.mkdir(parents=True, exist_ok=True)
    full_docs = full / "documents.parquet"
    if not full_docs.is_file():
        gen_documents(full, sf)

    con = duckdb.connect()
    srcs = [
        r[0]
        for r in con.execute(
            f"select distinct source from read_parquet('{full_docs}')"
        ).fetchall()
    ]
    chosen = sorted(srcs, key=lambda s: hashlib.md5(s.encode()).hexdigest())[
        :n_sources
    ]
    src_list = ", ".join(f"'{s}'" for s in chosen)
    con.execute(
        f"""
        copy (select * from read_parquet('{full_docs}')
              where source in ({src_list})
              order by doc_id)
        to '{out / "documents.parquet"}' (format parquet)
        """
    )
    n = con.execute(
        f"select count(*) from read_parquet('{out / 'documents.parquet'}')"
    ).fetchone()[0]
    print(
        f"slice: {n} docs across {n_sources} complete source blocks "
        f"(of {len(srcs)}) from gen sf={sf}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
