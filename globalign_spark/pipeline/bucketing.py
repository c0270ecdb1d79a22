"""Bucketed storage for shuffle-free joins (SURVEY.md §4.2 partitioning).

At 10^12 rows the expensive joins are the ones that re-shuffle the pages
table: attaching texts to candidate pairs, re-joining scores to metadata,
incremental merges. Writing the hot tables bucketed by their join key
makes those joins SortMergeJoin-without-Exchange: each bucket pairs with
its twin, no network movement of the big side ever again.

The sandbox has no Hive metastore by default; ``bucketed_writer`` uses the
session catalog (``saveAsTable``), which works with the built-in in-memory
catalog + spark.sql.warehouse.dir. On a cluster the same calls target the
production catalog, or Iceberg's ``write.distribution-mode`` + hidden
``bucket(N, key)`` partition transform replaces them 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` — a
    single column or a composite key like the banded-signature table's
    ``["band_id", "band_hash"]``.

    Sorting within buckets additionally removes the per-task Sort from
    later sort-merge joins — the join becomes a pure zip of pre-sorted
    buckets.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count: Catalyst plans a SortMergeJoin with NO Exchange on either side
    (verified by tests/test_plans.py::test_bucketed_join_no_shuffle).
    """
    return spark.table(left_table).join(spark.table(right_table), key)
