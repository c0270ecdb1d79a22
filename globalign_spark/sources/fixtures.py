"""Deterministic synthetic `pages` corpus with known entity clusters.

Input-hint shape (BASELINE.json): pages(url string, warc_ts timestamp,
html binary, text string, lang string). Ground truth (entity_id) rides along
in a separate column so tests/metrics can join it; the pipeline itself never
reads it.

Duplicate model mirrors the reference's simulator *semantics* —
`draw_two_random_seqs` (/root/reference/src/globalign/start.py:724-867):
edit budget ceil(divergence*len/3) each of insert/delete/substitute — with
our own seeded implementation (numpy Philox via SeedSequence; we do NOT
promise the reference's CPython-random byte streams, which only its own
tests pin, /root/reference/tests/start_test.py:68-115).

Scale design: generation is itself a distributed job — `spark.range(E)` over
entity ids, `mapInPandas` emits that entity's 1..5 variant rows, each row
seeded by SeedSequence(seed, entity_id, variant_id) so the corpus is
bit-identical regardless of partitioning or cluster size. Host assignment is
deliberately skewed (top host ~20% of rows) to exercise the salted-join path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

VOCAB = (
    "the web page data spark table query join scan filter sort merge group "
    "hash key row column value index store read write fast slow small large "
    "order part line item event user time stamp batch stream window agg "
    "count sum total news article report market price stock share trade "
).split()

LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("entity_id", LongType(), False),
        StructField("variant_id", IntegerType(), False),
    ]
)


def _rng(seed: int, *key: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(np.random.SeedSequence((seed, *key))))


def _base_text(rng: np.random.Generator, min_len: int, max_len: int) -> str:
    target = int(rng.integers(min_len, max_len + 1))
    words = []
    total = 0
    while total < target:
        w = VOCAB[int(rng.integers(0, len(VOCAB)))]
        words.append(w)
        total += len(w) + 1
    return " ".join(words)


def _mutate(rng: np.random.Generator, text: str, divergence: float) -> str:
    """Seeded insert/delete/substitute edits, budget ceil(d*len/3) each
    (same budget model as the reference simulator)."""
    if divergence <= 0:
        return text
    chars = list(text)
    budget = int(np.ceil(divergence * len(chars) / 3))
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    for _ in range(budget):  # substitutions
        p = int(rng.integers(0, len(chars)))
        chars[p] = alphabet[int(rng.integers(0, len(alphabet)))]
    for _ in range(budget):  # deletions
        if len(chars) > 2:
            chars.pop(int(rng.integers(0, len(chars))))
    for _ in range(budget):  # insertions
        p = int(rng.integers(0, len(chars) + 1))
        chars.insert(p, alphabet[int(rng.integers(0, len(alphabet)))])
    return "".join(chars)


def _entity_rows(seed: int, e: int, n_hosts: int, min_len: int, max_len: int):
    rng = _rng(seed, e, 0)
    base = _base_text(rng, min_len, max_len)
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    # ~60% singletons, rest 2-5 variants (near-duplicate cluster).
    r = rng.random()
    n_var = 1 if r < 0.6 else int(rng.integers(2, 6))
    # Zipf-ish host skew: ~20% of entities land on host0.
    host_id = (
        0
        if n_hosts <= 1 or rng.random() < 0.2
        else int(rng.integers(1, n_hosts))
    )
    rows = []
    for v in range(n_var):
        vr = _rng(seed, e, v + 1)
        divergence = 0.0 if v == 0 else float(vr.choice([0.02, 0.05, 0.1]))
        text = _mutate(vr, base, divergence)
        url = f"https://host{host_id}.example.com/p{e}-{v}"
        ts = np.datetime64("2025-01-01") + np.timedelta64(int(e % 365), "D")
        html = b"<html><body><p>" + text.encode("utf-8") + b"</p></body></html>"
        rows.append((url, pd.Timestamp(ts), html, text, lang, e, v))
    return rows


def pages_df(
    spark: SparkSession,
    n_entities: int,
    seed: int = 42,
    n_hosts: int = 50,
    min_len: int = 50,
    max_len: int = 800,
) -> DataFrame:
    """Distributed deterministic pages corpus (~1.9 rows per entity)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for e in pdf["id"]:
                out.extend(_entity_rows(seed, int(e), n_hosts, min_len, max_len))
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "warc_ts", "html", "text", "lang",
                    "entity_id", "variant_id",
                ],
            )

    n_part = max(2, min(64, n_entities // 500 + 2))
    return spark.range(0, n_entities, numPartitions=n_part).mapInPandas(
        gen, schema=PAGES_SCHEMA
    )


def labeled_pairs_df(pages: DataFrame) -> DataFrame:
    """Ground-truth positive pairs (url_1 < url_2, same entity) — derived
    from the generator's entity column, used only by the metrics stage."""
    a = pages.select(
        F.col("url").alias("url_1"), F.col("entity_id").alias("e1")
    )
    b = pages.select(
        F.col("url").alias("url_2"), F.col("entity_id").alias("e2")
    )
    return (
        a.join(b, F.col("e1") == F.col("e2"))
        .where(F.col("url_1") < F.col("url_2"))
        .select("url_1", "url_2", F.lit(True).alias("is_same_entity"))
    )
