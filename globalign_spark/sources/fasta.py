"""FASTA sources: a lazy driver-side generator (reference parity) and a
distributed Spark reader.

Reference semantics: /root/reference/src/globalign/start.py:614-688 —
'>'-prefixed description lines, sequence lines concatenated and uppercased,
empty sequences rejected, only the first two records consumed by the
single-pair API.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, Window


def read_seq_from_fasta(fasta_path: Path) -> Iterator[tuple[str, str]]:
    """Lazy (description, sequence) generator — driver-side, for the
    single-pair API and tests."""
    with Path(fasta_path).open() as f:
        first = f.readline().strip()
        if not first.startswith(">"):
            raise RuntimeError(
                "Invalid FASTA format. Expected the first line to start with '>'."
            )
        desc = first
        chunks: list[str] = []
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                seq = "".join(chunks).upper()
                if not seq:
                    raise RuntimeError("Empty sequence detected in FASTA.")
                yield (desc, seq)
                desc = line
                chunks = []
            elif line:
                chunks.append(line)
        seq = "".join(chunks).upper()
        if not seq:
            raise RuntimeError("Empty sequence detected in FASTA.")
        yield (desc, seq)


def read_first_2_seqs_from_fasta(fasta_path: Path) -> tuple[str, str]:
    it = read_seq_from_fasta(fasta_path)
    try:
        _, seq_1 = next(it)
        _, seq_2 = next(it)
    except StopIteration:
        raise RuntimeError("Two sequences could not be read from the FASTA file.")
    return seq_1, seq_2


def read_fasta_df(spark: SparkSession, path: str) -> DataFrame:
    """Distributed FASTA scan -> DataFrame(record_id, description, sequence).

    spark.read.text preserves line order per file via input_file_name +
    a monotonically increasing id; records are formed by a running count of
    header lines ('>' prefix) and grouped. Suitable for fixture ingest; the
    pipeline's primary source is the pages table, not FASTA.
    """
    lines = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("line_id"),
            F.trim(F.col("value")).alias("line"),
        )
        .where(F.length("line") > 0)
    )
    w = Window.partitionBy("file").orderBy("line_id")
    recs = (
        lines.withColumn("is_header", F.col("line").startswith(">"))
        .withColumn("record_id", F.sum(F.col("is_header").cast("long")).over(w))
        .groupBy("file", "record_id")
        .agg(
            F.max(F.when(F.col("is_header"), F.col("line"))).alias("description"),
            F.concat_ws(
                "", F.collect_list(F.when(~F.col("is_header"), F.col("line")))
            ).alias("sequence"),
        )
        .withColumn("sequence", F.upper("sequence"))
        .where(F.length("sequence") > 0)
        .select("record_id", "description", "sequence")
    )
    return recs
