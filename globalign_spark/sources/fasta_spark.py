"""Distributed FASTA source (SURVEY §2.1 S1/S2 mapped to Spark).

Reference semantics reproduced (/root/reference/src/globalign/start.py:614-663):
  - records start at '>' header lines; description = header minus '>',
  - sequence = concatenation of following lines, uppercased,
  - empty sequences rejected, '-' forbidden.

Design: files are the unit of parallelism (`wholetext` per file), record
splitting happens in an Arrow-batched mapInPandas — a crawl-scale corpus is
many FASTA files, so this parallelizes with the file count while keeping
multi-line records intact (a line-based reader would need a stateful
cross-partition merge for records spanning splits).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

FASTA_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),
        StructField("description", StringType(), False),
        StructField("sequence", StringType(), False),
    ]
)


def parse_fasta_text(content: str):
    """Yield (description, sequence) from FASTA text (reference-equivalent:
    uppercase, skip blanks before first '>')."""
    desc = None
    chunks: list[str] = []
    for line in content.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            if desc is not None:
                yield desc, "".join(chunks).upper()
            desc = line[1:].strip()
            chunks = []
        elif desc is not None:
            chunks.append(line)
    if desc is not None:
        yield desc, "".join(chunks).upper()


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """(file, description, sequence) rows for every record in every file."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )

    def split_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["file"], pdf["value"]):
                for desc, seq in parse_fasta_text(content):
                    if seq and "-" not in seq:
                        rows.append((fname, desc, seq))
            yield pd.DataFrame(rows, columns=["file", "description", "sequence"])

    return raw.mapInPandas(split_records, schema=FASTA_SCHEMA)
