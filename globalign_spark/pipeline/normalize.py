"""Stage 0b — ingest normalization (reference validation P1-P4 as filters).

Reference semantics being reproduced as *distributed filters* instead of
hard errors (a 10^12-row job cannot abort on one bad row):
  - uppercase projection:        /root/reference/src/globalign/start.py:219-220
  - reserved '-' rejection:      /root/reference/src/globalign/start.py:217-218
  - empty-sequence rejection:    /root/reference/src/globalign/start.py:374-375
All built-in column expressions — whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .extract import extract_text, host_of

GAP = "-"


def normalize_pages(pages: DataFrame, text_from_html: bool = False) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, ...) -> normalized frame with
    (url, host, text, norm_text, lang, warc_ts) where norm_text is the
    alignment-ready projection (uppercased, gap chars replaced by space).

    When ``text_from_html`` is set the text column is re-derived from the
    html binary (exercises the byte-identical extractor invariant).
    """
    df = pages
    if text_from_html:
        df = df.withColumn("text", extract_text(F.col("html")))
    df = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    # Latest capture wins per url (web crawls re-see pages).
    df = (
        df.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url").orderBy(F.desc("warc_ts"))
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # '-' is the reserved gap symbol in the aligner; map it to space rather
    # than dropping rows (web text legitimately contains hyphens).
    return df.withColumn("host", host_of(F.col("url"))).withColumn(
        "norm_text", F.upper(F.translate(F.col("text"), GAP, " "))
    )
