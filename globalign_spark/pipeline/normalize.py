"""Stage 0b — ingest normalization (reference validation P1-P4 as filters).

Reference semantics being reproduced as *distributed filters* instead of
hard errors (a 10^12-row job cannot abort on one bad row):
  - uppercase projection:        /root/reference/src/globalign/start.py:219-220
  - reserved '-' rejection:      /root/reference/src/globalign/start.py:217-218
  - empty-sequence rejection:    /root/reference/src/globalign/start.py:374-375
All built-in column expressions — whole-stage codegen, no Python.

Crawl-dedup semantics: a web crawl re-sees pages, and the same page
arrives under many url spellings (scheme/host case, `www.`, default
ports, tracking params, fragments — see ``ops/web.canonical_url``). The
record identity for everything downstream is the CANONICAL url; among a
canonical url's captures the latest ``warc_ts`` wins (ties broken on the
raw url spelling, so the survivor is deterministic). Scale shape: one
shuffle on the canonical url — the same shuffle the raw-url version
already paid — with tiny per-key sort groups (a url's recrawl count,
not the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ops.web import canonical_url
from .extract import extract_text, host_of

GAP = "-"


def normalize_pages(
    pages: DataFrame,
    text_from_html: bool = False,
    canonicalize_urls: bool = True,
    tracking_params: list[str] | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, ...) -> normalized frame with
    (url, canonical_url, host, text, norm_text, lang, warc_ts) where
    norm_text is the alignment-ready projection (uppercased, gap chars
    replaced by space) and ``host`` is the canonical host (blocking key —
    `WWW.X.com` and `x.com` must land in the same block).

    When ``text_from_html`` is set the text column is re-derived from the
    html binary (exercises the byte-identical extractor invariant).
    ``canonicalize_urls=False`` restores raw-spelling identity (exact
    pre-round-3 behavior) for corpora whose urls are already canonical.
    ``tracking_params`` overrides the dropped query-param list; the
    default includes bare ``ref``, which conflates pages on hosts that
    use ``?ref=`` semantically (see ``ops/web.TRACKING_PARAMS`` caveat) —
    all but the latest capture of such a group are dropped here.
    """
    df = pages
    if text_from_html:
        df = df.withColumn("text", extract_text(F.col("html")))
    df = df.where(F.col("text").isNotNull() & (F.length("text") > 0))
    curl = (
        canonical_url(F.col("url"), tracking_params)
        if canonicalize_urls
        else F.col("url")
    )
    df = df.withColumn("canonical_url", curl)
    # Latest capture wins per canonical url (web crawls re-see pages);
    # deterministic survivor via the raw-spelling tie-break.
    df = (
        df.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("canonical_url").orderBy(
                    F.desc("warc_ts"), F.desc("url")
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # '-' is the reserved gap symbol in the aligner; map it to space rather
    # than dropping rows (web text legitimately contains hyphens).
    return df.withColumn(
        "host", host_of(F.col("canonical_url"))
    ).withColumn("norm_text", F.upper(F.translate(F.col("text"), GAP, " ")))
