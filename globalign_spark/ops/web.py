"""Web-corpus URL operators: canonicalization + URL-level dedup.

A Common-Crawl-style corpus carries the same page under many url spellings
(scheme/host case, default ports, `www.` prefixes, tracking query params,
trailing slashes, fragments). Canonicalizing urls BEFORE any text-level
dedup removes the cheapest duplicate class at zero kernel cost — a
hash-groupBy on the canonical string, the same scale shape as exact text
dedup (`ops/dedup.dedup_exact`).

Everything is built-in regexp/string expressions (whole-stage codegen, no
Python). Each transformation step is small and ordered so the DuckDB SQL
twin in ``__spark_entry__`` can reproduce it exactly; patterns use only
portable regex constructs (char classes, anchors, alternation — no
lookaround), and the SQL twin passes the ``'g'`` flag where Spark's
``regexp_replace`` is implicitly global.

Canonicalization steps, in order (each one motivated by a real CC
duplicate class):
  1. drop the ``#fragment`` (never sent to the server);
  2. lowercase the ``scheme://authority`` prefix (case-insensitive per
     RFC 3986) — the path/query stay case-sensitive;
  3. drop ``userinfo@`` from the authority;
  4. drop default ports ``:80`` (http) / ``:443`` (https);
  5. drop a leading ``www.``;
  6. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
     ``ref``), then repair the separator (``?&`` -> ``?``, trailing
     ``?``/``&`` removed);
  7. strip trailing slashes from the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking params dropped by step 6 (regex alternatives). CAVEAT: the
# default list includes bare ``ref``, which some hosts use semantically
# (e.g. ``?ref=<branch>`` on code hosts) — with the default list, distinct
# pages differing only in ``ref`` collapse to one canonical url and
# ``url_dedup``/``normalize_pages`` keep a single representative. Pass a
# custom ``tracking_params`` list (e.g. without ``ref``) to every entry
# point below when crawling such hosts.
TRACKING_PARAMS = ["utm_[a-zA-Z0-9_]*", "fbclid", "gclid", "ref"]
TRACKING_PARAM_RE = "[?&](" + "|".join(TRACKING_PARAMS) + ")=[^&#]*"


def tracking_param_re(params: list[str]) -> str:
    """Build the step-6 removal regex from a list of param-name patterns."""
    return "[?&](" + "|".join(params) + ")=[^&#]*"


def canonical_url(
    url: Column, tracking_params: list[str] | None = None
) -> Column:
    """Canonical form of a url (codegen-only; see module docstring).

    ``tracking_params`` overrides the dropped query-param list (default
    ``TRACKING_PARAMS``; see its conflation caveat about ``ref``).

    Query-side operations (tracking-param removal, separator repair) run
    on the SPLIT-OFF query component only: an un-anchored pattern over the
    whole url would also rewrite a legal ``&`` in the path (RFC 3986
    allows it — ``/wiki/AT&T``) or strip slashes inside a query value
    (``?next=/docs/``), conflating distinct pages. Likewise the ``www.``
    strip requires another dotted label after it so the registrable host
    ``www.com`` is not rewritten to ``com``.
    """
    tp_re = (
        TRACKING_PARAM_RE
        if tracking_params is None
        else tracking_param_re(tracking_params)
    )
    # 1. fragment
    u = F.regexp_replace(url, "#.*$", "")
    # 2. lowercase scheme://authority, keep path/query case. The authority
    # is everything up to the first /?# after the scheme separator.
    prefix = F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(F.lower(prefix), rest)
    # 3. userinfo
    u = F.regexp_replace(u, "^([a-z][a-z0-9+.-]*://)[^/?#@]*@", "$1")
    # 4. default ports (capture the following delimiter instead of a
    # lookahead — RE2 in the DuckDB twin has no lookaround)
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80([/?#]|$)", "$1$2")
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443([/?#]|$)", "$1$2")
    # 5. leading www. — only when another dotted label follows, so a
    # registrable host like www.com keeps its name
    u = F.regexp_replace(
        u, "^([a-z][a-z0-9+.-]*://)www\\.([^/?#.]+\\.)", "$1$2"
    )
    # 6-7. split at the first '?': query-side ops touch only the query,
    # path-side slash stripping only the base.
    base = F.regexp_extract(u, "^([^?]*)", 1)
    q = F.regexp_replace(u, "^[^?]*", "")
    q = F.regexp_replace(q, tp_re, "")
    # first surviving param lost its '?' to a removed leading tracking
    # param -> promote; a bare '?' / trailing '&' is dropped entirely
    q = F.regexp_replace(q, "^&", "?")
    q = F.regexp_replace(q, "[?&]$", "")
    base = F.regexp_replace(base, "/+$", "")
    return F.concat(base, q)


def host_from_canonical(curl: Column) -> Column:
    """Host of an ALREADY-canonical url (no re-canonicalization)."""
    return F.regexp_replace(
        F.regexp_extract(curl, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1),
        ":[0-9]+$",
        "",
    )


def canonical_host(url: Column) -> Column:
    """Host of the CANONICAL url: lowercase, no userinfo/port/www."""
    return host_from_canonical(canonical_url(url))


def add_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    tracking_params: list[str] | None = None,
) -> DataFrame:
    # canonical_host derives from the canonical_url COLUMN so the ~10-step
    # regexp chain runs once per row, not twice
    return df.withColumn(
        "canonical_url", canonical_url(F.col(url_col), tracking_params)
    ).withColumn(
        "canonical_host", host_from_canonical(F.col("canonical_url"))
    )


def url_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    tracking_params: list[str] | None = None,
) -> DataFrame:
    """One row per canonical url: keep the smallest id (crawl-stable
    representative), count the spellings collapsed into it.

    Scale shape: a single hash-groupBy on the canonical string with
    map-side partial aggregation — no join, no explode; identical to
    exact-text dedup and safe at any corpus size.
    """
    return (
        add_canonical_url(df, url_col, tracking_params)
        .groupBy("canonical_url")
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count("*").alias("n_urls"),
            F.min("canonical_host").alias("canonical_host"),
        )
    )
