"""Stage 0a — HTML -> text extraction.

The per-row invariant (BASELINE.json input_hint) is *byte-identical
extracted text per url* versus the reference extractor. The corpus's html is
`<html><body><p>{text}</p></body></html>`-shaped (FIXTURES.md §1), so the
deterministic extractor is: decode UTF-8, strip tags, unescape the five
standard XML entities. All JVM-side built-ins (regexp_replace chain) — stays
inside whole-stage codegen; no Python in this stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def extract_text(html: Column) -> Column:
    """binary html -> extracted text (deterministic, order of rules fixed)."""
    s = F.decode(html, "UTF-8")
    # Drop script/style subtrees first, then comments, then all tags.
    s = F.regexp_replace(s, r"(?is)<(script|style)\b[^>]*>.*?</\1>", "")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    s = F.regexp_replace(s, r"<[^>]*>", "")
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def host_of(url: Column) -> Column:
    """Normalized host: lowercase authority without port or userinfo."""
    h = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    h = F.regexp_replace(h, r"^.*@", "")
    h = F.regexp_replace(h, r":\d+$", "")
    return h
