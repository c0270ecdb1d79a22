"""Stage 0a — HTML -> text extraction.

The per-row invariant (BASELINE.json input_hint) is *byte-identical
extracted text per url* versus the reference extractor. The corpus's html is
`<html><body><p>{text}</p></body></html>`-shaped (FIXTURES.md §1), so the
deterministic fast path is: decode UTF-8, strip tags, unescape the five
standard XML entities — all JVM-side built-ins (regexp_replace chain),
inside whole-stage codegen, no Python.

Real Common-Crawl HTML needs more, so the extractor is tiered:

- tag stripping understands quoted attribute values (a literal ``>`` inside
  ``title="a>b"`` must not terminate the tag) and drops script/style/
  comment subtrees — still pure codegen;
- ``entities="full"`` additionally resolves numeric character references
  (``&#233;`` / ``&#xE9;``, with or without the trailing ``;``) and the
  full HTML5 named set — including the legacy semicolon-less refs like
  ``&gt`` — via an Arrow-batched pandas UDF over ``html.unescape``,
  applied ONLY to rows still carrying such a token after the named fast
  path, so the Python crossing is pay-per-rare-row, not per-corpus;
- ``normalize_ws=True`` collapses whitespace runs to single spaces and
  trims (off by default: the byte-identity invariant forbids it for the
  fixture corpus).
"""

from __future__ import annotations

import html.entities

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tag pattern: quoted attribute sections may contain '>', so the tag body
# is (not > or quote) | "..." | '...'. Unterminated constructs fall through
# unstripped rather than swallowing the rest of the document.
_TAG = "<(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"

_NAMED = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
          ("&#39;", "'"), ("&amp;", "&")]

# Screen for rows that must cross into the html.unescape pandas UDF in
# entities="full" mode. It must match every token class html.unescape
# resolves, or parity silently breaks for that class:
#   - numeric refs, WITH OR WITHOUT the trailing ';' (&#65 -> "A"),
#   - ';'-terminated named refs (&eacute;),
#   - the HTML5 legacy named refs that resolve WITHOUT a ';' (&gt, &copy,
#     ... — the 106 semicolon-less keys of html.entities.html5).
# Over-matching is safe (the row crosses to Python and unescape(raw)
# agrees with the named fast path byte-for-byte); under-matching is the
# bug this pattern exists to prevent.
_LEGACY_NAMED = "|".join(
    sorted((k for k in html.entities.html5 if not k.endswith(";")),
           key=len, reverse=True)
)
_ENTITY_SCREEN = (
    "&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*;|(?:%s))"
    % _LEGACY_NAMED
)


def strip_tags(s: Column) -> Column:
    """Drop script/style subtrees, comments, then all tags (codegen)."""
    s = F.regexp_replace(s, r"(?is)<(script|style)\b[^>]*>.*?</\1>", "")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    return F.regexp_replace(s, _TAG, "")


def _unescape_full(col: Column) -> Column:
    """Full HTML5 entity resolution (named + decimal/hex numeric refs) via
    an Arrow-batched pandas UDF; only invoked on rows the caller has
    already screened as containing residual entities."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: `from __future__ import annotations` stringifies hints, and
    # pyspark resolves them via the function's globals — so the signature
    # is declared with explicit non-deferred types here.
    def _unescape(s):
        import html as _html

        return s.map(lambda t: _html.unescape(t) if t is not None else None)

    _unescape.__annotations__ = {"s": pd.Series, "return": pd.Series}
    unescape = pandas_udf(_unescape, "string")
    return unescape(col)


def extract_text(
    html: Column,
    entities: str = "named",
    normalize_ws: bool = False,
) -> Column:
    """binary html -> extracted text (deterministic, order of rules fixed).

    ``entities``: "named" = the five standard XML entities, pure codegen
    (the fixture-parity mode); "full" = HTML5 named + numeric refs, with a
    pandas-UDF fallback on the (rare) rows still carrying ``&...;`` after
    the named pass. Named entities resolve identically in both modes
    (``&amp;`` last, so ``&amp;lt;`` yields the literal ``&lt;`` — no
    double-unescape).
    """
    s = F.decode(html, "UTF-8")
    s = strip_tags(s)
    for ent, ch in _NAMED:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    if entities == "full":
        # Residual entity tokens AFTER the named pass -> full resolver
        # (see _ENTITY_SCREEN for the exact token classes, including the
        # semicolon-less legacy named refs html.unescape resolves).
        # The screen runs on the post-named text s (so a row whose only
        # entities are the five common ones never crosses into Python),
        # but the resolver re-derives from the stripped ORIGINAL: running
        # html.unescape on s would re-unescape what &amp; produced
        # (&amp;lt; -> &lt; must stay literal). Safe because the named
        # pass only ever rewrites the five exact `&x;` literals — it can
        # neither create nor destroy any OTHER entity token, and on the
        # one token it can create (&amp;lt; -> &lt;) single-pass
        # html.unescape(raw) agrees with the named pass byte-for-byte.
        raw = strip_tags(F.decode(html, "UTF-8"))
        s = F.when(s.rlike(_ENTITY_SCREEN), _unescape_full(raw)).otherwise(s)
    if normalize_ws:
        s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return s


def host_of(url: Column) -> Column:
    """Normalized host: lowercase authority without port or userinfo."""
    h = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    h = F.regexp_replace(h, r"^.*@", "")
    h = F.regexp_replace(h, r":\d+$", "")
    return h
