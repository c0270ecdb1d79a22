"""Unit tests for the web-curation ops: URL canonicalization/dedup,
Gopher-style repetition signals, CCNet-style corpus line dedup."""

from pyspark.sql import functions as F

from globalign_spark.ops import text as text_ops
from globalign_spark.ops import web


def test_canonical_url_collapses_cc_duplicate_classes(spark):
    cases = [
        # (input, expected canonical)
        ("HTTPS://WWW.Example.COM:443/Path/To/page/?utm_source=x&id=5#frag",
         "https://example.com/Path/To/page?id=5"),
        ("https://example.com/Path/To/page?id=5",
         "https://example.com/Path/To/page?id=5"),
        ("http://user:pw@Example.com:80/a//", "http://example.com/a"),
        ("http://example.com/a", "http://example.com/a"),
        ("https://example.com", "https://example.com"),
        ("https://example.com/?utm_campaign=z", "https://example.com"),
        # mid-query tracking param: separator chain must survive
        ("https://example.com/p?a=1&utm_x=2&b=3",
         "https://example.com/p?a=1&b=3"),
        # non-default port and path case are preserved
        ("https://sub.example.com:8080/P/", "https://sub.example.com:8080/P"),
        # review regressions: query-side rules must not touch the path...
        ("https://en.wikipedia.org/wiki/AT&T",
         "https://en.wikipedia.org/wiki/AT&T"),
        ("https://a.com/download&ref=nav", "https://a.com/download&ref=nav"),
        # ...nor the values of surviving query params
        ("https://a.com/s?path=/docs/", "https://a.com/s?path=/docs/"),
        ("https://a.com/p?next=https://b.com/x/",
         "https://a.com/p?next=https://b.com/x/"),
        # www IS the registrable host here: must not strip
        ("https://www.com/x", "https://www.com/x"),
        # root slash before a query normalizes away with the slash rule
        ("https://h.com/?q=1", "https://h.com?q=1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "doc_id long, url string"
    )
    got = {
        r.doc_id: r.canonical_url
        for r in web.add_canonical_url(df).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i])


def test_url_dedup_keeps_min_id_and_counts(spark):
    df = spark.createDataFrame(
        [
            (7, "https://a.com/x?utm_source=f"),
            (3, "HTTPS://WWW.A.com/x"),
            (9, "https://a.com/x/"),
            (5, "https://b.com/y"),
        ],
        "doc_id long, url string",
    )
    out = {r.canonical_url: r for r in web.url_dedup(df).collect()}
    assert out["https://a.com/x"].keep_id == 3
    assert out["https://a.com/x"].n_urls == 3
    assert out["https://b.com/y"].n_urls == 1
    assert out["https://a.com/x"].canonical_host == "a.com"


def test_repetition_features_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e a b c d e a b c d e"),  # one 5-token line x3
            (2, "p q p q p q p q p q p q"),        # bigram soup, distinct lines
            (3, ""),                                # empty doc
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in text_ops.add_repetition_features(df, line_width=5).collect()
    }
    r1 = out[1]
    assert r1.n_lines == 3
    assert abs(r1.dup_line_frac - (1 - 1 / 3)) < 1e-6
    assert r1.dup_line_char_frac == 1.0  # every line char is in a dup line
    assert r1.repetitive
    r2 = out[2]
    # 11 bigram slots; 'p q' fills 6 of them
    assert abs(r2.top_bigram_frac - 6 / 11) < 1e-6
    assert r2.dup_line_frac == 0.0
    r3 = out[3]
    assert r3.n_lines == 1 and r3.top_bigram_frac == 0.0 and not r3.repetitive


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    # 'cookie banner' line appears in 3 docs -> dropped at max_df=2;
    # unique content lines survive in original order.
    rows = [
        (1, "cookie banner text here unique alpha one two"),
        (2, "cookie banner text here unique beta three four"),
        (3, "cookie banner text here unique gamma five six"),
        (4, "totally unrelated content stands alone fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in text_ops.line_dedup(
            df, line_width=4, max_df=2
        ).collect()
    }
    # each doc = two 4-token lines; line 1 ('cookie banner text here') has
    # df=3 > 2 -> dropped from docs 1-3
    for d in (1, 2, 3):
        assert out[d].n_dropped == 1 and out[d].n_kept == 1
    assert out[1].clean_text == "unique alpha one two"
    assert out[4].n_dropped == 0
    assert out[4].clean_text == rows[3][1]


def test_line_dedup_within_doc_repeat_is_not_corpus_boilerplate(spark):
    # a line repeated inside ONE doc has document-frequency 1 and survives
    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b c d e f")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in text_ops.line_dedup(df, line_width=2, max_df=1).collect()
    }
    assert out[1].n_dropped == 0 and out[1].clean_text == "x y x y x y"


def test_normalize_pages_dedups_recrawls_per_canonical_url(spark):
    from datetime import datetime

    from globalign_spark.pipeline.normalize import normalize_pages

    rows = [
        # same page, three spellings / captures: newest capture must win
        ("https://a.com/x", datetime(2026, 1, 1), b"", "old text", "en"),
        ("HTTPS://WWW.A.com/x", datetime(2026, 3, 1), b"", "new text", "en"),
        ("https://a.com/x?utm_source=f", datetime(2026, 2, 1), b"", "mid text", "en"),
        # different page on the same host
        ("https://a.com/y", datetime(2026, 1, 1), b"", "other page", "en"),
        # empty text is filtered before dedup
        ("https://a.com/z", datetime(2026, 1, 1), b"", "", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = normalize_pages(pages).collect()
    by_curl = {r.canonical_url: r for r in out}
    assert len(out) == 2
    assert by_curl["https://a.com/x"].text == "new text"
    # survivor keeps its raw spelling; host is canonical (www stripped)
    assert by_curl["https://a.com/x"].url == "HTTPS://WWW.A.com/x"
    assert by_curl["https://a.com/x"].host == "a.com"
    assert by_curl["https://a.com/y"].text == "other page"


def test_normalize_pages_tie_break_is_deterministic(spark):
    from datetime import datetime

    from globalign_spark.pipeline.normalize import normalize_pages

    ts = datetime(2026, 1, 1)
    pages = spark.createDataFrame(
        [
            ("https://a.com/x#one", ts, b"", "t1", "en"),
            ("https://a.com/x#two", ts, b"", "t2", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = normalize_pages(pages).collect()
    assert len(out) == 1
    assert out[0].url == "https://a.com/x#two"  # desc raw-url tie-break


# ---------------------------------------------------------------- fuzz
# Structural property fuzz for the canonicalizer: build urls FROM KNOWN
# COMPONENTS (so the expected canonical form is computed from the
# components directly, never by parsing), decorate them with every
# duplicate class the regexp chain claims to remove, and require exact
# agreement. This is an independent oracle for the regex chain — the
# expected value is assembled structurally, not derived from the same
# patterns.

import random as _random


def _expected_canonical(scheme, www, host, port, segs, trail, params, frag):
    s = scheme.lower()
    h = host.lower()
    default = {"http": "80", "https": "443"}[s]
    netloc = h if (port is None or port == default) else f"{h}:{port}"
    path = "".join("/" + seg for seg in segs)
    keep = [(k, v) for k, v in params if not (
        k.startswith("utm_") or k in ("fbclid", "gclid", "ref"))]
    query = "&".join(f"{k}={v}" for k, v in keep)
    # trailing slashes (incl. a bare root slash) strip entirely
    return f"{s}://{netloc}{path}" + (f"?{query}" if query else "")


def _spell(scheme, www, host, port, segs, trail, params, frag, rng):
    case = lambda x: "".join(
        c.upper() if rng.random() < 0.5 else c for c in x)
    u = case(scheme) + "://"
    if rng.random() < 0.3:
        u += "user:pw@" if rng.random() < 0.5 else "bob@"
    if www:
        u += case("www.")
    u += case(host)
    if port is not None:
        u += f":{port}"
    u += "".join("/" + seg for seg in segs)
    if trail:
        u += "/" * rng.randint(1, 3)
    if params:
        u += "?" + "&".join(f"{k}={v}" for k, v in params)
    if frag:
        u += "#sec-2"
    return u


def test_canonical_url_structural_fuzz(spark):
    rng = _random.Random(20260821)
    word = lambda: "".join(
        rng.choice("abcdefgh123") for _ in range(rng.randint(1, 6)))
    rows = []
    for i in range(400):
        scheme = rng.choice(["http", "https"])
        www = rng.random() < 0.4
        host = word() + "." + rng.choice(["com", "org", "io"])
        port = rng.choice([None, None, "80", "443", "8080"])
        segs = [word() for _ in range(rng.randint(0, 3))]
        n_par = rng.randint(0, 3)
        params = []
        for _ in range(n_par):
            if rng.random() < 0.4:
                params.append((rng.choice(
                    ["utm_source", "utm_x", "fbclid", "gclid", "ref"]),
                    word()))
            else:
                params.append((rng.choice(["id", "q", "pageno"]), word()))
        trail = rng.random() < 0.4
        frag = rng.random() < 0.3
        comp = (scheme, www, host, port, segs, trail, params, frag)
        rows.append((i, _spell(*comp, rng), _expected_canonical(*comp)))
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in rows], "doc_id long, url string")
    got = {r.doc_id: r.canonical_url
           for r in web.add_canonical_url(df).collect()}
    bad = [(rows[i][1], got[i], rows[i][2])
           for i in range(len(rows)) if got[i] != rows[i][2]]
    assert not bad, bad[:5]


def test_newline_path_repetition_and_line_dedup(spark):
    # real-page shape: newline-delimited lines, empties removed
    df = spark.createDataFrame(
        [
            (1, "nav home about\ncontent alpha\nnav home about\n\ncontent beta"),
            (2, "nav home about\nunique gamma text"),
            (3, "nav home about\nother page body"),
        ],
        "doc_id long, text string",
    )
    rep = {
        r.doc_id: r
        for r in text_ops.add_repetition_features(
            df, use_newlines=True
        ).collect()
    }
    assert rep[1].n_lines == 4  # empty line dropped
    assert abs(rep[1].dup_line_frac - (1 - 3 / 4)) < 1e-6

    out = {
        r.doc_id: r
        for r in text_ops.line_dedup(
            df, max_df=2, use_newlines=True
        ).collect()
    }
    # 'nav home about' appears in all 3 docs -> dropped (df=3 > 2);
    # doc 1 drops BOTH its copies
    assert out[1].n_dropped == 2
    assert out[1].clean_text == "content alpha\ncontent beta"
    assert out[2].clean_text == "unique gamma text"


def test_duplicate_span_stats_known_values(spark):
    shared = "0123456789abcdefghijklmnopqrs"  # 29 chars, appears in docs 1+2
    df = spark.createDataFrame(
        [
            (1, "XXAAA" + shared + "BBBYY"),
            (2, "QQQZZ" + shared + "WWWPP"),
            (3, "totally unrelated text with no twenty-char overlap at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in text_ops.duplicate_span_stats(df, k=20, max_df=1).collect()
    }
    # only the k-grams fully inside the shared 29-char run collide:
    # 29-20+1 = 10 gram starts, merged span = 29 chars
    assert out[1].dup_chars == 29 and out[2].dup_chars == 29
    assert out[3].dup_chars == 0 and out[3].dup_frac == 0.0
    assert abs(out[1].dup_frac - 29 / len("XXAAA" + shared + "BBBYY")) < 1e-5


def test_duplicate_span_stats_merges_overlaps_within_doc(spark):
    # one doc repeats the OTHER doc's substring twice, separated by filler:
    # two disjoint merged spans, not double-counted gram mass
    shared = "abcdefghijklmnopqrstuvwx"  # 24 chars
    df = spark.createDataFrame(
        [
            (1, shared + "-----" + shared),
            (2, "zz" + shared + "zzzzzzzz"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in text_ops.duplicate_span_stats(df, k=20, max_df=1).collect()
    }
    assert out[1].dup_chars == 48  # 2 x 24, intervals merged per occurrence
    assert out[2].dup_chars == 24


def test_curate_corpus_repetition_gate(spark):
    from globalign_spark.ops import curation

    # spam carries an 'en' marker ('the') so lang-id keeps it; its 5-token
    # pseudo-lines cycle with period 3, so dup_line_frac = 1 - 3/8 > 0.3
    spam = ("buy the now " * 13).strip()
    good = ("the quick brown fox jumps over the lazy dog and runs to the "
            "market with a basket of fresh bread and ripe fruit for all")
    other = ("a completely different second page about gardens with the "
             "usual words and plenty of varied content for quality checks")
    df = spark.createDataFrame(
        [(1, good), (2, spam), (3, other)],
        "doc_id long, text string",
    )
    base = {r.doc_id for r in curation.curate_corpus(
        df, quality_min=0.0, tokens_min=1, num_bands=1).collect()}
    gated = {r.doc_id for r in curation.curate_corpus(
        df, quality_min=0.0, tokens_min=1, num_bands=1,
        dup_line_frac_max=0.3, top_bigram_frac_max=0.5).collect()}
    assert 2 in base          # repetition gate off: spam survives curation
    assert 2 not in gated     # gate on: spam dropped
    assert 1 in gated and 3 in gated


def test_corpus_token_stats_exact_percentiles(spark):
    # token counts per lang 'xx': [2, 4, 6, 8] -> p50 = 5.0 (interpolated),
    # p95 = 2 + 0.95*3 intervals... R-7: rank = 0.95*(4-1) = 2.85 ->
    # 6 + 0.85*(8-6) = 7.7
    rows = [
        (1, "a b", "xx"), (2, "a b c d", "xx"),
        (3, "a b c d e f", "xx"), (4, "a b c d e f g h", "xx"),
        (5, "a", "yy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.grp: r for r in text_ops.corpus_token_stats(df).collect()}
    xx = out["xx"]
    assert xx.n_docs == 4 and xx.total_tokens == 20
    assert xx.mean_tokens == 5.0
    assert xx.p50_tokens == 5.0
    assert abs(xx.p95_tokens - 7.7) < 1e-6
    assert out["yy"].p50_tokens == 1.0


def test_corpus_token_stats_approx_bounded_by_exact(spark):
    # 500 docs with token counts 1..500 in one group: the GK sketch's
    # returned value must be an OBSERVED count whose rank is within
    # n/accuracy of the true percentile rank.
    n, accuracy = 500, 100
    rows = [(i, "w " * i, "xx") for i in range(1, n + 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    approx = text_ops.corpus_token_stats(df, approx=True, accuracy=accuracy)
    row = approx.collect()[0]
    assert row.n_docs == n and row.total_tokens == n * (n + 1) // 2
    counts = list(range(1, n + 1))
    eps = n / accuracy
    for p, got in [(0.5, row.p50_tokens), (0.95, row.p95_tokens)]:
        assert got in counts  # observed value, not interpolated
        rank = counts.index(int(got))
        assert abs(rank - p * (n - 1)) <= eps + 1, (p, got)
    # schema identical to the exact path (drop-in production swap)
    exact = text_ops.corpus_token_stats(df)
    assert approx.columns == exact.columns
    assert approx.schema == exact.schema


def test_redact_pii_counts_and_order(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "server 192.168.1.20 and backup 10.0.0.7"),
            (3, "ssn 123-45-6789 leaked"),
            # email whose local part is dotted digits: must be ONE <EMAIL>,
            # not an <IP> inside an email
            (4, "from 1.2.3.4@ex.com sent"),
            (5, "clean document with no identifiers"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text_ops.redact_pii(df).collect()}
    assert out[1].n_email == 1 and out[1].clean_text == "mail me at <EMAIL> today"
    assert out[2].n_ipv4 == 2
    assert out[2].clean_text == "server <IP> and backup <IP>"
    assert out[3].n_ssn == 1 and "<SSN>" in out[3].clean_text
    assert out[4].clean_text == "from <EMAIL> sent"
    # overlap attribution: the dotted-digit local part is counted as the
    # email it sits in, NOT also as an IPv4 — sum(n_*) == tokens inserted
    assert out[4].n_email == 1 and out[4].n_ipv4 == 0
    assert out[5].clean_text == df.collect()[4].text
    assert out[5].n_email == out[5].n_ipv4 == out[5].n_ssn == 0
