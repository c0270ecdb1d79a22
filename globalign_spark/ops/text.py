"""Text-analysis operators for a training-data pipeline over `documents`.

Everything here is pure built-in column expressions (whole-stage codegen;
no Python UDFs in any hot path). Each operator has an exact ANSI-SQL twin in
``__spark_entry__.oracle_sql`` so the DuckDB harness verifies values, not
just shapes.

Operators:
  - token_count:      whitespace tokens + BPE-ish regex token count
  - quality_score:    length/punctuation/stopword-ratio heuristic
  - lang_id:          marker-stopword n-gram heuristic with argmax
  - doc_fingerprint:  winnowing-style rolling-hash fingerprints (k-gram
                      md5 hashes, sliding-window minima, distinct)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import round6

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "from",
]

# Marker words per language for the n-gram/stopword lang-id heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "una", "que", "para", "por", "con"],
}


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization with empties removed — identical semantics to
    the SQL twin (split on single space, filter '')."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumn("ws_tokens", F.size(ws_tokens(t))).withColumn(
        "bpe_tokens", F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0))
    )


def quality_features(text: Column) -> dict[str, Column]:
    toks = ws_tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS])))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^a-zA-Z0-9 ]"), 0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "stopword_ratio": n_stop / F.greatest(n_tokens, F.lit(1)),
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
        "mean_token_len": (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1)),
    }


def add_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic in [0,1]: rewards mid-length docs with
    some stopwords and sane word lengths, punishes punctuation soup.
    score = 0.4*min(n_tokens/100,1) + 0.3*min(stop_ratio*5,1)
          + 0.3*max(0, 1 - |mean_token_len - 5|/5) - punct_ratio
    clamped to [0,1]; rounded to 6 dp (stable across engines)."""
    f = quality_features(F.col(text_col))
    raw = (
        0.4 * F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
        + 0.3 * F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
        + 0.3
        * F.greatest(
            F.lit(0.0), 1.0 - F.abs(f["mean_token_len"] - 5.0) / F.lit(5.0)
        )
        - f["punct_ratio"]
    )
    # Tie-robust 6-dp rounding (similarity.round6), NOT F.round — see the
    # helper's docstring for the Spark/DuckDB half-ulp divergence it
    # exists to avoid; valid here because the operands are clamped >= 0.
    clamped = F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))
    return (
        df.withColumn("n_tokens", f["n_tokens"])
        .withColumn("stopword_ratio", round6(f["stopword_ratio"]))
        .withColumn("quality_score", round6(clamped))
    )


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word lang-id: hits(lang) = |tokens ∩ markers(lang)| per doc;
    predicted = argmax hits with deterministic tie-break on language code
    (alphabetical, 'und' if zero hits everywhere)."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    hit_cols = [
        F.struct(
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(LANG_MARKERS.items())
    ]
    # array_max on struct(hits, lang): max hits, ties -> max lang code.
    # To get alphabetical-min tie-break, compare on (hits, negated lang) is
    # not expressible; instead sort desc by hits then asc lang via sort_array
    # of struct(-hits, lang) and take element 1.
    best = F.sort_array(
        F.array(
            *[
                F.struct(
                    (-c["hits"]).alias("neg_hits"), c["lang"].alias("lang")
                )
                for c in hit_cols
            ]
        )
    )[0]
    pred = F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn("pred_lang", pred).withColumn(
        "lang_hits", -best["neg_hits"]
    )


def kgram_hashes(text: Column, k: int = 8) -> Column:
    """48-bit integer hash (first 12 hex chars of md5, base-16 decoded) of
    every k-char gram, position order kept — not distinct. BIGINT
    fingerprints keep the winnowing shuffles 8x narrower than 32-char hex
    strings, and DuckDB computes the identical value via
    ``('0x'||substr(md5(g),1,12))::BIGINT``."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.md5(F.substr(text, i, F.lit(k))), 1, 12), 16, 10
        ).cast("long"),
    )


def fingerprint_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003 shape) as
    DISTINCT (id, fp) rows: per-window minima over k-gram md5 hashes.

    posexplode + window-function min (rows between current and window-1
    following) keeps md5 in whole-stage codegen and each gram hashed once —
    the array-of-lambdas formulation would re-evaluate the hash array per
    window through the interpreted expression path.
    """
    w = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    # spread the per-row md5-array build across cores (single parquet split
    # otherwise runs every hash in one task)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.greatest(F.length(text_col) - (k - 1), F.lit(1)).alias("_ng"),
        F.posexplode(kgram_hashes(F.col(text_col), k)).alias("pos", "h"),
    )
    return (
        grams.withColumn("fp", F.min("h").over(w))
        # valid window starts only: pos in [0, n_grams - window]
        .where(F.col("pos") <= F.greatest(F.col("_ng") - window, F.lit(0)))
        .select(F.col("_id").alias("id"), "fp")
        .distinct()
    )


def fingerprint_summary(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, window: int = 4,
) -> DataFrame:
    """(id, n_fingerprints, min_fingerprint) per document."""
    return (
        fingerprint_rows(df, id_col, text_col, k, window)
        .groupBy("id")
        .agg(
            F.count("*").alias("n_fingerprints"),
            F.min("fp").alias("min_fingerprint"),
        )
    )


def fingerprint_overlap_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, window: int = 4, min_common: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Docs sharing >= min_common winnowing fingerprints (distinct-fp
    explode -> equi self-join on fingerprint -> count per pair).

    ``max_df`` drops fingerprints appearing in more than that many docs
    before the self-join: a boilerplate fingerprint shared by d documents
    emits d^2/2 join rows, so an uncapped hot fp is a quadratic skew bomb
    (same discipline as the LSH bucket cap). High-df fingerprints carry no
    dedup signal anyway — they are template/boilerplate text.
    """
    # The winnowing pipeline explodes ~n_chars gram rows per doc and sorts
    # them in a per-doc window — the heaviest subtree here — and feeds
    # three plan branches (df-frequency filter + both join sides).
    # Materializing the DISTINCT (id, fp) rows once (the ~50x smaller
    # output of the explode + window sort) is a consistent paired-run win,
    # though a modest one: 9.4/9.5s vs 10.6s at sf0.1 in an
    # interleaved new/old/new run — the three branches of the un-checked
    # plan largely share scan-side work via exchange reuse. (Contrast
    # dedup_minhash_lsh, where the same materialization measured 1.8x
    # SLOWER — its band-row subtree is a cheap projection.)
    fp = fingerprint_rows(df, id_col, text_col, k, window).localCheckpoint()
    if max_df is not None:
        dfreq = fp.groupBy("fp").agg(F.count("*").alias("_df"))
        fp = fp.join(
            dfreq.where(F.col("_df") <= max_df).drop("_df"), "fp"
        )
    a = fp.select(F.col("id").alias("id_1"), "fp")
    b = fp.select(F.col("id").alias("id_2"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


# ------------------------------------------------------------------ lines
# "Lines" for the repetition / line-dedup operators. Real web pages have
# newline structure; the synthetic corpus is single-line word soup, so the
# operators take the line definition as a parameter: split on '\n' when the
# text has newlines, else chunk the whitespace tokens into fixed-width
# pseudo-lines (deterministic in both engines, so the DuckDB twins verify
# values). Chunking semantics: words[i*w : (i+1)*w] joined by a single
# space, ceil(n/w) chunks, one empty chunk for empty text.


def chunk_lines(text: Column, width: int) -> Column:
    """Array of pseudo-lines: whitespace tokens in fixed-width chunks."""
    words = ws_tokens(text)
    n_chunks = F.ceil(F.size(words) / F.lit(width)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i * width + 1, width), " "),
    )


def split_lines(text: Column) -> Column:
    """Real newline split (web pages with structure), empties removed."""
    return F.filter(F.split(text, "\n"), lambda s: s != "")


def add_repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_width: int = 5,
    use_newlines: bool = False,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    documents dominated by repeated lines or one repeated n-gram are
    boilerplate/spam and poison LLM training data.

    Emits per doc:
      - ``n_lines``            total lines (pseudo-lines unless newlines)
      - ``dup_line_frac``      1 - distinct_lines/lines (count basis)
      - ``dup_line_char_frac`` chars inside duplicated lines / total line
                               chars (Gopher's character basis)
      - ``top_bigram_frac``    share of word-bigram slots taken by the most
                               frequent bigram (0 when < 2 words)
      - ``repetitive``         Gopher-shaped gate: dup_line_frac > 0.30 or
                               top_bigram_frac > 0.18

    Scale shape: two explode -> hash-groupBy legs (lines, bigrams), each
    with map-side partial aggregation, joined back on the doc id — no
    self-join, no window over the corpus, all codegen. Fractions are
    6-dp-rounded via ``similarity.round6`` so the SQL twin is bit-stable.
    """
    t = F.col(text_col)
    lines_arr = split_lines(t) if use_newlines else chunk_lines(t, line_width)
    base = df.select(F.col(id_col).alias("_id"), lines_arr.alias("_lines"),
                     ws_tokens(t).alias("_words"))

    lines = base.select("_id", F.explode("_lines").alias("line"))
    per_line = lines.groupBy("_id", "line").agg(F.count("*").alias("c"))
    line_stats = per_line.groupBy("_id").agg(
        F.sum("c").alias("n_lines"),
        F.count("*").alias("n_distinct"),
        F.sum(F.length("line") * F.col("c")).alias("chars_total"),
        F.sum(
            F.when(F.col("c") > 1, F.length("line") * F.col("c")).otherwise(0)
        ).alias("chars_dup"),
    )

    bigrams = base.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("_words") - 1, F.lit(1))
                ),
                # F.get is 0-based and NULL out-of-bounds (ANSI-safe;
                # element_at would raise under Spark 4's ANSI default).
                # concat_ws skips NULLs, so the <2-word sentinel slot
                # becomes a space-less token the .where below drops.
                lambda i: F.concat_ws(
                    " ", F.get("_words", i - 1), F.get("_words", i)
                ),
            )
        ).alias("bg"),
    ).where(F.col("bg").contains(" "))  # drop the <2-word sentinel slot
    bg_stats = (
        bigrams.groupBy("_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bg"))
    )

    # line_stats covers every doc (chunk_lines emits >= 1 line even for
    # empty text; split_lines docs with no lines have no line stats and are
    # deliberately absent) — no need to re-join the base for the id set.
    out = (
        line_stats.join(bg_stats, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("n_lines").cast("long").alias("n_lines"),
            round6(
                1.0 - F.col("n_distinct") / F.col("n_lines")
            ).alias("dup_line_frac"),
            round6(
                F.col("chars_dup") / F.greatest(F.col("chars_total"), F.lit(1))
            ).alias("dup_line_char_frac"),
            round6(
                F.coalesce(F.col("top_c") / F.col("n_bg"), F.lit(0.0))
            ).alias("top_bigram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("dup_line_frac") > 0.30) | (F.col("top_bigram_frac") > 0.18),
        )
    )
    return out


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_width: int = 5,
    max_df: int = 100,
    use_newlines: bool = False,
) -> DataFrame:
    """Corpus-level line deduplication (CCNet shape, Wenzek et al. 2020):
    drop every line whose hash appears in more than ``max_df`` documents —
    navigation chrome, cookie banners, boilerplate footers — and reassemble
    each document from its surviving lines in order.

    Emits (id, clean_text, n_kept, n_dropped).

    Scale shape: posexplode -> hash-groupBy per line hash (map-side
    partials; the line-frequency table is tiny relative to the corpus) ->
    equi-join back on the 48-bit line hash -> per-doc ordered reassembly
    via sort_array(collect_list(struct(pos, line))). The only wide state is
    per-document (bounded by doc length), never per-corpus. At CC scale the
    frequency table is Zipf-headed: the join key distribution is exactly
    the corpus's boilerplate skew, so the high-df lines being DROPPED are
    also the hot join keys being filtered BEFORE the join-back (the
    frequency side is reduced to df <= max_df rows first).

    Hash width: 48 bits (md5 prefix — the widest integer DuckDB's oracle
    decodes exactly, matching ``kgram_hashes``). A collision between two
    distinct lines merges their document frequencies, so a rare line
    sharing a hash with boilerplate can be over-dropped: expected
    collisions ~ n^2/2^49 — negligible below ~10^9 distinct lines; above
    that, widen to xxhash64 (and lose the SQL twin) or accept the
    CCNet-style tolerance (dedup is a lossy filter by design, and a df
    merge only errs toward dropping).
    """
    t = F.col(text_col)
    lines_arr = split_lines(t) if use_newlines else chunk_lines(t, line_width)
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(lines_arr).alias("pos", "line"),
    ).withColumn(
        "lh",
        F.conv(F.substring(F.md5(F.col("line")), 1, 12), 16, 10).cast("long"),
    )
    freq = exploded.groupBy("lh").agg(
        F.count_distinct("_id").alias("line_df")
    )
    kept = exploded.join(
        freq.where(F.col("line_df") <= max_df).select("lh"), "lh"
    )
    # newline documents are rejoined with newlines so the cleaned text
    # keeps its line structure (a later repetition/line pass must still
    # see lines); chunked pseudo-lines rejoin with the space they were
    # split on.
    sep = "\n" if use_newlines else " "
    rebuilt = (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "line"))
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
    )
    # Per-doc line totals as a COLUMN EXPRESSION on the source rows — the
    # line count is a function of the text alone, so paying a third
    # traversal of the exploded frame (explode + hash + shuffle) for it is
    # pure waste. Docs with zero lines (possible only on the newline path)
    # are absent from the exploded frame and stay absent here, preserving
    # the output row-set exactly.
    n_total_col = (
        F.size(split_lines(t))
        if use_newlines
        else F.greatest(
            F.ceil(F.size(ws_tokens(t)) / F.lit(line_width)).cast("int"),
            F.lit(1),
        )
    )
    totals = (
        df.select(
            F.col(id_col).alias("_id"), n_total_col.alias("n_total")
        )
        .where(F.col("n_total") > 0)
    )
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    max_df: int = 1,
) -> DataFrame:
    """Cross-document duplicate-span statistics (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" measurement,
    k-gram-approximated): how many of a document's characters sit inside a
    k-char substring that also appears in more than ``max_df`` documents.

    Emits (id, n_chars, dup_chars, dup_frac) — the per-doc mass of
    boilerplate/template/copied text. Exact-substring span REMOVAL at the
    reference's suffix-array granularity reduces to the same marked-span
    set; this op reports the mass (the curation-policy input) rather than
    rewriting text.

    Shape: posexplode k-gram hashes (pure codegen, one md5 per gram) ->
    document-frequency table on the 48-bit hash (md5 prefix, see
    ``kgram_hashes``; collisions ~n_grams^2/2^49; map-side partials — the
    Zipf-headed hot grams each collapse to one row per input partition) ->
    join positions against the >max_df hashes only -> per-doc interval
    merge via a running-max window over gram end offsets (sorted by
    position, O(doc grams) state). No self-join anywhere; the biggest
    shuffle key is a gram hash with its df, never a pair.
    """
    t = F.col(text_col)
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.length(t).alias("_len"),
        F.posexplode(kgram_hashes(t, k)).alias("pos", "h"),
    )
    hot = (
        grams.groupBy("h")
        .agg(F.count_distinct("_id").alias("gdf"))
        .where(F.col("gdf") > max_df)
        .select("h")
    )
    end = F.least(F.col("pos") + k, F.col("_len"))
    w = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = (
        grams.join(hot, "h")
        .withColumn(
            "_contrib",
            F.greatest(
                end
                - F.greatest(
                    F.col("pos"), F.coalesce(F.max(end).over(w), F.lit(0))
                ),
                F.lit(0),
            ),
        )
        .groupBy("_id")
        .agg(F.sum("_contrib").alias("dup_chars"))
    )
    totals = df.select(
        F.col(id_col).alias("_id"), F.length(t).alias("n_chars")
    )
    return totals.join(marked, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.coalesce(F.col("dup_chars"), F.lit(0)).cast("long").alias(
            "dup_chars"
        ),
        round6(
            F.coalesce(F.col("dup_chars"), F.lit(0))
            / F.greatest(F.col("n_chars"), F.lit(1))
        ).alias("dup_frac"),
    )


def corpus_token_stats(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group corpus statistics: doc count, token mass, mean and
    p50/p95 of per-doc token counts — the numbers a curation run reports
    per language/source before choosing thresholds.

    Default (``approx=False``): EXACT interpolated ``percentile`` so the
    DuckDB ``quantile_cont`` twin verifies values; both engines use the
    R-7 linear-interpolation definition. Exact percentiles buffer the
    group's values — fine for a handful of lang/source groups at any
    corpus size, wrong for per-host groupings where one group can hold
    10^9 docs.

    Production (``approx=True``): ``approx_percentile`` (Greenwald-Khanna
    sketch, mergeable map-side partials, O(accuracy * log n) memory per
    group regardless of group size). Returns an OBSERVED value whose rank
    differs from the true percentile rank by at most ``n/accuracy`` (no
    interpolation). No exact SQL twin — the `corpus_stats` oracle row
    stays on the exact path; the approx path is pytest-bounded against it
    (rank error ≤ n/accuracy, `tests/test_web_curation.py`).
    """
    n = F.size(ws_tokens(F.col(text_col)))
    if approx:
        pcts = F.approx_percentile(
            F.col("n"),
            F.array(F.lit(0.5), F.lit(0.95)),
            F.lit(accuracy),
        )
        p50 = round6(pcts[0].cast("double")).alias("p50_tokens")
        p95 = round6(pcts[1].cast("double")).alias("p95_tokens")
        # approx_percentile yields both values from ONE sketch; alias the
        # struct once via an agg expression list
        return (
            df.select(F.col(group_col).alias("grp"), n.alias("n"))
            .groupBy("grp")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n").cast("long").alias("total_tokens"),
                round6(F.avg("n")).alias("mean_tokens"),
                p50,
                p95,
            )
        )
    return (
        df.select(F.col(group_col).alias("grp"), n.alias("n"))
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            round6(F.avg("n")).alias("mean_tokens"),
            round6(F.percentile("n", F.lit(0.5))).alias("p50_tokens"),
            round6(F.percentile("n", F.lit(0.95))).alias("p95_tokens"),
        )
    )


# ------------------------------------------------------------------ PII
# Portable patterns (identical semantics in Java regex and RE2): email,
# IPv4, US-SSN-shaped ids. Kept deliberately conservative — char classes,
# bounded repetition, \b word boundaries; no lookaround (RE2), no
# catastrophic backtracking shapes (Java).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
]


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Count and redact PII-shaped spans (the C4/CCNet-style scrub a web
    corpus runs before training): emails, IPv4 addresses, SSN-shaped ids
    replaced by typed placeholder tokens.

    Redaction applies the patterns in PII_PATTERNS order (email first, so
    an address is one <EMAIL>, not an <EMAIL> wrapping an <IP>-like digit
    run), and each ``n_<name>`` is counted on the text as redacted by the
    PRECEDING patterns — so overlapping spans are attributed to exactly
    one pattern and ``sum(n_*)`` equals the number of placeholder tokens
    inserted ('1.2.3.4@ex.com' is n_email=1, n_ipv4=0, one <EMAIL>).
    Pure regexp_count/regexp_replace column expressions — codegen, zero
    shuffle, embarrassingly row-parallel at any corpus size.
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, token)
    return df.select(
        F.col(id_col).alias(id_col), *counts, cur.alias("clean_text")
    )
