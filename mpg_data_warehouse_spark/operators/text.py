"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token/char statistics, quality scoring, language-ID
heuristic, content fingerprinting.

Everything is built from JVM-side column expressions (split / filter /
transform / aggregate higher-order functions) — no Python UDFs, so the
whole stage stays in whole-stage codegen and scales linearly with no
serialization boundary. At 100 TB these run as a single narrow map
stage over the documents table: no shuffle at all.

Hot-path discipline: every ``*_from`` variant takes an already-bound
token-array column, so multi-metric profiles tokenize ONCE per row
(``text_profile`` projects ``_toks`` first). The plain wrappers embed
the split inline — fine for a single metric, wasteful for several.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal distinctive-stopword sets per language for the n-gram/stopword
# language-ID heuristic. Real pipelines would use character n-gram
# profiles; the engine keeps the same plan shape (pure column math).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "les", "et", "des"),
    "de": ("der", "die", "und", "das", "ist"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the baseline token counter; a BPE-ish
    regex tokenizer is ``bpe_ish_tokens``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-flavored subword proxy: split on whitespace AND
    punctuation/word boundaries, keeping punctuation runs as tokens —
    the cheap token-count estimator used for budget accounting."""
    c = F.col(col) if isinstance(col, str) else col
    # Insert breaks around non-alphanumeric runs, then split.
    marked = F.regexp_replace(c, r"([^\sA-Za-z0-9]+)", r" $1 ")
    return F.filter(F.split(F.trim(marked), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def char_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document length / punctuation / whitespace statistics."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_space = F.length(c) - F.length(F.regexp_replace(c, r"\s", ""))
    return df.withColumns(
        {
            "n_chars": n_chars.cast("long"),
            "n_tokens": token_count(c),
            "punct_ratio": F.round(n_punct / n_chars, 4),
            "space_ratio": F.round(n_space / n_chars, 4),
        }
    )


def stopword_ratio_from(
    toks: Column, stopwords: tuple[str, ...] = STOPWORDS
) -> Column:
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.round(n_stop / F.size(toks), 4)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return stopword_ratio_from(tokens(col), stopwords)


def quality_score_from(c: Column, toks: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + stopword
    presence + mean token length band — the standard cheap pre-filter
    before expensive dedup/model scoring."""
    n_tok = F.size(toks)
    mean_tok_len = (F.length(c) - n_tok + 1) / n_tok
    len_ok = (n_tok >= 10) & (n_tok <= 100000)
    stop_ok = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tok > 0.01
    tok_len_ok = (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
    return F.round(
        (len_ok.cast("double") + stop_ok.cast("double") + tok_len_ok.cast("double"))
        / 3.0,
        4,
    )


def quality_score(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return quality_score_from(c, tokens(c))


def lang_score_from(toks: Column, lang: str) -> Column:
    """Marker hit count for one language."""
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_score(col: Column | str, lang: str) -> Column:
    return lang_score_from(tokens(col), lang)


def lang_id_from(toks: Column) -> Column:
    """Stopword-marker language ID: argmax of per-language marker hit
    counts, alphabetically-first language wins ties (deterministic and
    trivially mirrorable as an ANSI CASE chain for the oracle). Pure
    column math — no UDF, no shuffle."""
    langs = sorted(LANG_MARKERS)
    scores = {lg: lang_score_from(toks, lg) for lg in langs}
    expr = F.lit(langs[-1])
    # Walk backwards: earlier (alphabetical) languages override on >=.
    for lg in reversed(langs[:-1]):
        later = [scores[o] for o in langs if o > lg]
        cond = scores[lg] >= later[0]
        for s in later[1:]:
            cond = cond & (scores[lg] >= s)
        expr = F.when(cond, F.lit(lg)).otherwise(expr)
    return expr


def lang_id(col: Column | str) -> Column:
    return lang_id_from(tokens(col))


ROLL_BASE = 1000003
ROLL_MOD = 2147483647  # 2^31 − 1: acc·B + h < 2^52, exact in int64


def rolling_fingerprint_from(toks: Column) -> Column:
    """Order-SENSITIVE polynomial rolling hash over the token stream:
    h = Σ md5₃₂(tokᵢ)·Bⁿ⁻ⁱ mod M, folded left-to-right in one codegen
    expression. Complements the order-insensitive ``doc_fingerprint``
    (reordered docs collide there, not here). Deterministic and
    mirrored by DuckDB ``list_reduce`` (fold-from-first-element equals
    fold-from-zero for this recurrence)."""
    tok_hash = lambda t: F.conv(  # noqa: E731
        F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10
    ).cast("long")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLL_BASE + tok_hash(t)) % ROLL_MOD,
    )


def rolling_fingerprint(col: Column | str) -> Column:
    return rolling_fingerprint_from(tokens(col))


def doc_fingerprint_from(toks: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set. Survives word reordering and duplication —
    the cheap bucket key for near-dup candidate grouping."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(toks))).cast("binary")
    )


def doc_fingerprint(col: Column | str) -> Column:
    return doc_fingerprint_from(tokens(col))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass full text profile: stats + quality + lang + fingerprint.

    Tokenizes once into a bound ``_toks`` column, then derives every
    token-based metric from it — one regex split per row instead of
    ~10 (HOF lambdas re-evaluate captured expression trees)."""
    c = F.col(text_col)
    toked = char_stats(df, text_col).withColumn("_toks", tokens(text_col))
    return toked.withColumns(
        {
            "stopword_ratio": stopword_ratio_from(F.col("_toks")),
            "quality_score": quality_score_from(c, F.col("_toks")),
            "lang_pred": lang_id_from(F.col("_toks")),
            "fingerprint": doc_fingerprint_from(F.col("_toks")),
        }
    ).drop("_toks")


# ---------------------------------------------------------------------------
# Vocabulary / TF-IDF — corpus-level term statistics.
# ---------------------------------------------------------------------------


def norm_tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens with empties dropped — the
    canonical normalization shared by the vocabulary and TF-IDF ops
    (and mirrored in oracles as
    ``unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))``).

    Empties are dropped with ``array_remove`` rather than a
    ``filter`` lambda: when this expression is embedded inside
    another higher-order function (the DSIR n-gram builder wraps it
    in ``transform``), the nested named-lambda variables collided
    and the OUTER lambda's variable silently resolved against the
    inner filter's, corrupting every gram (caught by the dsir_select
    oracle; pinned by test_dsir_md5_grams_match_reference). A
    lambda-free rewrite composes safely at any nesting depth."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.trim(F.lower(c)), r"\s+"), "")


def doc_term_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-(document, term) frequency: explode normalized tokens, one
    hash-agg on (doc, term). At 100 TB the explode is a narrow map; the
    agg shuffles (doc, term) pairs — partial aggregation collapses
    within-partition repeats first, so the wire carries distinct pairs,
    not raw tokens. ``tokens_col`` consumes an already-tokenized
    array column instead (compositions that score one corpus several
    ways tokenize ONCE and share the persisted arrays — the regex
    split is the map-side CPU hog, not the agg)."""
    toks = (
        F.col(tokens_col) if tokens_col else norm_tokens(text_col)
    )
    return (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_counts(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """Corpus vocabulary with total occurrence counts. One explode +
    one agg keyed by term; map-side combine absorbs the Zipf head, so
    shuffle volume ≈ vocabulary size per partition, not token count.
    ``tokens_col``: see ``doc_term_counts``."""
    toks = (
        F.col(tokens_col) if tokens_col else norm_tokens(text_col)
    )
    return (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """TF-IDF per (document, term): tf × ln(N / df).
    ``tokens_col``: see ``doc_term_counts``.

    Plan shape: one (doc, term) agg → a term-keyed doc-frequency agg
    derived FROM it (no second pass over raw text) → term-keyed join
    to attach idf. The doc-frequency side is |vocabulary| rows —
    orders of magnitude smaller than the corpus, broadcastable for
    real-world vocabularies (≤ a few GB); Spark's AQE converts the
    join to broadcast-hash at runtime when it fits.
    """
    dtc = doc_term_counts(df, id_col, text_col, tokens_col=tokens_col)
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    docfreq = dtc.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    return (
        dtc.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("doc_freq")), 6),
        )
        .drop("n_docs")
    )


# ---------------------------------------------------------------------------
# Redaction — pattern-based PII/content scrubbing.
# ---------------------------------------------------------------------------

# Conservative cross-engine pattern (Java regex AND RE2 compatible: no
# backreferences, no lookaround) — emails plus standalone digit runs.
PII_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|\b\d{4,}\b"


def redaction_count(col: Column | str, pattern: str = PII_PATTERN) -> Column:
    """How many pattern hits a row carries (audit metric — run it
    BEFORE the replace so the report and the scrub share one scan)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("long")


def redact(
    col: Column | str,
    pattern: str = PII_PATTERN,
    replacement: str = "[REDACTED]",
) -> Column:
    """Replace every pattern match. Pure JVM regexp_replace — a narrow
    map over the corpus, no shuffle; keep patterns RE2-safe so the
    same regex drives Spark, DuckDB oracles, and any downstream Go/C++
    scrubbers identically."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, pattern, replacement)


# ---------------------------------------------------------------------------
# Line-level boilerplate removal (the C4/Dolma-style cleaning pass:
# navigation bars, cookie banners, and license footers repeat VERBATIM
# across thousands of pages — they are line-frequency outliers, not
# document-frequency outliers, so line-grain dedup is its own op).
# ---------------------------------------------------------------------------


def line_doc_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(line, line_df) — in how many DISTINCT documents each exact
    line occurs. One explode + one hash-agg; count-distinct on the doc
    id is partial-aggregation friendly because the explode emits each
    (doc, line) pair at most once after the in-row dedup."""
    lines = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), r"\n"))
        ).alias("line"),
    )
    return lines.groupBy("line").agg(
        F.countDistinct(id_col).alias("line_df")
    )


def strip_boilerplate_lines(
    df: DataFrame,
    max_line_df: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """Remove every line that occurs in more than ``max_line_df``
    distinct documents, preserving the order of surviving lines.

    Scale shape: the boilerplate line SET is tiny by construction
    (only frequency outliers qualify), so the removal join broadcasts
    it and the corpus is never shuffled for the filter; the only
    corpus-scale shuffle is the per-document reassembly groupBy. Lines
    shorter than ``min_line_chars`` are exempt (blank separators are
    universal, removing them would glue paragraphs).

    Returns ``df`` with ``text_col`` rewritten and an
    ``n_lines_removed`` count per document.
    """
    other_cols = [c for c in df.columns if c != text_col]
    stop = (
        line_doc_frequencies(df, id_col, text_col)
        .filter(
            (F.col("line_df") > max_line_df)
            & (F.length("line") >= min_line_chars)
        )
        .select(F.col("line").alias("_stop_line"))
    )
    exploded = df.select(
        *other_cols,
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_pos", "_line"),
    )
    kept = exploded.join(
        F.broadcast(stop),
        exploded["_line"] == F.col("_stop_line"),
        "left_anti",
    )
    # Reassemble keyed by the doc id ALONE and re-attach metadata with
    # a LEFT join from the original frame: grouping/joining on every
    # metadata column would (a) drop any row whose metadata contains a
    # NULL (equi-join keys never match null) and (b) silently lose
    # docs whose every line was boilerplate (absent from the groupBy,
    # dropped by an inner join). Those docs now survive with empty
    # text — the caller's quality gate is the right place to drop
    # empty docs, not a join artifact.
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_line"))
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias(text_col),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    n_lines = F.size(F.split(F.col(text_col), r"\n"))
    base = df.withColumn("_n_total", n_lines).drop(text_col)
    return (
        base.join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
        .withColumn(
            "n_lines_removed",
            (
                F.col("_n_total")
                - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).cast("long"),
        )
        .select(*other_cols, text_col, "n_lines_removed")
    )


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-rule family): within-document repetition
# is a strong low-quality marker (keyword stuffing, scraped templates,
# generation loops).
# ---------------------------------------------------------------------------


def duplicate_line_fraction(col: Column | str) -> Column:
    """Fraction of a document's lines that are duplicates of an
    earlier line — pure in-row array math, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, r"\n")
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round((n - F.size(F.array_distinct(lines))) / n, 4)
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition profile: duplicate-line fraction and
    top-bigram fraction (share of all word bigrams taken by the
    single most frequent one). BOTH are in-row array math — sort the
    doc's own bigrams, walk the longest equal-run with one
    ``aggregate()`` fold — so the whole profile is a narrow map over
    the corpus: zero Exchange, no per-bigram shuffle (the previous
    explode + two-keyed-aggs form moved |doc|×|bigrams| rows; at
    sf0.1 that was the difference between 0.9 s and 2.3 s for the
    span-stats contract query, and at 100 TB it is a corpus-sized
    shuffle bought for a per-doc statistic)."""
    toked = df.select(
        F.col(id_col),
        duplicate_line_fraction(F.col(text_col)).alias("dup_line_frac"),
        tokens(text_col).alias("_toks"),
    )
    return toked.select(
        F.col(id_col),
        "dup_line_frac",
        top_bigram_fraction_from(F.col("_toks")).alias("top_bigram_frac"),
    )


def top_bigram_fraction_from(toks: Column) -> Column:
    """Share of a doc's word bigrams taken by its single most
    frequent one — in-row array math (sort the doc's own bigrams,
    walk the longest equal-run with one ``aggregate()`` fold): zero
    Exchange, usable as a straight filter predicate in curation
    plans. Docs under 2 tokens (no real bigram — the shingle builder
    emits one truncated gram that would read as 100% repetition)
    score 0.0. ``toks`` must be a PLAIN column reference (see
    ``shingles_from_tokens``)."""
    from mpg_data_warehouse_spark.operators.dedup import shingles_from_tokens

    grams = F.array_sort(shingles_from_tokens(toks, 2, distinct=False))
    zero = F.lit(0).cast("long")
    run_next = lambda acc, x: (  # noqa: E731 — shared by run and best
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
    )
    best = F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_next(acc, x).alias("run"),
            F.greatest(acc["best"], run_next(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return (
        F.when(F.size(toks) < 2, F.lit(0.0))
        .otherwise(F.round(best / F.size(grams), 4))
    )


# ---------------------------------------------------------------------------
# Unigram-LM quality scoring — the CCNet-style perplexity proxy.
# ---------------------------------------------------------------------------


def unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 0.5,
    tokens_col: str | None = None,
) -> tuple[DataFrame, float]:
    """Lidstone-smoothed unigram language model over the corpus: the
    top-``vocab_size`` terms by frequency (ties broken by term, so the
    vocabulary is a pure function of the corpus) with
    ``logp = ln((n + α) / (N + α·(V+1)))``; every out-of-vocabulary
    term shares the returned scalar ``oov_logp = ln(α / (N + α·(V+1)))``
    (the "+1" is the single OOV event class).

    Returns ``(model, oov_logp)`` where ``model`` is a ``(term, logp)``
    DataFrame of at most ``vocab_size`` rows. The two scalars (total
    token count, kept-vocab size) are one tiny aggregate collect; the
    model itself is vocabulary-sized — broadcastable by construction,
    which is the point of the cap: scoring 100 TB of text against the
    model must be a map-side join, so the model must fit an executor.
    """
    # ONE corpus aggregation: persist the (vocabulary-sized) counts so
    # the top-K, the total, and the kept-vocab size don't each re-run
    # the corpus-wide explode+agg — unpersisted, the model build cost
    # three full scans.
    counts = term_counts(df, text_col, tokens_col=tokens_col).persist()
    try:
        # orderBy().limit() compiles to TakeOrderedAndProject —
        # per-partition partial top-K then a driver merge of K-row
        # heads — never a global single-partition sort.
        vocab_rows = (
            counts.orderBy(F.col("n").desc(), F.col("term"))
            .limit(vocab_size)
            .collect()
        )
        totals = counts.agg(F.sum("n").alias("total")).collect()[0]
    finally:
        counts.unpersist()
    n_total = int(totals["total"] or 0)
    v = len(vocab_rows)
    denom = float(n_total) + alpha * (v + 1)
    import math

    spark = df.sparkSession
    # logp computed through the same engine expression as before
    # (F.round is HALF_UP; Python round() is banker's) so model values
    # stay bit-identical to the pre-refactor lazy plan
    model = spark.createDataFrame(
        [(r["term"], r["n"]) for r in vocab_rows] or [("", 0)],
        "term string, n long",
    ).select(
        "term",
        F.round(F.log((F.col("n") + F.lit(alpha)) / F.lit(denom)), 6).alias(
            "logp"
        ),
    )
    if not vocab_rows:
        model = model.limit(0)
    return model, round(math.log(alpha / denom), 6)


def doc_logprob_score(
    df: DataFrame,
    model: DataFrame,
    oov_logp: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document mean negative token log-probability under a
    unigram model — low scores ≈ fluent in-distribution text, high
    scores ≈ noise/garble (the quality gate CCNet applies with a
    KenLM 5-gram; the unigram variant keeps it engine-portable and
    oracle-replayable).

    Output: ``(id, n_tokens, nll_per_token)``. Plan shape: one
    (doc, term, tf) hash-agg over the corpus, then a term-keyed join
    against the BROADCAST model (vocab-capped — see ``unigram_lm``),
    then a doc-keyed agg. The corpus never shuffles raw tokens: the
    join input is distinct (doc, term) pairs, already collapsed by
    partial aggregation. Zero-token documents don't appear (nothing to
    score); callers gate on ``n_tokens`` anyway.
    """
    dtc = doc_term_counts(df, id_col, text_col, tokens_col=tokens_col)
    # token logps accumulate as INTEGER micro-nats (the model's round-6
    # logp × 1e6 is integer-valued, so the quantization is exact): the
    # per-doc sum is then order-independent exact integer algebra and
    # the only float op is one final division — without this, double
    # summation ORDER (Spark partial aggs vs a replaying engine's
    # sequential sum) shifts the sum by an ulp and flips the rounded
    # score at .5e-6 boundaries (caught by the contract hash).
    lp_u = F.round(
        F.coalesce(F.col("logp"), F.lit(oov_logp)) * F.lit(1e6)
    ).cast("long")
    scored = dtc.join(F.broadcast(model), "term", "left").select(
        F.col(id_col), F.col("tf"), (F.col("tf") * lp_u).alias("_nll_u")
    )
    # the mean is half-up-rounded IN INTEGER SPACE — sum_µ/n hits an
    # exact decimal midpoint whenever sum_µ ≡ n/2 (mod n), where a
    # float division + engine round() disagree across engines on
    # which side of the midpoint the quotient double fell; the
    # integer form (2a+n) div (2n) is the same half-up value computed
    # exactly, and r/1e6 is one deterministic division of exact ints
    agg = (
        scored.groupBy(id_col)
        .agg(F.sum("tf").alias("n_tokens"), F.sum("_nll_u").alias("_s"))
        .withColumn(
            "_num", (F.lit(-2) * F.col("_s") + F.col("n_tokens")).cast("long")
        )
        .withColumn("_den", (F.lit(2) * F.col("n_tokens")).cast("long"))
    )
    return agg.select(
        F.col(id_col),
        "n_tokens",
        (F.expr("_num div _den").cast("double") / F.lit(1e6)).alias(
            "nll_per_token"
        ),
    )


def bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
    alpha: float = 0.5,
    tokens_col: str | None = None,
) -> tuple[DataFrame, DataFrame, float]:
    """Jelinek–Mercer-ready bigram model: capped bigram ML
    probabilities plus the Lidstone unigram base the scorer
    interpolates against (Jelinek & Mercer 1980; the CCNet gate's
    KenLM n-gram stand-in one order up from ``unigram_lm``).

    Returns ``(bi_model, uni_model, p_oov)``:
    - ``bi_model``: top-``bigram_size`` ``(w1, w2)`` pairs by corpus
      count (ties by pair, so the table is a pure function of the
      corpus) with ``p_ml = round(c(w1,w2) / c(w1,·), 12)`` — the ML
      conditional, with the CONTEXT total taken before capping so
      kept pairs keep their true conditionals;
    - ``uni_model``: ``(term, p_uni)`` with the same smoothed base
      distribution as ``unigram_lm`` but in PROBABILITY space
      (rounded 12), because the interpolation is linear in p, not in
      log p;
    - ``p_oov``: the shared out-of-vocabulary probability.

    Both tables are cap-bounded → broadcastable by construction, so
    scoring 100 TB is two map-side joins. Probabilities are rounded
    at the model boundary (same policy as ``unigram_lm``'s logp) so a
    replaying engine consumes identical doubles."""
    # bigrams stay WITHIN a document: zip the token array against its
    # own tail in-row (no window, no cross-doc phantom pairs)
    toks_expr = (
        F.col(tokens_col) if tokens_col else norm_tokens(text_col)
    )
    toked = df.select(toks_expr.alias("_toks")).filter(
        F.size("_toks") >= 2
    )
    pairs = toked.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("_toks"), 1, F.size("_toks") - 1),
                F.slice(F.col("_toks"), 2, F.size("_toks") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_p")
    ).select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    bcounts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    ).persist()
    try:
        ctx = bcounts.groupBy("w1").agg(F.sum("c12").alias("c1"))
        top = (
            bcounts.orderBy(F.col("c12").desc(), "w1", "w2")
            .limit(bigram_size)
            .join(ctx, "w1")
            .select(
                "w1",
                "w2",
                F.round(F.col("c12") / F.col("c1"), 12).alias("p_ml"),
            )
        )
        # materialize before unpersisting the counts it derives from
        bi_rows = top.collect()
    finally:
        bcounts.unpersist()
    spark = df.sparkSession
    bi_model = spark.createDataFrame(
        bi_rows or [], "w1 string, w2 string, p_ml double"
    )
    # unigram base computed directly in probability space (no
    # exp(round(ln(p))) round-trip — the scorer and any replaying
    # engine consume one rounding of the exact count ratio)
    tcounts = term_counts(df, text_col, tokens_col=tokens_col).persist()
    try:
        vocab_rows = (
            tcounts.orderBy(F.col("n").desc(), F.col("term"))
            .limit(vocab_size)
            .collect()
        )
        total_row = tcounts.agg(F.sum("n").alias("total")).collect()[0]
    finally:
        tcounts.unpersist()
    denom = float(int(total_row["total"] or 0)) + alpha * (
        len(vocab_rows) + 1
    )
    uni_model = spark.createDataFrame(
        [(r["term"], r["n"]) for r in vocab_rows] or [("", 0)],
        "term string, n long",
    ).select(
        "term",
        F.round((F.col("n") + F.lit(alpha)) / F.lit(denom), 12).alias(
            "p_uni"
        ),
    )
    if not vocab_rows:
        uni_model = uni_model.limit(0)
    return bi_model, uni_model, round(alpha / denom, 12)


def doc_logprob_score_bigram(
    df: DataFrame,
    bi_model: DataFrame,
    uni_model: DataFrame,
    p_oov: float,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document mean negative bigram log-probability under the
    interpolated model: each in-doc bigram (w1, w2) scores
    ``ln(λ·p_ml(w2|w1) + (1−λ)·p_uni(w2))`` with ``p_ml = 0`` for
    pairs outside the capped table and ``p_uni`` falling back to the
    OOV mass — the word-ORDER-sensitive fluency gate the unigram
    scorer cannot be (shuffling a document's words leaves its unigram
    score untouched and tanks this one; pinned in tests).

    Output: ``(id, n_bigrams, nll_per_token)``. Plan: in-row bigram
    zip → one (doc, w1, w2) hash-agg → two BROADCAST joins
    (cap-bounded models) → doc-grain agg. Documents with fewer than
    two tokens have no bigram and don't appear, matching
    ``doc_logprob_score``'s zero-token rule."""
    toks_expr = (
        F.col(tokens_col) if tokens_col else norm_tokens(text_col)
    )
    toked = df.select(
        F.col(id_col), toks_expr.alias("_toks")
    ).filter(F.size("_toks") >= 2)
    grams = toked.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(F.col("_toks"), 1, F.size("_toks") - 1),
                F.slice(F.col("_toks"), 2, F.size("_toks") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_p"),
    ).select(
        F.col(id_col),
        F.col("_p.w1").alias("w1"),
        F.col("_p.w2").alias("w2"),
    )
    dbc = grams.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # per-pair log-prob quantized to INTEGER micro-nats before the doc
    # sum — same exact-integer-sum policy as doc_logprob_score (the
    # quantization costs ≤ 0.5 µnat/pair, far under the round-6 emit;
    # what it buys is an order-independent sum no replaying engine can
    # drift from by an addition-order ulp)
    ll_u = F.round(
        F.log(
            F.lit(lam) * F.coalesce(F.col("p_ml"), F.lit(0.0))
            + F.lit(1.0 - lam) * F.coalesce(F.col("p_uni"), F.lit(p_oov))
        )
        * F.lit(1e6)
    ).cast("long")
    scored = (
        dbc.join(F.broadcast(bi_model), ["w1", "w2"], "left")
        .join(
            F.broadcast(uni_model.withColumnRenamed("term", "w2")),
            "w2",
            "left",
        )
        .select(F.col(id_col), "tf", (F.col("tf") * ll_u).alias("_ll_u"))
    )
    # same exact-integer half-up mean as doc_logprob_score (see the
    # midpoint note there)
    agg = (
        scored.groupBy(id_col)
        .agg(F.sum("tf").alias("n_bigrams"), F.sum("_ll_u").alias("_s"))
        .withColumn(
            "_num",
            (F.lit(-2) * F.col("_s") + F.col("n_bigrams")).cast("long"),
        )
        .withColumn("_den", (F.lit(2) * F.col("n_bigrams")).cast("long"))
    )
    return agg.select(
        F.col(id_col),
        "n_bigrams",
        (F.expr("_num div _den").cast("double") / F.lit(1e6)).alias(
            "nll_per_token"
        ),
    )


# ---------------------------------------------------------------------------
# Unicode / whitespace normalization — the canonicalization pass every
# web-scraped training corpus needs BEFORE dedup and quality scoring
# (curly quotes vs straight, NBSP vs space, and zero-width characters
# otherwise defeat exact- and span-hash dedup on visually identical
# text). All pure JVM regexp/translate column math: a narrow map
# stage, no shuffle, whole-stage codegen at 100 TB.
# ---------------------------------------------------------------------------

# Translate table: visually-equivalent unicode punctuation → ASCII.
_UNICODE_PUNCT_SRC = "‘’‚‛“”„‟–—―−    　"
_UNICODE_PUNCT_DST = "''''\"\"\"\"----     "

# Control chars (C0 except \t\n\r, DEL, C1) and zero-width/bidi marks.
_CONTROL_CHARS_RE = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\u0080-\\u009f"
    "\\u200b\\u200c\\u200d\\u2060\\ufeff\\u00ad]"
)


def normalize_punct(col: Column | str) -> Column:
    """Map curly quotes / long dashes / exotic spaces to their ASCII
    equivalents via a single ``translate`` (one pass, no regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _UNICODE_PUNCT_SRC, _UNICODE_PUNCT_DST)


def strip_control_chars(col: Column | str) -> Column:
    """Delete C0/C1 control characters (keeping tab/newline/CR) and
    zero-width / soft-hyphen / BOM marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _CONTROL_CHARS_RE, "")


def collapse_whitespace(col: Column | str) -> Column:
    """Collapse horizontal whitespace runs to one space and runs of 3+
    newlines to exactly two (paragraph break), then trim. Preserves
    the paragraph structure ``pack_paragraphs`` splits on."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[ \t\x0b\f]+", " ")
    c = F.regexp_replace(c, r" ?(\r?\n) ?", "$1")
    c = F.regexp_replace(c, r"(\r?\n){3,}", "\n\n")
    return F.trim(c)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
) -> DataFrame:
    """Canonicalize ``text_col`` in place: unicode punctuation → ASCII,
    control/zero-width chars stripped, whitespace collapsed, optional
    lowercasing. Column order and all other columns preserved, so the
    result drops into any downstream dedup/quality stage unchanged."""
    c = collapse_whitespace(
        strip_control_chars(normalize_punct(F.col(text_col)))
    )
    if lowercase:
        c = F.lower(c)
    return df.withColumn(text_col, c)


def nb_term_weights(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    alpha: float = 1.0,
    tokens_col: str | None = None,
) -> tuple[DataFrame, float]:
    """Train a linear quality classifier in closed form: per-term
    Naive-Bayes log-odds weights over binarized document frequencies
    (the NBSVM feature weighting of Wang & Manning, ACL 2012 — public),
    the same family as the LR "looks like curated text" filters used to
    select LLM pretraining data (CCNet; GPT-3 appendix A).

    ``pos`` is a sample of wanted text (curated corpus), ``neg`` a
    sample of unwanted (raw crawl). Returns ``(weights, bias)`` where
    ``weights`` is a ``(term, weight)`` DataFrame and
    ``bias = log(|pos| / |neg|)`` the class prior.

    One explode + one hash-agg per side and a full-outer join keyed by
    term: at 100 TB the shuffle carries the (term, df) pairs only —
    map-side combine absorbs the Zipf head, and the result is
    vocabulary-sized, not corpus-sized. Training is a single pass with
    no iteration, which is exactly why this form (and not SGD) is the
    Spark-native classifier.
    """

    def docfreq(df: DataFrame) -> DataFrame:
        toks = (
            F.col(tokens_col) if tokens_col else norm_tokens(text_col)
        )
        # binarized: a term counts once per document (NBSVM's binarize)
        return (
            df.select(
                F.explode(F.array_distinct(toks)).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )

    n_pos = pos.count()
    n_neg = neg.count()
    if n_pos == 0 or n_neg == 0:
        raise ValueError("both classes need at least one document")
    joined = (
        docfreq(pos)
        .withColumnsRenamed({"df": "df_pos"})
        .join(
            docfreq(neg).withColumnsRenamed({"df": "df_neg"}),
            "term",
            "full_outer",
        )
        .select(
            "term",
            F.coalesce("df_pos", F.lit(0)).alias("df_pos"),
            F.coalesce("df_neg", F.lit(0)).alias("df_neg"),
        )
    )
    # log ratio of smoothed per-class Bernoulli rates; the class-size
    # normalization keeps weights centered when |pos| != |neg|
    weights = joined.select(
        "term",
        (
            F.log((F.col("df_pos") + alpha) / (n_pos + 2.0 * alpha))
            - F.log((F.col("df_neg") + alpha) / (n_neg + 2.0 * alpha))
        ).alias("weight"),
    )
    import math

    return weights, math.log(n_pos / n_neg)


def quality_classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    tokens_col: str | None = None,
) -> DataFrame:
    """Score documents with a linear term-weight model: logit =
    bias + Σ weight(term) over the document's DISTINCT terms (matching
    ``nb_term_weights``' binarized features), probability via sigmoid,
    ``quality_keep`` at ``threshold``. Out-of-vocabulary terms
    contribute 0; empty documents keep the bias alone.

    Plan shape: explode distinct tokens (narrow), join the
    vocabulary-sized weight table (broadcast — weights are ~MBs even
    for web-scale vocabularies), one hash-agg back to doc grain, and a
    left join to re-attach docs with no in-vocabulary terms. No UDFs,
    no iteration; scoring cost is one pass over the token stream.
    """
    toks_expr = (
        F.col(tokens_col) if tokens_col else norm_tokens(text_col)
    )
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(toks_expr)).alias("term"),
    )
    logits = (
        toks.join(F.broadcast(weights), "term", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_w_sum")
        )
    )
    scored = df.join(logits, id_col, "left").withColumn(
        "quality_logit", F.coalesce(F.col("_w_sum"), F.lit(0.0)) + F.lit(bias)
    )
    return (
        scored.withColumn(
            "quality_p",
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("quality_logit"))),
        )
        .withColumn("quality_keep", F.col("quality_p") >= F.lit(threshold))
        .drop("_w_sum")
    )


def with_compression_ratio(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append ``compress_ratio`` = deflate(utf8(text)) bytes / raw
    bytes — the compression-based repetition signal of the MassiveText
    /Gopher filters (Rae et al. 2021, public): highly repetitive or
    templated documents compress far below natural prose (~0.3–0.6),
    so a low ratio flags machine-generated spam that token-level
    heuristics (``repetition_signals``) can miss, and a ratio near 1
    flags already-compressed/binary junk. Empty texts get null.

    This is a deliberate Python boundary — DEFLATE has no JVM column
    form — kept Arrow-vectorized (pandas UDF batches, zlib releases
    the GIL) exactly like the multimodal byte decoders; it is the
    only non-JVM stage in the text family and never appears in a
    contract-query plan. Cost is one map pass; combine with cheap
    JVM-side gates FIRST so only their survivors pay it."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ratio_fn(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    # real annotation objects: this module's `from __future__ import
    # annotations` would otherwise hand pandas_udf unresolvable strings
    _ratio_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _ratio = pandas_udf(_ratio_fn, "double")
    return df.withColumn("compress_ratio", _ratio(F.col(text_col)))
