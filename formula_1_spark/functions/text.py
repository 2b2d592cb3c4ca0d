"""Text-analysis primitives for the training-data-pipeline extensions
(SURVEY.md §7.1(7)): tokenization, language-ID heuristic, quality scoring,
document fingerprinting, word n-gram shingles.

Everything is built from JVM-side ``pyspark.sql.functions`` expressions —
no Python UDFs — so text processing stays inside whole-stage codegen and
scales linearly with partitions. Each primitive has an exact ANSI-SQL
equivalent (used by the DuckDB oracles in
:mod:`formula_1_spark.queries.text_analysis`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker-word lexicons for the n-gram/stopword language heuristic.
# Deliberately tiny: language ID at pipeline scale is a cheap prior filter,
# not a classifier — precision comes from downstream quality gates.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|a|in|is)\b",
    "es": r"\b(el|la|de|que|y|los|las)\b",
    "de": r"\b(der|die|und|das|ein|zu)\b",
}


def tokens(text: str | Column = "text") -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: str | Column = "text") -> Column:
    return F.size(tokens(text))


def marker_count(text: str | Column, pattern: str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(pattern))


def lang_guess(text: str | Column = "text") -> Column:
    """Argmax over marker-word counts with a deterministic en>es>de
    tie-break; 'und' (undetermined) when no marker hits."""
    en = marker_count(text, LANG_MARKERS["en"])
    es = marker_count(text, LANG_MARKERS["es"])
    de = marker_count(text, LANG_MARKERS["de"])
    return (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def quality_score(text: str | Column = "text") -> Column:
    """Heuristic quality in [0, 1]: stopword-ratio (0.4) + length prior
    (0.3) + non-punctuation ratio (0.3). Pure integer counts combined with
    double arithmetic — reproducible bit-for-bit in ANSI SQL."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    stop_ratio = marker_count(c, LANG_MARKERS["en"]) / n_tok
    length_prior = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_ratio = (F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))) / F.length(c)
    return stop_ratio * 0.4 + length_prior * 0.3 + (F.lit(1.0) - punct_ratio) * 0.3


def fingerprint(text: str | Column = "text") -> Column:
    """Deterministic document fingerprint: md5 of casefolded, trimmed,
    whitespace-collapsed text (catches trivial-reformat duplicates that
    byte-exact hashing misses)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def word_ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column. Expression-only: ``transform(sequence)`` — no explode,
    no UDF. Take tokens from a cached relation: if ``toks`` is itself the
    ``split()`` expression, CollapseProject re-inlines the split into
    every lambda element (one regex split per n-gram per row)."""
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles (the dedup unit) straight from text.
    Prefer :func:`word_ngrams_from_tokens` over a cached token relation in
    hot paths (see its CollapseProject note)."""
    return word_ngrams_from_tokens(tokens(text), n)
