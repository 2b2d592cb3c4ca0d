from formula_1_spark.functions.text import (
    fingerprint,
    lang_guess,
    quality_score,
    token_count,
    tokens,
    word_ngrams,
)

__all__ = [
    "fingerprint",
    "lang_guess",
    "quality_score",
    "token_count",
    "tokens",
    "word_ngrams",
]
