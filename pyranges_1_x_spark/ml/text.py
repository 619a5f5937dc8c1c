"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in Spark SQL functions (JVM-side, codegen) — no
Python UDFs: tokenization is `split`, fingerprints are `md5`/`xxhash64`,
ratios are column arithmetic. Everything scales as embarrassingly-parallel
row-local work plus at most one hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny english stopword list for quality heuristics (deterministic, no deps).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

#: Word-ish tokenizer: runs of word characters (a BPE-ish regex would go here).
TOKEN_PATTERN = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokens of a text column (JVM split, no UDF)."""
    return F.split(F.trim(text), TOKEN_PATTERN)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, F.lower(t))))


def char_count(text: Column) -> Column:
    return F.length(text)


def quality_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document integer quality counters (counts, not ratios, so results are
    float-exact and oracle-comparable; ratios are one division away)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        char_count(t).alias("n_chars_text"),
        token_count(t).alias("n_tokens"),
        unique_token_count(t).alias("n_unique_tokens"),
        stopword_count(t).alias("n_stopwords"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                threshold: float = 0.05) -> DataFrame:
    """N-gram-free heuristic language ID: english iff stopword ratio exceeds
    ``threshold`` (a real model would plug in per-language stopword tables —
    the Spark plumbing is identical)."""
    t = F.col(text_col)
    ratio = stopword_count(t) / F.greatest(token_count(t), F.lit(1))
    return df.select(
        F.col(id_col),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unknown")).alias("pred_lang"),
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the content (exact-dup key)."""
    return F.md5(text)


def bow_signature(text: Column) -> Column:
    """Bag-of-words signature: md5 over the sorted distinct token multiset —
    equal for token-permuted near-duplicates (order-insensitive dedup key)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))
