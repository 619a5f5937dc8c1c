"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in Spark SQL functions (JVM-side, codegen) — no
Python UDFs: tokenization is `split`, fingerprints are `md5`/`xxhash64`,
ratios are column arithmetic. Everything scales as embarrassingly-parallel
row-local work plus at most one hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tiny english stopword list for quality heuristics (deterministic, no deps).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

#: Word-ish tokenizer: runs of word characters.
TOKEN_PATTERN = r"\s+"

#: GPT-2-style BPE pre-tokenizer (public: the openai/gpt-2 encoder regex),
#: restricted to the Java-regex/RE2 common subset so Spark and DuckDB
#: tokenize identically: contraction suffixes, space-prefixed letter runs,
#: digit runs, punctuation runs, whitespace runs. (The original's
#: ``\s+(?!\S)`` lookahead is dropped — RE2 has no lookahead — so a
#: whitespace run groups as one pre-token instead of splitting its last
#: space onto the next word; counts shift only for multi-space runs.)
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def tokens(text: Column) -> Column:
    """Whitespace tokens of a text column (JVM split, no UDF)."""
    return F.split(F.trim(text), TOKEN_PATTERN)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_pretokens(text: Column) -> Column:
    """BPE pre-tokens (the units a byte-pair encoder would merge within) —
    JVM-side ``regexp_extract_all``, no UDF."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    """Pre-token count — the standard cheap proxy for an exact BPE token
    budget when sizing a training mix (exact merges need the vocab; run
    them in a mapInPandas kernel if a tokenizer model is shipped)."""
    return F.size(bpe_pretokens(text))


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


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    window: int = 4,
    hash_fn=None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the MOSS scheme): hash every character k-gram, slide a ``window`` over
    consecutive positions, and keep a k-gram iff it is the minimum of the
    window ENDING at its position. The selected set is a position-robust
    sketch: near-duplicate documents share most fingerprints even under
    insertions/deletions, unlike whole-document hashes.

    All codegen: positions explode to rows, the per-position window minimum
    is a bounded rows-frame window per document (no serial stage), and the
    k-gram hash is computed directly on the substring — on a vectorized
    engine this equals the classic rolling-hash formulation output-for-output
    without the per-character carry loop. Returns distinct (id, fp) rows.
    ``hash_fn`` defaults to xxhash64; pass ``md5_hash64`` for the
    engine-portable oracle twin."""
    if hash_fn is None:
        from pyranges_1_x_spark.ml.dedup import xxhash64_fn

        hash_fn = xxhash64_fn
    # Hash the k-grams row-locally into ONE long array, then posexplode the
    # array: exploding positions first and substring-ing afterwards copies
    # the FULL document text into every per-position generator row —
    # len(text) rows x len(text) bytes per doc through the exploded
    # projection, quadratic in doc size. The exploded relation here is
    # (id, pos, long) regardless of doc length, which is the shape that
    # survives book-length documents.
    #
    # Per-element F.substring is O(position) on UTF8String, so hashing the
    # grams straight off the document is O(len^2) per doc. Fixed (r10) the
    # same way as functions/seqs.py translate_cds: cut the document into
    # chunks of c = ceil(sqrt(n_grams)) gram-starts with a k-1 char overlap
    # so boundary-spanning grams stay intact. The chunk array is the OUTER
    # transform's input — each chunk a bound, materialized lambda variable,
    # so inner per-gram substrings scan only the chunk — total char scans
    # O(len^1.5). (The r8 attempt that measured 25x SLOWER indexed a
    # \G-split array from INSIDE a lambda, which Catalyst inlines and
    # re-evaluates per element; binding chunks as lambda variables is the
    # shape that avoids it.) __t__ is materialized in its own projection so
    # the chunk lambda references an attribute, not an inlined trim().
    base = df.select(F.col(id_col), F.trim(F.col(text_col)).alias("__t__"))
    t = F.col("__t__")
    n_grams = F.greatest(F.length(t) - k + 1, F.lit(1))
    c = F.greatest(F.ceil(F.sqrt(n_grams)).cast("int"), F.lit(1))
    n_chunks = F.ceil(n_grams / c).cast("int")
    chunk_idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    chunks = F.transform(chunk_idx, lambda j: F.substring(t, j * c + 1, c + k - 1))

    def _chunk_hashes(ch: Column) -> Column:
        # Grams starting in this chunk: length(ch)-k+1 — exact for every
        # chunk (the last chunk's substring is truncated to just cover its
        # own gram starts). greatest(..,1) reproduces the whole-document
        # plan's position-0 hash for sub-k documents (t shorter than k).
        ng = F.greatest(F.length(ch) - k + 1, F.lit(1))
        return F.transform(
            F.sequence(F.lit(0), ng - 1), lambda i: hash_fn(F.substring(ch, i + 1, k))
        )

    h_arr = F.flatten(F.transform(chunks, _chunk_hashes))
    d = base.select(
        F.col(id_col),
        F.posexplode(h_arr).alias("__pos__", "__h__"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("__pos__")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    d = d.withColumn("__wm__", F.min("__h__").over(w))
    return (
        d.filter(F.col("__h__") == F.col("__wm__"))
        .select(F.col(id_col), F.col("__h__").alias("fp"))
        .distinct()
    )


def filter_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_chars: int = 200,
    min_tokens: int = 20,
    min_unique_ratio: float = 0.0,
    min_stopword_ratio: float = 0.0,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Quality-gate a corpus: per-doc ``keep`` flag plus the FIRST failing
    check as an auditable ``drop_reason`` (too_short -> too_few_tokens ->
    low_unique_ratio -> low_stopword_ratio, NULL when kept) — the
    filter stage a training pipeline runs between scraping and mixing,
    with reasons preserved so drop-rate dashboards can attribute loss.

    Pure column expressions over one scan; ratios are integer-count
    divisions, so Spark and an oracle engine agree bit-for-bit.
    """
    t = F.col(text_col)
    c = char_count(t)
    n = token_count(t)
    u = unique_token_count(t)
    sw = stopword_count(t, stopwords)
    nn = F.greatest(n, F.lit(1))
    reason = (
        F.when(c < min_chars, F.lit("too_short"))
        .when(n < min_tokens, F.lit("too_few_tokens"))
        .when(u / nn < min_unique_ratio, F.lit("low_unique_ratio"))
        .when(sw / nn < min_stopword_ratio, F.lit("low_stopword_ratio"))
    )
    return df.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


def normalize_text(
    text: Column,
    *,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_punctuation: bool = False,
) -> Column:
    """Canonicalize text before fingerprinting/shingling so near-dup
    detection is robust to case/spacing/punctuation noise — the normalize
    stage of an exact-dedup pipeline (run it, then ``fingerprint``/
    ``dedup_exact`` collapse trivially-different scrapes). Pure JVM
    expressions; engine-portable (lower/regexp_replace/trim exist with
    identical semantics in any oracle engine)."""
    t = text
    if lowercase:
        t = F.lower(t)
    if strip_punctuation:
        t = F.regexp_replace(t, r"[^\p{L}\p{N}\s]+", "")
    if collapse_whitespace:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t
