"""Deterministic sampling for training-data mixes.

Spark's ``sample``/``sampleBy`` draw from a partition-order-dependent RNG:
re-running the same pipeline (or the same query on a different cluster
layout) yields a DIFFERENT subset, which breaks reproducible training mixes
and makes incremental re-runs unstable. These operators key every keep/drop
decision on a HASH of a stable row key instead — the same rows survive on
any engine, any partitioning, any day (and DuckDB can replay the exact
arithmetic, so the driver's oracle gates them value-exactly).

Scale shape: a pure scan-time filter — no shuffle, no state, no driver
round-trips; composes with partition pruning and column pruning untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyranges_1_x_spark.ml.dedup import md5_hash64, xxhash64_fn

_DENOM = 1_000_000


def _bucket_shift(hash_fn, bucket_bits: int) -> int:
    """Right-shift that leaves exactly ``bucket_bits`` high bits of the hash
    as the bucket id. ``md5_hash64`` yields 60-bit non-negative values; the
    module's ``xxhash64_fn`` is the full signed 64 bits (arithmetic shift
    preserves order either way, but deriving the width keeps the summary
    relation at the documented 2^bits rows instead of 16x that — review
    find, r12). Other custom hash_fns are assumed 60-bit-like; pass a wider
    ``bucket_bits`` headroom if not."""
    return (64 if hash_fn is xxhash64_fn else 60) - bucket_bits


def hash_keep(key: Column, fraction: float, seed: int = 0, hash_fn=md5_hash64) -> Column:
    """Boolean keep-decision: ``hash(key, seed) mod 1e6 < fraction * 1e6``.
    Changing ``seed`` draws an independent subset; fractions are honored in
    expectation with deterministic membership. The threshold ROUNDS (r14
    review find): ``int()`` truncation misclassified one hash residue per
    million for fractions that are not exact binary floats (0.29 * 1e6 =
    289999.99999999994 truncates to 289999, biasing the realized fraction
    low against the documented formula)."""
    return F.pmod(hash_fn(key, seed), F.lit(_DENOM)) < F.lit(round(fraction * _DENOM))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
    hash_fn=md5_hash64,
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample of ``fraction`` of the rows."""
    return df.filter(hash_keep(F.col(key_col), fraction, seed, hash_fn))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default: float = 0.0,
    seed: int = 0,
    hash_fn=md5_hash64,
) -> DataFrame:
    """Deterministic per-stratum sampling — the "training mix" operator:
    keep a different fraction of each stratum (source, language, quality
    band), decided by row-key hash so the mix is bit-reproducible. Strata
    absent from ``fractions`` fall back to ``default`` (0.0 = drop).

    The strata->threshold table rides along as a literal MAP expression
    (strata counts are small); the plan is a single filtered scan.
    """
    pairs: list[Column] = []
    for s, f in fractions.items():
        pairs += [F.lit(s), F.lit(round(f * _DENOM))]  # round, not truncate (see hash_keep)
    thresh = (
        F.coalesce(
            F.create_map(*pairs)[F.col(strata_col)],
            F.lit(round(default * _DENOM)),
        )
        if pairs
        # round, not truncate, in BOTH branches: the same default must
        # yield the same threshold whether fractions is empty or not
        # (r14 advice find — int() here reintroduced the truncation bias)
        else F.lit(round(default * _DENOM))
    )
    return df.filter(F.pmod(hash_fn(F.col(key_col), seed), F.lit(_DENOM)) < thresh)


def pack_training_examples(
    df: DataFrame,
    budget: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    seed: int = 0,
    hash_fn=md5_hash64,
    bucket_bits: int = 12,
) -> DataFrame:
    """Sequence packing for pretraining batches: concatenate every document's
    tokens in a deterministic shuffle order and chunk the stream into
    fixed-``budget``-token training examples (documents MAY span an example
    boundary — the standard GPT-style pack-then-chunk, not bin packing).
    Returns one row per document with its place in the packed stream:

    * ``n_tokens`` — whitespace token count (or ``tokens_col`` if the
      pipeline already counted, e.g. with a real BPE);
    * ``start_offset`` — the doc's first token's position in the global
      concatenated stream (0-based; consecutive docs tile it exactly);
    * ``first_example`` / ``last_example`` — ids of the fixed-size examples
      the doc lands in (``start_offset DIV budget`` .. ``(end-1) DIV
      budget``; empty docs carry ``first_example`` in both).

    Order is ``(hash(id, seed), id)`` — the same engine/partitioning/rerun-
    independent permutation as ``deterministic_shuffle``, so re-exporting a
    grown corpus moves only the docs whose hashes interleave, not everything.

    Scale shape (two-phase, no global window — the same plan family as
    ``deterministic_shuffle`` and plans/sweep.py): the hash's high
    ``bucket_bits`` form uniform buckets that PREFIX the total order; the
    running token sum is a per-bucket window plus one broadcast prefix
    offset per bucket (2^bits summary rows). Token counting is a row-local
    JVM expression; integer arithmetic end-to-end (oracle-exact).
    """
    from pyspark.sql import Window

    from pyranges_1_x_spark.plans.interval_join import floordiv

    if budget <= 0:
        raise ValueError("budget must be a positive token count")
    if not 1 <= bucket_bits <= 40:
        raise ValueError("bucket_bits must be in [1, 40]")
    if tokens_col is not None:
        nt = F.col(tokens_col).cast("long")
    else:
        from pyranges_1_x_spark.ml.text import nonempty_tokens

        # NULL text counts 0 tokens: a bare size(NULL) is NULL, which would
        # give this doc NULL offsets while the window sums silently skip it
        # (r14 review find); zero keeps the tiling invariant exact.
        nt = F.coalesce(
            F.size(nonempty_tokens(F.col(text_col))), F.lit(0)
        ).cast("long")
    shift = _bucket_shift(hash_fn, bucket_bits)
    # NULL ids are excluded up front (r14 review find): a NULL key hashes to
    # a NULL bucket, whose rows can never equi-join their offset back —
    # but, unguarded, the NULL bucket's token total still entered the
    # prefix-offset window (NULLS FIRST) and shifted EVERY real doc's
    # start_offset. A row without identity has no stable place in a
    # deterministic order; dropping it corrupts nothing else.
    d = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col), nt.alias("__nt__"))
        .withColumn("__h__", hash_fn(F.col(id_col), seed))
        .withColumn("__bkt__", F.shiftright("__h__", shift))
    )
    wl = (
        Window.partitionBy("__bkt__")
        .orderBy(F.col("__h__").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("__lcum__", F.sum("__nt__").over(wl))
    summary = d.groupBy("__bkt__").agg(F.sum("__nt__").alias("__tot__"))
    ws = Window.orderBy(F.col("__bkt__").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    summary = summary.select(
        "__bkt__", F.coalesce(F.sum("__tot__").over(ws), F.lit(0)).alias("__off__")
    )
    out = local.join(F.broadcast(summary), on="__bkt__")
    end = F.col("__off__") + F.col("__lcum__")
    start = end - F.col("__nt__")
    first_ex = floordiv(start, budget).cast("long")
    return out.select(
        F.col(id_col),
        F.col("__nt__").alias("n_tokens"),
        start.cast("long").alias("start_offset"),
        first_ex.alias("first_example"),
        F.when(F.col("__nt__") > 0, floordiv(end - 1, budget).cast("long"))
        .otherwise(first_ex)
        .alias("last_example"),
    )


def _grouped_prefix_keep(
    df, group_col, key_col, seed, hash_fn, bucket_bits, measure, limit
):
    """Shared two-phase engine of the quota pair: per ``group_col``, the
    running total of ``measure`` (a Column; ``lit(1)`` makes it a rank) in
    ascending ``(hash(key_col, seed), key_col)`` order, keeping only rows
    whose INCLUSIVE running total is <= ``limit``. No per-group global
    window: the hash's high ``bucket_bits`` split each group into 2^bits
    uniform sub-buckets that prefix the group's order; the running total is
    a per-(group, bucket) window plus a broadcast per-(group, bucket)
    prefix offset (summary <= #groups * 2^bits rows, its window per-group
    over <= 2^bits rows). Rows whose BUCKET-LOCAL total already exceeds
    ``limit`` are pruned before the offset join — the global total only
    grows — so the join input is bounded however large the corpus. The
    offset join is null-safe: a NULL group (missing domain/source) is a
    legitimate quota group of its own; the window already treats it as one
    partition, and a plain equi-join would silently DROP those rows.
    ``key_col`` values are assumed non-null (a NULL key hashes to NULL and
    would sort engine-dependently).

    Returns the input columns + ``__m__`` (the row's measure) + ``__run__``
    (the group's inclusive running total at this row).
    """
    from pyspark.sql import Window

    if limit < 0:
        raise ValueError("the quota limit must be non-negative")
    if not 1 <= bucket_bits <= 40:
        raise ValueError("bucket_bits must be in [1, 40]")
    shift = _bucket_shift(hash_fn, bucket_bits)
    d = (
        df.withColumn("__m__", measure)
        .withColumn("__h__", hash_fn(F.col(key_col), seed))
        .withColumn("__bkt__", F.shiftright("__h__", shift))
    )
    wl = (
        Window.partitionBy(group_col, "__bkt__")
        .orderBy(F.col("__h__").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("__lrun__", F.sum("__m__").over(wl)).filter(
        F.col("__lrun__") <= limit
    )
    summary = d.groupBy(group_col, "__bkt__").agg(F.sum("__m__").alias("__tot__"))
    ws = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__bkt__").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    summary = summary.select(
        F.col(group_col).alias("__g2__"),
        F.col("__bkt__").alias("__b2__"),
        F.coalesce(F.sum("__tot__").over(ws), F.lit(0)).alias("__off__"),
    )
    return (
        local.join(
            F.broadcast(summary),
            on=F.col(group_col).eqNullSafe(F.col("__g2__"))
            & (F.col("__bkt__") == F.col("__b2__")),
        )
        .withColumn("__run__", F.col("__off__") + F.col("__lrun__"))
        .filter(F.col("__run__") <= limit)
        .select(*df.columns, "__m__", "__run__")
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str = "doc_id",
    seed: int = 0,
    hash_fn=md5_hash64,
    out_col: str | None = None,
    bucket_bits: int = 12,
) -> DataFrame:
    """Per-group deterministic quota — the domain/source-balancing stage of a
    corpus mix: keep at most ``cap`` rows per ``group_col`` value (web domain,
    crawl source, language), chosen by ascending ``(hash(key, seed), key)``
    so the SAME rows survive on any engine, partitioning, or rerun, and a
    grown corpus evicts only rows whose hashes interleave past the cap.
    Differs from ``stratified_sample`` (a per-stratum FRACTION) in giving a
    hard per-group COUNT — the shape used to stop a single crawl domain from
    dominating the training mix. ``out_col`` optionally keeps the 1-based
    within-group rank.

    Physical plan: ``_grouped_prefix_keep`` with measure ``lit(1)`` (a
    running count IS a rank under a total order) — see the helper for the
    two-phase bucketed shape, the pre-join prune, and NULL-group semantics.
    """
    kept = _grouped_prefix_keep(
        df, group_col, key_col, seed, hash_fn, bucket_bits, F.lit(1).cast("long"), cap
    )
    # out_col substitutes IN PLACE when it names an existing column (the
    # scrub_pii/strip_repeated_substrings convention) — appending it too
    # would emit a duplicate-named column (review find, r12).
    keep = list(df.columns) + ([out_col] if out_col and out_col not in df.columns else [])
    if out_col:
        kept = kept.withColumn(out_col, F.col("__run__"))
    return kept.select(*keep)


def token_quota_sample(
    df: DataFrame,
    group_col: str,
    token_budget: int,
    key_col: str = "doc_id",
    *,
    text_col: str = "text",
    tokens_col: str | None = None,
    seed: int = 0,
    hash_fn=md5_hash64,
    bucket_bits: int = 12,
) -> DataFrame:
    """Per-group TOKEN-budget quota — ``quota_sample``'s sibling where the
    cap is what actually matters to a training mix: keep documents per
    group (domain, source, language) in ascending ``(hash(key, seed),
    key)`` order until the group's cumulative token count would exceed
    ``token_budget``; the first overflowing doc and everything after it (in
    that deterministic order) are dropped. Membership is a prefix of the
    group's hash order, so the same budget reproduces the same mix
    anywhere, and a grown corpus only moves docs whose hashes interleave
    before the cut. Emits the input row plus ``n_tokens``.

    Physical plan: ``_grouped_prefix_keep`` with the token count as the
    measure (the pack_training_examples decomposition, per group) — see
    the helper for the two-phase bucketed shape, the pre-join prune, and
    NULL-group semantics.
    """
    if tokens_col is not None:
        nt = F.col(tokens_col).cast("long")
    else:
        from pyranges_1_x_spark.ml.text import nonempty_tokens

        # NULL text counts 0 tokens (see pack_training_examples)
        nt = F.coalesce(
            F.size(nonempty_tokens(F.col(text_col))), F.lit(0)
        ).cast("long")
    kept = _grouped_prefix_keep(
        df, group_col, key_col, seed, hash_fn, bucket_bits, nt, token_budget
    )
    # n_tokens substitutes IN PLACE when the input already carries that
    # column (the quota_sample out_col convention) — appending it too would
    # emit a duplicate-named column (r14 review find, the same class the
    # r12 quota_sample fix covered).
    out_cols = [
        F.col("__m__").alias("n_tokens") if c == "n_tokens" else F.col(c)
        for c in df.columns
    ]
    if "n_tokens" not in df.columns:
        out_cols.append(F.col("__m__").alias("n_tokens"))
    return kept.select(*out_cols)


def deterministic_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 0,
    hash_fn=md5_hash64,
    out_col: str = "shuffle_rank",
    bucket_bits: int = 12,
) -> DataFrame:
    """Reproducible global shuffle order for training-data export: rank rows
    by ``(hash(key, seed), key)`` — the same permutation on any engine, any
    partitioning, any rerun, unlike ``orderBy(rand())``. Changing ``seed``
    draws an independent permutation. Write sharded output with
    ``repartitionByRange(out_col).sortWithinPartitions(out_col)``.

    Scale shape (two-phase, no global window): the hash's high
    ``bucket_bits`` form 2^bits uniform buckets that are a PREFIX of the
    total order, so rank = per-bucket ``row_number`` + a broadcast prefix
    offset from one summary row per bucket — the same plan that de-serialized
    ``sort_ranges(rank_col=...)`` (VERDICT r4 #3), here with provably
    balanced buckets because the bucket key is a hash prefix.
    """
    from pyspark.sql import Window

    if not 1 <= bucket_bits <= 40:
        raise ValueError("bucket_bits must be in [1, 40]")
    shift = _bucket_shift(hash_fn, bucket_bits)
    # NULL keys are excluded up front — same offset-corruption mechanism as
    # pack_training_examples (r14 review find)
    d = df.filter(F.col(key_col).isNotNull()).withColumn(
        "__h__", hash_fn(F.col(key_col), seed)
    ).withColumn(
        "__bkt__", F.shiftright("__h__", shift)
    )
    wl = Window.partitionBy("__bkt__").orderBy(F.col("__h__").asc(), F.col(key_col).asc())
    local = d.withColumn("__lrn__", F.row_number().over(wl).cast("long"))
    summary = d.groupBy("__bkt__").agg(F.count(F.lit(1)).alias("__cnt__"))
    ws = Window.orderBy(F.col("__bkt__").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    summary = summary.select(
        "__bkt__", F.coalesce(F.sum("__cnt__").over(ws), F.lit(0)).alias("__off__")
    )
    return (
        local.join(F.broadcast(summary), on="__bkt__")
        .withColumn(out_col, F.col("__off__") + F.col("__lrn__"))
        .drop("__h__", "__bkt__", "__lrn__", "__off__")
    )
