"""Structured-Streaming-ready event aggregations (Spark-side extension).

The reference has no streaming (SURVEY.md §2 'Streaming'); this module gives
the engine's windowed aggregations a form that runs identically on a batch
DataFrame and a `readStream` source: event-time tumbling/sliding windows via
`F.window`, with watermarking applied only when the input is streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) window counts + value sums per event type.

    On a streaming DataFrame a watermark bounds state; on batch it is a no-op
    path (batch has no late data). Output schema is identical in both modes:
    (window_start, window_end, key, n_events, sum_value).
    """
    d = events
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide) if slide else F.window(
        F.col(ts_col), window_duration
    )
    out = (
        d.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )
    return out


def sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based). Streaming-safe via
    session_window. ``value_col`` names the summed metric column (r14 —
    previously hardcoded to 'value', unusable on other schemas)."""
    d = events
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    return (
        d.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(user_col),
            "n_events",
            "sum_value",
        )
    )


def _welford_scan(rows, count, mean, m2, z_threshold):
    """Shared sequential Welford fold (streaming + batch twin run THIS code).

    ``rows`` yields (payload, value); emits (payload, value, z, n_seen) for
    each value deviating > z_threshold sample stddevs from the state BEFORE
    it, and returns the updated (count, mean, m2).

    Non-finite values (NULL arrives as NaN through pandas) are SKIPPED
    entirely — no alert, no state update (r14 review find: folding one NaN
    made mean/m2 NaN forever, permanently blinding the key with no error).
    Documented semantics at sd == 0: a deviation right after a constant
    history is NOT alerted (z is undefined with zero variance); the
    threshold applies only once variance exists. Both twins share this
    rule, so batch/stream/oracle parity holds.
    """
    import math

    out = []
    for payload, v in rows:
        v = float(v)
        if not math.isfinite(v):
            continue
        if count >= 2:
            sd = math.sqrt(m2 / (count - 1))
            if sd > 0 and abs(v - mean) / sd > z_threshold:
                out.append((*payload, v, (v - mean) / sd, count))
        count += 1
        delta = v - mean
        mean += delta / count
        m2 += delta * (v - mean)
    return out, (count, mean, m2)


def running_anomalies_batch(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str | None = None,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Batch-mode twin of ``running_anomalies``: one applyInPandas per key
    running the SAME Welford fold the streaming operator uses (shared
    ``_welford_scan``), over the whole history in one go — so the streaming
    semantics ("each row scored against all history before it") become
    oracle-checkable against a deterministic prefix-window SQL twin.

    ``id_col`` (unique within a key) pins the fold order at ts ties; rows
    sort by (ts, id_col). Scale posture: parallelism = #keys, which is the
    operator's contract (monitoring keys are bounded); the per-key fold is
    O(n) with O(1) state.
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    in_schema = {f.name: f for f in events.schema.fields}
    out_fields = [in_schema[key_col], in_schema[ts_col]]
    if id_col:
        out_fields.append(in_schema[id_col])
    out_fields += [
        StructField(value_col, DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("n_seen", LongType()),
    ]
    out_schema = StructType(out_fields)
    order = [ts_col] + ([id_col] if id_col else [])
    payload_cols = [key_col, ts_col] + ([id_col] if id_col else [])

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        rows = (
            (tuple(t[1:][:len(payload_cols)]), t[1 + len(payload_cols)])
            for t in pdf[payload_cols + [value_col]].itertuples()
        )
        out, _state = _welford_scan(rows, 0, 0.0, 0.0, z_threshold)
        return pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return events.groupBy(F.col(key_col)).applyInPandas(fold, schema=out_schema)


def running_anomalies(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Custom stateful streaming operator: per-key running mean/variance
    (Welford) carried ACROSS micro-batches via ``applyInPandasWithState``,
    emitting every event whose value deviates more than ``z_threshold``
    standard deviations from the statistics accumulated so far.

    This is the class of operator Spark's built-ins cannot express — the
    state is not a windowed aggregate but an unbounded running fold whose
    PER-EVENT output depends on all history before that event. Semantics are
    deterministic given the per-key event-time order: rows fold in ``ts``
    order within each batch, and each row is scored against the state BEFORE
    it (its own value never suppresses its own alert).

    State per key is three scalars (count, mean, M2) — O(#keys) total, no
    growth with stream length; NoTimeout keeps keys alive for the stream's
    lifetime, which is the intended contract for fleet-style monitoring keys
    (bounded cardinality).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    # key/ts field types COPY the input schema (r14 review find: hardcoded
    # StringType/TimestampType broke any non-string key and silently
    # diverged from the batch twin, which always derived them)
    in_schema = {f.name: f for f in events.schema.fields}
    out_schema = StructType(
        [
            in_schema[key_col],
            in_schema[ts_col],
            StructField(value_col, DoubleType()),
            StructField("zscore", DoubleType()),
            StructField("n_seen", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("count", LongType()),
            StructField("mean", DoubleType()),
            StructField("m2", DoubleType()),
        ]
    )

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            count, mean, m2 = state.get
        else:
            count, mean, m2 = 0, 0.0, 0.0
        out_rows = []
        # applyInPandasWithState splits one key's micro-batch into multiple
        # Arrow chunks (default 10k rows) in arbitrary order — concatenate
        # and sort ONCE so the fold really sees ts order across the whole
        # batch (per-chunk sorting would make alerts order-dependent,
        # ADVICE r5).
        chunks = [c for c in pdfs if len(c)]
        for pdf in [pd.concat(chunks, ignore_index=True)] if chunks else []:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            rows = (
                ((key[0], ts), v) for ts, v in zip(pdf[ts_col], pdf[value_col])
            )
            out, (count, mean, m2) = _welford_scan(
                rows, count, mean, m2, z_threshold
            )
            out_rows.extend(out)
        state.update((count, mean, m2))
        yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])

    return (
        events.groupBy(F.col(key_col))
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str] | str,
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup for continuous ingestion: keep the FIRST arrival of each
    key, dropping re-deliveries that arrive within the watermark horizon —
    the streaming twin of ``ml.dedup.dedup_exact`` for at-least-once
    sources (log replays, retried uploads).

    State posture (why this survives an unbounded stream):
    ``dropDuplicatesWithinWatermark`` expires a key's dedup state once the
    watermark passes its first-seen event time, so state is bounded by
    (keys per watermark window), not by all keys ever seen —
    ``dropDuplicates`` on a stream would grow without bound. On a batch
    DataFrame ``dropDuplicatesWithinWatermark`` is rejected by the
    analyzer, so the batch path degrades to plain ``dropDuplicates`` —
    same key set, arbitrary (not first-arrival) row kept; parity tests
    must pin assertions to the key columns.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_dedup_against_store(
    stream: DataFrame,
    store: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sig_col: str = "sig",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Continuous corpus intake vs a persisted signature store: the
    streaming twin of ``ml.dedup.dedup_against_store``. Each arriving
    document is fingerprinted, anti-joined against the HISTORICAL store
    (a static relation — persist it sig-bucketed and the join probes it
    without reshuffling history), then deduped in-stream so re-deliveries
    and intra-stream duplicates within the watermark horizon emit once.

    Emitted rows carry ``sig_col`` — exactly what a downstream
    ``foreachBatch`` appends to the store for the next day's increment.

    State posture: the stream-static LEFT ANTI join keeps NO stream state
    (the static side is re-readable per micro-batch), and the dedup state
    expires with the watermark like ``streaming_dedup`` — bounded by keys
    per horizon, not keys ever seen. WHICH duplicate arrival survives is
    processing-order dependent; deterministic gates must project the key
    set (the driver gate compares the distinct unseen-signature set).
    Batch input degrades to ``dropDuplicates`` on the signature, same
    contract as ``streaming_dedup``.
    """
    from pyspark.sql import Window

    from pyranges_1_x_spark.ml.text import fingerprint

    s = stream.withColumn(sig_col, fingerprint(F.col(text_col)))
    s = s.join(store.select(sig_col).distinct(), on=sig_col, how="left_anti")
    if not stream.isStreaming:
        # batch degrade keeps the SMALLEST id per signature — the exact
        # rule of the batch twin ml.dedup.dedup_against_store, so the two
        # entry points agree row-for-row on batch input (r14 review find:
        # id_col was accepted and silently ignored, leaving an arbitrary
        # survivor). The streaming path keeps first ARRIVAL by contract —
        # event order, not id order — documented above.
        w = Window.partitionBy(sig_col).orderBy(F.col(id_col).asc())
        return (
            s.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
    return s.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [sig_col]
    )
