"""Late / out-of-order parity axis for every gated stream (VERDICT r10 #7).

The density axis (scripts/measure_streaming_scale.py) and the batch-twin
parity tests cover on-time data; these tests stage LATE arrivals — rows
whose event time is below the watermark when they arrive — as separate
file-source micro-batches (``maxFilesPerTrigger=1`` + mtime ordering) and
pin each operator's documented drop/keep accounting against its batch twin
restricted to on-time rows.

The empirically-pinned Spark contract (probed on pyspark 4.1, matches
SPARK-40925's two-watermark design): stateful operators filter late events
with the PREVIOUS completed batch's watermark (``watermarkForLateEvents``)
and evict state with the current one (``watermarkForEviction``). A late
row arriving in the batch immediately after the watermark-advancing row is
therefore still ACCEPTED; the drop takes effect one batch later. Every
staging below inserts an intervening on-time batch so the late filter has
caught up — that is the accounting the SCALING.md late-row sentence
documents.

Watermark-less operators have the complementary contract, also pinned
here: running_anomalies (applyInPandasWithState, NoTimeout) folds late
rows on ARRIVAL (state includes them; alerts score against state-so-far),
and annotate_stream is stateless (late rows always joined and emitted).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pandas as pd
from pyspark.sql import functions as F

T = pd.Timestamp
EV_SCHEMA = "k string, ts timestamp, value double"
IV_SCHEMA = "Chromosome string, Start long, End long, read_id long, ts timestamp"


def stage_files(spark, tmp_path, schema, frames, name="late_in"):
    """Write each frame as ONE parquet file with strictly increasing mtimes
    so the file source replays them as separate micro-batches in order."""
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    now = time.time()
    for i, pdf in enumerate(frames):
        tmp = str(tmp_path / f"__stage_{name}_{i}")
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        dst = f"{d}/f{i}.parquet"
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], dst)
        mtime = now - 90 + 30 * i
        os.utime(dst, (mtime, mtime))
    return d


def run_staged(spark, d, schema, op, name):
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
    )
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name).toPandas()


def _sorted(pdf):
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


# Shared staging for the watermarked event operators: f0 carries the
# on-time rows plus a 13:00 watermark-advancer, f1 is the intervening
# on-time batch that lets the late filter catch up to 12:00, f2 carries the
# LATE rows (ts 10:15 < 12:00 at arrival -> dropped) plus a 17:00 flusher
# whose final no-data batch pushes the watermark to 16:00, finalizing every
# on-time window. The flusher's own window stays open and is excluded from
# both sides of the comparison.
FINAL_WM = T("2026-01-01 16:00")


def _event_frames():
    f0 = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": [T("2026-01-01 10:00"), T("2026-01-01 10:30"), T("2026-01-01 13:00")],
            "value": [1.0, 2.0, 3.0],
        }
    )
    f1 = pd.DataFrame({"k": ["b"], "ts": [T("2026-01-01 13:30")], "value": [4.0]})
    f2 = pd.DataFrame(
        {
            "k": ["a", "c"],
            "ts": [T("2026-01-01 10:15"), T("2026-01-01 17:00")],
            "value": [100.0, 5.0],
        }
    )
    on_time = pd.concat([f0, f1, f2.iloc[[1]]], ignore_index=True)
    return [f0, f1, f2], on_time


def test_windowed_event_stats_late_rows_dropped(spark, tmp_path):
    """Watermarked tumbling-window agg: the late row is dropped, so the
    append-mode emissions equal the batch twin over ON-TIME rows only, for
    windows finalized by the final watermark. Control: the batch twin over
    the FULL input differs (the late row would have changed its window)."""
    from pyranges_1_x_spark.streaming.events import windowed_event_stats

    frames, on_time = _event_frames()
    d = stage_files(spark, tmp_path, EV_SCHEMA, frames, "wes_late")
    got = run_staged(
        spark,
        d,
        EV_SCHEMA,
        lambda s: windowed_event_stats(
            s, key_col="k", window_duration="1 hour", watermark="1 hour"
        ),
        "wes_late_sink",
    )

    def twin(pdf):
        b = windowed_event_stats(
            spark.createDataFrame(pdf, EV_SCHEMA),
            key_col="k",
            window_duration="1 hour",
        ).toPandas()
        return b[b.window_end <= FINAL_WM]

    pd.testing.assert_frame_equal(_sorted(got), _sorted(twin(on_time)))
    full = twin(pd.concat(frames, ignore_index=True))
    assert not _sorted(got).equals(_sorted(full))  # the drop is observable


def test_sessionize_late_rows_dropped(spark, tmp_path):
    """Watermarked session windows: a late event neither revives nor extends
    a session; emissions equal the batch twin over on-time rows for
    sessions closed by the final watermark."""
    from pyranges_1_x_spark.streaming.events import sessionize

    f0 = pd.DataFrame(
        {
            "k": ["u1", "u1", "uf"],
            "ts": [T("2026-01-01 10:00"), T("2026-01-01 10:10"), T("2026-01-01 13:00")],
            "value": [1.0, 2.0, 3.0],
        }
    )
    f1 = pd.DataFrame({"k": ["u2"], "ts": [T("2026-01-01 13:30")], "value": [4.0]})
    f2 = pd.DataFrame(
        {
            "k": ["u1", "uz"],
            "ts": [T("2026-01-01 10:05"), T("2026-01-01 17:00")],
            "value": [100.0, 5.0],
        }
    )
    on_time = pd.concat([f0, f1, f2.iloc[[1]]], ignore_index=True)
    d = stage_files(spark, tmp_path, EV_SCHEMA, [f0, f1, f2], "sess_late")
    got = run_staged(
        spark,
        d,
        EV_SCHEMA,
        lambda s: sessionize(s, user_col="k", gap="30 minutes", watermark="1 hour"),
        "sess_late_sink",
    )

    def twin(pdf):
        b = sessionize(
            spark.createDataFrame(pdf, EV_SCHEMA), user_col="k", gap="30 minutes"
        ).toPandas()
        return b[b.session_end <= FINAL_WM]

    pd.testing.assert_frame_equal(_sorted(got), _sorted(twin(on_time)))
    # control: had the late 10:05 event been kept it would only merge into
    # u1's existing [10:00,10:40) session (value sum 103) — assert the
    # emitted u1 session is the on-time one
    u1 = got[got.k == "u1"]
    assert len(u1) == 1 and float(u1.sum_value.iloc[0]) == 3.0


def test_windowed_coverage_late_rows_dropped(spark, tmp_path):
    """Watermarked per-(window, Chromosome, bin) counts: a late interval's
    bins are dropped; append emissions equal the batch twin on on-time rows
    for finalized windows."""
    from pyranges_1_x_spark.streaming.intervals import windowed_interval_coverage

    f0 = pd.DataFrame(
        {
            "Chromosome": ["chr1", "chr1", "chr2"],
            "Start": [0, 500, 100],
            "End": [100, 1700, 200],
            "read_id": [1, 2, 3],
            "ts": [T("2026-01-01 10:00"), T("2026-01-01 10:30"), T("2026-01-01 13:00")],
        }
    )
    f1 = pd.DataFrame(
        {
            "Chromosome": ["chr2"],
            "Start": [900],
            "End": [1100],
            "read_id": [4],
            "ts": [T("2026-01-01 13:30")],
        }
    )
    f2 = pd.DataFrame(
        {
            "Chromosome": ["chr1", "chr1"],
            "Start": [0, 50],
            "End": [2500, 60],
            "read_id": [5, 6],
            "ts": [T("2026-01-01 10:15"), T("2026-01-01 17:00")],
        }
    )
    on_time = pd.concat([f0, f1, f2.iloc[[1]]], ignore_index=True)
    d = stage_files(spark, tmp_path, IV_SCHEMA, [f0, f1, f2], "wcov_late")
    got = run_staged(
        spark,
        d,
        IV_SCHEMA,
        lambda s: windowed_interval_coverage(
            s, window_duration="1 hour", bin_size=1000, watermark="1 hour"
        ),
        "wcov_late_sink",
    )

    def twin(pdf):
        b = windowed_interval_coverage(
            spark.createDataFrame(pdf, IV_SCHEMA),
            window_duration="1 hour",
            bin_size=1000,
        ).toPandas()
        return b[b.window_start < FINAL_WM]

    pd.testing.assert_frame_equal(_sorted(got), _sorted(twin(on_time)))
    full = twin(pd.concat([f0, f1, f2], ignore_index=True))
    assert not _sorted(got).equals(_sorted(full))  # read_id 5's bins dropped


def test_streaming_dedup_late_rows_dropped(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a key whose ONLY arrival is below the
    late-event watermark never reaches the output (even though it was never
    a duplicate) — the key set equals the batch twin over on-time rows."""
    from pyranges_1_x_spark.streaming.events import streaming_dedup

    f0 = pd.DataFrame(
        {
            "k": ["a", "b", "f"],
            "ts": [T("2026-01-01 10:00"), T("2026-01-01 10:01"), T("2026-01-01 13:00")],
            "value": [1.0, 2.0, 3.0],
        }
    )
    f1 = pd.DataFrame({"k": ["g"], "ts": [T("2026-01-01 13:30")], "value": [4.0]})
    f2 = pd.DataFrame(
        {
            "k": ["z", "c"],
            "ts": [T("2026-01-01 10:30"), T("2026-01-01 12:30")],
            "value": [9.0, 7.0],
        }
    )
    on_time = pd.concat([f0, f1, f2.iloc[[1]]], ignore_index=True)
    d = stage_files(spark, tmp_path, EV_SCHEMA, [f0, f1, f2], "dedup_late")
    got = run_staged(
        spark,
        d,
        EV_SCHEMA,
        lambda s: streaming_dedup(s, "k", watermark="1 hour"),
        "dedup_late_sink",
    )
    batch = streaming_dedup(spark.createDataFrame(on_time, EV_SCHEMA), "k").toPandas()
    assert sorted(got.k) == sorted(batch.k) == ["a", "b", "c", "f", "g"]
    assert "z" not in set(got.k)  # the late-only key was dropped


def test_running_anomalies_late_rows_folded_on_arrival(spark, tmp_path):
    """running_anomalies carries NO watermark (NoTimeout unbounded fold):
    late rows are KEPT and folded in ARRIVAL order — batch 3's out-of-order
    rows score against the state accumulated through batches 1-2, exactly
    reproducing the shared _welford_scan applied per arrival batch."""
    from pyranges_1_x_spark.streaming.events import _welford_scan, running_anomalies

    f0 = pd.DataFrame(
        {
            "k": ["m"] * 6,
            "ts": [T("2026-01-01 10:00") + pd.Timedelta(minutes=i) for i in range(6)],
            "value": [10.0, 10.5, 9.5, 10.2, 9.8, 10.1],
        }
    )
    f1 = pd.DataFrame(
        {
            "k": ["m"],
            "ts": [T("2026-01-01 12:00")],
            "value": [10.3],
        }
    )
    # LATE batch: event times BEFORE everything already folded; the spike
    # must still alert (scored on arrival against state-so-far)
    f2 = pd.DataFrame(
        {
            "k": ["m", "m"],
            "ts": [T("2026-01-01 09:00"), T("2026-01-01 09:01")],
            "value": [50.0, 10.0],
        }
    )
    d = stage_files(spark, tmp_path, EV_SCHEMA, [f0, f1, f2], "anom_late")
    got = run_staged(
        spark,
        d,
        EV_SCHEMA,
        lambda s: running_anomalies(s, key_col="k", z_threshold=3.0),
        "anom_late_sink",
    )
    # reference: the shared fold, batch by arrival batch, ts-sorted within
    count, mean, m2 = 0, 0.0, 0.0
    expected = []
    for pdf in (f0, f1, f2):
        pdf = pdf.sort_values("ts", kind="mergesort")
        out, (count, mean, m2) = _welford_scan(
            ((("m", ts), v) for ts, v in zip(pdf.ts, pdf.value)), count, mean, m2, 3.0
        )
        expected.extend(out)
    assert count == 9  # late rows ARE in the state
    got_rows = sorted((r.ts, r.value, r.n_seen) for r in got.itertuples())
    exp_rows = sorted((ts, v, n) for _k, ts, v, _z, n in expected)
    assert [(t, v, n) for t, v, n in got_rows] == exp_rows
    assert any(v == 50.0 for _, v, _ in got_rows)  # the late spike alerted


def test_annotate_stream_late_rows_kept(spark, tmp_path):
    """annotate_stream is stateless (0 state rows, no watermark): late rows
    are always joined and emitted — stream over staged late input equals
    the batch twin over the FULL input."""
    from pyranges_1_x_spark.core import GenomicRanges
    from pyranges_1_x_spark.streaming.intervals import annotate_stream

    ann = GenomicRanges(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "Chromosome": ["chr1", "chr2"],
                    "Start": [0, 0],
                    "End": [1000, 1000],
                    "gene": ["g1", "g2"],
                }
            )
        )
    )
    f0 = pd.DataFrame(
        {
            "Chromosome": ["chr1", "chr2"],
            "Start": [10, 20],
            "End": [50, 60],
            "read_id": [1, 2],
            "ts": [T("2026-01-01 10:00"), T("2026-01-01 13:00")],
        }
    )
    f1 = pd.DataFrame(
        {
            "Chromosome": ["chr1"],
            "Start": [100],
            "End": [200],
            "read_id": [3],
            "ts": [T("2026-01-01 13:30")],
        }
    )
    f2 = pd.DataFrame(  # late, still joined
        {
            "Chromosome": ["chr2"],
            "Start": [500],
            "End": [600],
            "read_id": [4],
            "ts": [T("2026-01-01 09:00")],
        }
    )
    d = stage_files(spark, tmp_path, IV_SCHEMA, [f0, f1, f2], "ann_late")
    got = run_staged(
        spark, d, IV_SCHEMA, lambda s: annotate_stream(s, ann), "ann_late_sink"
    )
    full = annotate_stream(
        spark.createDataFrame(pd.concat([f0, f1, f2], ignore_index=True), IV_SCHEMA),
        ann,
    ).toPandas()
    assert sorted(got.read_id) == sorted(full.read_id) == [1, 2, 3, 4]
    pd.testing.assert_frame_equal(_sorted(got), _sorted(full))


def test_stream_store_dedup_late_rows_dropped(spark, tmp_path):
    """stream_dedup_against_store under out-of-order input: a doc whose
    ONLY arrival is below the late-event watermark never emits even when
    its signature is genuinely unseen; the emitted sig set equals the
    batch twin restricted to on-time rows (store-dups excluded on both
    paths)."""
    from pyspark.sql import functions as F

    from pyranges_1_x_spark.ml.dedup import fingerprint
    from pyranges_1_x_spark.streaming.events import stream_dedup_against_store

    DOC_SCHEMA = "doc_id long, text string, ts timestamp"
    store = spark.createDataFrame(
        pd.DataFrame({"text": ["archived text"]})
    ).select(fingerprint(F.col("text")).alias("sig"))

    f0 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["archived text", "fresh one", "pacer doc"],
            "ts": [
                T("2026-01-01 10:00"),
                T("2026-01-01 10:01"),
                T("2026-01-01 13:00"),   # advances the watermark to 12:00
            ],
        }
    )
    f1 = pd.DataFrame(
        {"doc_id": [4], "text": ["pacer two"], "ts": [T("2026-01-01 13:30")]}
    )
    f2 = pd.DataFrame(
        {
            "doc_id": [5, 6],
            "text": ["late unique", "on time unique"],
            "ts": [T("2026-01-01 10:30"), T("2026-01-01 12:30")],
        }
    )
    on_time = pd.concat([f0, f1, f2.iloc[[1]]], ignore_index=True)
    d = stage_files(spark, tmp_path, DOC_SCHEMA, [f0, f1, f2], "storededup_late")
    got = run_staged(
        spark,
        d,
        DOC_SCHEMA,
        lambda s: stream_dedup_against_store(s, store, watermark="1 hour"),
        "storededup_late_sink",
    )
    batch = stream_dedup_against_store(
        spark.createDataFrame(on_time, DOC_SCHEMA), store
    ).toPandas()
    assert sorted(got.sig) == sorted(batch.sig)
    assert sorted(got.doc_id) == [2, 3, 4, 6]  # late-only doc 5 dropped,
    # store-dup doc 1 dropped on both paths
