"""Crash/restart-recovery axis for every stateful gated stream (VERDICT
r11 #4).

The late-data axis (tests/test_streaming_late.py) and the state
measurements cover a continuously-running stream; these tests prove
EXACTLY-ONCE ACROSS A RESTART: each stateful operator runs with a durable
``checkpointLocation`` into a fault-tolerant parquet sink, the query stops
CLEANLY MID-INPUT (``availableNow`` over only the first files), more input
lands, and a brand-new query object resumes from the same checkpoint. The
committed sink contents (read through the sink's ``_spark_metadata``
exactly-once log) must equal the batch twin over the FULL input — no
duplicated rows from re-emitting pre-restart output, no lost rows, and,
critically, MERGED state: every fixture has a session/window/dedup-key/
Welford fold that STRADDLES the restart, so the right answer is only
reachable if phase 2 recovered phase 1's state store rather than starting
cold.

Reference precedent for twin parity: the r9 stream-vs-batch tests; the
late-axis staging recipe (one parquet file per batch + mtime ordering +
maxFilesPerTrigger=1 + availableNow) is reused so batch boundaries are
deterministic.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pandas as pd

T = pd.Timestamp
EV_SCHEMA = "k string, ts timestamp, value double"
IV_SCHEMA = "Chromosome string, Start long, End long, read_id long, ts timestamp"


def _sorted(pdf):
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


class _RestartHarness:
    """Stage frames as one-file micro-batches, run phase 1 over the first
    ``split`` files with a durable checkpoint into a parquet sink, then add
    the remaining files and resume a NEW query from the same checkpoint."""

    def __init__(self, spark, tmp_path, schema, name):
        self.spark = spark
        self.schema = schema
        self.src = str(tmp_path / f"{name}_src")
        self.ckpt = str(tmp_path / f"{name}_ckpt")
        self.sink = str(tmp_path / f"{name}_sink")
        self.stage_dir = tmp_path
        self.name = name
        self.base_mtime = time.time() - 600
        os.makedirs(self.src, exist_ok=True)

    def add_files(self, frames, start_idx):
        for i, pdf in enumerate(frames, start=start_idx):
            tmp = str(self.stage_dir / f"__stage_{self.name}_{i}")
            self.spark.createDataFrame(pdf, self.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            dst = f"{self.src}/f{i}.parquet"
            shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], dst)
            mtime = self.base_mtime + 30 * i
            os.utime(dst, (mtime, mtime))

    def run_phase(self, op):
        stream = (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(self.src)
        )
        q = (
            op(stream)
            .writeStream.format("parquet")
            .option("path", self.sink)
            .option("checkpointLocation", self.ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def committed(self):
        # Reading the sink directory goes through _spark_metadata: only
        # files committed by the sink's exactly-once log are visible.
        return self.spark.read.parquet(self.sink).toPandas()

    def run_split(self, frames, split, op):
        self.add_files(frames[:split], 0)
        self.run_phase(op)
        p1 = self.committed()
        self.add_files(frames[split:], split)
        self.run_phase(op)  # new query object, same checkpoint: RESTART
        return p1, self.committed()


def test_sessionize_restart_merges_open_session(spark, tmp_path):
    """A session with events on BOTH sides of the restart must emit ONCE
    with the merged aggregate (state recovered), the session finalized
    before the restart must not re-emit (exactly-once), and the total
    equals the batch twin over the full input."""
    from pyranges_1_x_spark.streaming.events import sessionize

    # phase 1: uC closes (watermark 11:00 after f1 > 08:30 end); u1's
    # session [10:45, 11:30) stays OPEN across the restart
    f0 = pd.DataFrame(
        {
            "k": ["uC", "u1", "u1"],
            "ts": [T("2026-01-01 08:00"), T("2026-01-01 10:45"), T("2026-01-01 11:00")],
            "value": [9.0, 1.0, 2.0],
        }
    )
    f1 = pd.DataFrame({"k": ["uA"], "ts": [T("2026-01-01 12:00")], "value": [3.0]})
    # phase 2 (post-restart): u1 extends its open session; uZ flushes
    f2 = pd.DataFrame(
        {
            "k": ["u1", "uZ"],
            "ts": [T("2026-01-01 11:20"), T("2026-01-01 17:00")],
            "value": [4.0, 5.0],
        }
    )
    h = _RestartHarness(spark, tmp_path, EV_SCHEMA, "sess_restart")
    op = lambda s: sessionize(s, user_col="k", gap="30 minutes", watermark="1 hour")
    p1, final = h.run_split([f0, f1, f2], 2, op)

    # mid-input stop committed exactly the finalized uC session
    assert list(p1.k) == ["uC"] and float(p1.sum_value.iloc[0]) == 9.0

    full = pd.concat([f0, f1, f2], ignore_index=True)
    twin = sessionize(
        spark.createDataFrame(full, EV_SCHEMA), user_col="k", gap="30 minutes"
    ).toPandas()
    twin = twin[twin.session_end <= T("2026-01-01 16:00")]  # final watermark
    pd.testing.assert_frame_equal(_sorted(final), _sorted(twin))
    # the straddling session merged: one u1 row, all three events in it
    u1 = final[final.k == "u1"]
    assert len(u1) == 1 and int(u1.n_events.iloc[0]) == 3
    assert float(u1.sum_value.iloc[0]) == 7.0
    assert len(final) == len(final.drop_duplicates())  # no duplicated emissions


def test_windowed_coverage_restart_merges_open_window(spark, tmp_path):
    """Per-(window, bin) counts with intervals arriving before AND after
    the restart in the same open window: the final counts merge both
    phases; the window finalized pre-restart is not re-emitted."""
    from pyranges_1_x_spark.streaming.intervals import windowed_interval_coverage

    # phase 1: 10:00 window rows; 13:00 row both advances the watermark
    # (wm 12:00 finalizes the 10:00 window) and opens the 13:00 window
    f0 = pd.DataFrame(
        {
            "Chromosome": ["chr1", "chr1"],
            "Start": [0, 500],
            "End": [100, 700],
            "read_id": [1, 2],
            "ts": [T("2026-01-01 10:00"), T("2026-01-01 10:30")],
        }
    )
    f1 = pd.DataFrame(
        {
            "Chromosome": ["chr2"],
            "Start": [100],
            "End": [200],
            "read_id": [3],
            "ts": [T("2026-01-01 13:00")],
        }
    )
    # phase 2: more intervals in the OPEN 13:00 window (same chr2 bin and
    # a new one), then the 17:00 flusher
    f2 = pd.DataFrame(
        {
            "Chromosome": ["chr2", "chr2"],
            "Start": [150, 9000],
            "End": [260, 9100],
            "read_id": [4, 5],
            "ts": [T("2026-01-01 13:30"), T("2026-01-01 17:00")],
        }
    )
    h = _RestartHarness(spark, tmp_path, IV_SCHEMA, "cov_restart")
    op = lambda s: windowed_interval_coverage(
        s, window_duration="1 hour", bin_size=100, watermark="1 hour"
    )
    p1, final = h.run_split([f0, f1, f2], 2, op)

    # phase 1 committed the finalized 10:00 window only
    assert set(p1.window_start) == {T("2026-01-01 10:00")}

    full = pd.concat([f0, f1, f2], ignore_index=True)
    twin = windowed_interval_coverage(
        spark.createDataFrame(full, IV_SCHEMA), window_duration="1 hour", bin_size=100
    ).toPandas()
    twin = twin[twin.window_start < T("2026-01-01 16:00")]
    pd.testing.assert_frame_equal(_sorted(final), _sorted(twin))
    # the straddling (13:00 window, chr2 bin 100) count merged reads 3+4:
    # read 3 covers bins 100, read 4 covers bins 100-200
    w13 = final[
        (final.window_start == T("2026-01-01 13:00"))
        & (final.Chromosome == "chr2")
        & (final.Start == 100)
    ]
    assert len(w13) == 1 and int(w13.n_intervals.iloc[0]) == 2
    assert len(final) == len(final.drop_duplicates())


def test_running_anomalies_restart_recovers_welford_state(spark, tmp_path):
    """The per-key (count, mean, M2) fold straddles the restart: phase 2's
    spike only alerts against phase 1's statistics (a cold restart would
    have count < 2 and stay silent), and the combined emissions equal the
    shared-fold reference over all arrival batches."""
    from pyranges_1_x_spark.streaming.events import _welford_scan, running_anomalies

    f0 = pd.DataFrame(
        {
            "k": ["m"] * 6,
            "ts": [T("2026-01-01 10:00") + pd.Timedelta(minutes=i) for i in range(6)],
            "value": [10.0, 10.5, 9.5, 10.2, 9.8, 60.0],  # phase-1 spike too
        }
    )
    f1 = pd.DataFrame(
        {"k": ["m"], "ts": [T("2026-01-01 12:00")], "value": [10.3]}
    )
    # phase 2: the spike that must score against RECOVERED state
    f2 = pd.DataFrame(
        {"k": ["m"], "ts": [T("2026-01-01 13:00")], "value": [100.0]}
    )
    h = _RestartHarness(spark, tmp_path, EV_SCHEMA, "anom_restart")
    op = lambda s: running_anomalies(s, key_col="k", z_threshold=3.0)
    p1, final = h.run_split([f0, f1, f2], 2, op)

    assert any(final.value == 100.0), "post-restart spike must alert"
    # n_seen on the post-restart alert proves the recovered count (7 rows
    # folded before it), not a cold restart (count 0)
    assert int(final[final.value == 100.0].n_seen.iloc[0]) == 7

    count, mean, m2 = 0, 0.0, 0.0
    expected = []
    for pdf in (f0, f1, f2):
        pdf = pdf.sort_values("ts", kind="mergesort")
        out, (count, mean, m2) = _welford_scan(
            ((("m", ts), v) for ts, v in zip(pdf.ts, pdf.value)), count, mean, m2, 3.0
        )
        expected.extend(out)
    got_rows = sorted((r.ts, r.value, r.n_seen) for r in final.itertuples())
    exp_rows = sorted((ts, v, n) for _k, ts, v, _z, n in expected)
    assert got_rows == exp_rows
    # exactly-once: phase-1 alerts are not re-emitted by the resumed query
    assert len(final) == len(expected) and len(p1) < len(final)


def test_streaming_dedup_restart_remembers_seen_keys(spark, tmp_path):
    """A re-delivery AFTER the restart of a key first seen BEFORE it must
    still be dropped — only possible if the dedup state store was
    recovered — and first arrivals are emitted exactly once."""
    from pyranges_1_x_spark.streaming.events import streaming_dedup

    f0 = pd.DataFrame(
        {
            "k": ["A", "B"],
            "ts": [T("2026-01-01 10:00"), T("2026-01-01 10:05")],
            "value": [1.0, 2.0],
        }
    )
    # phase 2: A re-delivered (within the 1h watermark horizon of its
    # first arrival), C is new
    f1 = pd.DataFrame(
        {
            "k": ["A", "C"],
            "ts": [T("2026-01-01 10:10"), T("2026-01-01 10:20")],
            "value": [99.0, 3.0],
        }
    )
    h = _RestartHarness(spark, tmp_path, EV_SCHEMA, "dedup_restart")
    op = lambda s: streaming_dedup(s, "k", watermark="1 hour")
    p1, final = h.run_split([f0, f1], 1, op)

    assert sorted(p1.k) == ["A", "B"]
    assert sorted(final.k) == ["A", "B", "C"]  # no duplicate A, no losses
    # the surviving A row is the FIRST arrival, not the replay
    assert float(final[final.k == "A"].value.iloc[0]) == 1.0
    # batch-twin key parity (the twin's dropDuplicates keeps an arbitrary
    # row, so pin keys only — the operator's documented batch contract)
    full = pd.concat([f0, f1], ignore_index=True)
    twin = streaming_dedup(spark.createDataFrame(full, EV_SCHEMA), "k").toPandas()
    assert sorted(final.k) == sorted(twin.k)


def test_stream_store_dedup_restart_remembers_seen_sigs(spark, tmp_path):
    """stream_dedup_against_store across a restart: a signature first seen
    BEFORE the restart must drop its post-restart re-delivery (only
    recovered dedup state can do that), store-dups stay dropped on both
    sides, and the final sig set equals the batch twin over the full
    input."""
    from pyspark.sql import functions as F

    from pyranges_1_x_spark.ml.dedup import fingerprint
    from pyranges_1_x_spark.streaming.events import stream_dedup_against_store

    DOC_SCHEMA = "doc_id long, text string, ts timestamp"
    store = spark.createDataFrame(
        pd.DataFrame({"text": ["archived text"]})
    ).select(fingerprint(F.col("text")).alias("sig"))

    f0 = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["archived text", "fresh one"],
            "ts": [T("2026-01-01 10:00"), T("2026-01-01 10:01")],
        }
    )
    f1 = pd.DataFrame(
        {"doc_id": [3], "text": ["other doc"], "ts": [T("2026-01-01 10:05")]}
    )
    # phase 2 (post-restart): doc 4 re-delivers doc 2's text within the
    # watermark — droppable only if phase 1's dedup state was recovered
    f2 = pd.DataFrame(
        {
            "doc_id": [4, 5, 6],
            "text": ["fresh one", "brand new", "archived text"],
            "ts": [
                T("2026-01-01 10:10"),
                T("2026-01-01 10:11"),
                T("2026-01-01 10:12"),
            ],
        }
    )
    h = _RestartHarness(spark, tmp_path, DOC_SCHEMA, "storededup_restart")
    op = lambda s: stream_dedup_against_store(s, store, watermark="1 hour")
    p1, final = h.run_split([f0, f1, f2], 2, op)

    # phase 1 committed exactly the two unseen docs (store-dup 1 dropped)
    assert sorted(p1.doc_id) == [2, 3]

    full = pd.concat([f0, f1, f2], ignore_index=True)
    twin = stream_dedup_against_store(
        spark.createDataFrame(full, DOC_SCHEMA), store
    ).toPandas()
    assert sorted(final.sig) == sorted(twin.sig)
    # the straddling signature emitted ONCE, and it is the PRE-restart
    # arrival — a cold-started phase 2 would have emitted doc 4 too
    fresh = final[final.text == "fresh one"]
    assert list(fresh.doc_id) == [2]
    assert sorted(final.doc_id) == [2, 3, 5]
