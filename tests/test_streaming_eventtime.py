"""Event-time streaming semantics, proved deterministically with a file
source + memory sink:

- watermark contract: a late-but-tolerated event lands in its (already
  open) window; an event later than the watermark is DROPPED; append mode
  emits a window exactly once, after the watermark passes its end.
- stateful operator: running per-doc totals accumulate across
  micro-batches through the state store (applyInPandasWithState).
"""

from __future__ import annotations

import os
import uuid

import pytest

SCHEMA = "doc_id string, kind string, n_chars long, event_time timestamp"


def _write_batch(spark, input_dir: str, rows: list[tuple]) -> None:
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "doc_id string, kind string, n_chars long, event_time string"
    ).withColumn("event_time", F.to_timestamp("event_time"))
    df.coalesce(1).write.mode("append").parquet(input_dir)


def _start(spark, stream_df, name: str, checkpoint: str, mode: str):
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .start()
    )


@pytest.fixture()
def dirs(tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    return inp, str(tmp_path / "ckpt")


def test_watermark_window_and_late_drop(spark, dirs):
    from pdf_craft_spark.streaming.eventtime import windowed_extraction_metrics

    input_dir, ckpt = dirs
    name = f"win_{uuid.uuid4().hex[:8]}"
    # batch 1: three events in window [12:00, 12:10)
    _write_batch(
        spark,
        input_dir,
        [
            ("d1", "text", 100, "2026-01-01 12:00:30"),
            ("d1", "title", 20, "2026-01-01 12:04:00"),
            ("d2", "text", 50, "2026-01-01 12:09:59"),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    q = _start(
        spark, windowed_extraction_metrics(stream, "10 minutes", "20 minutes"),
        name, ckpt, "append",
    )
    try:
        q.processAllAvailable()
        # watermark (max_event - 20min) hasn't passed 12:10 — nothing final
        assert spark.table(name).count() == 0

        # batch 2: a LATE event at 12:05 (within tolerance — must count)
        # plus a 12:35 event that advances the watermark to 12:15 > 12:10
        _write_batch(
            spark,
            input_dir,
            [
                ("d3", "text", 10, "2026-01-01 12:05:00"),
                ("d1", "text", 40, "2026-01-01 12:35:00"),
            ],
        )
        q.processAllAvailable()
        # batch 3: event at 12:01 — LATER than the 12:15 watermark: dropped
        _write_batch(spark, input_dir, [("d9", "text", 999, "2026-01-01 12:01:00")])
        q.processAllAvailable()

        rows = {r.window_start.strftime("%H:%M"): r for r in spark.table(name).collect()}
        assert "12:00" in rows
        w = rows["12:00"]
        # 3 on-time + 1 tolerated-late; the watermark-late 999-char row absent
        assert w.n_spans == 4
        assert w.n_chars == 100 + 20 + 50 + 10
    finally:
        q.stop()


def test_running_doc_totals_state_across_batches(spark, dirs):
    from pdf_craft_spark.streaming.eventtime import running_doc_totals

    input_dir, ckpt = dirs
    name = f"tot_{uuid.uuid4().hex[:8]}"
    _write_batch(
        spark,
        input_dir,
        [
            ("a", "text", 10, "2026-01-01 00:00:00"),
            ("a", "text", 5, "2026-01-01 00:00:01"),
            ("b", "title", 7, "2026-01-01 00:00:02"),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    q = _start(spark, running_doc_totals(stream), name, ckpt, "update")
    try:
        q.processAllAvailable()
        first = {r.doc_id: r for r in spark.table(name).collect()}
        assert (first["a"].n_spans, first["a"].n_chars) == (2, 15)
        assert (first["b"].n_spans, first["b"].n_chars) == (1, 7)

        # second micro-batch: state must carry, totals must be cumulative
        _write_batch(spark, input_dir, [("a", "text", 100, "2026-01-01 00:01:00")])
        q.processAllAvailable()
        rows = spark.table(name).collect()
        latest_a = max(
            (r for r in rows if r.doc_id == "a"), key=lambda r: r.n_spans
        )
        assert (latest_a.n_spans, latest_a.n_chars) == (3, 115)
    finally:
        q.stop()
