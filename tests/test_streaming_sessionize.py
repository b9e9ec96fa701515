"""Session-window boundary semantics for the streaming sessionize job:
an exact-gap successor MERGES (Spark's session windows are closed at
the end boundary: only a step strictly greater than the gap splits), as
does a sub-gap successor — including across the b0/b1
micro-batch boundary, which forces the state store to carry the open
session between triggers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_session_boundaries_and_cross_batch_merge(spark, tmp_path):
    from pdf_craft_spark.queries.streamingq import streaming_sessionize

    rows = [
        # user 11: spans the day-10/day-11 batch split with a sub-gap
        # step -> ONE merged session of 2 events
        (11, "2024-01-10 23:00:00"),
        (11, "2024-01-11 22:59:59.999999"),
        # user 22: successor at EXACTLY the gap -> merges (boundary is
        # inclusive); the third event one microsecond past the gap splits
        (22, "2024-01-05 00:00:00"),
        (22, "2024-01-06 00:00:00"),
        (22, "2024-01-07 00:00:00.000001"),
        # user 12: fails the user_id % 11 filter -> never appears
        (12, "2024-01-05 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.lit(1).alias("event_id"),
        F.lit("click").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))

    out = streaming_sessionize(spark, str(tmp_path)).collect()
    got = [
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in out
    ]
    assert got == [
        (
            11,
            "2024-01-10 23:00:00.000000",
            "2024-01-12 22:59:59.999999",
            2,
        ),
        (22, "2024-01-05 00:00:00.000000", "2024-01-07 00:00:00.000000", 2),
        (
            22,
            "2024-01-07 00:00:00.000001",
            "2024-01-08 00:00:00.000001",
            1,
        ),
    ], got
