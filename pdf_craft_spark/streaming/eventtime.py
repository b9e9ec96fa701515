"""Event-time streaming operators: watermarked windowed metrics and a
custom stateful per-document accumulator.

The reference itself has no event-time semantics (SURVEY §2.10 — it is a
resumable batch pipeline), so these are the ENGINE's forward-looking half
of the streaming story, complementing streaming/incremental.py's
file-arrival ingest:

- ``windowed_extraction_metrics``: A9-style per-window extraction metrics
  over a stream of span events carrying an ``event_time`` — tumbling
  windows + watermark, so late events inside the tolerance still count
  and events later than the watermark are dropped deterministically
  (proved in tests/test_streaming_eventtime.py).
- ``running_doc_totals``: a custom STATEFUL operator via
  ``applyInPandasWithState`` — per-document running span totals that
  survive across micro-batches (state = (n_spans, n_chars) so far); the
  canonical shape for any cross-batch accumulator Spark lacks natively.

Scale notes: the window aggregate is a standard partial-agg + state-store
op (state bounded by watermark horizon × key cardinality); the stateful
operator's state is one tiny tuple per in-flight document, keyed —
like everything else in this engine — by doc_id, so the state store
shards on exactly the pipeline's partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def windowed_extraction_metrics(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Tumbling event-time windows over span events
    (doc_id, kind, n_chars, event_time): per-window span counts, distinct
    doc estimate and char volume.  Late rows within ``watermark`` still
    land in their window; rows later than the watermark are dropped (the
    deterministic late-data contract).  Append output mode emits a window
    only once it can no longer change."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.approx_count_distinct("doc_id").alias("n_docs_approx"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_spans",
            "n_docs_approx",
            "n_chars",
        )
    )


DOC_TOTALS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n_spans", LongType(), False),
        StructField("n_chars", LongType(), False),
    ]
)
_DOC_STATE_SCHEMA = StructType(
    [
        StructField("n_spans", LongType(), False),
        StructField("n_chars", LongType(), False),
    ]
)


def _doc_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_spans, n_chars = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_spans += len(pdf)
        n_chars += int(pdf["n_chars"].fillna(0).sum())
    state.update((n_spans, n_chars))
    yield pd.DataFrame(
        {"doc_id": [key[0]], "n_spans": [n_spans], "n_chars": [n_chars]}
    )


def running_doc_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-document span totals
    across micro-batches.  Each batch emits the UPDATED running total for
    every document that received events — the streaming twin of
    doc_metrics' batch aggregate, with state carried by the engine's
    state store instead of a shuffle-wide re-aggregation."""
    from pdf_craft_spark.shipping import ensure_package_shipped

    ensure_package_shipped(events.sparkSession)
    return events.groupBy("doc_id").applyInPandasWithState(
        _doc_totals_fn,
        outputStructType=DOC_TOTALS_SCHEMA,
        stateStructType=_DOC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
