"""Incremental (streaming) extraction of newly-arriving documents.

The reference is a resumable batch pipeline (SURVEY.md §2.10: no
event-time semantics anywhere), so the Spark-native incremental story is
file-arrival Structured Streaming: new parquet files of interleaved docs
land in a directory; each micro-batch runs the SAME batch extraction plan
via ``foreachBatch`` and appends to the same bucket-partitioned output the
batch checkpoint (plans/checkpoint.py) uses.

Delivery semantics: ``foreachBatch`` is at-least-once — a micro-batch can
REPLAY after a failure between the parquet append and the offset commit.
The sink is therefore made idempotent at the document level: each batch is
left-anti-joined against the doc_ids already committed to the output
(exactly what plans/checkpoint.run_with_resume does for batch resume), so
a replayed batch re-writes nothing and the OBSERVED result is
effectively-once per document.  On Iceberg the same property comes
cheaper, from MERGE/overwrite-by-filter snapshot atomicity keyed on
(epoch_id, doc_id).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_craft_spark.plans.checkpoint import N_BUCKETS, committed_doc_ids
from pdf_craft_spark.plans.pipeline import extract_spans_df
from pdf_craft_spark.schemas import INTERLEAVED_DOC_SCHEMA


def make_batch_processor(out_dir: str) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body, exposed for direct replay testing: dedups
    the batch against committed doc_ids, so re-processing the same batch
    (an at-least-once replay) appends nothing."""

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        done = committed_doc_ids(spark, out_dir)
        todo = (
            batch_df
            if done is None
            else batch_df.join(done, "doc_id", "left_anti")
        )
        # write through the SAME sink as batch resume: one bucketing scheme
        # (sinks.bucket_expr) per dataset, so external lineage recompute
        # and mixed batch/stream output dirs stay consistent
        from pdf_craft_spark.plans.sinks import ParquetBucketSink

        flat = extract_spans_df(todo).withColumn(
            "run_id", F.lit(f"epoch_{epoch_id}")
        )
        ParquetBucketSink(out_dir, N_BUCKETS).append_spans(flat)

    return process_batch


def start_incremental_extraction(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 8,
):
    """readStream over an interleaved-docs directory → per-micro-batch
    extraction → idempotent append to the bucket-partitioned spans dataset.

    Returns the StreamingQuery (caller stops it / processAllAvailable)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    stream = (
        spark.readStream.schema(INTERLEAVED_DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(make_batch_processor(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
