"""Driver-visible streaming query: the stateful per-doc accumulator run
as a REAL Structured Streaming job (file source, two micro-batches,
memory sink), whose final state must equal the plain batch aggregate —
stream ≡ batch as a DuckDB-checkable oracle row, not just a pytest claim.

The event feed is derived deterministically from the documents table
(one event per doc per i in [0, doc_id % 4], n_chars = length(text) + i),
split into two files so maxFilesPerTrigger=1 forces TWO micro-batches and
the state store genuinely carries totals across a batch boundary."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ev = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("doc_id") % 4).cast("int"))
        ).alias("i"),
        F.length("text").alias("base"),
    )
    return ev.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "i",
        F.lit("text").alias("kind"),
        (F.col("base") + F.col("i")).cast("long").alias("n_chars"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("event_time"),
    )


def streaming_doc_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_craft_spark.streaming.eventtime import running_doc_totals

    events = _events(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="stream_totals_")
    input_dir = os.path.join(work, "in")
    name = f"totals_{uuid.uuid4().hex[:10]}"
    try:
        # two files == two micro-batches (maxFilesPerTrigger=1): the second
        # batch must ACCUMULATE onto state built by the first
        events.filter(F.col("i") % 2 == 0).drop("i").coalesce(1).write.parquet(
            os.path.join(input_dir, "b0")
        )
        events.filter(F.col("i") % 2 == 1).drop("i").coalesce(1).write.parquet(
            os.path.join(input_dir, "b1")
        )
        stream = (
            spark.readStream.schema(
                "doc_id string, kind string, n_chars long, event_time timestamp"
            )
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(input_dir)
        )
        q = (
            running_doc_totals(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # latest update per doc == the final state == the batch aggregate
        final = (
            spark.table(name)
            .groupBy("doc_id")
            .agg(
                F.max("n_spans").alias("n_events"),
                F.max("n_chars").alias("n_chars"),
            )
            .orderBy("doc_id")
        )
        rows = final.collect()  # materialize before the tmp dir vanishes
        return spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the batch truth the streaming state must equal
STREAMING_DOC_TOTALS_SQL = """
WITH ev AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         length(text) + i AS n_chars
  FROM documents, unnest(range(0, doc_id % 4 + 1)) AS t(i)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM ev GROUP BY doc_id ORDER BY doc_id
"""

QUERIES = {"streaming_doc_totals": streaming_doc_totals}
ORACLES = {"streaming_doc_totals": STREAMING_DOC_TOTALS_SQL}
