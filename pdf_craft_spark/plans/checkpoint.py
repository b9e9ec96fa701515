"""S10: checkpointed, resumable extraction runs with per-partition lineage.

Behavioral spec: the reference's resume markers — skip page if its XML
exists, skip doc if 'done' exists (/root/reference/pdf_craft/pdf/ocr.py:
92-95,129-136,218-219).  Spark-native equivalent:

- output spans land in a bucket-partitioned parquet dataset (bucket =
  pmod(hash(doc_id), n_buckets)); on Iceberg this is a partitioned table
  with snapshot-atomic commits.
- resume = LEFT ANTI join of the input docs against the doc_ids already
  committed — only uncommitted documents are recomputed.
- every run appends a manifest row per bucket (run_id, bucket, n_docs,
  n_spans, wall_sec) — the per-partition lineage + metrics record the
  north rule asks for.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_craft_spark.plans.pipeline import extract_spans_df

N_BUCKETS = 16


def _spans_path(out_dir: str) -> str:
    return os.path.join(out_dir, "spans")


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def committed_doc_ids(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = _spans_path(out_dir)
    try:
        return spark.read.parquet(path).select("doc_id").distinct()
    except Exception:
        return None  # first run: nothing committed yet


def run_with_resume(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str,
) -> dict:
    """Extract `docs`, skipping documents already committed in out_dir.

    Returns run stats; output is appended bucket-partitioned, and the
    manifest gains one row per touched bucket.
    """
    t0 = time.time()
    done = committed_doc_ids(spark, out_dir)
    todo = docs if done is None else docs.join(done, "doc_id", "left_anti")

    # every span row carries the run that produced it — row-level lineage,
    # and the per-run manifest delta below is a cheap parquet scan filtered
    # on run_id (row-group stats prune old runs) instead of a re-extraction
    flat = (
        extract_spans_df(todo)
        .withColumn("bucket", F.pmod(F.hash("doc_id"), F.lit(N_BUCKETS)))
        .withColumn("run_id", F.lit(run_id))
    )
    flat.write.mode("append").partitionBy("bucket").parquet(_spans_path(out_dir))
    wall = time.time() - t0

    # mergeSchema: an output dir written before the run_id column existed
    # has files without it — schema inference must union footers, not pick
    # one, or the run_id filter below can fail / read inconsistently
    out = spark.read.option("mergeSchema", "true").parquet(_spans_path(out_dir))
    # manifest rows record THIS run's delta per bucket; wall_sec is the
    # run-level wall clock (identical across the run's bucket rows)
    lineage = (
        out.filter(F.col("run_id") == run_id)
        .groupBy("bucket")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("wall_sec", F.lit(round(wall, 3)))
        .withColumn("status", F.lit("committed"))
    )
    lineage.write.mode("append").parquet(_manifest_path(out_dir))

    stats_row = out.agg(
        F.countDistinct("doc_id").alias("docs"), F.count(F.lit(1)).alias("spans")
    ).collect()[0]
    return {
        "run_id": run_id,
        "wall_sec": wall,
        "total_docs_committed": stats_row["docs"],
        "total_spans_committed": stats_row["spans"],
    }
