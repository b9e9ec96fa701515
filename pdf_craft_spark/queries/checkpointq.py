"""Driver-visible S4/S7/S10 row: checkpointed resume, value-checked.

Runs the REAL resumable sink twice — first 6 documents, then the same 6
plus 6 more (the second run's left-anti join must skip the committed
half) — and returns the final committed span set.  The oracle is the
golden extraction table for those 12 documents: equality proves the
resume path loses nothing, duplicates nothing, and writes byte-identical
spans through the sink seam (plans/sinks.ParquetBucketSink)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_craft_spark.plans.checkpoint import N_BUCKETS
from pdf_craft_spark.queries.pipelineq import _GOLDEN_DIR

N_FIRST = 6
N_TOTAL = 12

# both queries below need the same two-run resume; one execution per Spark
# application serves both (the driver sweep runs them in one session), with
# only the collected rows kept — the tmp sink dir is gone by return time
_RESUME_CACHE: dict[str, tuple] = {}


def _two_run_resume(spark: SparkSession):
    """Run the 6-doc then 12-doc resume once; return materialized
    (spans_rows, spans_schema, manifest_rows, manifest_schema)."""
    from pdf_craft_spark.plans.checkpoint import run_with_resume
    from pdf_craft_spark.plans.pipeline import corpus_df
    from pdf_craft_spark.plans.sinks import ParquetBucketSink

    app_id = spark.sparkContext.applicationId
    if app_id in _RESUME_CACHE:
        return _RESUME_CACHE[app_id]

    out_dir = tempfile.mkdtemp(prefix="resume_q_")
    try:
        run_with_resume(spark, corpus_df(spark, N_FIRST), out_dir, "run1")
        run_with_resume(spark, corpus_df(spark, N_TOTAL), out_dir, "run2")
        sink = ParquetBucketSink(out_dir)
        spans = sink.read_spans(spark).select(
            "doc_id", "chapter_id", "kind", "text", "media_ref", "offset"
        ).orderBy("doc_id", "offset")
        manifest = sink.read_manifest(spark).select(
            "run_id", "bucket", "n_docs", "n_spans", "status"
        ).orderBy("run_id", "bucket")
        result = (spans.collect(), spans.schema, manifest.collect(), manifest.schema)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    _RESUME_CACHE[app_id] = result
    return result


def checkpoint_resume_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows, schema, _m_rows, _m_schema = _two_run_resume(spark)
    return spark.createDataFrame(rows, schema)


_GOLDEN_SPANS = os.path.join(_GOLDEN_DIR, "pipeline_extract_spans.parquet")

CHECKPOINT_RESUME_SPANS_SQL = f"""
SELECT doc_id, chapter_id, kind, text, media_ref, "offset"
FROM read_parquet('{_GOLDEN_SPANS}')
WHERE CAST(doc_id AS INT) < {N_TOTAL}
ORDER BY doc_id, "offset"
"""

def lineage_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north rule's "per-partition lineage + metrics", value-checked.

    Same two-run resume as checkpoint_resume_spans, but returns the
    MANIFEST: one row per (run, bucket) with doc/span counts.  The bucket
    id is engine-agnostic (sinks.bucket_expr: md5-derived), so the DuckDB
    oracle recomputes the full lineage — which docs run 2's anti-join
    left to which run, how they bucket, and how many spans each bucket
    committed — from the golden extraction table alone.  wall_sec is
    wall-clock (nondeterministic) and excluded from the projection."""
    _rows, _schema, m_rows, m_schema = _two_run_resume(spark)
    return spark.createDataFrame(m_rows, m_schema)


LINEAGE_MANIFEST_SQL = f"""
WITH spans AS (
  SELECT CASE WHEN CAST(doc_id AS INT) < {N_FIRST} THEN 'run1' ELSE 'run2' END
           AS run_id,
         CAST('0x' || substr(md5(doc_id), 1, 6) AS BIGINT) % {N_BUCKETS} AS bucket,
         doc_id
  FROM read_parquet('{_GOLDEN_SPANS}')
  WHERE CAST(doc_id AS INT) < {N_TOTAL}
)
SELECT run_id, bucket,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_spans,
       'committed' AS status
FROM spans GROUP BY run_id, bucket ORDER BY run_id, bucket
"""


QUERIES = {
    "checkpoint_resume_spans": checkpoint_resume_spans,
    "lineage_manifest": lineage_manifest,
}
ORACLES = {
    "checkpoint_resume_spans": CHECKPOINT_RESUME_SPANS_SQL,
    "lineage_manifest": LINEAGE_MANIFEST_SQL,
}
