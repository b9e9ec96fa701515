"""S10 resume semantics: a second run over a superset input recomputes
ONLY the uncommitted documents; manifest rows accrue per bucket."""

from __future__ import annotations

import uuid

from pdf_craft_spark.plans.checkpoint import run_with_resume
from pdf_craft_spark.plans.pipeline import corpus_df


def test_resume_skips_committed(spark, tmp_path):
    out_dir = str(tmp_path / "out")

    stats1 = run_with_resume(spark, corpus_df(spark, 4, partitions=2), out_dir, "run1")
    assert stats1["total_docs_committed"] == 4

    # superset input: only the 4 new docs should be extracted
    stats2 = run_with_resume(spark, corpus_df(spark, 8, partitions=2), out_dir, "run2")
    assert stats2["total_docs_committed"] == 8

    out = spark.read.parquet(f"{out_dir}/spans")
    # no duplicated work: each (doc_id, offset) appears exactly once
    n = out.count()
    nd = out.select("doc_id", "offset").distinct().count()
    assert n == nd

    manifest = spark.read.parquet(f"{out_dir}/manifest")
    runs = {r.run_id for r in manifest.select("run_id").distinct().collect()}
    assert runs == {"run1", "run2"}
    assert manifest.filter(manifest.status == "committed").count() >= 2


def test_resume_into_pre_run_id_output(spark, tmp_path):
    """An output dir written before the run_id column existed (schema
    drift) must resume cleanly: the sink's mergeSchema read unions the
    footers and the lineage delta filter sees NULL run_id on old files."""
    from pyspark.sql import functions as F

    from pdf_craft_spark.plans.pipeline import extract_spans_df
    from pdf_craft_spark.plans.sinks import ParquetBucketSink

    out_dir = str(tmp_path / "out")
    legacy = extract_spans_df(corpus_df(spark, 2, partitions=2)).withColumn(
        "bucket", F.pmod(F.hash("doc_id"), F.lit(16))
    )
    legacy.write.mode("append").partitionBy("bucket").parquet(f"{out_dir}/spans")

    stats = run_with_resume(spark, corpus_df(spark, 4, partitions=2), out_dir, "r2")
    assert stats["total_docs_committed"] == 4
    out = ParquetBucketSink(out_dir).read_spans(spark)
    assert out.select("doc_id", "offset").distinct().count() == out.count()
    # legacy rows surface with NULL run_id; new rows carry r2
    assert out.filter(F.col("run_id").isNull()).count() > 0
    assert out.filter(F.col("run_id") == "r2").count() > 0


def test_noop_rerun(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    run_with_resume(spark, corpus_df(spark, 3, partitions=2), out_dir, uuid.uuid4().hex)
    before = spark.read.parquet(f"{out_dir}/spans").count()
    run_with_resume(spark, corpus_df(spark, 3, partitions=2), out_dir, uuid.uuid4().hex)
    after = spark.read.parquet(f"{out_dir}/spans").count()
    assert before == after
