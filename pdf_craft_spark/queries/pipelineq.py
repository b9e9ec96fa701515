"""Extraction-pipeline queries (per-doc ordered kernels; rows-only driver
checks — chapter/paragraph stitching, reading order, TOC inference and
footnote joins are not ANSI-SQL-expressible, so no DuckDB oracle entries).

Each runs the deterministic synthetic interleaved corpus at a size scaled
to the sf directory, through the 3-stage Spark plan in plans/pipeline.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_craft_spark.plans.pipeline import (
    corpus_df,
    doc_metrics,
    extract_markdown_df,
    extract_spans_df,
    prepare_stage1,
    to_nested_output,
)

SEED = 42


def _n_docs(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    return max(8, int(2400 * sf))


def pipeline_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full extraction — raw interleaved spans → ordered output
    spans (W1/W2/W3/W4/W5/W6/W7, J1/J2/J3, E1-E12, A2-A7, F1-F9)."""
    docs = corpus_df(spark, _n_docs(sf_dir), SEED)
    return extract_spans_df(docs).orderBy("doc_id", "offset")


def pipeline_stage1_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1 alone (F1/F3/F4 as codegen'd Catalyst scalar ops)."""
    from pdf_craft_spark.plans.pipeline import explode_spans

    flat = prepare_stage1(explode_spans(corpus_df(spark, _n_docs(sf_dir), SEED)))
    return flat.select("doc_id", "kind", "text", "offset").orderBy("doc_id", "offset")


def pipeline_doc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: per-doc extraction metrics table."""
    docs = corpus_df(spark, _n_docs(sf_dir), SEED)
    return doc_metrics(extract_spans_df(docs)).orderBy("doc_id")


def pipeline_nested_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 3: re-nested (doc_id, spans) output contract shape."""
    docs = corpus_df(spark, _n_docs(sf_dir), SEED)
    nested = to_nested_output(extract_spans_df(docs))
    return nested.select(
        "doc_id", F.size("spans").alias("n_spans")
    ).orderBy("doc_id")


def pipeline_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12: extraction with frequency-based repeated-line demotion on —
    running headers recurring across a book's pages are dropped."""
    docs = corpus_df(spark, _n_docs(sf_dir), SEED)
    return extract_spans_df(docs, boilerplate=True).orderBy("doc_id", "offset")


def pipeline_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: per-doc rendered markdown (the file-sink payload)."""
    docs = corpus_df(spark, _n_docs(sf_dir), SEED)
    return extract_markdown_df(docs).select(
        "doc_id", "n_spans", F.length("markdown").alias("md_len")
    ).orderBy("doc_id")


QUERIES = {
    "pipeline_extract_spans": pipeline_extract_spans,
    "pipeline_markdown": pipeline_markdown,
    "pipeline_stage1_prep": pipeline_stage1_prep,
    "pipeline_doc_metrics": pipeline_doc_metrics,
    "pipeline_nested_output": pipeline_nested_output,
    "pipeline_boilerplate_strip": pipeline_boilerplate_strip,
}
ORACLES: dict = {}
