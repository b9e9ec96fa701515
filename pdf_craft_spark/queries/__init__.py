"""Query registry: every implemented operator from SURVEY.md §2 (plus the
training-data-pipeline function library) exposed as a (spark_fn, oracle_sql)
pair for the driver's DuckDB correctness gate.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name]`` is the
ANSI-SQL equivalent DuckDB runs over the same parquet views.  Ops that are
not SQL-expressible (per-doc kernels) appear in QUERIES only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_craft_spark.queries import (
    bookmetaq,
    checkpointq,
    dedup,
    multimodalq,
    pipelineq,
    relational,
    relational2,
    similarity,
    streamingq,
    textops,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (
    relational,
    relational2,
    textops,
    dedup,
    similarity,
    multimodalq,
    pipelineq,
    bookmetaq,
    streamingq,
    checkpointq,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

# every oracle key must have a query
assert set(ORACLES) <= set(QUERIES), sorted(set(ORACLES) - set(QUERIES))
