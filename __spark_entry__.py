"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on /root/testdata/sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
training-data function library), one callable per op.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for each SQL-expressible op.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_craft_spark.queries import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full extraction pipeline — deterministic interleaved
    raw-span corpus (pinned 28-doc golden corpus; see queries/pipelineq.py)
    → stage-1 Catalyst prep → per-doc Arrow kernel → ordered output spans
    (the north-rule artifact, oracle-checked against golden/n28)."""
    return QUERIES["pipeline_extract_spans"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
