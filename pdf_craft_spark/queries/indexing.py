"""Index-construction operators: an inverted text index (the search/
retrieval build step every corpus pipeline eventually needs) and a
Z-order space-filling-curve clustering key (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` layout primitive, computed engine-neutrally).

Both are pure Catalyst — no Python in the data path — and both are
integer/ASCII-exact so the DuckDB oracle matches hash-for-hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- inverted index ---------------------------------------------------------
# term -> (document frequency, collection frequency, first-K posting list).
# Tokens are ASCII-only words ([A-Za-z]{3,}) extracted BEFORE lowercasing,
# so unicode case-mapping divergence between the JVM and DuckDB never
# enters (the house tokenization rule from keyword_tfidf_topk).  The
# dataflow is the scalable index-build shape: explode -> per-(term,doc)
# count (first shuffle, the only one that sees token volume) -> per-term
# aggregate with a row_number cap on the materialized posting list.  df/cf
# are counted over ALL docs; only the *stored* posting list is capped at
# POSTINGS_CAP ids (ascending doc_id), so a hot stopword term costs one
# aggregate row, never an unbounded array.  DF_MIN trims the hapax tail
# from the output (the full index would simply skip the HAVING).
POSTINGS_CAP = 20
DF_MIN = 5
_TOKEN_RE = "[A-Za-z]{3,}"


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.expr(f"regexp_extract_all(text, '{_TOKEN_RE}', 0)")).alias("t"),
    ).select("doc_id", F.lower("t").alias("term"))
    td = toks.groupBy("term", "doc_id").agg(F.count("*").alias("cnt"))
    rk = td.withColumn(
        "r", F.row_number().over(W.partitionBy("term").orderBy("doc_id"))
    )
    return (
        rk.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("cnt").alias("cf"),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("r") <= POSTINGS_CAP, F.col("doc_id"))
                    )
                ).cast("array<string>"),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= DF_MIN)
        .selectExpr(
            "term",
            "CAST(df AS BIGINT) AS df",
            "CAST(cf AS BIGINT) AS cf",
            "postings",
        )
        .orderBy("term")
    )


INVERTED_INDEX_POSTINGS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         lower(unnest(regexp_extract_all(text, '{_TOKEN_RE}'))) AS term
  FROM documents
), td AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
), rk AS (
  SELECT term, doc_id, cnt,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS r
  FROM td
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(cnt) AS BIGINT) AS cf,
       string_agg(CASE WHEN r <= {POSTINGS_CAP} THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM rk
GROUP BY 1
HAVING count(*) >= {DF_MIN}
ORDER BY term
"""


# --- Z-order clustering key -------------------------------------------------
# Bit-interleaved (custkey, order-day) Morton code — the multi-dimensional
# clustering key behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: sorting by z
# gives range-scan locality on BOTH dimensions at once, so a predicate on
# either column prunes most files.  The interleave is a generated 16-term
# shift/mask sum rendered per-engine (Spark shiftleft/shiftright functions,
# DuckDB << >> operators — same integer semantics, value-identical), i.e.
# pure whole-stage-codegen arithmetic per row.  The output aggregates the
# per-row keys into the file-level summary a layout optimizer actually
# uses: for each z-range bucket (z >> 18 — sized to the synthetic key
# domain; a planner would pick the shift from the target file count), the
# row count and the
# min/max of both source dimensions — tight per-bucket dimension ranges
# ARE the demonstrated clustering win (each "file" prunes on both
# o_custkey and o_orderdate).
ZBITS = 16
Z_EPOCH = "1995-01-01"


def _zorder_terms(x: str, y: str, engine: str) -> str:
    terms = []
    for i in range(ZBITS):
        if engine == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_cluster_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").selectExpr(
        "CAST(o_custkey & 65535 AS BIGINT) AS x",
        f"CAST(datediff(CAST(o_orderdate AS DATE), DATE '{Z_EPOCH}')"
        " & 65535 AS BIGINT) AS y",
    )
    z = orders.selectExpr(
        "x", "y", f"CAST({_zorder_terms('x', 'y', 'spark')} AS BIGINT) AS z"
    )
    return (
        z.groupBy(F.expr("CAST(z DIV 262144 AS BIGINT)").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
            F.min("x").alias("min_cust"),
            F.max("x").alias("max_cust"),
            F.min("y").alias("min_day"),
            F.max("y").alias("max_day"),
        )
        .selectExpr(
            "bucket",
            "CAST(n AS BIGINT) AS n",
            "CAST(min_z AS BIGINT) AS min_z",
            "CAST(max_z AS BIGINT) AS max_z",
            "CAST(min_cust AS BIGINT) AS min_cust",
            "CAST(max_cust AS BIGINT) AS max_cust",
            "CAST(min_day AS BIGINT) AS min_day",
            "CAST(max_day AS BIGINT) AS max_day",
        )
        .orderBy("bucket")
    )


ZORDER_CLUSTER_KEY_SQL = f"""
WITH base AS (
  SELECT CAST(o_custkey & 65535 AS BIGINT) AS x,
         CAST(date_diff('day', DATE '{Z_EPOCH}', CAST(o_orderdate AS DATE))
              & 65535 AS BIGINT) AS y
  FROM orders
), zz AS (
  SELECT x, y, CAST({_zorder_terms('x', 'y', 'duck')} AS BIGINT) AS z
  FROM base
)
SELECT CAST(z // 262144 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(z) AS BIGINT) AS min_z,
       CAST(max(z) AS BIGINT) AS max_z,
       CAST(min(x) AS BIGINT) AS min_cust,
       CAST(max(x) AS BIGINT) AS max_cust,
       CAST(min(y) AS BIGINT) AS min_day,
       CAST(max(y) AS BIGINT) AS max_day
FROM zz
GROUP BY 1
ORDER BY bucket
"""


QUERIES = {
    "inverted_index_postings": inverted_index_postings,
    "zorder_cluster_key": zorder_cluster_key,
}

ORACLES = {
    "inverted_index_postings": INVERTED_INDEX_POSTINGS_SQL,
    "zorder_cluster_key": ZORDER_CLUSTER_KEY_SQL,
}
