"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

- brute-force cosine top-k: the correctness baseline.  Query set × corpus
  cross join with the dot product computed as a Catalyst higher-order
  expression (``zip_with`` + ``aggregate``) — JVM-side, no Python.
- LSH bucketing (random-hyperplane signs): the scale path — at 100 TB the
  cross join is replaced by an equi-join on bucket key; brute force then
  runs only within buckets.

Float determinism vs the DuckDB oracle: every element is cast to double
before multiply, and both engines fold the 64 products left-to-right
(Spark ``aggregate``, DuckDB ``list_reduce``), so the doubles are
bit-identical and rounding is purely cosmetic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

N_QUERIES = 10
TOP_K = 5
N_PLANES = 8
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # norms are per-row: compute them once per side BEFORE the cross join
    # (the higher-order aggregate is interpreted, not codegen'd — don't
    # re-evaluate it per pair)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.expr(_DOT.format(a="embedding", b="embedding")).alias("nq"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.expr(_DOT.format(a="embedding", b="embedding")).alias("nc"),
    )
    joined = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    dot = F.expr(_DOT.format(a="qe", b="ce"))
    cos = dot / F.sqrt(F.col("nq") * F.col("nc"))
    scored = joined.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
        .orderBy("query_id", "rank")
    )


_DOT_DUCK = (
    "list_reduce(list_transform(range(1, {n} + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (acc, v) -> acc + v)"
)

SIM_COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         round({_DOT_DUCK.format(a="qe", b="ce", n=DIM)}
               / sqrt({_DOT_DUCK.format(a="qe", b="qe", n=DIM)}
                      * {_DOT_DUCK.format(a="ce", b="ce", n=DIM)}), 6) AS cos_sim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
)
SELECT query_id, rank, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


# --- LSH bucket assignment (random-hyperplane signs) ------------------------
# Hyperplane p, dim d sign taken from md5 parity (engine-portable, seedless):
# r[p][d] = +1 if first hex nibble of md5('p|d') < '8' else -1.
# bucket bit p = 1 iff sum_d r[p][d] * v[d] > 0.
def _plane_signs() -> list[list[int]]:
    import hashlib

    signs = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
            row.append(1 if h[0] in "01234567" else -1)
        signs.append(row)
    return signs


def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    signs = _plane_signs()
    bit_cols = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"({s}.0 * CAST(element_at(embedding, {d + 1}) AS DOUBLE))"
            for d, s in enumerate(signs[p])
        )
        bit_cols.append(F.when(F.expr(terms) > 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.select(
        "vec_id", F.concat(*bit_cols).alias("bucket"), "label"
    ).orderBy("vec_id")


def _lsh_duck_sql() -> str:
    signs = _plane_signs()
    bits = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"({s}.0 * CAST(embedding[{d + 1}] AS DOUBLE))"
            for d, s in enumerate(signs[p])
        )
        bits.append(f"CASE WHEN ({terms}) > 0 THEN '1' ELSE '0' END")
    bucket = " || ".join(bits)
    return f"SELECT vec_id, {bucket} AS bucket, label FROM embeddings ORDER BY vec_id"


SIM_LSH_BUCKETS_SQL = _lsh_duck_sql()


QUERIES = {
    "sim_cosine_topk": sim_cosine_topk,
    "sim_lsh_buckets": sim_lsh_buckets,
}

ORACLES = {
    "sim_cosine_topk": SIM_COSINE_TOPK_SQL,
    "sim_lsh_buckets": SIM_LSH_BUCKETS_SQL,
}
