"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

- brute-force cosine top-k: the correctness baseline (query set × corpus).
- LSH bucketing + sim_lsh_topk: scale path #1 — candidates via equi-join
  on the hyperplane bucket key with Hamming-1 multiprobe.
- IVF + sim_ivf_topk: scale path #2 — a coarse quantizer assigns every
  vector to its nearest centroid (the classic inverted-file layout);
  queries probe their NPROBE nearest lists and rerank exactly within them.

Float determinism vs the DuckDB oracle: every element is cast to double
before arithmetic, and both engines evaluate the 64-term sums in the same
left-associated order (literal sums on both sides), so the doubles are
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


# The dot product as a left fold over zip_with (interpreted higher-order
# expression).  A literal 64-term sum was MEASURED AND REJECTED: it is
# 4.2x faster per row in an isolated projection, but inside the top-k
# join stages the inlined copies blow Janino's 64KB method limit — the
# WHOLE stage falls back to interpreted and the queries get slower
# (sim_cosine_topk 1.2s -> 2.0s).  The fold keeps stages codegen-friendly
# and folds left-to-right, bit-identical to DuckDB's list_reduce.
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


def _bit_cols() -> list[F.Column]:
    signs = _plane_signs()
    bit_cols = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"({s}.0 * CAST(element_at(embedding, {d + 1}) AS DOUBLE))"
            for d, s in enumerate(signs[p])
        )
        bit_cols.append(F.when(F.expr(terms) > 0, F.lit("1")).otherwise(F.lit("0")))
    return bit_cols


def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return emb.select(
        "vec_id", F.concat(*_bit_cols()).alias("bucket"), "label"
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


# --- end-to-end bucketed ANN top-k -------------------------------------------
# The 100 TB path: candidates come from an EQUI-JOIN on bucket key (with
# multiprobe — each query also probes the 8 buckets at Hamming distance 1
# from its own, recovering most hyperplane-boundary misses), then exact
# cosine reranks only within the candidate set.  The plan contains no
# CartesianProduct / BroadcastNestedLoopJoin anywhere: bucket assignment is
# a narrow projection, candidate generation shuffles on the 8-bit bucket
# key, rerank is per-pair scalar math.  Scale knobs: more planes and/or
# multiple hash tables widen the bucket space as the corpus grows.
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    base = emb.select(
        "vec_id",
        "embedding",
        F.concat(*_bit_cols()).alias("bucket"),
        F.expr(_DOT.format(a="embedding", b="embedding")).alias("norm2"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("bucket").alias("cbucket"),
        F.col("norm2").alias("nc"),
    )
    # probe set: own bucket + each single-bit flip (Hamming radius 1)
    flips = [F.col("bucket")] + [
        F.concat(
            F.substring("bucket", 1, p),
            F.when(F.substring("bucket", p + 1, 1) == "1", F.lit("0")).otherwise(
                F.lit("1")
            ),
            F.substring("bucket", p + 2, N_PLANES - p - 1),
        )
        for p in range(N_PLANES)
    ]
    q = (
        base.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("norm2").alias("nq"),
            F.explode(F.array(*flips)).alias("probe"),
        )
    )
    cand = q.join(c, q["probe"] == c["cbucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    dot = F.expr(_DOT.format(a="qe", b="ce"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(dot / F.sqrt(F.col("nq") * F.col("nc")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
        .orderBy("query_id", "rank")
    )


def _lsh_topk_duck_sql() -> str:
    signs = _plane_signs()
    bits = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"({s}.0 * CAST(embedding[{d + 1}] AS DOUBLE))"
            for d, s in enumerate(signs[p])
        )
        bits.append(f"CASE WHEN ({terms}) > 0 THEN '1' ELSE '0' END AS b{p}")
    bucket = " || ".join(f"b{p}" for p in range(N_PLANES))
    probe_selects = ["  SELECT query_id, qe, nq, bucket AS probe FROM q"]
    for p in range(N_PLANES):
        flipped = " || ".join(
            f"(CASE WHEN b{i} = '1' THEN '0' ELSE '1' END)" if i == p else f"b{i}"
            for i in range(N_PLANES)
        )
        probe_selects.append(
            f"  SELECT query_id, qe, nq, {flipped} AS probe FROM q"
        )
    probes = "\n  UNION ALL\n".join(probe_selects)
    norm = _DOT_DUCK.format(a="embedding", b="embedding", n=DIM)
    dot = _DOT_DUCK.format(a="qe", b="ce", n=DIM)
    return f"""
WITH base AS (
  SELECT vec_id, embedding, {", ".join(bits)}, {norm} AS norm2 FROM embeddings
), base2 AS (
  SELECT vec_id, embedding, {bucket} AS bucket, norm2,
         {", ".join(f"b{p}" for p in range(N_PLANES))}
  FROM base
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, norm2 AS nq,
         bucket, {", ".join(f"b{p}" for p in range(N_PLANES))}
  FROM base2 WHERE vec_id < {N_QUERIES}
), probes AS (
{probes}
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS ce, bucket AS cbucket, norm2 AS nc
  FROM base2
), scored AS (
  SELECT query_id, neighbor_id,
         round({dot} / sqrt(nq * nc), 6) AS cos_sim
  FROM probes JOIN c ON probe = cbucket
  WHERE query_id <> neighbor_id
)
SELECT query_id, rank, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


SIM_LSH_TOPK_SQL = _lsh_topk_duck_sql()


# --- IVF: coarse quantizer + inverted lists -----------------------------------
# Centroids are DETERMINISTIC SEEDS (the first N_CENTROIDS vectors) — the
# Lloyd-iteration "fit" of real IVF is a driver-side sampling step outside
# the oracle-checkable dataflow, so the quantizer here is seeded, not
# trained; the DATAFLOW (assign every vector to its nearest list, probe
# NPROBE lists per query, exact rerank within lists) is exactly IVF's.
# Assignment is a narrow codegen projection against centroid literals
# (collected once on the driver — the "model broadcast" of a fit step);
# candidate generation is an equi-join on the centroid id.  Scale knobs:
# more centroids (sqrt(N) rule) and NPROBE for the recall/cost trade.
N_CENTROIDS = 16
NPROBE = 2


def _sqdist_lit(cvals: list[float]) -> F.Column:
    """Squared L2 distance embedding↔literal centroid vector, as a left
    fold over zip_with with an array literal — one compact expression per
    centroid (a 64-term literal sum per centroid made the optimizer and
    codegen choke: 39s for the whole query vs ~2s with the fold).  Fold
    order starts at +0.0, value-identical to the SQL twin's literal
    left-associated sum."""
    arr = "array(" + ", ".join(f"{float(v)!r}D" for v in cvals) + ")"
    return F.expr(
        f"aggregate(zip_with(embedding, {arr}, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    cent = (
        emb.filter(F.col("vec_id") < N_CENTROIDS)
        .select("vec_id", "embedding")
        .collect()
    )  # the fit artifact: N_CENTROIDS rows on the driver, literal below
    cent = sorted(((r.vec_id, list(r.embedding)) for r in cent))
    dists = [
        F.struct(_sqdist_lit(vals).alias("d"), F.lit(int(cid)).alias("c"))
        for cid, vals in cent
    ]
    base = emb.select(
        "vec_id",
        "embedding",
        F.expr(_DOT.format(a="embedding", b="embedding")).alias("norm2"),
        F.least(*dists)["c"].alias("cid"),  # nearest list, ties → lowest cid
        F.slice(F.array_sort(F.array(*dists)), 1, NPROBE).alias("probes"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("norm2").alias("nc"),
        "cid",
    )
    q = (
        base.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("norm2").alias("nq"),
            F.explode("probes").alias("p"),
        )
        .select("query_id", "qe", "nq", F.col("p.c").alias("pcid"))
    )
    cand = q.join(c, q["pcid"] == c["cid"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    dot = F.expr(_DOT.format(a="qe", b="ce"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(dot / F.sqrt(F.col("nq") * F.col("nc")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
        .orderBy("query_id", "rank")
    )


def _ivf_duck_sql() -> str:
    sq = " + ".join(
        f"((CAST(e.embedding[{d + 1}] AS DOUBLE) - CAST(c.embedding[{d + 1}] AS DOUBLE))"
        f" * (CAST(e.embedding[{d + 1}] AS DOUBLE) - CAST(c.embedding[{d + 1}] AS DOUBLE)))"
        for d in range(DIM)
    )
    norm = _DOT_DUCK.format(a="embedding", b="embedding", n=DIM)
    dot = _DOT_DUCK.format(a="qe", b="ce", n=DIM)
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {N_CENTROIDS}
), dists AS (
  SELECT e.vec_id, c.cid, {sq} AS d
  FROM embeddings e CROSS JOIN cent c
), ranked AS (
  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
  FROM dists
), base AS (
  SELECT vec_id, embedding, {norm} AS norm2 FROM embeddings
), assign AS (
  SELECT r.vec_id, r.cid FROM ranked r WHERE r.rk = 1
), q AS (
  SELECT b.vec_id AS query_id, b.embedding AS qe, b.norm2 AS nq, r.cid AS pcid
  FROM base b JOIN ranked r ON r.vec_id = b.vec_id
  WHERE b.vec_id < {N_QUERIES} AND r.rk <= {NPROBE}
), c AS (
  SELECT b.vec_id AS neighbor_id, b.embedding AS ce, b.norm2 AS nc, a.cid
  FROM base b JOIN assign a ON a.vec_id = b.vec_id
), scored AS (
  SELECT query_id, neighbor_id,
         round({dot} / sqrt(nq * nc), 6) AS cos_sim
  FROM q JOIN c ON pcid = cid
  WHERE query_id <> neighbor_id
)
SELECT query_id, rank, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


SIM_IVF_TOPK_SQL = _ivf_duck_sql()


QUERIES = {
    "sim_cosine_topk": sim_cosine_topk,
    "sim_lsh_buckets": sim_lsh_buckets,
    "sim_lsh_topk": sim_lsh_topk,
    "sim_ivf_topk": sim_ivf_topk,
}

ORACLES = {
    "sim_cosine_topk": SIM_COSINE_TOPK_SQL,
    "sim_lsh_buckets": SIM_LSH_BUCKETS_SQL,
    "sim_lsh_topk": SIM_LSH_TOPK_SQL,
    "sim_ivf_topk": SIM_IVF_TOPK_SQL,
}
