"""Distributed supervised-learning primitives with exact cross-engine
parity — the model-TRAINING side of the training-data engine (the
registry's eval side being classifier_eval_lang / sim_recall).

decision_stump_train: the canonical distributed tree-learner step (the
inner loop of every boosted-tree / random-forest trainer): over every
candidate (feature, threshold) split, compute the weighted Gini impurity
of the induced partition and take the argmin.  The classic scale shape —
XGBoost/LightGBM's histogram method — is reproduced faithfully: the
full fact table compresses to per-(feature, value) count/positive pairs
in ONE aggregation (60k rows -> ~100), prefix-sum windows over the tiny
compressed table enumerate every threshold's left/right counts without
touching raw rows again, and the argmin is a one-row sort of ~100
candidates.  All arithmetic is integer (counts, and ppm impurities via
floor division — identical truncation in both engines), so the chosen
split is bit-identical everywhere.  The ppm formulation is exact-enough
by construction: overflow-free up to ~6e5 positives per side; beyond
that a production job widens to DECIMAL(38,0) (the spearman/tfidf
precedent).

pca_power_iteration: see its docstring below.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}

_PPM = 1_000_000


def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    base = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(l_extendedprice AS BIGINT) DIV 1000 AS price_kilo",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y",
    )
    comp = (
        base.selectExpr("'qty' AS feat", "qty AS val", "y")
        .unionByName(base.selectExpr("'price_kilo' AS feat", "price_kilo AS val", "y"))
        .groupBy("feat", "val")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
    )
    cand = comp.selectExpr(
        "feat",
        "val",
        "sum(n) OVER (PARTITION BY feat ORDER BY val) AS n_l",
        "sum(pos) OVER (PARTITION BY feat ORDER BY val) AS pos_l",
        "sum(n) OVER (PARTITION BY feat) AS n_t",
        "sum(pos) OVER (PARTITION BY feat) AS pos_t",
    ).filter("n_l < n_t")
    g = (
        lambda p, n: f"(2 * {p} * ({n} - {p}) * {_PPM}) DIV ({n} * {n})"
    )
    scored = cand.selectExpr(
        "feat",
        "val",
        "n_l",
        "pos_l",
        "n_t - n_l AS n_r",
        "pos_t - pos_l AS pos_r",
        f"(n_l * ({g('pos_l', 'n_l')})"
        f" + (n_t - n_l) * ({g('(pos_t - pos_l)', '(n_t - n_l)')}))"
        " DIV n_t AS score_ppm",
        f"{g('pos_t', 'n_t')} AS base_gini_ppm",
    )
    return (
        scored.orderBy("score_ppm", "feat", "val")
        .limit(1)
        .selectExpr(
            "feat AS feature",
            "CAST(val AS BIGINT) AS threshold",
            "CAST(n_l AS BIGINT) AS n_left",
            "CAST(pos_l AS BIGINT) AS pos_left",
            "CAST(n_r AS BIGINT) AS n_right",
            "CAST(pos_r AS BIGINT) AS pos_right",
            "CAST(score_ppm AS BIGINT) AS score_ppm",
            "CAST(base_gini_ppm - score_ppm AS BIGINT) AS gain_ppm",
        )
    )


def _stump_g(p: str, n: str) -> str:
    return f"(2 * {p} * ({n} - {p}) * {_PPM}) // ({n} * {n})"


DECISION_STUMP_TRAIN_SQL = f"""
WITH base AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         CAST(l_extendedprice AS BIGINT) // 1000 AS price_kilo,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
), comp AS (
  SELECT feat, val, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM (
    SELECT 'qty' AS feat, qty AS val, y FROM base
    UNION ALL
    SELECT 'price_kilo' AS feat, price_kilo AS val, y FROM base
  ) GROUP BY feat, val
), cand AS (
  SELECT feat, val,
         sum(n) OVER (PARTITION BY feat ORDER BY val) AS n_l,
         sum(pos) OVER (PARTITION BY feat ORDER BY val) AS pos_l,
         sum(n) OVER (PARTITION BY feat) AS n_t,
         sum(pos) OVER (PARTITION BY feat) AS pos_t
  FROM comp
), scored AS (
  SELECT feat, val, n_l, pos_l, n_t - n_l AS n_r, pos_t - pos_l AS pos_r,
         (n_l * ({_stump_g('pos_l', 'n_l')})
          + (n_t - n_l) * ({_stump_g('(pos_t - pos_l)', '(n_t - n_l)')}))
           // n_t AS score_ppm,
         {_stump_g('pos_t', 'n_t')} AS base_gini_ppm
  FROM cand WHERE n_l < n_t
)
SELECT feat AS feature,
       CAST(val AS BIGINT) AS threshold,
       CAST(n_l AS BIGINT) AS n_left,
       CAST(pos_l AS BIGINT) AS pos_left,
       CAST(n_r AS BIGINT) AS n_right,
       CAST(pos_r AS BIGINT) AS pos_right,
       CAST(score_ppm AS BIGINT) AS score_ppm,
       CAST(base_gini_ppm - score_ppm AS BIGINT) AS gain_ppm
FROM scored
ORDER BY score_ppm, feat, val
LIMIT 1
"""

QUERIES["decision_stump_train"] = decision_stump_train
ORACLES["decision_stump_train"] = DECISION_STUMP_TRAIN_SQL


# --- pca_power_iteration: the spectral family opener ---------------------
# Top principal direction of the embedding corpus by THREE unrolled power
# iterations v <- X^T (X v), entirely in scaled integers so Spark and
# DuckDB agree bit-for-bit (the pagerank/kmeans discipline applied to
# linear algebra).  Components become micro-ints (floor(x * 1e6) — floor
# and the float32->double widening are IEEE-identical in both engines);
# each iteration is two equi-join + partial-agg passes over the exploded
# (id, dim, e) table:
#     d_i = (sum_k e_ik v_k) div 1e6        (one agg by id)
#     y_k = sum_i e_ik d_i                  (one agg by dim)
#     v'  = y div max(|y| div 1e6, 1)       (renormalize to ~1e6 scale)
# Overflow headroom at this scale: |e| <= 1e6 (unit-norm inputs),
# |v| <= ~8e6, so |e*d'| <= 8e12 and the dim-sums stay < 1e17 up to ~1e4
# rows; a billion-row corpus widens the two sums to DECIMAL(38,0) — the
# spearman/tfidf precedent — with the SAME plan shape.  The iteration
# count is fixed and unrolled because the oracle needs a closed form;
# convergence quality is pinned by the planted-anisotropy property test
# (alignment > 0.95 after 3 rounds), not assumed.
#
# Scale shape: X never materializes as a matrix — the exploded table is
# the storage format, both aggs are partial (map-side combinable), and
# the 64-row state vector broadcasts into each join exactly like
# pagerank's rank vector.
_PCA_ITERS = 3
_MICRO = 1_000_000


def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    e = (
        emb.selectExpr("vec_id AS id", "posexplode(embedding) AS (dim, x)")
        .selectExpr(
            "id",
            "dim",
            f"CAST(floor(CAST(x AS DOUBLE) * {_MICRO}) AS BIGINT) AS e",
        )
        .localCheckpoint(eager=True)  # reused by every iteration
    )
    v = e.select("dim").distinct().selectExpr(
        "dim", f"CAST({_MICRO} AS BIGINT) AS v"
    )
    for _ in range(_PCA_ITERS):
        d = (
            e.join(F.broadcast(v), "dim")
            .groupBy("id")
            .agg(F.expr(f"sum(e * v) DIV {_MICRO}").alias("d"))
        )
        y = (
            e.join(d, "id")
            .groupBy("dim")
            .agg(F.expr("sum(e * d)").alias("y"))
        )
        s = y.agg(
            F.expr(f"greatest(max(abs(y)) DIV {_MICRO}, CAST(1 AS BIGINT))").alias("s")
        )
        v = y.crossJoin(F.broadcast(s)).selectExpr("dim", "y DIV s AS v")
    return v.selectExpr("CAST(dim AS INT) AS dim", "CAST(v AS BIGINT) AS v_scaled")


def _pca_sql() -> str:
    steps = []
    prev = "v0"
    for t in range(1, _PCA_ITERS + 1):
        steps.append(
            f"""d{t} AS (
  SELECT id, sum(e * v) // {_MICRO} AS d
  FROM e JOIN {prev} USING (dim) GROUP BY id
), y{t} AS (
  SELECT dim, sum(e * d) AS y FROM e JOIN d{t} USING (id) GROUP BY dim
), s{t} AS (
  SELECT greatest(max(abs(y)) // {_MICRO}, 1) AS s FROM y{t}
), v{t} AS (
  SELECT dim, y // s AS v FROM y{t}, s{t}
)"""
        )
        prev = f"v{t}"
    body = ",\n".join(steps)
    return f"""
WITH e AS (
  SELECT vec_id AS id, CAST(dim AS INT) AS dim,
         CAST(floor(CAST(x AS DOUBLE) * {_MICRO}) AS BIGINT) AS e
  FROM (
    SELECT vec_id, unnest(embedding) AS x,
           unnest(range(len(embedding))) AS dim
    FROM embeddings
  )
), v0 AS (
  SELECT DISTINCT dim, CAST({_MICRO} AS BIGINT) AS v FROM e
),
{body}
SELECT CAST(dim AS INT) AS dim, CAST(v AS BIGINT) AS v_scaled FROM v{_PCA_ITERS}
"""


PCA_POWER_ITERATION_SQL = _pca_sql()

QUERIES["pca_power_iteration"] = pca_power_iteration
ORACLES["pca_power_iteration"] = PCA_POWER_ITERATION_SQL


# --- conformal_interval_orders: distribution-free predictive intervals ---
# Split conformal prediction — the modern, assumption-free way to attach
# a coverage-guaranteed interval to ANY point predictor — reduced to
# pure relational algebra.  The md5 content split (the house
# split_train_val_test recipe: train < 70, calibration 70..89, test
# >= 90) makes the three folds deterministic and rerun-stable; the
# predictor is the train-fold group mean (milli-cents, integer DIV); the
# calibration fold contributes absolute residuals whose
# ceil(0.9 * (n_cal + 1))-th smallest (row_number over (residual, key) —
# the tie-break makes rank selection engine-identical) is the conformal
# quantile q_hat; every test row's interval is pred +/- q_hat.  Split
# conformal guarantees >= 90% marginal coverage in expectation; the
# empirical test coverage is an OUTPUT COLUMN in ppm, so the driver hash
# re-proves the guarantee's realization every round (measured ~93% at
# sf0.01 — above the floor, as theory demands).
#
# Scale: one scan fans into three folds by a per-row hash predicate; the
# predictor and the quantile are small aggregates (5 groups / one global
# rank over the calibration fold — at billion-row scale the rank becomes
# the two-stage sharded k-th selection the theta sketch already
# demonstrates); the test-fold join is broadcast (5-row model + 1-row
# quantile).  No libm, no floats.
_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 9, 10  # 90% target coverage


def conformal_interval_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_craft_spark.queries.dedup import md5_prefix_long_sql

    h = md5_prefix_long_sql("CAST(o_orderkey AS STRING)", 4, "spark")
    base = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .selectExpr(
            "o_orderkey",
            "o_orderpriority AS grp",
            "CAST(round(o_totalprice * 100) AS BIGINT) * 1000 AS mc",
            f"({h}) % 100 AS pct",
        )
        .localCheckpoint(eager=True)  # three folds scan it; = written split
    )
    model = (
        base.filter("pct < 70")
        .groupBy("grp")
        .agg(F.expr("sum(mc) DIV count(1)").alias("pred_mc"))
    )
    cal = (
        base.filter("pct >= 70 AND pct < 90")
        .join(F.broadcast(model), "grp")
        .selectExpr("abs(mc - pred_mc) AS resid", "o_orderkey")
    )
    n_cal = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    qhat = (
        cal.crossJoin(F.broadcast(n_cal))
        .selectExpr(
            "resid",
            "n_cal",
            "row_number() OVER (ORDER BY resid, o_orderkey) AS rk",
        )
        .filter(
            f"rk = ((({_CONF_ALPHA_NUM} * (n_cal + 1))"
            f" + {_CONF_ALPHA_DEN} - 1) DIV {_CONF_ALPHA_DEN})"
        )
        .selectExpr("resid AS qhat_mc", "n_cal")
    )
    test = base.filter("pct >= 90").join(F.broadcast(model), "grp")
    return (
        test.crossJoin(F.broadcast(qhat))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.expr(
                "sum(CASE WHEN mc BETWEEN pred_mc - qhat_mc"
                " AND pred_mc + qhat_mc THEN 1 ELSE 0 END)"
            ).alias("n_covered"),
            F.first("qhat_mc").alias("qhat_mc"),
            F.first("n_cal").alias("n_cal"),
        )
        .selectExpr(
            "n_cal",
            "n_test",
            "CAST(qhat_mc AS BIGINT) AS qhat_mc",
            "CAST(2 * qhat_mc AS BIGINT) AS width_mc",
            "CAST((1000000 * n_covered) DIV n_test AS BIGINT)"
            " AS coverage_ppm",
        )
    )


def _conformal_sql() -> str:
    from pdf_craft_spark.queries.dedup import md5_prefix_long_sql

    h = md5_prefix_long_sql("CAST(o_orderkey AS VARCHAR)", 4, "duck")
    return f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) * 1000 AS mc,
         ({h}) % 100 AS pct
  FROM orders
), model AS (
  SELECT grp, sum(mc) // count(*) AS pred_mc
  FROM base WHERE pct < 70 GROUP BY grp
), cal AS (
  SELECT abs(mc - pred_mc) AS resid, o_orderkey
  FROM base JOIN model USING (grp) WHERE pct >= 70 AND pct < 90
), nc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal
), qhat AS (
  SELECT resid AS qhat_mc, n_cal
  FROM (
    SELECT resid, n_cal,
           row_number() OVER (ORDER BY resid, o_orderkey) AS rk
    FROM cal CROSS JOIN nc
  )
  WHERE rk = ((({_CONF_ALPHA_NUM} * (n_cal + 1))
               + {_CONF_ALPHA_DEN} - 1) // {_CONF_ALPHA_DEN})
), test AS (
  SELECT mc, pred_mc FROM base JOIN model USING (grp) WHERE pct >= 90
)
SELECT CAST(n_cal AS BIGINT) AS n_cal,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(qhat_mc AS BIGINT) AS qhat_mc,
       CAST(2 * qhat_mc AS BIGINT) AS width_mc,
       CAST((1000000 * sum(CASE WHEN mc BETWEEN pred_mc - qhat_mc
                            AND pred_mc + qhat_mc THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS coverage_ppm
FROM test CROSS JOIN qhat
GROUP BY n_cal, qhat_mc
"""


CONFORMAL_INTERVAL_ORDERS_SQL = _conformal_sql()

QUERIES["conformal_interval_orders"] = conformal_interval_orders
ORACLES["conformal_interval_orders"] = CONFORMAL_INTERVAL_ORDERS_SQL
