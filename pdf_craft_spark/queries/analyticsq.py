"""Session-10 analytics batch: exact mode, cumulative-share (top-p) cuts,
tokenizer-vocabulary coverage, diversity indices, session/window load
overlap, corpus mixture planning, and anti-entropy bucket fingerprints.

House rules (same as statsq/textops): every value that decides the result
is integer or DECIMAL (ppm / cents / micros via DIV); doubles never cross
an aggregation; md5-derived integers come from the shared
``md5_prefix_long_sql`` spelling so both engines hash identically; log()
never appears — concentration is measured with the Simpson/HHI index
(pure integer) instead of entropy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pdf_craft_spark.queries.dedup import md5_prefix_long_sql as _md5pl


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- exact mode per group ---------------------------------------------------
# Mode of p_size per brand with a deterministic tie-break (smallest size
# among the max-count ties).  Scale shape: the raw table collapses FIRST to
# the compressed (brand, size, cnt) table — one map-side-combinable
# aggregation — and the argmax runs as max_by over a struct whose ordering
# encodes the tie-break ((cnt, -size) lexicographic), a second combinable
# aggregation.  No window over raw rows, no sort; at 100 TB both stages are
# partial-agg shuffles bounded by distinct (brand, size).
def mode_exact_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnts = (
        _t(spark, sf_dir, "part")
        .groupBy("p_brand", "p_size")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cnts.groupBy("p_brand")
        .agg(
            F.max(
                F.struct(
                    F.col("cnt"),
                    (-F.col("p_size")).alias("neg_size"),
                )
            ).alias("m"),
            F.count(F.lit(1)).alias("n_distinct_sizes"),
        )
        .selectExpr(
            "p_brand",
            "CAST(-m.neg_size AS BIGINT) AS mode_size",
            "CAST(m.cnt AS BIGINT) AS mode_count",
            "CAST(n_distinct_sizes AS BIGINT) AS n_distinct_sizes",
        )
        .orderBy("p_brand")
    )


MODE_EXACT_PER_GROUP_SQL = """
WITH cnts AS (
  SELECT p_brand, p_size, count(*) AS cnt
  FROM part GROUP BY p_brand, p_size
), ranked AS (
  SELECT p_brand, p_size, cnt,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY cnt DESC, p_size ASC) AS rn,
         count(*) OVER (PARTITION BY p_brand) AS n_distinct_sizes
  FROM cnts
)
SELECT p_brand,
       CAST(p_size AS BIGINT) AS mode_size,
       CAST(cnt AS BIGINT) AS mode_count,
       CAST(n_distinct_sizes AS BIGINT) AS n_distinct_sizes
FROM ranked WHERE rn = 1
ORDER BY p_brand
"""


# --- cumulative-share cutoff (top-p) ----------------------------------------
# Per nation: the smallest prefix of suppliers (by revenue, descending)
# whose cumulative revenue reaches 90% of the nation total — the "top-p /
# nucleus" cut used to pick the head of a heavy-tailed contributor list.
# Scale shape: lineitem collapses to one row per supplier (partial-agg
# shuffle, exact integer cents via DECIMAL), the nation total is a second
# combinable agg over that COMPRESSED table, and the cumulative window
# orders only suppliers-within-nation (bounded by suppliers, not facts).
# The crossing row is included: kept rows are those whose cumulative sum
# MINUS own revenue is still below the threshold.
def topp_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    sup_rev = li.groupBy("l_suppkey").agg(F.sum("cents").alias("rev_c"))
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    per_sup = sup_rev.join(F.broadcast(sup), "l_suppkey")
    wcum = (
        W.partitionBy("s_nationkey")
        .orderBy(F.col("rev_c").desc(), F.col("l_suppkey"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wtot = W.partitionBy("s_nationkey")
    cum = per_sup.select(
        "s_nationkey",
        F.col("l_suppkey").alias("s_suppkey"),
        "rev_c",
        F.sum("rev_c").over(wcum).alias("cum_c"),
        F.sum("rev_c").over(wtot).alias("tot_c"),
    )
    # keep while the PREVIOUS cumulative (cum - own) is below 90% of total;
    # all comparisons in integer cents: 10*(cum-rev) < 9*tot.
    return (
        cum.filter(10 * (F.col("cum_c") - F.col("rev_c")) < 9 * F.col("tot_c"))
        .selectExpr(
            "CAST(s_nationkey AS BIGINT) AS s_nationkey",
            "CAST(s_suppkey AS BIGINT) AS s_suppkey",
            "CAST(rev_c AS BIGINT) AS revenue_cents",
            "CAST(cum_c AS BIGINT) AS cum_cents",
            "CAST((1000000 * cum_c) DIV tot_c AS BIGINT) AS cum_share_ppm",
        )
        .orderBy("s_nationkey", F.col("cum_cents"))
    )


TOPP_REVENUE_SUPPLIERS_SQL = """
WITH sup_rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev_c
  FROM lineitem GROUP BY l_suppkey
), cum AS (
  SELECT s.s_nationkey, s.s_suppkey, r.rev_c,
         sum(r.rev_c) OVER (PARTITION BY s.s_nationkey
                            ORDER BY r.rev_c DESC, s.s_suppkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c,
         sum(r.rev_c) OVER (PARTITION BY s.s_nationkey) AS tot_c
  FROM sup_rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
)
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       CAST(s_suppkey AS BIGINT) AS s_suppkey,
       CAST(rev_c AS BIGINT) AS revenue_cents,
       CAST(cum_c AS BIGINT) AS cum_cents,
       CAST((1000000 * cum_c) // tot_c AS BIGINT) AS cum_share_ppm
FROM cum
WHERE 10 * (cum_c - rev_c) < 9 * tot_c
ORDER BY s_nationkey, cum_cents
"""


# --- tokenizer-vocabulary coverage (OOV rate) -------------------------------
# Build the top-VOCAB_K tokens of the corpus by total frequency (ties break
# on the token string), then score every document's out-of-vocabulary rate
# in ppm.  VOCAB_K is sized to the synthetic corpus's 29 common tokens,
# excluding only its rare adversarial token — every scale factor then
# populates BOTH outcome classes (fully-covered docs and docs with OOV
# mass), so the check can't go vacuous; at prod VOCAB_K is the
# tokenizer's real vocabulary size.  This is the tokenizer-coverage pass a training pipeline runs
# before committing to a vocabulary.  Scale shape: token counting is one
# partial-agg shuffle on the token; the vocabulary is a distributed top-k
# (TakeOrderedAndProject — no global sort materializes) whose result is
# VOCAB_K rows, broadcast back as a left join; the per-doc rollup is one
# more combinable agg.  The corpus is never re-scanned per vocab entry.
VOCAB_K = 29


def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(text, '[a-z]{2,}', 0)")
            ).alias("t"),
        )
    )
    vocab = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("t"))
        .limit(VOCAB_K)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .selectExpr(
            "doc_id",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            "CAST(n_oov AS BIGINT) AS n_oov",
            "CAST((1000000 * n_oov) DIV n_tokens AS BIGINT) AS oov_ppm",
        )
        .orderBy("doc_id")
    )


VOCAB_OOV_RATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]{{2,}}')) AS t
  FROM documents
), vocab AS (
  SELECT t FROM (
    SELECT t, count(*) AS freq FROM toks GROUP BY t
  ) ORDER BY freq DESC, t LIMIT {VOCAB_K}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST((1000000 * sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS oov_ppm
FROM toks LEFT JOIN vocab v USING (t)
GROUP BY doc_id
ORDER BY doc_id
"""


# --- Simpson / HHI character diversity --------------------------------------
# Per-document repetition/concentration score WITHOUT entropy's log():
# Simpson diversity = 1 - sum(p_i^2) over the token distribution, reported
# in ppm as 1e6 - (1e6 * sum(cnt_i^2)) DIV n^2 — pure integer arithmetic,
# so the quality gate is engine-exact (log-based entropy would couple the
# result to each engine's libm).  Degenerate/repetitive documents score
# near 0; diverse prose near 1e6.  Scale shape: one (doc, token) partial
# agg, then one per-doc combinable agg; counts fit BIGINT because
# sum(cnt^2) <= n^2 and n is per-document.
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(text, '[a-z]+', 0)")
            ).alias("t"),
        )
    )
    cnts = toks.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        cnts.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .selectExpr(
            "doc_id",
            "CAST(n AS BIGINT) AS n_tokens",
            "CAST(n_distinct AS BIGINT) AS n_distinct",
            "CAST(1000000 - (1000000 * ss) DIV (n * n) AS BIGINT)"
            " AS simpson_ppm",
        )
        .orderBy("doc_id")
    )


TEXT_SIMPSON_DIVERSITY_SQL = """
WITH cnts AS (
  SELECT doc_id, t, count(*) AS cnt FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS t
    FROM documents
  ) GROUP BY doc_id, t
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(1000000 - (1000000 * sum(cnt * cnt))
            // (sum(cnt) * sum(cnt)) AS BIGINT) AS simpson_ppm
FROM cnts
GROUP BY doc_id
ORDER BY doc_id
"""


# --- session / wall-clock-window load overlap -------------------------------
# The load-profile rollup: total in-session seconds per 6-hour wall-clock
# window, from 30-minute-gap sessions over the events table.  A session
# spanning several windows contributes its clamped overlap to EACH — the
# interval-intersection aggregation (utilization, SLA attribution, cost
# allocation all share this shape).  Scale: sessionization is the standard
# one-shuffle user window; each session then explodes over ONLY the
# windows it spans (sequence of window indices — bounded by session
# duration, typically 1-2), and the rollup is one combinable agg on the
# window index.  No join, no cartesian; second-level integer micros
# throughout.
WIN_US = 6 * 3600 * 1_000_000


def session_window_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # `us` is monotone in ts, so ordering by (us, event_id) is the same
    # session order as (ts, event_id) with the raw timestamp pruned away.
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = ev.select("user_id", "event_id", us.alias("us")).withColumn(
        "starts_new",
        F.coalesce(
            (F.col("us") - F.lag("us", 1).over(w) > F.lit(gap_us)).cast("int"),
            F.lit(1),
        ),
    )
    sess = (
        flagged.withColumn(
            "session_id",
            F.sum("starts_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("us").alias("s_us"), F.max("us").alias("e_us"))
        # zero-length sessions (single event) still occupy their window:
        # count them as 1 microsecond so the overlap rollup sees them.
        .withColumn("e_us", F.greatest(F.col("e_us"), F.col("s_us") + 1))
    )
    spans = sess.select(
        "user_id",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                (F.col("s_us") / WIN_US).cast("long"),
                ((F.col("e_us") - 1) / WIN_US).cast("long"),
            )
        ).alias("win_idx"),
    )
    ov = spans.select(
        "win_idx",
        (
            F.least(F.col("e_us"), (F.col("win_idx") + 1) * WIN_US)
            - F.greatest(F.col("s_us"), F.col("win_idx") * WIN_US)
        ).alias("ov_us"),
        "user_id",
    )
    return (
        ov.groupBy("win_idx")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("ov_us").alias("busy_us"),
        )
        .selectExpr(
            "CAST(win_idx AS BIGINT) AS win_idx",
            "CAST(n_sessions AS BIGINT) AS n_sessions",
            "CAST(busy_us DIV 1000000 AS BIGINT) AS busy_seconds",
        )
        .orderBy("win_idx")
    )


SESSION_WINDOW_OVERLAP_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              THEN 1
              WHEN lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS starts_new
  FROM events
), sess_rows AS (
  SELECT user_id, us,
         sum(starts_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS session_id
  FROM flagged
), sess AS (
  SELECT user_id, session_id, min(us) AS s_us,
         greatest(max(us), min(us) + 1) AS e_us
  FROM sess_rows GROUP BY user_id, session_id
), spans AS (
  SELECT s_us, e_us,
         unnest(range(s_us // {WIN_US}, (e_us - 1) // {WIN_US} + 1))
           AS win_idx
  FROM sess
)
SELECT CAST(win_idx AS BIGINT) AS win_idx,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(least(e_us, (win_idx + 1) * {WIN_US})
                - greatest(s_us, win_idx * {WIN_US})) // 1000000 AS BIGINT)
         AS busy_seconds
FROM spans
GROUP BY win_idx
ORDER BY win_idx
"""


# --- corpus mixture sampling plan -------------------------------------------
# Given target language shares for a training mixture (a literal policy
# table), compute each language's sampling rate against the corpus's actual
# token mass: rate_ppm = min(1e6, target_tokens * 1e6 / actual_tokens),
# with target_tokens = share_ppm * total / 1e6 — the static mixture plan a
# data pipeline materializes before sampling (languages over their target
# are downsampled; under it are capped at 1.0, i.e. fully taken).  Scale
# shape: ONE aggregation over documents (token counts are a combinable
# sum), a 5-row literal policy table broadcast in, and pure integer
# arithmetic after — the 100 TB cost is exactly one scan + one tiny join.
MIXTURE_SHARES_PPM: tuple[tuple[str, int], ...] = (
    ("en", 400_000),
    ("zh", 200_000),
    ("de", 150_000),
    ("fr", 150_000),
    ("es", 100_000),
)


def mixture_plan_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).cast(
            "long"
        ).alias("n_tok"),
    )
    actual = docs.groupBy("lang").agg(F.sum("n_tok").alias("actual_tokens"))
    policy = spark.createDataFrame(
        list(MIXTURE_SHARES_PPM), ["lang", "share_ppm"]
    )
    tot = actual.select(F.sum("actual_tokens").alias("total_tokens"))
    return (
        actual.join(F.broadcast(policy), "lang")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "lang",
            "CAST(actual_tokens AS BIGINT) AS actual_tokens",
            "CAST(share_ppm AS BIGINT) AS share_ppm",
            "CAST((share_ppm * total_tokens) DIV 1000000 AS BIGINT)"
            " AS target_tokens",
            "CAST(least(1000000,"
            " (((share_ppm * total_tokens) DIV 1000000) * 1000000)"
            " DIV actual_tokens) AS BIGINT) AS sample_rate_ppm",
        )
        .orderBy("lang")
    )


_MIX_POLICY_ROWS = ", ".join(
    f"('{lang}', {ppm})" for lang, ppm in MIXTURE_SHARES_PPM
)

MIXTURE_PLAN_TOKENS_SQL = f"""
WITH actual AS (
  SELECT lang,
         sum(len(regexp_extract_all(text, '[a-z]+'))) AS actual_tokens
  FROM documents GROUP BY lang
), policy(lang, share_ppm) AS (VALUES {_MIX_POLICY_ROWS}),
tot AS (SELECT sum(actual_tokens) AS total_tokens FROM actual)
SELECT a.lang,
       CAST(a.actual_tokens AS BIGINT) AS actual_tokens,
       CAST(p.share_ppm AS BIGINT) AS share_ppm,
       CAST((p.share_ppm * t.total_tokens) // 1000000 AS BIGINT)
         AS target_tokens,
       CAST(least(1000000,
            (((p.share_ppm * t.total_tokens) // 1000000) * 1000000)
            // a.actual_tokens) AS BIGINT) AS sample_rate_ppm
FROM actual a JOIN policy p USING (lang) CROSS JOIN tot t
ORDER BY a.lang
"""


# --- anti-entropy bucket fingerprints ---------------------------------------
# Verify a 100 TB replica WITHOUT a full diff: both table versions reduce
# to 64 constant-size bucket fingerprints (row-hash XOR + count per
# md5-bucket of the key), and only differing buckets are reported — the
# Merkle/anti-entropy pattern (Dynamo, Cassandra repair).  XOR is the
# point: order-free, overflow-free, and any single-row change flips the
# bucket fingerprint.  The mutated snapshot reuses the deterministic CDC
# recipe (update 1 cent where md5-pct < UPD, drop where pct >= DEL).
# Scale shape: two scans, each collapsing straight to 64 rows via a
# combinable (xor, count) agg; the compare is a 64x64 join of constants.
# Mutation density is deliberately SPARSE (basis points, not percent) so
# the differing-bucket set is a strict subset of the 64 — the check is
# only meaningful if clean buckets actually fingerprint-match.
FP_BUCKETS = 64
FP_UPD_BP = 30  # update where md5-bp < 30 (0.30% of rows)
FP_DEL_BP = 9985  # drop where md5-bp >= 9985 (0.15% of rows)


def _fp_hash(engine: str) -> str:
    canon = (
        "concat(CAST(o_orderkey AS STRING), '|', o_orderstatus, '|', "
        "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS STRING))"
        if engine == "spark"
        else "concat(CAST(o_orderkey AS VARCHAR), '|', o_orderstatus, '|', "
        "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS VARCHAR))"
    )
    return _md5pl(canon, 15, engine)


def table_fingerprint_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    bp = _md5pl("CAST(o_orderkey AS STRING)", 4, "spark") + " % 10000"
    base = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_orderstatus", "o_totalprice", f"({bp}) AS bp"
    )
    replica = base.filter(F.col("bp") < FP_DEL_BP).selectExpr(
        "o_orderkey",
        "o_orderstatus",
        f"CASE WHEN bp < {FP_UPD_BP} THEN o_totalprice + 0.01"
        " ELSE o_totalprice END AS o_totalprice",
    )

    def fingerprints(df: DataFrame, side: str) -> DataFrame:
        bucket = _md5pl("CAST(o_orderkey AS STRING)", 4, "spark") + (
            f" % {FP_BUCKETS}"
        )
        return (
            df.selectExpr(
                f"({bucket}) AS bucket", f"({_fp_hash('spark')}) AS h"
            )
            .groupBy("bucket")
            .agg(
                F.expr("bit_xor(h)").alias(f"{side}_fp"),
                F.count(F.lit(1)).alias(f"{side}_rows"),
            )
        )
    src = fingerprints(base.drop("bp"), "src")
    dst = fingerprints(replica, "dst")
    return (
        src.join(dst, "bucket", "full_outer")
        .filter(
            (F.col("src_fp").eqNullSafe(F.col("dst_fp")) == F.lit(False))
            | (F.col("src_rows").eqNullSafe(F.col("dst_rows")) == F.lit(False))
        )
        .selectExpr(
            "CAST(bucket AS BIGINT) AS bucket",
            "CAST(src_rows AS BIGINT) AS src_rows",
            "CAST(dst_rows AS BIGINT) AS dst_rows",
            "CAST(src_fp AS BIGINT) AS src_fp",
            "CAST(dst_fp AS BIGINT) AS dst_fp",
        )
        .orderBy("bucket")
    )


_FP_BP_DUCK = _md5pl("CAST(o_orderkey AS VARCHAR)", 4, "duck") + " % 10000"
_FP_BUCKET_DUCK = (
    _md5pl("CAST(o_orderkey AS VARCHAR)", 4, "duck") + f" % {FP_BUCKETS}"
)

TABLE_FINGERPRINT_BUCKETS_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         ({_FP_BP_DUCK}) AS bp
  FROM orders
), replica AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN bp < {FP_UPD_BP} THEN o_totalprice + 0.01
              ELSE o_totalprice END AS o_totalprice
  FROM base WHERE bp < {FP_DEL_BP}
), src AS (
  SELECT ({_FP_BUCKET_DUCK}) AS bucket,
         bit_xor({_fp_hash('duck')}) AS src_fp,
         count(*) AS src_rows
  FROM base GROUP BY 1
), dst AS (
  SELECT ({_FP_BUCKET_DUCK}) AS bucket,
         bit_xor({_fp_hash('duck')}) AS dst_fp,
         count(*) AS dst_rows
  FROM replica GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(src_rows AS BIGINT) AS src_rows,
       CAST(dst_rows AS BIGINT) AS dst_rows,
       CAST(src_fp AS BIGINT) AS src_fp,
       CAST(dst_fp AS BIGINT) AS dst_fp
FROM src FULL OUTER JOIN dst USING (bucket)
WHERE src_fp IS DISTINCT FROM dst_fp
   OR src_rows IS DISTINCT FROM dst_rows
ORDER BY bucket
"""


QUERIES = {
    "mode_exact_per_group": mode_exact_per_group,
    "topp_revenue_suppliers": topp_revenue_suppliers,
    "vocab_oov_rate": vocab_oov_rate,
    "text_simpson_diversity": text_simpson_diversity,
    "session_window_overlap": session_window_overlap,
    "mixture_plan_tokens": mixture_plan_tokens,
    "table_fingerprint_buckets": table_fingerprint_buckets,
}

ORACLES = {
    "mode_exact_per_group": MODE_EXACT_PER_GROUP_SQL,
    "topp_revenue_suppliers": TOPP_REVENUE_SUPPLIERS_SQL,
    "vocab_oov_rate": VOCAB_OOV_RATE_SQL,
    "text_simpson_diversity": TEXT_SIMPSON_DIVERSITY_SQL,
    "session_window_overlap": SESSION_WINDOW_OVERLAP_SQL,
    "mixture_plan_tokens": MIXTURE_PLAN_TOKENS_SQL,
    "table_fingerprint_buckets": TABLE_FINGERPRINT_BUCKETS_SQL,
}
