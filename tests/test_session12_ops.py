"""Property tests for the session-12 ops (ALS half-step, stump boosting,
calibration bins, EWMA recurrence).  Oracle parity is covered by
test_oracle_parity; these pin the mathematical claims the parity hash
can't see: the ALS solve satisfies its normal equations exactly, the
boosting round genuinely reduces training SSE, ECE is the weighted mean
of the bin gaps, and the EWMA kernel implements the recurrence."""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# --- als_factor_step ---------------------------------------------------------


def _als_rows(spark, sf_dir):
    from pdf_craft_spark.queries.mlq import als_factor_step

    return {r["o_custkey"]: r for r in als_factor_step(spark, sf_dir).collect()}


def test_als_solution_satisfies_normal_equations(spark):
    """Recompute each user's (A, b) independently in exact rational
    arithmetic and check x_micro == trunc(1e6 * A^-1 b) — the emitted
    factors ARE the exact Cramer solve, not an approximation."""
    from pdf_craft_spark.queries.mlq import _ALS_LAMBDA, _ALS_Q_MOD

    rows = _als_rows(spark, SF)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    rat = con.execute(
        f"""
        SELECT o_custkey,
               CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_custkey, l_partkey
        """
    ).fetchall()
    eqs: dict[int, list] = {}
    for cust, h, r in rat:
        q1 = 1 + h % _ALS_Q_MOD
        q2 = 1 + (h // _ALS_Q_MOD) % _ALS_Q_MOD
        a = eqs.setdefault(cust, [0, 0, 0, 0, 0, 0])
        a[0] += q1 * q1
        a[1] += q1 * q2
        a[2] += q2 * q2
        a[3] += q1 * r
        a[4] += q2 * r
        a[5] += 1
    assert set(eqs) == set(rows)
    for cust, (s11, s12, s22, b1, b2, n) in eqs.items():
        a11, a12, a22 = _ALS_LAMBDA + s11, s12, _ALS_LAMBDA + s22
        det = a11 * a22 - a12 * a12
        assert det > 0  # ridge makes A positive definite
        x1 = Fraction((a22 * b1 - a12 * b2) * 1_000_000, det)
        x2 = Fraction((a11 * b2 - a12 * b1) * 1_000_000, det)
        row = rows[cust]
        assert row["n_items"] == n
        assert row["det"] == det
        # Spark DIV truncates toward zero
        assert row["x1_micro"] == int(x1)
        assert row["x2_micro"] == int(x2)


def test_als_factors_beat_zero_model(spark):
    """The solved factors must reduce ridge-regularized squared error vs
    the zero-factor baseline for every user (guaranteed by optimality;
    failing means the solve is wrong even if internally consistent)."""
    from pdf_craft_spark.queries.mlq import _ALS_LAMBDA, _ALS_Q_MOD

    rows = _als_rows(spark, SF)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    rat = con.execute(
        """
        SELECT o_custkey,
               CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_custkey, l_partkey
        """
    ).fetchall()
    per_user: dict[int, list] = {}
    for cust, h, r in rat:
        q1 = 1 + h % _ALS_Q_MOD
        q2 = 1 + (h // _ALS_Q_MOD) % _ALS_Q_MOD
        per_user.setdefault(cust, []).append((q1, q2, r))
    for cust, items in per_user.items():
        x1 = Fraction(rows[cust]["x1_micro"], 1_000_000)
        x2 = Fraction(rows[cust]["x2_micro"], 1_000_000)
        obj = sum((r - q1 * x1 - q2 * x2) ** 2 for q1, q2, r in items)
        obj += _ALS_LAMBDA * (x1 * x1 + x2 * x2)
        base = sum(r * r for _, _, r in items)
        assert obj < base, cust


# --- gbt_residual_boost ------------------------------------------------------


def test_gbt_rounds_and_gain_shape(spark):
    from pdf_craft_spark.queries.mlq import gbt_residual_boost

    rows = {r["round"]: r for r in gbt_residual_boost(spark, SF).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["feature"] in ("qty", "price_kilo")
        # SSE-reduction of the argmax split is nonnegative by construction
        assert r["gain"] >= 0
    # round-1 leaves are milli-means of a {0,1000} label
    assert 0 <= rows[1]["leaf_left_milli"] <= 1000
    assert 0 <= rows[1]["leaf_right_milli"] <= 1000


def test_gbt_second_round_reduces_training_sse(spark):
    """Applying stump 2 on top of stump 1 must lower the exact integer
    training SSE — the boosting step is live, not a no-op."""
    from pdf_craft_spark.queries.mlq import gbt_residual_boost

    b1, b2 = sorted(
        gbt_residual_boost(spark, SF01).collect(), key=lambda r: r["round"]
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF01}/lineitem.parquet'")

    def pred_case(b):
        return (
            f"CASE WHEN ({'qty' if b['feature'] == 'qty' else 'price_kilo'}"
            f" <= {b['threshold']}) THEN {b['leaf_left_milli']}"
            f" ELSE {b['leaf_right_milli']} END"
        )

    sse1, sse2 = con.execute(
        f"""
        WITH base AS (
          SELECT CAST(l_quantity AS BIGINT) AS qty,
                 CAST(l_extendedprice AS BIGINT) // 1000 AS price_kilo,
                 CASE WHEN l_returnflag = 'R' THEN 1000 ELSE 0 END AS t
          FROM lineitem
        )
        SELECT sum((t - ({pred_case(b1)})) ** 2),
               sum((t - ({pred_case(b1)}) - ({pred_case(b2)})) ** 2)
        FROM base
        """
    ).fetchone()
    assert sse2 < sse1, (sse1, sse2)


# --- calibration_bins_eval ---------------------------------------------------


def test_calibration_ece_is_weighted_gap_mean(spark):
    from pdf_craft_spark.queries.mlq import calibration_bins_eval

    rows = calibration_bins_eval(spark, SF01).collect()
    assert len(rows) >= 3  # the (lang, source) predictor populates bins
    n_tot = sum(r["n_test"] for r in rows)
    ece = sum(r["n_test"] * r["gap_ppm"] for r in rows) // n_tot
    for r in rows:
        assert 0 <= r["bin"] <= 10
        assert r["gap_ppm"] == abs(r["mean_pred_ppm"] - r["actual_ppm"])
        assert r["ece_ppm"] == ece  # the window sum IS the weighted mean
        assert 0 <= r["actual_ppm"] <= 1_000_000
        # bin membership: mean prediction lies in the bin's ppm range
        assert r["bin"] * 100_000 <= r["mean_pred_ppm"] < (r["bin"] + 1) * 100_000 or (
            r["bin"] == 10 and r["mean_pred_ppm"] == 1_000_000
        )


# --- ewma_order_smoothing ----------------------------------------------------


def test_ewma_kernel_matches_pure_python_walk(spark):
    from pdf_craft_spark.queries.timeseries import (
        _EWMA_DEN,
        _EWMA_NUM,
        ewma_order_smoothing,
    )

    got = {r["o_custkey"]: r for r in ewma_order_smoothing(spark, SF).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    series = con.execute(
        """
        SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT)
        FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey
        """
    ).fetchall()
    walks: dict[int, list] = {}
    for cust, cents in series:
        walks.setdefault(cust, []).append(cents)
    assert set(walks) == set(got)
    for cust, xs in walks.items():
        s = None
        peak = 0
        for x in xs:
            s = x if s is None else (x + _EWMA_NUM * s) // _EWMA_DEN
            peak = max(peak, s)
        r = got[cust]
        assert r["n_orders"] == len(xs)
        assert r["final_ewma_cents"] == s
        assert r["peak_ewma_cents"] == peak
        assert r["peak_ewma_cents"] >= r["final_ewma_cents"]


def test_ewma_smooths_toward_series_range(spark):
    """EWMA output stays within [min, max] of the prefix it smooths —
    the defining contraction property (exact under this integer scheme
    because (x + 3 s) // 4 lies between min(x, s) and max(x, s))."""
    from pdf_craft_spark.queries.timeseries import ewma_order_smoothing

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    lo, hi = con.execute(
        "SELECT min(CAST(round(o_totalprice * 100) AS BIGINT)),"
        " max(CAST(round(o_totalprice * 100) AS BIGINT)) FROM orders"
    ).fetchone()
    for r in ewma_order_smoothing(spark, SF).collect():
        assert lo - 3 <= r["final_ewma_cents"] <= hi
        assert lo - 3 <= r["peak_ewma_cents"] <= hi
