"""Property tests for the session-13 ops (Durbin-Watson, SMAPE backtest,
LOO target encoding, k-fold CV, AMS F2 sketch, t-closeness audit).
Oracle parity is covered by test_oracle_parity; these pin the claims the
parity hash can't see: DW detects planted autocorrelation regimes, the
backtest prefers the seasonal forecaster on seasonal data, LOO excludes
the own row, CV predictions never see their own fold, the AMS estimate
lands within the sketch's variance bound around the exact F2, and the
EMD is zero for a perfectly representative class and maximal for a fully
skewed one."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _duck(sf_dir: str, tables=("orders", "customer", "events")):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# --- durbin_watson_trend -----------------------------------------------------


def _dw_of_series(ys):
    """Run the oracle's exact pipeline on a synthetic daily series."""
    from pdf_craft_spark.queries.timeseries import DURBIN_WATSON_TREND_SQL

    con = duckdb.connect()
    rows = ", ".join(
        f"(TIMESTAMP '2001-01-01' + INTERVAL ({i}) DAY, {y / 100.0})"
        for i, y in enumerate(ys)
    )
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM (VALUES "
        + rows
        + ") AS t(o_orderdate, o_totalprice)"
    )
    return con.execute(DURBIN_WATSON_TREND_SQL).fetchone()


def test_dw_detects_planted_regimes():
    """Alternating residuals push DW toward 4; a random-walk style
    positively-correlated series pushes it toward 0; both around a trend."""
    n = 200
    alt = [100_000 + 500 * t + (20_000 if t % 2 == 0 else -20_000) for t in range(n)]
    _, _, _, dw_alt = _dw_of_series(alt)
    # slow sign-runs: +e for 20 days, -e for 20 days, ...
    runs = [100_000 + 500 * t + (20_000 if (t // 20) % 2 == 0 else -20_000) for t in range(n)]
    _, _, _, dw_runs = _dw_of_series(runs)
    assert dw_alt > 3_000_000, dw_alt  # ~4 in micro
    assert dw_runs < 1_000_000, dw_runs  # strong positive autocorrelation


def test_dw_white_noise_near_two(spark):
    """On the real corpus the daily-revenue residuals are near-independent:
    DW should land in the classic no-autocorrelation band around 2."""
    from pdf_craft_spark.queries.timeseries import durbin_watson_trend

    row = durbin_watson_trend(spark, SF01).collect()[0]
    assert 1_500_000 < row["dw_micro"] < 2_500_000, row


# --- forecast_backtest_smape --------------------------------------------------


def test_backtest_prefers_seasonal_on_seasonal_series():
    """Plant a strong period-7 series: the seasonal-naive SMAPE must beat
    the naive SMAPE (exercised through the oracle SQL on synthetic events)."""
    from pdf_craft_spark.queries.timeseries import FORECAST_BACKTEST_SMAPE_SQL

    con = duckdb.connect()
    vals = []
    for d in range(120):
        n_ev = 5 + (50 if d % 7 == 0 else 0)  # weekly spike
        for k in range(n_ev):
            vals.append(f"(TIMESTAMP '2001-01-01' + INTERVAL ({d}) DAY, 'buy')")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        + ", ".join(vals)
        + ") AS t(ts, event_type)"
    )
    et, n, s_naive, s_snaive, winner = con.execute(
        FORECAST_BACKTEST_SMAPE_SQL
    ).fetchone()
    assert winner == "seasonal" and s_snaive == 0 and s_naive > 200_000


# --- loo_target_encoding -----------------------------------------------------


def test_loo_excludes_own_row(spark):
    """Recompute the per-segment LOO sum independently: for each row,
    (s - x) // (n - 1); the op's audit sums must match exactly."""
    from pdf_craft_spark.queries.mlq import loo_target_encoding

    got = {r["c_mktsegment"]: r for r in loo_target_encoding(spark, SF).collect()}
    con = _duck(SF, ("orders", "customer"))
    rows = con.execute(
        """
        SELECT c_mktsegment,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        """
    ).fetchall()
    by_seg: dict[str, list[int]] = {}
    for seg, x in rows:
        by_seg.setdefault(seg, []).append(x)
    for seg, xs in by_seg.items():
        s, n = sum(xs), len(xs)
        # python // floors; the engines truncate toward zero — all values
        # here are positive so the two agree
        loos = [(s - x) // (n - 1) for x in xs]
        assert got[seg]["n_rows"] == n
        assert got[seg]["sum_loo_cents"] == sum(loos), seg
        assert got[seg]["min_loo_cents"] == min(loos)
        assert got[seg]["max_loo_cents"] == max(loos)


# --- cv_kfold_mse ------------------------------------------------------------


def test_cv_train_excludes_test_fold(spark):
    """Recompute fold 0's prediction from ONLY folds 1-4 and check the
    op's rmse for fold 0 against an independent python recompute."""
    import math

    from pdf_craft_spark.queries.mlq import CV_FOLDS, cv_kfold_mse

    got = {r["fold"]: r for r in cv_kfold_mse(spark, SF).collect()}
    assert set(got) == set(range(CV_FOLDS))
    con = _duck(SF, ("orders",))
    rows = con.execute(
        f"""
        SELECT o_orderpriority,
               CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
                    AS BIGINT) % {CV_FOLDS} AS fold,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        FROM orders
        """
    ).fetchall()
    for k in range(CV_FOLDS):
        sse = n_test = 0
        for pri in {r[0] for r in rows}:
            train = [x for p, f, x in rows if p == pri and f != k]
            test = [x for p, f, x in rows if p == pri and f == k]
            if not test:
                continue
            pred = sum(train) // len(train)
            sse += sum((x - pred) ** 2 for x in test)
            n_test += len(test)
        assert got[k]["n_test"] == n_test
        assert got[k]["rmse_cents"] == round(math.sqrt(sse / n_test)), k


# --- ams_f2_sketch -----------------------------------------------------------


def test_ams_estimate_within_variance_bound(spark):
    """The mean-of-K AMS estimator has Var <= 2*F2^2/K; check the estimate
    sits within 4 standard deviations of the exact F2 (a deterministic
    check — the hash is fixed — but one that would fail if the signs were
    biased or the estimator wrong)."""
    from pdf_craft_spark.queries.sketches import AMS_K, ams_f2_sketch

    row = ams_f2_sketch(spark, SF01).collect()[0]
    f2, est = row["exact_f2"], row["est_mean"]
    sd = (2.0 * f2 * f2 / AMS_K) ** 0.5
    assert abs(est - f2) < 4 * sd, row
    assert abs(row["est_mom"] - f2) < 5 * sd, row


def test_ams_exact_f2_is_self_join_size():
    """F2 on the key-count table == COUNT(*) of the actual self-join."""
    con = _duck(SF, ("orders",))
    f2 = con.execute(
        "SELECT sum(cnt * cnt) FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey)"
    ).fetchone()[0]
    sj = con.execute(
        "SELECT count(*) FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey"
    ).fetchone()[0]
    assert f2 == sj


# --- t_closeness_audit -------------------------------------------------------


def test_tcloseness_planted_extremes():
    """A class distributed exactly like the table has EMD 0; a class
    concentrated on the extreme band has the maximal EMD among classes."""
    from pdf_craft_spark.queries.analyticsq import T_CLOSENESS_AUDIT_SQL

    con = duckdb.connect()
    # three bands 0/1/2 (prices ~25k/75k/125k); global mix uniform-ish.
    orders, custs = [], []
    ck = 0
    # class A mirrors the global distribution exactly: one order per band
    for nat in range(3):
        for band in range(3):
            ck += 1
            custs.append(f"({ck}, 'MIRROR', {nat})")
            orders.append(f"({ck}, {25000 + band * 50000}.0)")
    # class B: all mass on band 2
    for i in range(3):
        ck += 1
        custs.append(f"({ck}, 'SKEWED', 0)")
        orders.append(f"({ck}, 125000.0)")
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM (VALUES "
        + ", ".join(custs)
        + ") AS t(c_custkey, c_mktsegment, c_nationkey)"
    )
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM (VALUES "
        + ", ".join(orders)
        + ") AS t(o_custkey, o_totalprice)"
    )
    rows = con.execute(T_CLOSENESS_AUDIT_SQL).fetchall()
    by = {(r[0], r[1]): r for r in rows}
    # MIRROR classes per-nation each hold one order per band = the global
    # shape only if the global is uniform; with SKEWED adding band-2 mass
    # the global tilts, so MIRROR EMD is small but nonzero; SKEWED is max.
    skew = by[("SKEWED", 0)]
    assert skew[3] == max(r[3] for r in rows), rows
    assert skew[4] is True or skew[3] > 150_000
    for nat in range(3):
        assert by[("MIRROR", nat)][3] < skew[3]


def test_tcloseness_real_corpus_shape(spark):
    """On the real corpus: every class reports, EMD in [0, 1e6], and the
    breach flag equals the threshold predicate."""
    from pdf_craft_spark.queries.analyticsq import (
        T_CLOSENESS_PPM,
        t_closeness_audit,
    )

    rows = t_closeness_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["emd_ppm"] <= 1_000_000
        assert r["breach"] == (r["emd_ppm"] > T_CLOSENESS_PPM)
