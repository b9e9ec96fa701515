"""Property tests for acf_daily_revenue, seasonal_decompose_ma7, and
collocation_lift_bigrams: each statistic recomputed independently in plain
Python (exact ints / Counter), checked against the distributed plan."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def test_acf_matches_bruteforce(spark):
    from pdf_craft_spark.queries.timeseries import acf_daily_revenue

    rows = {r["lag"]: r for r in acf_daily_revenue(spark, SF).collect()}
    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    xs = [c // 100 for _, c in daily]  # dollars, trunc (all positive)
    n = len(xs)
    m = sum(xs) // n
    ys = [x - m for x in xs]
    den = sum(y * y for y in ys)
    for k in range(1, 8):
        num = sum(ys[i] * ys[i + k] for i in range(n - k))
        r = rows[k]
        assert r["n_pairs"] == n - k
        assert r["num"] == num
        assert r["den"] == den
        assert abs(r["acf_micro"] / 1e6 - num / den) < 2e-6


def test_seasonal_decompose_matches_bruteforce(spark):
    from pdf_craft_spark.queries.timeseries import seasonal_decompose_ma7

    rows = {r["slot"]: r for r in seasonal_decompose_ma7(spark, SF).collect()}
    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    eds = [e for e, _ in daily]
    xs = [x for _, x in daily]
    slots: dict[int, list[int]] = defaultdict(list)
    for i in range(3, len(xs) - 3):
        sum7 = sum(xs[i - 3 : i + 4])
        d_milli = xs[i] * 1000 - (sum7 * 1000) // 7
        slots[eds[i] % 7].append(d_milli)
    assert set(slots) == set(rows)
    for slot, ds in slots.items():
        r = rows[slot]
        assert r["n_days"] == len(ds)
        s = sum(ds)
        trunc = abs(s) // len(ds) * (1 if s >= 0 else -1)
        assert r["seasonal_milli"] == trunc


def test_collocation_lift_matches_counter(spark):
    from pdf_craft_spark.queries.textops import (
        COLLOC_TOPK,
        collocation_lift_bigrams,
    )

    out = collocation_lift_bigrams(spark, SF).collect()
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall()
    joint: Counter = Counter()
    first: Counter = Counter()
    second: Counter = Counter()
    for (t,) in texts:
        toks = [w.lower() for w in re.findall(r"[A-Za-z]{2,}", t)]
        for a, b in zip(toks, toks[1:]):
            joint[(a, b)] += 1
            first[a] += 1
            second[b] += 1
    n = sum(joint.values())
    ranked = sorted(joint.items(), key=lambda kv: (-kv[1], kv[0]))[:COLLOC_TOPK]
    assert len(out) == min(COLLOC_TOPK, len(ranked))
    for row, ((a, b), c_ab) in zip(out, ranked):
        assert (row["a"], row["b"], row["c_ab"]) == (a, b, c_ab)
        assert row["c_a"] == first[a] and row["c_b"] == second[b] and row["n"] == n
        lift = c_ab * n / (first[a] * second[b])
        assert abs(row["lift_micro"] / 1e6 - lift) < 2e-6
