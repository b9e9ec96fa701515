"""Invariant tests for theta_sketch_intersection (session-11): the KMV
set-algebra op that fixes the HLL intersection-error caveat.  The oracle
hash proves cross-engine equality; these assert the claims the op exists
to make — exact-mode degradation below k, bounded intersection error in
estimate mode, and the superiority over the HLL inclusion-exclusion path
on the same sets."""

from __future__ import annotations

SF_SMALL = "/root/testdata/sf0.001"  # both sets < k=256 -> exact branch
SF_EST = "/root/testdata/sf0.01"  # sets ~1600 -> estimate branch


def _row(spark, sf_dir):
    from pdf_craft_spark.queries.sketches import theta_sketch_intersection

    rows = theta_sketch_intersection(spark, sf_dir).collect()
    assert len(rows) == 1
    return rows[0]


def test_theta_exact_mode_below_k(spark):
    """With both sets smaller than k the sketch holds every hash: theta is
    the full range (frac 1.0) and every estimate IS the exact count."""
    r = _row(spark, SF_SMALL)
    assert r["theta_frac"] == 1.0
    for part in ("purchase", "click", "intersection", "union"):
        assert r[f"est_{part}"] == float(r[f"exact_{part}"]), part
    assert r["err_pct_intersection"] == 0.0
    assert r["err_pct_union"] == 0.0


def test_theta_estimate_mode_error_bounded(spark):
    """Estimate mode at sf0.01: theta strictly below 1, every estimate
    within 10% of exact, and the intersection error far inside the HLL
    algebra op's measured 22.5% at the same overlap (house bound: 15%)."""
    r = _row(spark, SF_EST)
    assert 0.0 < r["theta_frac"] < 1.0
    for part in ("purchase", "click", "union"):
        rel = abs(r[f"est_{part}"] - r[f"exact_{part}"]) / r[f"exact_{part}"]
        assert rel < 0.10, (part, rel)
    assert abs(r["err_pct_intersection"]) < 15.0
    assert abs(r["err_pct_union"]) < 10.0


def test_theta_beats_hll_intersection_on_same_sets(spark):
    """The head-to-head the docstring claims: KMV intersection error is
    strictly smaller than the HLL inclusion-exclusion intersection error
    on the identical purchase/click user-day sets."""
    from pdf_craft_spark.queries.sketches import hll_set_algebra_user_days

    kmv = _row(spark, SF_EST)
    hll = hll_set_algebra_user_days(spark, SF_EST).collect()[0]
    hll_err = abs(
        100.0
        * (hll["est_intersection"] - hll["exact_intersection"])
        / hll["exact_intersection"]
    )
    assert abs(kmv["err_pct_intersection"]) < hll_err, (
        kmv["err_pct_intersection"],
        hll_err,
    )


def test_theta_plan_has_no_cartesian_and_two_stage_topk(spark):
    """Plan shape: the only nested-loop is the broadcast 1-row theta/exact
    attach (BroadcastNestedLoopJoin), never a CartesianProduct; both
    row_number stages are present (sharded then global k-min)."""
    from pdf_craft_spark.queries.sketches import theta_sketch_intersection

    plan = (
        theta_sketch_intersection(spark, SF_EST)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("row_number") >= 2
