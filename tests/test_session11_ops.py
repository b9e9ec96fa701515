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


# --- html_main_content_extract: the density rule is live, not template-keyed


def _page(paras, ad_text="sponsored content click here"):
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (
        "<html><head><title>doc 1</title></head><body>"
        '<nav><a href="/">home</a> <a href="/a">archive</a></nav>'
        "<header><h1>document 1</h1></header>"
        f'<article>{body}<div class="ad"><a href="/s">{ad_text}</a></div>'
        "</article>"
        '<aside><ul><li><a href="/r">related one</a></li></ul></aside>'
        "<footer>copyright twenty twenty six corpus press all rights"
        " reserved</footer></body></html>"
    )


def _mains(html):
    from pdf_craft_spark.queries.htmlx import classify_main, extract_blocks

    return [
        t for t, nw, lc in extract_blocks(html) if classify_main(nw, lc, len(t))
    ]


def test_html_density_rule_recovers_exactly_the_article():
    para = " ".join(f"word{i}" for i in range(30))
    assert _mains(_page([para])) == [para]


def test_html_ad_padded_to_plain_prose_flips_to_main():
    """Pad the ad block's LINK to 20 words: link density stays 1.0 so it
    stays boiler; pad with text OUTSIDE the link and it flips to main —
    the classifier reads density, not the class=ad attribute."""
    para = " ".join(f"word{i}" for i in range(30))
    linked = " ".join(f"buy{i}" for i in range(20))
    assert _mains(_page([para], ad_text=linked)) == [para]
    pad = " ".join(f"plain{i}" for i in range(20))
    html = _page([para]).replace(
        "</a></div>", f"</a> {pad}</div>"
    )
    mains = _mains(html)
    assert len(mains) == 2 and mains[0] == para and "plain0" in mains[1]


def test_html_paragraph_moved_into_aside_stays_main():
    """Tag names never enter the classifier: a long link-free paragraph
    inside <aside> is still main content (Boilerpipe semantics)."""
    para = " ".join(f"word{i}" for i in range(30))
    moved = " ".join(f"aside{i}" for i in range(25))
    html = _page([para]).replace(
        "<aside><ul>", f"<aside><p>{moved}</p><ul>"
    )
    mains = _mains(html)
    assert mains == [para, moved]


def test_html_malformed_markup_still_parses():
    """Unclosed tags (tag-soup web reality): html.parser recovers and the
    article text still comes back whole."""
    para = " ".join(f"word{i}" for i in range(30))
    html = _page([para]).replace("</p>", "").replace("</nav>", "")
    assert _mains(html) == [para]
