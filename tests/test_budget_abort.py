"""A8 budget-abort boundary semantics, pinned at the oracle level.

The reference raises TokenLimitError BEFORE the page that would start
with the budget already spent (pdf/ocr.py:140-143) — so a document whose
budget is exhausted only AFTER its final page finishes cleanly.  These
invariants tie the two A8 oracles together without a Spark session, so
they run in milliseconds and catch any drift between the metering and
abort formulations.
"""

from __future__ import annotations

import re

import duckdb

from pdf_craft_spark.queries.pipelineq import (
    A8_BUDGET_ABORT_SQL,
    A8_MAX_TOKENS,
    A8_TOKEN_METERING_SQL,
)


def _run(sql: str):
    return duckdb.connect().execute(sql).df()


def test_abort_set_matches_metering_cut():
    meter = _run(A8_TOKEN_METERING_SQL)
    abort = _run(A8_BUDGET_ABORT_SQL)
    cut_docs = set(meter[meter["cut_page_index"].notna()]["doc_id"])
    err_rows = abort[abort["kind"] == "doc_error"]
    assert set(err_rows["doc_id"]) == cut_docs
    # both abort branches must be exercised by the golden corpus
    assert 0 < len(cut_docs) < len(meter)


def test_error_rows_carry_pre_abort_metering():
    meter = _run(A8_TOKEN_METERING_SQL).set_index("doc_id")
    abort = _run(A8_BUDGET_ABORT_SQL)
    pat = re.compile(
        r"\[\[aborted: TOKEN_LIMIT_EXCEEDED after (\d+) pages, in=(\d+), out=(\d+)\]\]"
    )
    err_rows = abort[abort["kind"] == "doc_error"]
    assert len(err_rows) > 0
    for row in err_rows.itertuples(index=False):
        m = pat.fullmatch(row.text)
        assert m, row.text
        pages_done, in_tok, out_tok = (int(g) for g in m.groups())
        doc = meter.loc[row.doc_id]
        # pages processed before the abort == pages within budget
        assert pages_done == doc["pages_within_budget"]
        # the abort happens BEFORE a page: tokens metered so far must be
        # the sum over completed pages only, and must already be >= budget
        # at the abort point by construction of the pre-page check
        assert in_tok + out_tok >= A8_MAX_TOKENS
        assert in_tok <= doc["input_tokens"]
        assert out_tok <= doc["output_tokens"]


def test_surviving_docs_keep_full_extraction():
    meter = _run(A8_TOKEN_METERING_SQL)
    abort = _run(A8_BUDGET_ABORT_SQL)
    ok_docs = set(meter[meter["cut_page_index"].isna()]["doc_id"])
    spans = abort[abort["kind"] != "doc_error"]
    assert set(spans["doc_id"]) == ok_docs
    # a surviving doc that spent its whole budget on its final page is the
    # boundary case: it must NOT be aborted (the reference checks before a
    # page, never after the last one)
    totals = meter.set_index("doc_id")
    over_after_finish = [
        d
        for d in ok_docs
        if totals.loc[d, "input_tokens"] + totals.loc[d, "output_tokens"]
        >= A8_MAX_TOKENS
    ]
    assert over_after_finish, (
        "golden corpus lost its budget-boundary doc (finishes with total "
        "spend >= budget but never starts a page over budget) — retune "
        "A8_MAX_TOKENS or the corpus"
    )
