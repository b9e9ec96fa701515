"""As-of join boundary semantics on a hand-built event stream.

The sf-dir parity suite checks the shipped corpus; these rows sit exactly
ON the as-of boundaries the window formulation must get right:
an equal-timestamp click (strictly-before ⇒ excluded), two clicks at the
identical timestamp (tie resolves to the max event_id), a purchase with
no preceding click (-1 sentinels), and a click strictly after the
purchase (never visible).  Each case is asserted by value AND the whole
frame is compared against the DuckDB ASOF-LEFT-JOIN oracle.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_craft_spark.queries.timeseries import (
    ASOF_JOIN_LAST_CLICK_SQL,
    asof_join_last_click,
)


def _ts(h: int, m: int) -> datetime:
    return datetime(2024, 1, 1, h, m, 0)


_ROWS = [
    # (event_id, ts, user_id, event_type)
    (1, _ts(9, 0), 1, "click"),
    (2, _ts(9, 30), 1, "click"),
    (3, _ts(10, 0), 1, "purchase"),   # → click 2, gap 30min
    (4, _ts(9, 30), 1, "purchase"),   # equal-ts click 2 excluded → click 1
    (5, _ts(9, 0), 2, "click"),
    (6, _ts(9, 0), 2, "click"),       # same ts as 5
    (7, _ts(9, 30), 2, "purchase"),   # tie → max event_id = 6
    (8, _ts(9, 0), 3, "purchase"),    # no preceding click → -1/-1
    (9, _ts(10, 0), 3, "click"),      # strictly after — never visible
    (10, _ts(8, 0), 1, "view"),       # other kinds ignored
]


def _write_events(tmp_path) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in _ROWS], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([1.0] * len(_ROWS), pa.float64()),
            "props": pa.array(["{}"] * len(_ROWS), pa.string()),
        }
    )
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_asof_boundary_semantics_and_oracle_parity(spark, tmp_path):
    from tests.oracle_harness import compare

    sf_dir = _write_events(tmp_path)
    spark_df = asof_join_last_click(spark, sf_dir).toPandas()
    by_purchase = {int(r.purchase_id): r for r in spark_df.itertuples(index=False)}

    assert set(by_purchase) == {3, 4, 7, 8}
    assert by_purchase[3].click_id == 2
    assert by_purchase[3].gap_us == 30 * 60 * 1_000_000
    # strictly-before: the click AT the purchase timestamp is invisible
    assert by_purchase[4].click_id == 1
    assert by_purchase[4].gap_us == 30 * 60 * 1_000_000
    # equal-ts clicks tie-break to the max event_id
    assert by_purchase[7].click_id == 6
    # no preceding click → sentinels
    assert by_purchase[8].click_id == -1 and by_purchase[8].gap_us == -1

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    duck_df = con.sql(ASOF_JOIN_LAST_CLICK_SQL).df()
    problems = compare(spark_df, duck_df)
    assert not problems, problems
