"""Dirty-payload edges for json_extract_props: non-integer numbers,
strings, malformed JSON, empty objects and NULL props must all become
NULL k in BOTH engines (the raw cast edges diverge: Spark ANSI throws on
'6.5', DuckDB rounds it — the regex validation is what keeps parity)."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from tests.oracle_harness import compare


def test_dirty_props_parity(spark, tmp_path):
    from pdf_craft_spark.queries.sourcesq import (
        JSON_EXTRACT_PROPS_SQL,
        json_extract_props,
    )

    types = ["click", "click", "click", "view", "view", "view", "view"]
    props = ['{"k": 69}', '{"k": -3}', '{"k": 6.5}', '{"k": "abc"}',
             "not json at all", "{}", None]
    tbl = pa.table({
        "event_id": pa.array(range(1, 8), pa.int64()),
        "ts": pa.array([0] * 7, pa.timestamp("us")),
        "user_id": pa.array([1] * 7, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([0.0] * 7),
        "props": pa.array(props),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))

    sdf = json_extract_props(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{tmp_path}/events.parquet')"
    )
    ddf = con.sql(JSON_EXTRACT_PROPS_SQL).df()
    assert not compare(sdf, ddf), compare(sdf, ddf)
    click = sdf[sdf.event_type == "click"].iloc[0]
    assert click.n_with_k == 2 and click.sum_k == 66  # 69 + -3; 6.5 -> NULL
    view = sdf[sdf.event_type == "view"].iloc[0]
    assert view.n_with_k == 0  # string/malformed/empty/NULL all rejected
