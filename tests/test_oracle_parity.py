"""Every queries() entry that has an oracle must match DuckDB exactly —
this mirrors the driver's CORRECTNESS gate (rowcount + schema + values).

Runs at sf0.001 by default (fast); set PARITY_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's scale.
"""

from __future__ import annotations

import os

import pytest

from pdf_craft_spark.queries import ORACLES, QUERIES
from pdf_craft_spark.queries.similarity import oracle_overrides
from tests.oracle_harness import compare, duck_run

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

# oracles embedding data-dependent fit literals (IVF centroids) must be
# rebuilt for the sf directory this test run targets.  A missing testdata
# directory degrades to the static oracles (similarity itself degrades to
# rows-only at import) instead of failing pytest collection.
try:
    ORACLES = {**ORACLES, **oracle_overrides(SF_DIR)}
except FileNotFoundError:
    pass

ORACLE_KEYS = sorted(ORACLES)


# Registry-wide structural ban: NO query may plan a CartesianProduct.
# Broadcast crossJoins (1-row totals, 10-row query sides) plan as
# BroadcastNestedLoopJoin and are guarded per-op in test_plan_shapes /
# test_session10_properties; CartesianProduct — both sides large, full
# pairwise shuffle — is never acceptable at 100 TB, so the whole registry
# is swept here at zero extra cost (the DF is built for parity anyway).
CARTESIAN_OK: frozenset[str] = frozenset()


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian"
    spark_df = df.toPandas()
    duck_df = duck_run(SF_DIR, ORACLES[name])
    problems = compare(spark_df, duck_df)
    assert not problems, f"{name}: {problems}"


def test_all_queries_run(spark):
    """Queries without oracles must still execute and return a DataFrame."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
