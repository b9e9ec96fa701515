"""The driver sweeps queries() in registry order and caps the sweep
(observed r3/r4: first 50) — insertion order decides which entries get a
correctness row.  The policy is AUTOMATIC rotation: least-recently
externally verified first, from the driver's own CORRECTNESS_r*.json
records, so no query can go two consecutive capped rounds unchecked and
the policy survives cap changes without hand-edits.  Pin it here."""

from __future__ import annotations

import glob
import json
import os

from pdf_craft_spark.queries import (
    ORACLES,
    QUERIES,
    _LAST_VERIFIED,
    _last_verified_rounds,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OBSERVED_CAP = 50  # driver sweep size observed in r3 and r4


def test_order_is_least_recently_verified_first():
    rounds = [_LAST_VERIFIED.get(q, -1) for q in QUERIES]
    assert rounds == sorted(rounds), "registry must be ordered oldest-verified first"


def test_rotation_covers_every_query_within_two_rounds():
    """With the observed cap, the queries a sweep skips are exactly the
    most recently verified — so they lead the next round's order."""
    keys = list(QUERIES)
    skipped = keys[OBSERVED_CAP:]
    if not skipped:
        return
    latest = max(_LAST_VERIFIED.values(), default=-1)
    for q in skipped:
        assert _LAST_VERIFIED.get(q, -1) == latest, (
            f"{q} would be skipped this round but was not verified in the "
            f"latest recorded round {latest} — rotation is broken"
        )


def test_last_verified_matches_records():
    """The computed history must reflect the actual driver records."""
    records = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    assert records, "driver correctness records expected at repo root"
    last = _last_verified_rounds()
    assert last == _LAST_VERIFIED
    # spot-check against the newest record file (errored rows — err set —
    # are deliberately NOT counted as verified)
    newest = max(records)
    with open(newest) as f:
        rows = json.load(f)
    for name, row in rows.items():
        if isinstance(row, dict) and row.get("err") is not None:
            continue
        assert name in last


def test_every_query_has_an_oracle_or_is_known_exception():
    # the full registry is oracle-backed today; if a genuinely
    # non-SQL-expressible op is ever added, list it here explicitly
    known_rows_only: set[str] = set()
    missing = set(QUERIES) - set(ORACLES) - known_rows_only
    assert not missing, sorted(missing)


def test_oracles_follow_registry_order():
    assert list(ORACLES) == [k for k in QUERIES if k in ORACLES]
