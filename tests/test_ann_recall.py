"""ANN quality regression gate: the tuned recall target (BENCH.md,
mean recall ≥ 0.9 @ k=5 vs brute-force ground truth) is a tested
invariant at the driver's sf0.01 scale, not a one-off measurement —
any knob or fit change that silently costs recall fails here."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)

RECALL_TARGET = 0.9


def test_ann_recall_meets_target(spark):
    from pdf_craft_spark.queries.similarity import TOP_K, sim_recall

    rows = sim_recall(spark, SF_DIR).collect()
    by_method: dict[str, list[float]] = {}
    for r in rows:
        by_method.setdefault(r.method, []).append(r.recall_at_k)
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hits <= TOP_K
    assert set(by_method) == {"ivf", "lsh"}
    for method, vals in by_method.items():
        mean = sum(vals) / len(vals)
        assert mean >= RECALL_TARGET, f"{method} mean recall {mean:.2f} < {RECALL_TARGET}"
