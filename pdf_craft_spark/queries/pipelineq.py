"""Extraction-pipeline queries (per-doc kernels; rows-only driver checks).

Filled in as the pipeline stages land (SURVEY.md §7 steps 2-7).  These run
the synthetic interleaved-corpus generator over ``sf_dir`` deterministically
and apply the Spark extraction dataflow; they are not SQL-expressible
(ordered per-doc kernels), so no DuckDB oracle entries.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
