from __future__ import annotations

import os
import sys

import pytest
from hypothesis import settings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_craft_spark.session import get_spark  # noqa: E402

# The driver's gate runs this suite headless: keep fuzzing deterministic
# there (same example corpus every run).  Exploratory fuzzing with fresh
# seeds: HYPOTHESIS_PROFILE=explore python -m pytest tests/
settings.register_profile("ci", derandomize=True)
settings.register_profile("explore", derandomize=False)
settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "ci"))


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, app_name="pdf_craft_spark_tests", shuffle_partitions=4)
    yield s
