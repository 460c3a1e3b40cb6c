from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"

# deeper fuzzing on demand: HYPOTHESIS_PROFILE=deep pytest tests/test_property.py
try:
    import os as _os

    from hypothesis import settings as _settings

    _settings.register_profile("default", max_examples=25, deadline=None)
    _settings.register_profile("deep", max_examples=200, deadline=None)
    _settings.load_profile(_os.environ.get("HYPOTHESIS_PROFILE", "default"))
except ImportError:
    pass


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
