from __future__ import annotations

import os

import pytest

from bocadillo_spark.session import get_spark

# Default sf0.001 keeps the suite fast; override to mirror the driver's
# grading scale exactly, e.g.
#   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bocadillo_spark_tests", cores=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
