from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from cloudtrace_exporter_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # fewer threads + shuffle partitions for test latency; same configs otherwise
    s = get_spark("tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias fixture for hypothesis tests: @given can't inject function-
    scoped fixtures, so the session-scoped spark is passed through."""
    return spark
