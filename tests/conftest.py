from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from cloudtrace_exporter_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Two-tier suite (round 12, r11 verdict order #2): the FULL suite takes
# 32-50 min — it outgrew the driver's pytest window in round 11 (tests_ok
# false with zero visible failures). The default run is the FAST tier:
# every operator family, the oracle-shape tests, the fast-path
# bit-identity pins, plan fingerprints, streaming smoke — ~10 min. The
# SLOW tier (the differential/streaming fuzz modules plus the individual
# >=5 s deep-invariant tests listed in tests/slow_tier.txt) is skipped
# by default and opted back in with
#
#     SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/ -q      # full gate
#     python -m pytest tests/ -q --full                        # same
#
# The full gate is unchanged — it still runs at final HEAD each round
# (recorded in OPTIMIZATION_r{N}.md); only the DEFAULT selection is
# driver-window-sized.
# ---------------------------------------------------------------------------

_SLOW_MODULES = ("test_fuzz_differential.py", "test_fuzz_streaming.py")
_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tier.txt")


def pytest_addoption(parser):
    parser.addoption(
        "--full",
        action="store_true",
        default=False,
        help="run the slow tier too (fuzz modules + tests/slow_tier.txt)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full") or os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    slow_ids: set[str] = set()
    try:
        with open(_SLOW_LIST) as f:
            for ln in f:
                ln = ln.strip()
                if ln and not ln.startswith("#"):
                    slow_ids.add(ln)
                    slow_ids.add(ln.split("[", 1)[0])
    except OSError:
        pass
    skip = pytest.mark.skip(
        reason="slow tier (SPARK_GRAFT_FULL_TESTS=1 or --full to run)"
    )
    for item in items:
        nid = item.nodeid
        if (
            item.fspath.basename in _SLOW_MODULES
            or nid in slow_ids
            or nid.split("[", 1)[0] in slow_ids
        ):
            item.add_marker(skip)


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
