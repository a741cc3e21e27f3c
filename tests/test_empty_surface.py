"""Empty-corpus robustness sweep — reference behavior A12 ("empty batch
is normal, not an error", pkg/adapter/adapter.go) promoted to the WHOLE
query surface: every registered query must plan and execute against a
0-row corpus without raising, returning an empty (or legitimately
constant) result. At 100 TB this is the "first batch of a new tenant /
empty partition after pruning" case — a pipeline that crashes on empty
input cannot be scheduled unconditionally.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from cloudtrace_exporter_spark.schemas import FIXTURE_SCHEMAS


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("empty_sf")
    for name, schema in FIXTURE_SCHEMAS.items():
        spark.createDataFrame([], schema).coalesce(1).write.mode("overwrite").parquet(
            str(root / f"{name}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    fn = entry_mod.queries()[name]
    rows = fn(spark, empty_sf_dir).collect()
    assert isinstance(rows, list)
