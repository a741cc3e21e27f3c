"""A20 parity tests: env parse, defaults, validation range, override JSON."""

from __future__ import annotations

import pytest

from cloudtrace_exporter_spark.config import EngineConfig


def test_defaults_match_reference_code_not_readme():
    c = EngineConfig.from_env({})
    assert c.from_minutes == 5  # querier.go:14, main.go:25
    assert c.streams is True  # main.go:27
    assert c.forward is False  # main.go:26 (README.md:87 is stale)
    assert c.tracker == "system"  # querier.go:13,40-42
    assert c.sink is None and c.overrides == {}


def test_from_range_validated():
    assert EngineConfig.from_env({"CTS_FROM": "1"}).from_minutes == 1
    assert EngineConfig.from_env({"CTS_FROM": "10800"}).from_minutes == 10800
    for bad in ("0", "10801", "-5"):
        with pytest.raises(ValueError):
            EngineConfig.from_env({"CTS_FROM": bad})


def test_trigger_and_watermark_derive_from_window():
    c = EngineConfig.from_env({"CTS_FROM": "2"})
    assert c.trigger_interval == "2 minutes"
    assert c.watermark_delay == "2 minutes"


def test_overrides_json_parsed_and_stringified():
    c = EngineConfig.from_env({"K_CE_OVERRIDES": '{"region": "eu-nl", "n": 3}'})
    assert c.overrides == {"region": "eu-nl", "n": "3"}
    with pytest.raises(ValueError):
        EngineConfig.from_env({"K_CE_OVERRIDES": '["not", "a", "map"]'})
    with pytest.raises(Exception):
        EngineConfig.from_env({"K_CE_OVERRIDES": "not json"})


def test_bool_parse_variants():
    assert EngineConfig.from_env({"CTS_X_PNP": "true"}).forward is True
    assert EngineConfig.from_env({"CTS_X_PNP": "T"}).forward is True
    assert EngineConfig.from_env({"CTS_X_PNP": "0"}).forward is False
    assert EngineConfig.from_env({"CTS_STREAMS": "false"}).streams is False
