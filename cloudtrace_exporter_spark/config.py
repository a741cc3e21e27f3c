"""Engine configuration — A20 parity (env-driven config parse + validation).

The reference configures itself entirely from env vars with defaults and
a range check (/root/reference/cmd/cts_exporter/main.go:21-30,46-65,
210-216; /root/reference/pkg/adapter/querier.go:13-16,39-42). This is the
engine-side equivalent: the same knobs, mapped onto Spark concepts, with
the same defaults and the same ``[1, 10800]`` validation for the poll
window. Two reference quirks handled deliberately:

- ``CTS_X_PNP`` defaults to **false** in code (main.go:26) although the
  README claims true (README.md:87) — the code wins here.
- the tracker name defaults to ``system`` (querier.go:13,40-42).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

_MIN_FROM, _MAX_FROM = 1, 10800  # minutes (main.go:42-43, 210-216)


@dataclass(frozen=True)
class EngineConfig:
    """Reference env surface → engine semantics.

    | env var         | reference meaning              | engine meaning                  |
    |-----------------|--------------------------------|---------------------------------|
    | CTS_FROM        | poll window minutes (dflt 5)   | trigger interval / window width |
    | CTS_STREAMS     | stream vs batch mode (dflt t)  | readStream vs batch read        |
    | CTS_X_PNP       | forward to sink (dflt FALSE)   | attach the forwarding sink      |
    | CTS_TRACKER     | tracker channel (dflt system)  | source name/path selector       |
    | K_SINK          | CloudEvents HTTP target        | sink output path/URL            |
    | K_CE_OVERRIDES  | JSON extension overrides       | normalize.apply_overrides map   |
    """

    from_minutes: int = 5
    streams: bool = True
    forward: bool = False
    tracker: str = "system"
    sink: str | None = None
    overrides: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not (_MIN_FROM <= self.from_minutes <= _MAX_FROM):
            raise ValueError(
                f"CTS_FROM={self.from_minutes} outside [{_MIN_FROM}, {_MAX_FROM}] "
                "(fromInRange, main.go:210-216)"
            )

    @property
    def trigger_interval(self) -> str:
        """A18: the ticker cadence as a Structured Streaming trigger."""
        return f"{self.from_minutes} minutes"

    @property
    def watermark_delay(self) -> str:
        """A4: the overlap compensation as a watermark delay — one full
        window width covers the reference's measured-lag widening."""
        return f"{self.from_minutes} minutes"

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> EngineConfig:
        e = os.environ if env is None else env

        def _bool(key: str, default: bool) -> bool:
            raw = e.get(key)
            if raw is None:
                return default
            return raw.strip().lower() in ("1", "t", "true", "yes", "on")

        overrides_raw = e.get("K_CE_OVERRIDES", "")
        overrides: dict[str, str] = {}
        if overrides_raw.strip():
            # adapter.go:57-65: a JSON object of extension overrides; the
            # reference treats parse failure as fatal config error
            parsed = json.loads(overrides_raw)
            if not isinstance(parsed, dict):
                raise ValueError("K_CE_OVERRIDES must be a JSON object")
            overrides = {str(k): str(v) for k, v in parsed.items()}

        return cls(
            from_minutes=int(e.get("CTS_FROM", "5")),
            streams=_bool("CTS_STREAMS", True),
            forward=_bool("CTS_X_PNP", False),
            tracker=e.get("CTS_TRACKER", "system"),
            sink=e.get("K_SINK"),
            overrides=overrides,
        )
