"""Engine configuration with env-override parsing parity.

Mirrors the semantics of the reference's ``src/config/config.py:24-69``:
defaults for timeframes / indicator periods / cross periods, overridable via
environment variables, with ``ValueError`` on malformed ints or lists
(tested by the reference at ``tests/config/test_config.py:21-75``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

# Reference defaults: src/config/config.py:15-21 and dim seeds
# (alembic e2444ebd2a06:125-142, 0a3601d18004:23-27).
DEFAULT_TIMEFRAMES: dict[str, int] = {
    "1m": 60,
    "5m": 300,
    "15m": 900,
    "30m": 1800,
    "1h": 3600,
    "4h": 14400,
}
DEFAULT_INDICATOR_PERIODS: list[int] = [14, 28, 56]
DEFAULT_CROSS_SHORT_PERIOD: int = 14
DEFAULT_CROSS_LONG_PERIOD: int = 28
DEFAULT_CALC_VERSION: str = "0"  # transform_services.py:138 (stringly-typed PK part)


def _parse_int(name: str, raw: str) -> int:
    try:
        return int(raw)
    except ValueError as exc:  # same contract as reference config.py:30-36
        raise ValueError(f"{name} must be an integer, got {raw!r}") from exc


def _parse_int_list(name: str, raw: str) -> list[int]:
    items = [s.strip() for s in raw.split(",") if s.strip()]
    if not items:
        raise ValueError(f"{name} must be a non-empty comma-separated int list")
    return [_parse_int(name, s) for s in items]


def _parse_timeframes(name: str, raw: str) -> dict[str, int]:
    """``"2h:7200,8h:28800"`` → {"2h": 7200, "8h": 28800} (ValueError on
    malformed entries, same contract as the int parsers)."""
    out: dict[str, int] = {}
    for item in (s.strip() for s in raw.split(",") if s.strip()):
        code, sep, secs = item.partition(":")
        if not sep or not code:
            raise ValueError(f"{name} entries must be code:seconds, got {item!r}")
        seconds = _parse_int(name, secs)
        if seconds <= 0:
            raise ValueError(f"{name} durations must be positive, got {item!r}")
        out[code.strip()] = seconds
    if not out:
        raise ValueError(f"{name} must be a non-empty code:seconds list")
    return out


@dataclass
class EngineConfig:
    timeframes: dict[str, int] = field(default_factory=lambda: dict(DEFAULT_TIMEFRAMES))
    indicator_periods: list[int] = field(
        default_factory=lambda: list(DEFAULT_INDICATOR_PERIODS)
    )
    cross_short_period: int = DEFAULT_CROSS_SHORT_PERIOD
    cross_long_period: int = DEFAULT_CROSS_LONG_PERIOD
    calc_version: str = DEFAULT_CALC_VERSION

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "EngineConfig":
        env = dict(os.environ if env is None else env)
        cfg = cls()
        # The reference's only schema-evolution mechanism is a migration
        # adding a timeframe row (alembic 0a3601d18004:21-27). Here adding
        # one is configuration: ETL_TIMEFRAMES replaces the whole set,
        # ETL_EXTRA_TIMEFRAMES appends to the seed — dim_timeframe(), the
        # derived-OHLC fan-out, and the oracle CTEs all follow.
        if raw := env.get("ETL_TIMEFRAMES"):
            cfg.timeframes = _parse_timeframes("ETL_TIMEFRAMES", raw)
        if raw := env.get("ETL_EXTRA_TIMEFRAMES"):
            cfg.timeframes = {
                **cfg.timeframes,
                **_parse_timeframes("ETL_EXTRA_TIMEFRAMES", raw),
            }
        if raw := env.get("ETL_INDICATOR_PERIODS"):
            cfg.indicator_periods = _parse_int_list("ETL_INDICATOR_PERIODS", raw)
        if raw := env.get("ETL_CROSS_SHORT_PERIOD"):
            cfg.cross_short_period = _parse_int("ETL_CROSS_SHORT_PERIOD", raw)
        if raw := env.get("ETL_CROSS_LONG_PERIOD"):
            cfg.cross_long_period = _parse_int("ETL_CROSS_LONG_PERIOD", raw)
        if raw := env.get("ETL_CALC_VERSION"):
            cfg.calc_version = raw
        return cfg
