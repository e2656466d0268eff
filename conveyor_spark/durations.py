"""Duration parsing shared by ops whose params say "seconds or
duration string" (stream.join deltas, stream.session_window gap,
join.asof tolerance). Accepts a plain number, a numeric string, or
``"<n> <unit>"`` with Spark's interval unit vocabulary — the same
strings users already pass to watermarks, so a config can use one
spelling throughout.
"""

from __future__ import annotations

import re
from typing import Any

from conveyor_spark.errors import ConfigError

_UNIT_SECONDS = {
    "microsecond": 1e-6, "us": 1e-6,
    "millisecond": 1e-3, "ms": 1e-3,
    "second": 1.0, "sec": 1.0, "s": 1.0,
    "minute": 60.0, "min": 60.0, "m": 60.0,
    "hour": 3600.0, "hr": 3600.0, "h": 3600.0,
    "day": 86400.0, "d": 86400.0,
    "week": 604800.0, "w": 604800.0,
}

_DURATION_RE = re.compile(r"^(-?\d+(?:\.\d+)?)\s*([a-z]+)$")


def parse_duration_seconds(value: Any, param: str = "duration") -> float:
    """Number of seconds in ``value`` (number | "90" | "10 minutes")."""
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return float(value)
    s = str(value).strip().lower()
    try:
        return float(s)
    except ValueError:
        pass
    if m := _DURATION_RE.match(s):
        unit = m.group(2)
        if unit not in _UNIT_SECONDS and unit.endswith("s") and unit[:-1] in _UNIT_SECONDS:
            unit = unit[:-1]  # minutes -> minute (but never ms -> m)
        if unit in _UNIT_SECONDS:
            return float(m.group(1)) * _UNIT_SECONDS[unit]
    raise ConfigError(
        f"{param}: cannot parse duration {value!r} "
        "(use seconds or '<n> <unit>', e.g. '10 minutes')"
    )
