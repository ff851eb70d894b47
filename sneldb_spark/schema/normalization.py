"""Time parsing / normalization.

Matches the reference's accepted time inputs (reference: src/shared/time.rs:14-90):
RFC3339 / ISO-8601 strings (with 'T' or space separator, optional fractional
seconds, 'Z' or numeric offset), date-only ``YYYY-MM-DD``, and numeric
epochs whose magnitude is sniffed as seconds / millis / micros / nanos.
Everything normalizes to **epoch seconds** (int).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from sneldb_spark.errors import ValidationError

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")

SECONDS_PER_DAY = 86400

# Magnitude cutoffs for epoch unit sniffing: |n| below the cutoff is
# interpreted in that unit. 1e11 seconds is year ~5138, so any plausible
# second-epoch is < 1e11; millis < 1e14; micros < 1e17; else nanos.
_CUTOFF_SECONDS = 100_000_000_000
_CUTOFF_MILLIS = 100_000_000_000_000
_CUTOFF_MICROS = 100_000_000_000_000_000


def normalize_integer_epoch(n: float) -> int:
    a = abs(n)
    if a < _CUTOFF_SECONDS:
        return int(n)
    if a < _CUTOFF_MILLIS:
        return int(n // 1000)
    if a < _CUTOFF_MICROS:
        return int(n // 1_000_000)
    return int(n // 1_000_000_000)


def parse_time_value(value, *, what: str = "time") -> int:
    """Parse any accepted time input to epoch seconds."""
    if isinstance(value, bool):
        raise ValidationError(f"invalid {what} value: {value!r}")
    if isinstance(value, (int, float)):
        return normalize_integer_epoch(value)
    if isinstance(value, str):
        s = value.strip()
        if _NUM_RE.match(s):
            return normalize_integer_epoch(float(s))
        if _DATE_RE.match(s):
            dt = datetime.strptime(s, "%Y-%m-%d").replace(tzinfo=timezone.utc)
            return int(dt.timestamp())
        iso = s.replace(" ", "T", 1) if " " in s and "T" not in s else s
        if iso.endswith(("Z", "z")):
            iso = iso[:-1] + "+00:00"
        try:
            dt = datetime.fromisoformat(iso)
        except ValueError:
            raise ValidationError(
                f"Invalid time string: '{value}' ({what})"
            ) from None
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    raise ValidationError(f"invalid {what} value: {value!r}")


def try_parse_time_value(value) -> int | None:
    """SINCE semantics: an unparsable bound is ignored (query matches all).

    Mirrors the reference scenario ``since_unparsable_ignored_includes_all``.
    """
    try:
        return parse_time_value(value)
    except ValidationError:
        return None


def normalize_date_to_midnight(epoch_s: int) -> int:
    """``date`` fields snap to midnight UTC (floor, also for pre-1970)."""
    return (epoch_s // SECONDS_PER_DAY) * SECONDS_PER_DAY
