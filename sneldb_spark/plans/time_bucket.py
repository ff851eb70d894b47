"""PER HOUR|DAY|WEEK|MONTH|YEAR time bucketing.

Two modes, exactly like the reference (reference:
src/shared/datetime/time_bucketing.rs:24-117):

- **calendar** (default): timezone-aware truncation with a configurable
  week start. Implemented with built-in `date_trunc` on JVM-side timestamp
  arithmetic — stays in whole-stage codegen, no UDFs.
- **naive**: integer epoch division with fixed constants — hour 3600,
  day 86400, week 604800, month 30 days, year 365 days.

Input and output are epoch **seconds** (LongType); the bucket column holds
the bucket's start. Bucketing is a deterministic narrow projection, so it
never shuffles by itself; it only widens the downstream group-by key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NAIVE_SECONDS = {
    "hour": 3600,
    "day": 86400,
    "week": 7 * 86400,
    "month": 30 * 86400,
    "year": 365 * 86400,
}

_TRUNC_UNIT = {"hour": "hour", "day": "day", "week": "week", "month": "month", "year": "year"}


def bucket_column(
    ts_seconds: Column,
    granularity: str,
    *,
    mode: str = "calendar",
    timezone: str = "UTC",
    week_start: str = "monday",
) -> Column:
    if granularity not in NAIVE_SECONDS:
        raise ValueError(f"unknown granularity {granularity!r}")
    if mode == "naive":
        n = NAIVE_SECONDS[granularity]
        return (F.floor(ts_seconds / n) * n).cast("long")
    if mode != "calendar":
        raise ValueError(f"unknown bucketing mode {mode!r}")

    ts = F.to_timestamp(F.from_unixtime(ts_seconds))
    if timezone not in ("UTC", "Etc/UTC"):
        local = F.from_utc_timestamp(ts, timezone)
    else:
        local = ts

    if granularity == "week" and week_start.lower() != "monday":
        # date_trunc('week') is Monday-start; shift for other week starts.
        offsets = {
            "monday": 0, "tuesday": 1, "wednesday": 2, "thursday": 3,
            "friday": 4, "saturday": 5, "sunday": 6,
        }
        off = offsets[week_start.lower()]
        shifted = F.date_trunc("week", local - F.expr(f"INTERVAL {off} DAYS"))
        truncated = shifted + F.expr(f"INTERVAL {off} DAYS")
    else:
        truncated = F.date_trunc(_TRUNC_UNIT[granularity], local)

    if timezone not in ("UTC", "Etc/UTC"):
        truncated = F.to_utc_timestamp(truncated, timezone)
    return F.unix_timestamp(truncated).cast("long")
