"""Event-analytics extensions over event frames (beyond the reference's
command surface): cohort retention. Pure DataFrame compositions — every
step is a built-in aggregate or join, so Catalyst owns the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: Column | str = "ts",
    type_col: str = "event_type",
    signup_type: str = "signup",
    period_s: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by the period of their
    FIRST `signup_type` event; for each (cohort, periods_since) the
    distinct cohort users with ANY activity in that period, plus the
    retention rate against the cohort size.

    Output: (cohort, periods_since, active_users, cohort_size, retention)
    with retention rounded to 4 digits. Activity strictly before the
    user's first signup is excluded (periods_since >= 0).

    Plan shape at 100 TB: one user-keyed aggregate for first-signup, one
    user-keyed shuffle join attaching the cohort to each activity row
    (both sides user-partitioned — no corpus broadcast), one grouped
    exact count-distinct, and a cohort-keyed join for sizes (cohort
    cardinality is calendar-bounded, so Catalyst may broadcast it — a
    correct size-based choice, not a hint).
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    ts = ts.cast("long")
    first = (
        events.where(F.col(type_col) == signup_type)
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts).alias("first_ts"))
        .withColumn(
            "cohort", (F.floor(F.col("first_ts") / period_s) * period_s).cast("long")
        )
    )
    act = events.select(F.col(user_col).alias("user"), ts.alias("__ts")).join(
        first, "user"
    )
    act = act.withColumn(
        "periods_since",
        F.floor((F.col("__ts") - F.col("first_ts")) / period_s).cast("long"),
    ).where(F.col("periods_since") >= 0)
    matrix = act.groupBy("cohort", "periods_since").agg(
        F.countDistinct("user").alias("active_users")
    )
    sizes = first.groupBy("cohort").agg(F.countDistinct("user").alias("cohort_size"))
    return matrix.join(sizes, "cohort").select(
        "cohort",
        "periods_since",
        "active_users",
        "cohort_size",
        F.round(F.col("active_users") / F.col("cohort_size"), 4).alias("retention"),
    )
