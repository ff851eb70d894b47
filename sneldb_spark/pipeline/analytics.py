"""Event-analytics extensions over event frames (beyond the reference's
command surface): cohort retention, rolling active users (DAU/WAU/MAU),
A/B experiment readouts. Pure DataFrame compositions — every step is a
built-in aggregate or join, so Catalyst owns the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: Column | str = "ts",
    windows: tuple[int, ...] = (1, 7, 30),
    day_s: int = 86400,
) -> DataFrame:
    """Rolling active-user counts (DAU/WAU/MAU family): for each report
    day and trailing window length w (in days), the EXACT distinct users
    with any activity in the w days ending on that day.

    Output: (day, window_days, active_users) with `day` the epoch-second
    day bucket. Report days beyond the data's last activity day are not
    emitted.

    Plan shape: the corpus first collapses to distinct (user, day) — the
    only corpus-scale shuffle; each membership row then explodes into
    the <= max(windows) report days it supports (bounded constant
    fan-out over the REDUCED set, not the raw events) and one grouped
    exact count-distinct per (day, window) finishes. This is the exact
    path; swap the final aggregate for approx_count_distinct / HLL
    sketch union when trillion-user-day scale calls for it.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    day = (F.floor(ts.cast("long") / day_s) * day_s).cast("long")
    ud = events.select(
        F.col(user_col).alias("user"), day.alias("day")
    ).distinct()
    max_day = ud.agg(F.max("day").alias("__max"))
    out = None
    for w in windows:
        member = (
            ud.withColumn(
                "day_report",
                F.explode(
                    F.sequence(
                        F.col("day"),
                        F.col("day") + F.lit((w - 1) * day_s),
                        F.lit(day_s),
                    )
                ),
            )
            .crossJoin(max_day)
            .where(F.col("day_report") <= F.col("__max"))
            .groupBy(F.col("day_report").alias("day"))
            .agg(F.countDistinct("user").alias("active_users"))
            .withColumn("window_days", F.lit(w).cast("long"))
        )
        out = member if out is None else out.unionByName(member)
    return out.select("day", "window_days", "active_users")


def experiment_report(
    events: DataFrame,
    assignment_type: str = "assign",
    conversion_type: str = "convert",
    user_col: str = "user_id",
    ts_col: Column | str = "ts",
    type_col: str = "event_type",
    variant_col: Column | str = "variant",
    control: str = "control",
    tie_col: str | None = None,
) -> DataFrame:
    """A/B experiment readout: per-variant exposed users, conversions
    (first conversion at-or-after the user's FIRST assignment — pass
    `tie_col` (e.g. event_id) so same-timestamp assignments resolve
    deterministically), rate,
    lift vs the control variant, and the two-proportion z-score.

    Output: (variant, users, conversions, rate, lift, z) — rate/lift/z
    rounded to 4 digits; control rows carry NULL lift/z. Deterministic
    arithmetic end to end (counts -> IEEE doubles -> round), so any SQL
    engine reproduces it.

    Plan shape: one user-keyed aggregate per side (first assignment,
    first qualifying conversion), one user-keyed shuffle join, one
    variant-keyed aggregate; the per-variant table is experiment-sized
    (a handful of rows) before the control attach.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    ts = ts.cast("long")
    variant = F.col(variant_col) if isinstance(variant_col, str) else variant_col
    assigned = (
        events.where(F.col(type_col) == assignment_type)
        .select(
            F.col(user_col).alias("user"), ts.alias("__ts"),
            variant.alias("variant"),
            *([F.col(tie_col).alias("__tie")] if tie_col else []),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user").orderBy(
                    F.col("__ts").asc(),
                    *([F.col("__tie").asc()] if tie_col else []),
                )
            ),
        )
        .where(F.col("__rn") == 1)
        .select("user", F.col("__ts").alias("assign_ts"), "variant")
    )
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user"), ts.alias("conv_ts")
    )
    joined = assigned.join(conv, "user", "left").withColumn(
        "converted",
        (F.col("conv_ts").isNotNull() & (F.col("conv_ts") >= F.col("assign_ts"))),
    )
    per_user = joined.groupBy("user", "variant").agg(
        F.max(F.col("converted").cast("int")).alias("converted")
    )
    per_variant = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("users"),
        F.sum("converted").alias("conversions"),
    )
    # Attach the control row via a global window over the per-variant
    # table — it is experiment-sized (a handful of rows post-aggregate),
    # so one unpartitioned window beats a cartesian scalar attach.
    wall = Window.partitionBy()
    is_c = F.col("variant") == control
    out = per_variant.withColumn(
        "c_users", F.max(F.when(is_c, F.col("users"))).over(wall)
    ).withColumn("c_conv", F.max(F.when(is_c, F.col("conversions"))).over(wall))
    p = F.col("conversions") / F.col("users")
    p0 = F.col("c_conv") / F.col("c_users")
    pool = (F.col("conversions") + F.col("c_conv")) / (
        F.col("users") + F.col("c_users")
    )
    # z is undefined at pool in {0, 1} (zero variance) and lift at
    # p0 = 0 — emit NULL there instead of an ANSI divide-by-zero.
    z = F.try_divide(
        p - p0,
        F.sqrt(pool * (1 - pool) * (1 / F.col("users") + 1 / F.col("c_users"))),
    )
    is_ctrl = F.col("variant") == control
    return out.select(
        "variant",
        "users",
        "conversions",
        F.round(p, 4).alias("rate"),
        F.when(is_ctrl, F.lit(None).cast("double"))
        .otherwise(F.round(F.try_divide(p, p0) - 1, 4))
        .alias("lift"),
        F.when(is_ctrl, F.lit(None).cast("double"))
        .otherwise(F.round(z, 4))
        .alias("z"),
    )
