"""Watermarked tumbling-window aggregation over an event stream.

The reference engine buckets only at query time (PER DAY/HOUR/...; its
streaming side has no watermarks by design — server timestamps arrive in
order, `docs/src/design/aggregations.md`). A training-data pipeline
ingesting third-party event feeds does not get that luxury: event time
arrives out of order and late. This module is the Spark-first answer —
`readStream -> withWatermark -> window -> agg` — so the same tumbling
rollup the batch PER family computes stays incremental under late data.

Semantics:
- Tumbling windows of ``window_s`` seconds on the event-time column.
- Late rows older than ``watermark_s`` behind the max observed event time
  are dropped (append mode) — state for closed windows is freed, which is
  what bounds memory at 100 TB/day feeds.
- In append mode a window emits exactly once, when the watermark passes
  its end; in complete/update modes the sink sees running totals.

Scale shape: one shuffle per micro-batch on (window, group key) — the
same exchange the batch GROUP BY bucket plan produces — with partial
(map-side) aggregation before it; state is one row per open window per
key, O(windows x keys), independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    stream: DataFrame,
    time_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    window_s: int = 86_400,
    watermark_s: int = 3_600,
    value_col: str | None = None,
) -> DataFrame:
    """Watermarked tumbling count/sum rollup over a streaming DataFrame.

    Output schema: bucket (epoch seconds of window start), *group_cols,
    count, and total_<value_col> when ``value_col`` is given — matching
    the batch PER-bucket aggregate family so the two paths are
    interchangeable downstream.
    """
    # Event time must be a (tz-aware) TIMESTAMP for watermarking; the
    # session timezone is UTC so TIMESTAMP_NTZ inputs keep their face
    # value through this cast.
    ts = F.col(time_col).cast("timestamp")
    aggs = [F.count(F.lit(1)).alias("count")]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                f"total_{value_col}_cents"
            )
        )
    return (
        stream.withColumn("__event_time", ts)
        .withWatermark("__event_time", f"{watermark_s} seconds")
        .groupBy(
            F.window("__event_time", f"{window_s} seconds").alias("__w"),
            *group_cols,
        )
        .agg(*aggs)
        .select(
            F.col("__w.start").cast("long").alias("bucket"),
            *group_cols,
            "count",
            *(
                [f"total_{value_col}_cents"]
                if value_col is not None
                else []
            ),
        )
    )


def run_available_now(
    stream_agg: DataFrame, query_name: str, spark=None
) -> DataFrame:
    """Drain all currently-available input through the streaming plan in
    complete mode into an in-memory table and return it as a DataFrame.

    Complete mode is used for the drain-everything gate because append
    mode withholds windows the final watermark has not passed (the last
    day of a bounded replay would never emit); the watermark still runs
    and frees state for every window it passes. Live deployments write
    append-mode Parquet instead (see tests for the late-drop semantics).
    """
    spark = spark or stream_agg.sparkSession
    q = (
        stream_agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
