"""Aggregation compilation: AggSpec list + BY fields + PER bucket -> DataFrame.

Spark's HashAggregate already does the partial/final split the reference
hand-rolls per shard (reference: src/engine/core/read/aggregate/partial.rs),
so each SnelDB aggregate maps to one built-in:

- COUNT            -> count(*)
- COUNT f          -> count(f)                (non-null count)
- COUNT UNIQUE f   -> count(distinct f)       (exact, like the reference's
                      HashSet merge; spills via Spark instead of OOMing)
- TOTAL f          -> sum(f)
- AVG f            -> avg(f)
- MIN/MAX f        -> min/max(f)

Output schema per the reference (SURVEY §2.4 A11): optional `bucket`,
group fields, then agg columns named count / count_<f> / count_unique_<f> /
total_<f> / avg_<f> / min_<f> / max_<f>.

`LIMIT n` on an aggregate query caps the number of *groups* (A10). Decided
contract (SURVEY §2 A10): `.limit(n)` after full aggregation — at most n
groups, each carrying its exact full-scan aggregate value. The reference
instead stops CREATING groups past n during the scan
(docs/src/design/aggregations.md), which ties the group choice to physical
scan order; replicating that in Spark would serialize the aggregation for
an outcome the reference itself doesn't pin. Without ORDER BY both engines
leave the selection engine-defined; with ORDER BY both are the same
deterministic prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sneldb_spark.commands.ast import AggSpec
from sneldb_spark.errors import QueryError


def agg_expr(spec: AggSpec, col: Column | None) -> Column:
    if spec.op == "count":
        return F.count(F.lit(1)).alias("count")
    if col is None:
        raise QueryError(f"aggregate {spec.op} requires a field")
    name = spec.output_name
    if spec.op == "count_field":
        return F.count(col).alias(name)
    if spec.op == "count_unique":
        return F.countDistinct(col).alias(name)
    if spec.op == "total":
        return F.sum(col).alias(name)
    if spec.op == "avg":
        return F.avg(col).alias(name)
    if spec.op == "min":
        return F.min(col).alias(name)
    if spec.op == "max":
        return F.max(col).alias(name)
    raise QueryError(f"unknown aggregate op {spec.op!r}")


def apply_aggregation(
    df: DataFrame,
    specs: list[AggSpec],
    group_cols: list[str],
    resolve,
    bucket: Column | None = None,
) -> DataFrame:
    """resolve(field) -> (Column, FieldType|None); group_cols are output names."""
    keys: list[Column] = []
    if bucket is not None:
        df = df.withColumn("bucket", bucket)
        keys.append(F.col("bucket"))
    for g in group_cols:
        col, _ = resolve(g)
        keys.append(col.alias(g))
    aggs = []
    for spec in specs:
        col = resolve(spec.field)[0] if spec.field else None
        aggs.append(agg_expr(spec, col))
    if keys:
        return df.groupBy(*keys).agg(*aggs)
    return df.agg(*aggs)
