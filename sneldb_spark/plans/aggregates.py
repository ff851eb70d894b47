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


def is_percentile(op: str) -> bool:
    """median / p<NN> — exact interpolated percentiles (extension beyond
    the reference's aggregate set). EXACT percentiles are mergeable: the
    partial state is the group's value multiset (the same thing the SQL
    `percentile` aggregate buffers), merged by concatenation and
    finalized with the identical lower + (higher-lower)*frac
    interpolation — so incremental REMEMBER refreshes are bit-equal to
    the query path. The approx_percentiles sketch has no exposed merge,
    so THAT opt-in still routes to full recompute."""
    return op == "median" or (op.startswith("p") and op[1:].isdigit())


def percentile_fraction(op: str) -> float:
    return 0.5 if op == "median" else int(op[1:]) / 100.0


def agg_expr(
    spec: AggSpec,
    col: Column | None,
    approx_unique: bool = False,
    approx_pct: bool = False,
) -> Column:
    if spec.op == "count":
        return F.count(F.lit(1)).alias("count")
    if col is None:
        raise QueryError(f"aggregate {spec.op} requires a field")
    name = spec.output_name
    if spec.op == "count_field":
        return F.count(col).alias(name)
    if spec.op == "count_unique":
        # Exact by default (the reference's HashSet merge semantics).
        # approx_unique is the 100 TB opt-in: HyperLogLog++ sketch state
        # is O(1) per group instead of O(distinct values) — SURVEY §7
        # risk (f); same output column name/type, values within ~2.3%.
        if approx_unique:
            return F.approx_count_distinct(col).alias(name)
        return F.countDistinct(col).alias(name)
    if spec.op == "total":
        return F.sum(col).alias(name)
    if spec.op == "avg":
        return F.avg(col).alias(name)
    if spec.op == "min":
        return F.min(col).alias(name)
    if spec.op == "max":
        return F.max(col).alias(name)
    if is_percentile(spec.op):
        # Exact percentile with linear interpolation (SQL `percentile`):
        # one pass, per-group sorted-merge inside the aggregate. Matches
        # DuckDB's quantile_cont definition (index p*(n-1), interpolate).
        # approx_pct is the 100 TB opt-in: the exact form buffers every
        # group value in the aggregation state; percentile_approx keeps a
        # bounded sketch per group instead (same column name/type, value
        # within 1/accuracy rank error).
        frac = percentile_fraction(spec.op)
        if approx_pct:
            return F.percentile_approx(col, F.lit(frac), F.lit(10_000)).alias(name)
        return F.percentile(col, F.lit(frac)).alias(name)
    raise QueryError(f"unknown aggregate op {spec.op!r}")


def apply_aggregation(
    df: DataFrame,
    specs: list[AggSpec],
    group_cols: list[str],
    resolve,
    bucket: Column | None = None,
    approx_unique: bool = False,
    approx_pct: bool = False,
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
        aggs.append(agg_expr(spec, col, approx_unique=approx_unique, approx_pct=approx_pct))
    if keys:
        return df.groupBy(*keys).agg(*aggs)
    return df.agg(*aggs)


# ---------------------------------------------------------------------------
# Incremental materialization: mergeable partial state
# ---------------------------------------------------------------------------
# The reference refreshes an aggregate REMEMBER by merging a delta
# aggregate into stored per-group state rather than rescanning history
# (reference: src/command/handlers/show/delta/refresher.rs). The Spark
# shape: persist one partial-state row per group; on SHOW, aggregate ONLY
# the rows behind the high-water mark, union with the stored state, and
# merge — at 100 TB this turns a full-history rescan into a delta scan
# plus a state-sized shuffle.
#
# Partial state per AggSpec (merge op in parentheses):
#   count / count_f / total_f -> running number      (sum)
#   min_f / max_f             -> running extreme     (min / max; append-only
#                                source, so extremes only ever widen)
#   avg_f                     -> sum + count pair    (sum both, divide at
#                                finalize)
#   count_unique_f            -> exact value set     (distinct-union; the
#                                reference's HashSet merge. State is
#                                O(distinct values per group) — the cost
#                                exact COUNT UNIQUE inherently carries).
#                                With approx_unique: a DataSketches HLL
#                                sketch (binary, O(1) per group), merged
#                                by hll_union_agg and finalized by
#                                hll_sketch_estimate — approx COUNT
#                                UNIQUE materializations refresh
#                                incrementally too, with constant state.


def _avg_state(field: str) -> tuple[str, str]:
    return f"__avg_sum_{field}", f"__avg_cnt_{field}"


def _set_state(field: str) -> str:
    return f"__set_{field}"


def _vals_state(field: str) -> str:
    # shared by every percentile op on the same field (MEDIAN amount and
    # P90 amount finalize from one buffered multiset)
    return f"__vals_{field}"


def _percentile_from_array(state: Column, frac: float) -> Column:
    """Exact interpolated percentile of a buffered value array — the same
    position = frac*(n-1), (higher-position)*lowerValue +
    (position-lower)*higherValue formula Spark's `percentile` aggregate
    applies (Percentile.getPercentile), expression-for-expression, so the
    finalize path is BIT-equal to the direct query path (property-tested
    with no tolerance in tests/test_property.py)."""
    srt = F.array_sort(state)
    n = F.size(srt)
    pos = F.lit(float(frac)) * (n.cast("double") - F.lit(1.0))
    lo = F.floor(pos).cast("int")
    hi = F.ceil(pos).cast("int")
    lov = F.element_at(srt, lo + 1)
    hiv = F.element_at(srt, hi + 1)
    return F.when(
        n > 0,
        # integral position hits a real element (Spark returns it as-is;
        # the interpolation form would cancel to 0 there)
        F.when(lo == hi, lov).otherwise(
            (hi.cast("double") - pos) * lov + (pos - lo.cast("double")) * hiv
        ),
    )


def partial_agg_exprs(
    specs: list[AggSpec], resolve, approx_unique: bool = False
) -> list[Column]:
    """Aggregation expressions producing the mergeable state columns."""
    exprs: list[Column] = []
    seen_states: set[str] = set()
    for spec in specs:
        col = resolve(spec.field)[0] if spec.field else None
        if is_percentile(spec.op):
            st = _vals_state(spec.field)
            if st not in seen_states:
                seen_states.add(st)
                exprs.append(F.collect_list(col.cast("double")).alias(st))
            continue
        if spec.op == "count":
            exprs.append(F.count(F.lit(1)).alias(spec.output_name))
        elif spec.op == "count_field":
            exprs.append(F.count(col).alias(spec.output_name))
        elif spec.op == "total":
            exprs.append(F.sum(col).alias(spec.output_name))
        elif spec.op == "min":
            exprs.append(F.min(col).alias(spec.output_name))
        elif spec.op == "max":
            exprs.append(F.max(col).alias(spec.output_name))
        elif spec.op == "avg":
            s, c = _avg_state(spec.field)
            exprs.append(F.sum(col).alias(s))
            exprs.append(F.count(col).alias(c))
        elif spec.op == "count_unique":
            if approx_unique:
                exprs.append(
                    F.hll_sketch_agg(col.cast("string")).alias(
                        _set_state(spec.field)
                    )
                )
            else:
                exprs.append(F.collect_set(col).alias(_set_state(spec.field)))
        else:
            raise QueryError(f"unknown aggregate op {spec.op!r}")
    return exprs


def apply_partial_aggregation(
    df: DataFrame,
    specs: list[AggSpec],
    group_cols: list[str],
    resolve,
    bucket: Column | None = None,
    approx_unique: bool = False,
) -> tuple[DataFrame, list[str]]:
    """Like apply_aggregation but emitting partial state; returns the
    state frame and the group-key column names."""
    keys: list[Column] = []
    names: list[str] = []
    if bucket is not None:
        df = df.withColumn("bucket", bucket)
        keys.append(F.col("bucket"))
        names.append("bucket")
    for g in group_cols:
        col, _ = resolve(g)
        keys.append(col.alias(g))
        names.append(g)
    exprs = partial_agg_exprs(specs, resolve, approx_unique=approx_unique)
    if keys:
        return df.groupBy(*keys).agg(*exprs), names
    return df.agg(*exprs), names


def merge_partial_states(
    df: DataFrame,
    specs: list[AggSpec],
    key_names: list[str],
    approx_unique: bool = False,
) -> DataFrame:
    """Collapse a union of partial-state frames to one row per group."""
    aggs: list[Column] = []
    seen_states: set[str] = set()
    for spec in specs:
        name = spec.output_name
        if is_percentile(spec.op):
            st = _vals_state(spec.field)
            if st not in seen_states:
                seen_states.add(st)
                # multiset union: concatenate the buffered value arrays
                aggs.append(F.flatten(F.collect_list(st)).alias(st))
            continue
        if spec.op in ("count", "count_field", "total"):
            aggs.append(F.sum(name).alias(name))
        elif spec.op == "min":
            aggs.append(F.min(name).alias(name))
        elif spec.op == "max":
            aggs.append(F.max(name).alias(name))
        elif spec.op == "avg":
            s, c = _avg_state(spec.field)
            aggs.append(F.sum(s).alias(s))
            aggs.append(F.sum(c).alias(c))
        elif spec.op == "count_unique":
            s = _set_state(spec.field)
            if approx_unique:
                aggs.append(F.hll_union_agg(s).alias(s))
            else:
                aggs.append(
                    F.array_distinct(F.flatten(F.collect_list(s))).alias(s)
                )
        else:
            raise QueryError(f"unknown aggregate op {spec.op!r}")
    if key_names:
        return df.groupBy(*[F.col(k) for k in key_names]).agg(*aggs)
    return df.agg(*aggs)


def finalize_partial_state(
    df: DataFrame,
    specs: list[AggSpec],
    key_names: list[str],
    approx_unique: bool = False,
) -> DataFrame:
    """Partial state -> the exact output schema apply_aggregation yields
    (A11 naming, keys first then aggregates in spec order)."""
    out = df
    for spec in specs:
        if is_percentile(spec.op):
            out = out.withColumn(
                spec.output_name,
                _percentile_from_array(
                    F.col(_vals_state(spec.field)),
                    percentile_fraction(spec.op),
                ),
            )
        elif spec.op == "avg":
            s, c = _avg_state(spec.field)
            out = out.withColumn(spec.output_name, F.col(s) / F.col(c))
        elif spec.op == "count_unique":
            st = F.col(_set_state(spec.field))
            out = out.withColumn(
                spec.output_name,
                F.hll_sketch_estimate(st)
                if approx_unique
                else F.size(st).cast("long"),
            )
    return out.select(*key_names, *[s.output_name for s in specs])
