"""WHERE expression tree -> pyspark Column.

Null semantics: in the reference, a comparison against a NULL field value
evaluates to *false* (two-valued logic), so `NOT (f = 1)` *includes* rows
where f is null. SQL three-valued logic would exclude them.

Outside a NOT, null-as-false and null-as-null filter identically (AND/OR of
NULL and FALSE can never make a WHERE keep a row), so leaves compile to
plain comparisons — these push down into the Parquet scan (row-group
skipping = the reference's zone pruning). Only leaves *under a NOT* get a
COALESCE(pred, false) wrapper so the inversion includes nulls; that is also
exactly the subtree the reference can't zone-prune either. Boolean
simplification (De Morgan / double negation, hand-rolled in the reference's
filter_group_builder — reference: src/engine/core/filter/filter_group_builder.rs)
is Catalyst's job here.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from sneldb_spark.commands import ast
from sneldb_spark.errors import QueryError, ValidationError
from sneldb_spark.schema.normalization import parse_time_value
from sneldb_spark.schema.types import FieldType

# Resolver: field name -> (Column, FieldType | None). Lets the sequence
# compiler rewrite event-qualified names and lets typed literal coercion
# (datetime strings -> epoch seconds) happen per field.
FieldResolver = Callable[[str], tuple[Column, FieldType | None]]


class _Unparsable:
    """Sentinel: a time literal that failed to parse. The reference builds
    no typed condition for it, so the comparison matches nothing
    (scenario query_created_at_invalid_string_no_results) — it is not an
    error."""


_UNPARSABLE = _Unparsable()


def _coerce_literal(value, ftype: FieldType | None):
    """Coerce a parsed literal to the field's storage representation."""
    if ftype is not None and ftype.is_time and value is not None and not isinstance(value, bool):
        if isinstance(value, (str, int, float)):
            try:
                return parse_time_value(value)
            except ValidationError:
                return _UNPARSABLE
    return value


def compile_expr(
    expr: ast.Expr, resolve: FieldResolver, *, under_not: bool = False
) -> Column:
    def leaf(pred: Column) -> Column:
        # Under a NOT the inversion must treat null-compares as false so the
        # NOT includes those rows (reference two-valued semantics); outside a
        # NOT the plain predicate filters identically and stays pushdown-able.
        return F.coalesce(pred, F.lit(False)) if under_not else pred

    if isinstance(expr, ast.Compare):
        # A predicate on a field with no column matches nothing — the
        # reference has no column file to hydrate, so no zone can satisfy
        # the condition (and undefined event types stream empty results,
        # scenario query_empty_event_type).
        try:
            col, ftype = resolve(expr.field)
        except QueryError:
            return leaf(F.lit(False))
        val = _coerce_literal(expr.value, ftype)
        if val is _UNPARSABLE:
            return leaf(F.lit(False))
        lit = F.lit(val)
        if expr.op == "=":
            return leaf(col == lit) if val is not None else col.isNull()
        if expr.op == "!=":
            return leaf(col != lit) if val is not None else col.isNotNull()
        if expr.op == ">":
            return leaf(col > lit)
        if expr.op == ">=":
            return leaf(col >= lit)
        if expr.op == "<":
            return leaf(col < lit)
        if expr.op == "<=":
            return leaf(col <= lit)
        if expr.op in ("starts_with", "contains", "ends_with"):
            # String predicates (extension). STARTS WITH stays sargable —
            # Spark pushes StringStartsWith into the Parquet scan, where
            # footer min/max bound a prefix range (and our context range
            # layout makes `context_id STARTS WITH p` a file-level skip).
            # CONTAINS/ENDS WITH filter post-scan (no stats can bound them).
            if not isinstance(val, str) or (
                ftype is not None and ftype.kind not in ("string", "enum")
            ):
                # typed eval (reference semantics): a string predicate on
                # a non-string field matches nothing
                return leaf(F.lit(False))
            pred = {
                "starts_with": col.startswith,
                "contains": col.contains,
                "ends_with": col.endswith,
            }[expr.op](lit)
            return leaf(pred)
        raise QueryError(f"unknown comparison operator {expr.op!r}")
    if isinstance(expr, ast.In):
        try:
            col, ftype = resolve(expr.field)
        except QueryError:
            return leaf(F.lit(False))
        vals = [
            c
            for c in (_coerce_literal(v, ftype) for v in expr.values if v is not None)
            if c is not _UNPARSABLE
        ]
        pred = col.isin(vals) if vals else F.lit(False)
        if any(v is None for v in expr.values):
            pred = pred | col.isNull()
        return leaf(pred)
    if isinstance(expr, ast.And):
        return compile_expr(expr.left, resolve, under_not=under_not) & compile_expr(
            expr.right, resolve, under_not=under_not
        )
    if isinstance(expr, ast.Or):
        return compile_expr(expr.left, resolve, under_not=under_not) | compile_expr(
            expr.right, resolve, under_not=under_not
        )
    if isinstance(expr, ast.Not):
        return ~compile_expr(expr.expr, resolve, under_not=True)
    raise QueryError(f"unsupported expression node: {expr!r}")


def expr_fields(expr: ast.Expr | None) -> list[str]:
    """All field names referenced by a WHERE tree, first-mention order."""
    out: list[str] = []

    def walk(e):
        if e is None:
            return
        if isinstance(e, (ast.Compare, ast.In)):
            if e.field not in out:
                out.append(e.field)
        elif isinstance(e, (ast.And, ast.Or)):
            walk(e.left)
            walk(e.right)
        elif isinstance(e, ast.Not):
            walk(e.expr)

    walk(expr)
    return out


def split_sequence_where(
    expr: ast.Expr | None, event_types: list[str]
) -> dict[str, ast.Expr | None]:
    """Per-side WHERE rewrite for sequence queries.

    Event-qualified fields (`page_view.page = "/x"`) apply only to that
    event type's side, with the prefix stripped; unqualified predicates
    apply to every side (reference: src/engine/core/read/sequence/where_evaluator.rs).
    Returns {event_type: expr-or-None}. Raises if one AND/OR mixes sides in
    a way that can't be split (OR across different sides).
    """
    out: dict[str, list[ast.Expr]] = {et: [] for et in event_types}
    if expr is None:
        return {et: None for et in event_types}

    def owner(e: ast.Expr) -> str | None:
        """Which single side does this subtree reference? None = unqualified."""
        fields = expr_fields(e)
        owners = set()
        for f in fields:
            if "." in f:
                prefix = f.split(".", 1)[0]
                if prefix in event_types:
                    owners.add(prefix)
                else:
                    owners.add(None)
            else:
                owners.add(None)
        if len(owners) == 1:
            return owners.pop()
        non_null = {o for o in owners if o is not None}
        if len(non_null) == 1 and None in owners:
            return non_null.pop()
        raise QueryError(
            "sequence WHERE subtree mixes fields from different event types"
        )

    def strip(e: ast.Expr, et: str) -> ast.Expr:
        if isinstance(e, ast.Compare):
            f = e.field.split(".", 1)[1] if e.field.startswith(et + ".") else e.field
            return ast.Compare(f, e.op, e.value)
        if isinstance(e, ast.In):
            f = e.field.split(".", 1)[1] if e.field.startswith(et + ".") else e.field
            return ast.In(f, e.values)
        if isinstance(e, ast.And):
            return ast.And(strip(e.left, et), strip(e.right, et))
        if isinstance(e, ast.Or):
            return ast.Or(strip(e.left, et), strip(e.right, et))
        if isinstance(e, ast.Not):
            return ast.Not(strip(e.expr, et))
        return e

    def walk(e: ast.Expr):
        # Split top-level ANDs; each conjunct lands on its owning side(s).
        if isinstance(e, ast.And):
            walk(e.left)
            walk(e.right)
            return
        own = owner(e)
        if own is None:
            for et in event_types:
                out[et].append(strip(e, et))
        else:
            out[own].append(strip(e, own))

    walk(expr)

    result: dict[str, ast.Expr | None] = {}
    for et, conjuncts in out.items():
        if not conjuncts:
            result[et] = None
        else:
            acc = conjuncts[0]
            for c in conjuncts[1:]:
                acc = ast.And(acc, c)
            result[et] = acc
    return result


def hwm_after(hwm_ts: int, hwm_id: int) -> Column:
    """Predicate selecting rows STRICTLY past a (timestamp, event_id)
    high-water mark — the delta side of every incremental refresh. Sits
    directly on the scan columns so Parquet pushdown applies."""
    t = F.col("timestamp").cast("long")
    return (t > F.lit(hwm_ts)) | (
        (t == F.lit(hwm_ts)) & (F.col("event_id") > F.lit(hwm_id))
    )


def hwm_at_or_before(hwm_ts: int, hwm_id: int) -> Column:
    """Complement of `hwm_after`: rows at or before the mark. Bounding a
    materialization's read side with this makes the (probe hwm, run
    query) pair atomic — rows racing in after the probe are excluded now
    and picked up exactly once by the next delta."""
    t = F.col("timestamp").cast("long")
    return (t < F.lit(hwm_ts)) | (
        (t == F.lit(hwm_ts)) & (F.col("event_id") <= F.lit(hwm_id))
    )
