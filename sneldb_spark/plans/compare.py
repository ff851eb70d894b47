"""COMPARE / PlotQL VS: N aggregate queries full-outer-joined on group key.

Semantics per the reference merge (reference:
src/command/handlers/compare/merge.rs:16-120): each side runs as an
aggregate query; results join FULL OUTER on the shared group columns
(bucket + BY fields); metric columns are prefixed with the side's event
type, falling back to left/right/third/... when event types collide.

Aggregate side outputs are small relative to the scan (they are group
counts), so the full-outer join is cheap; Spark broadcasts the smaller
side automatically under AQE.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sneldb_spark.commands import ast
from sneldb_spark.errors import QueryError

_FALLBACK = ["left", "right", "third", "fourth", "fifth", "sixth", "seventh", "eighth"]


def side_labels(queries: list[ast.QueryCommand], labels=None) -> list[str]:
    if labels:
        return list(labels)
    names = [q.event_type for q in queries]
    if len(set(names)) == len(names):
        return names
    return [_FALLBACK[i] if i < len(_FALLBACK) else f"q{i}" for i in range(len(names))]


def merge_sides(
    queries: list[ast.QueryCommand],
    labels: list[str],
    dfs: list[DataFrame],
) -> DataFrame:
    """Label-prefix each side's metric columns and full-outer join on the
    shared group key. Shared by the direct COMPARE compile and the
    materializer's incremental refresh (which feeds per-side frames
    finalized from stored partial state instead of fresh scans)."""
    key_cols: list[str] | None = None
    sides: list[DataFrame] = []
    for q, label, df in zip(queries, labels, dfs):
        keys = (["bucket"] if q.time_bucket else []) + list(q.group_by)
        if key_cols is None:
            key_cols = keys
        elif keys != key_cols:
            raise QueryError("COMPARE sides must share bucket/group columns")
        metric_cols = [c for c in df.columns if c not in keys]
        renamed = df.select(
            *[F.col(f"`{k}`") for k in keys],
            *[F.col(f"`{m}`").alias(f"{label}_{m}") for m in metric_cols],
        )
        sides.append(renamed)

    if not key_cols:
        # Global (ungrouped) metrics: single-row sides, cross join them.
        return reduce(lambda l, r: l.crossJoin(r), sides)
    return reduce(lambda l, r: l.join(r, on=key_cols, how="full_outer"), sides)


def compile_compare(
    compiler, cmd: ast.CompareCommand, upper=None
) -> DataFrame:
    """`upper` closes every side's scan at a pre-probed (ts, event_id)
    high-water mark — see Compiler.compile; rows racing in during a
    materialization land in the next delta exactly once."""
    if not cmd.queries:
        raise QueryError("COMPARE requires at least one query")
    for q in cmd.queries:
        if not q.is_aggregate:
            raise QueryError("COMPARE sides must be aggregate queries")

    labels = side_labels(cmd.queries, cmd.labels)
    dfs = [compiler.compile_query(q, upper=upper) for q in cmd.queries]
    return merge_sides(cmd.queries, labels, dfs)
