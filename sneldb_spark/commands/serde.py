"""AST <-> JSON serialization (used by the materialization manifest)."""

from __future__ import annotations

from sneldb_spark.commands import ast


def expr_to_json(e: ast.Expr | None):
    if e is None:
        return None
    if isinstance(e, ast.Compare):
        return {"t": "cmp", "field": e.field, "op": e.op, "value": e.value}
    if isinstance(e, ast.In):
        return {"t": "in", "field": e.field, "values": list(e.values)}
    if isinstance(e, ast.And):
        return {"t": "and", "l": expr_to_json(e.left), "r": expr_to_json(e.right)}
    if isinstance(e, ast.Or):
        return {"t": "or", "l": expr_to_json(e.left), "r": expr_to_json(e.right)}
    if isinstance(e, ast.Not):
        return {"t": "not", "e": expr_to_json(e.expr)}
    raise TypeError(f"unserializable expr: {e!r}")


def expr_from_json(obj) -> ast.Expr | None:
    if obj is None:
        return None
    t = obj["t"]
    if t == "cmp":
        return ast.Compare(obj["field"], obj["op"], obj["value"])
    if t == "in":
        return ast.In(obj["field"], tuple(obj["values"]))
    if t == "and":
        return ast.And(expr_from_json(obj["l"]), expr_from_json(obj["r"]))
    if t == "or":
        return ast.Or(expr_from_json(obj["l"]), expr_from_json(obj["r"]))
    if t == "not":
        return ast.Not(expr_from_json(obj["e"]))
    raise ValueError(f"bad expr json: {obj!r}")


def query_to_json(q: ast.QueryCommand) -> dict:
    return {
        "sequence": {"head": q.sequence.head, "links": [list(l) for l in q.sequence.links]},
        "context_id": q.context_id,
        "since": q.since,
        "until": q.until,
        "where": expr_to_json(q.where),
        "return_fields": q.return_fields,
        "link_field": q.link_field,
        "aggs": [{"op": a.op, "field": a.field} for a in q.aggs],
        "group_by": q.group_by,
        "time_bucket": q.time_bucket,
        "time_field": q.time_field,
        "sequence_within": q.sequence_within,
        "order_by": list(q.order_by) if q.order_by else None,
        "order_by_rest": [list(k) for k in q.order_by_rest],
        "limit": q.limit,
        "offset": q.offset,
    }


def query_from_json(obj: dict) -> ast.QueryCommand:
    seq = ast.EventSequence(
        head=obj["sequence"]["head"],
        links=tuple(tuple(l) for l in obj["sequence"]["links"]),
    )
    return ast.QueryCommand(
        sequence=seq,
        context_id=obj["context_id"],
        since=obj["since"],
        until=obj.get("until"),
        where=expr_from_json(obj["where"]),
        return_fields=obj["return_fields"],
        link_field=obj["link_field"],
        aggs=[ast.AggSpec(a["op"], a["field"]) for a in obj["aggs"]],
        group_by=list(obj["group_by"]),
        time_bucket=obj["time_bucket"],
        time_field=obj["time_field"],
        sequence_within=obj.get("sequence_within"),
        order_by=tuple(obj["order_by"]) if obj["order_by"] else None,
        # .get: manifests written before multi-key ORDER BY load fine
        order_by_rest=tuple(tuple(k) for k in obj.get("order_by_rest", [])),
        limit=obj["limit"],
        offset=obj["offset"],
    )


def compare_to_json(c: ast.CompareCommand) -> dict:
    return {
        "compare": True,
        "queries": [query_to_json(q) for q in c.queries],
        "labels": list(c.labels) if c.labels else None,
    }


def compare_from_json(obj: dict) -> ast.CompareCommand:
    return ast.CompareCommand(
        queries=[query_from_json(q) for q in obj["queries"]],
        labels=list(obj["labels"]) if obj.get("labels") else None,
    )
