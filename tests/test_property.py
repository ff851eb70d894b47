"""Property tests (SURVEY §5 additions): sequence-match pairing semantics
against a brute-force oracle, and agg-merge associativity by construction.

The as-of pairing rules (one match per A, B reuse allowed, same-ts
inclusion differs between FOLLOWED BY and PRECEDED BY) are the
reference's trickiest semantics (reference:
src/engine/core/read/sequence/matcher.rs:310-611); random timestamps
with heavy tie probability exercise every boundary. Each Hypothesis
example packs many independent link groups into ONE DataFrame so the
Spark round-trip cost is per-example, not per-group.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sneldb_spark.commands.ast import FOLLOWED_BY, PRECEDED_BY
from sneldb_spark.plans.sequence import sequence_match

# one link group: lists of (ts, side) with ts drawn from a tiny domain to
# force timestamp collisions within and across sides
_group = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), st.sampled_from([0, 1])),
    min_size=0,
    max_size=12,
)


def _brute_force(rows, kind):
    """rows: list of (link, ts, tie, side). Returns {(a_tie, b_tie)}."""
    out = set()
    a_rows = [r for r in rows if r[3] == 0]
    b_rows = [r for r in rows if r[3] == 1]
    for link, ts_a, tie_a, _ in a_rows:
        if kind == FOLLOWED_BY:
            cands = [r for r in b_rows if r[0] == link and r[1] >= ts_a]
            pick = min(cands, key=lambda r: (r[1], r[2]), default=None)
        else:
            cands = [r for r in b_rows if r[0] == link and r[1] < ts_a]
            pick = max(cands, key=lambda r: (r[1], r[2]), default=None)
        if pick is not None:
            out.add((tie_a, pick[2]))
    return out


@pytest.mark.parametrize("kind", [FOLLOWED_BY, PRECEDED_BY])
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(groups=st.lists(_group, min_size=1, max_size=8))
def test_sequence_match_equals_brute_force(spark, kind, groups):
    rows = []
    tie = 0
    for g, events in enumerate(groups):
        for ts, side in events:
            rows.append((f"g{g}", ts, tie, side))
            tie += 1
    if not rows:
        return
    df = spark.createDataFrame(rows, "link string, timestamp long, event_id long, side int")
    a = df.where(F.col("side") == 0).drop("side")
    b = df.where(F.col("side") == 1).drop("side")
    got = {
        (r["a_event_id"], r["b_event_id"])
        for r in sequence_match(a, b, "link", kind).collect()
    }
    assert got == _brute_force(rows, kind)


# --- parser round-trip: Expr tree -> command text -> parse -> same tree ---

_field = st.sampled_from(["amount", "country", "is_active", "a.b"])
_value = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.floats(min_value=-100, max_value=100, allow_nan=False).map(lambda f: round(f, 3)),
    st.sampled_from(["NL", "a b", "x'y", ""]),
    st.booleans(),
    st.none(),
)


def _exprs():
    from sneldb_spark.commands import ast as A

    leaf = st.one_of(
        st.tuples(_field, st.sampled_from(["=", "!=", ">", ">=", "<", "<="]), _value).map(
            lambda t: A.Compare(*t)
        ),
        st.tuples(_field, st.lists(_value, min_size=1, max_size=4)).map(
            lambda t: A.In(t[0], tuple(t[1]))
        ),
    )
    return st.recursive(
        leaf,
        lambda sub: st.one_of(
            st.tuples(sub, sub).map(lambda t: A.And(*t)),
            st.tuples(sub, sub).map(lambda t: A.Or(*t)),
            sub.map(A.Not),
        ),
        max_leaves=8,
    )


def _render_value(v):
    import json as _json

    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return _json.dumps(v)
    return repr(v)


def _render(e) -> str:
    from sneldb_spark.commands import ast as A

    if isinstance(e, A.Compare):
        return f"{e.field} {e.op} {_render_value(e.value)}"
    if isinstance(e, A.In):
        return f"{e.field} IN ({', '.join(_render_value(v) for v in e.values)})"
    if isinstance(e, A.And):
        return f"({_render(e.left)} AND {_render(e.right)})"
    if isinstance(e, A.Or):
        return f"({_render(e.left)} OR {_render(e.right)})"
    if isinstance(e, A.Not):
        return f"NOT ({_render(e.expr)})"
    raise AssertionError(e)


@settings(max_examples=200, deadline=None)
@given(expr=_exprs())
def test_where_expression_text_roundtrip(expr):
    from sneldb_spark.commands.parser import parse_command

    q = parse_command(f"QUERY t WHERE {_render(expr)}")
    assert q.where == expr
