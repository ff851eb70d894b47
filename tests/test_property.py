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


@pytest.mark.parametrize("kind", [FOLLOWED_BY, PRECEDED_BY])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    groups=st.lists(_group, min_size=1, max_size=6),
    n_slices=st.sampled_from([2, 3, 16]),
)
def test_sliced_sequence_match_equals_brute_force(spark, kind, groups, n_slices):
    """The time-sliced matcher must agree with the brute-force oracle for
    arbitrary slice counts over arbitrary tie-heavy group layouts."""
    from sneldb_spark.plans.sequence import sequence_match_sliced

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
        for r in sequence_match_sliced(a, b, "link", kind, n_slices=n_slices).collect()
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


# --- WHERE evaluation vs brute-force two-valued-logic oracle ---------------

_TYPED_FIELDS = {"n": "int", "s": "string"}
_N_VALUES = st.one_of(st.integers(min_value=-3, max_value=3), st.none())
_S_VALUES = st.one_of(st.sampled_from(["a", "b", "c", ""]), st.none())


def _typed_leaf():
    from sneldb_spark.commands import ast as A

    ops = st.sampled_from(["=", "!=", ">", ">=", "<", "<="])
    return st.one_of(
        st.tuples(ops, _N_VALUES).map(lambda t: A.Compare("n", t[0], t[1])),
        st.tuples(ops, _S_VALUES).map(lambda t: A.Compare("s", t[0], t[1])),
        st.lists(_N_VALUES, min_size=1, max_size=3).map(lambda v: A.In("n", tuple(v))),
        st.lists(_S_VALUES, min_size=1, max_size=3).map(lambda v: A.In("s", tuple(v))),
    )


def _typed_exprs():
    from sneldb_spark.commands import ast as A

    return st.recursive(
        _typed_leaf(),
        lambda sub: st.one_of(
            st.tuples(sub, sub).map(lambda t: A.And(*t)),
            st.tuples(sub, sub).map(lambda t: A.Or(*t)),
            sub.map(A.Not),
        ),
        max_leaves=6,
    )


def _eval_reference(e, row) -> bool:
    """Two-valued reference semantics: any comparison on a NULL field value
    is false; `= null` means IS NULL; NOT is plain boolean inversion
    (so it *includes* null-comparison rows)."""
    from sneldb_spark.commands import ast as A

    if isinstance(e, A.Compare):
        v = row[e.field]
        if e.value is None:
            if e.op == "=":
                return v is None
            if e.op == "!=":
                return v is not None
            return False  # ordering vs null literal matches nothing
        if v is None:
            return False
        if e.op == "=":
            return v == e.value
        if e.op == "!=":
            return v != e.value
        if e.op == ">":
            return v > e.value
        if e.op == ">=":
            return v >= e.value
        if e.op == "<":
            return v < e.value
        return v <= e.value
    if isinstance(e, A.In):
        v = row[e.field]
        if v is None:
            return None in e.values
        return v in [x for x in e.values if x is not None]
    if isinstance(e, A.And):
        return _eval_reference(e.left, row) and _eval_reference(e.right, row)
    if isinstance(e, A.Or):
        return _eval_reference(e.left, row) or _eval_reference(e.right, row)
    if isinstance(e, A.Not):
        return not _eval_reference(e.expr, row)
    raise AssertionError(e)


_WHERE_ROWS = [
    {"id": i, "n": n, "s": s}
    for i, (n, s) in enumerate(
        [(0, "a"), (1, "b"), (-2, "c"), (3, ""), (None, "a"), (2, None),
         (None, None), (0, "c"), (-3, "b"), (1, "")]
    )
]


@settings(max_examples=60, deadline=None)
@given(expr=_typed_exprs())
def test_where_eval_matches_reference_semantics(spark_session_holder, expr):
    from pyspark.sql import functions as F

    from sneldb_spark.plans.filters import compile_expr

    spark, df = spark_session_holder
    resolve = lambda f: (F.col(f), None)  # noqa: E731
    got = {r["id"] for r in df.where(compile_expr(expr, resolve)).collect()}
    want = {row["id"] for row in _WHERE_ROWS if _eval_reference(expr, row)}
    assert got == want, f"expr={expr}"


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    df = spark.createDataFrame(
        _WHERE_ROWS, "id long, n long, s string"
    ).coalesce(1).persist()
    df.count()
    yield spark, df
    df.unpersist()


# --- parser never crashes: any input -> Command or clean ParseError --------

@settings(max_examples=300, deadline=None)
@given(
    text=st.one_of(
        st.text(max_size=80),
        # structured-ish inputs hit deeper parser paths than pure noise
        st.from_regex(
            r"(QUERY|STORE|DEFINE|REPLAY|PLOT|GRANT|REVOKE|CREATE|SHOW|BATCH)"
            r" [a-z_ {}\[\]().,;:\"'=<>!0-9|-]{0,60}",
            fullmatch=True,
        ),
    )
)
def test_parser_total_on_arbitrary_input(text):
    from sneldb_spark.commands.parser import parse_command
    from sneldb_spark.errors import SnelDBError

    try:
        parse_command(text)
    except SnelDBError:
        pass  # clean engine error is the contract; anything else is a crash


# ---------------------------------------------------------------------------
# Top-k file pruning: for ANY dataset, the kept files must reproduce the
# exact top-n value multiset under Spark's null ordering (nulls FIRST
# ascending, LAST descending) — pure-Python property, no Spark round-trip.
# ---------------------------------------------------------------------------

_file_values = st.lists(
    st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),
    min_size=1,
    max_size=12,
)


@given(
    files=st.lists(_file_values, min_size=1, max_size=8),
    n=st.integers(min_value=1, max_value=15),
    desc=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_topk_prune_preserves_topn_values(files, n, desc):
    from sneldb_spark.store.topk_prune import FileStat, select_topk_files

    stats = []
    for i, vals in enumerate(files):
        known = [v for v in vals if v is not None]
        stats.append(
            FileStat(
                path=str(i),
                rows=len(vals),
                cmin=min(known) if known else None,
                cmax=max(known) if known else None,
                # a file of only nulls has no min/max stats: unprunable
                nulls=len(vals) - len(known) if known else 0,
            )
        )
    keep, _bound = select_topk_files(stats, n, desc)
    kept_vals = [v for i, vals in enumerate(files) if str(i) in keep for v in vals]
    all_vals = [v for vals in files for v in vals]

    def order_key(v):
        # Spark: asc -> nulls first; desc -> nulls last
        if desc:
            return (1, 0) if v is None else (0, -v)
        return (0, 0) if v is None else (1, v)

    top_all = sorted(all_vals, key=order_key)[:n]
    top_kept = sorted(kept_vals, key=order_key)[:n]
    assert top_kept == top_all, (stats, keep, top_kept, top_all)


def _brute_force_chain(rows, kinds):
    """rows: (link, ts, tie, side) with side in {0..N}. Greedy
    left-to-right chain: step i+1 = single-link pick with the cursor at
    the matched step-i event's ts. Returns the set of matched tie
    tuples."""
    out = set()
    sides = {}
    for r in rows:
        sides.setdefault(r[3], []).append(r)
    for link, ts0, tie0, _ in sides.get(0, []):
        chain = [tie0]
        cur_ts, ok = ts0, True
        for step, kind in enumerate(kinds, start=1):
            cands = [r for r in sides.get(step, []) if r[0] == link]
            if kind == FOLLOWED_BY:
                cands = [r for r in cands if r[1] >= cur_ts]
                pick = min(cands, key=lambda r: (r[1], r[2]), default=None)
            else:
                cands = [r for r in cands if r[1] < cur_ts]
                pick = max(cands, key=lambda r: (r[1], r[2]), default=None)
            if pick is None:
                ok = False
                break
            chain.append(pick[2])
            cur_ts = pick[1]
        if ok:
            out.add(tuple(chain))
    return out


_chain_group = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), st.sampled_from([0, 1, 2])),
    min_size=0,
    max_size=12,
)


@pytest.mark.parametrize(
    "kinds",
    [
        [FOLLOWED_BY, FOLLOWED_BY],
        [FOLLOWED_BY, PRECEDED_BY],
        [PRECEDED_BY, FOLLOWED_BY],
    ],
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(groups=st.lists(_chain_group, min_size=1, max_size=6))
def test_sequence_chain_equals_brute_force(spark, kinds, groups):
    from sneldb_spark.plans.sequence import sequence_match_chain

    rows = []
    tie = 0
    for g, events in enumerate(groups):
        for ts, side in events:
            rows.append((f"g{g}", ts, tie, side))
            tie += 1
    if not rows:
        return
    df = spark.createDataFrame(rows, "link string, timestamp long, event_id long, side int")
    frames = [df.where(F.col("side") == s).drop("side") for s in range(3)]
    want = _brute_force_chain(rows, kinds)
    got = {
        (r["s0_event_id"], r["s1_event_id"], r["s2_event_id"])
        for r in sequence_match_chain(frames, "link", kinds).collect()
    }
    assert got == want
    # sliced chain: identical output under the same tie-heavy inputs
    sliced = {
        (r["s0_event_id"], r["s1_event_id"], r["s2_event_id"])
        for r in sequence_match_chain(frames, "link", kinds, n_slices=3).collect()
    }
    assert sliced == want


def test_funnel_report_counts_and_conversions(spark):
    from sneldb_spark.plans.sequence import funnel_report

    rows = [
        # link, ts, id, side (0=A entry, 1=B, 2=C)
        ("u1", 1, 1, 0), ("u1", 2, 2, 1), ("u1", 3, 3, 2),
        ("u2", 1, 4, 0), ("u2", 2, 5, 1),            # no C
        ("u3", 5, 6, 0),                              # no B
        ("u4", 1, 7, 0), ("u4", 1, 8, 1), ("u4", 1, 9, 2),  # all tied
    ]
    df = spark.createDataFrame(
        rows, "link string, timestamp long, event_id long, side int"
    )
    frames = [df.where(F.col("side") == s).drop("side") for s in range(3)]
    out = {r["step"]: r for r in funnel_report(frames, "link").collect()}
    assert (out[0]["reached"], out[1]["reached"], out[2]["reached"]) == (4, 3, 2)
    assert out[0]["conversion"] is None and out[0]["overall"] == 1.0
    assert out[1]["conversion"] == 0.75
    assert out[2]["conversion"] == round(2 / 3, 4) and out[2]["overall"] == 0.5


def test_funnel_report_single_frame(spark):
    """A one-step funnel (no links) is just its entry count — regression
    for the step_hook rewrite, which used to reject the empty chain."""
    from sneldb_spark.plans.sequence import funnel_report

    df = spark.createDataFrame(
        [("u1", 1, 1), ("u2", 2, 2)], "link string, timestamp long, event_id long"
    )
    out = funnel_report([df], "link").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["step"], r["reached"], r["conversion"], r["overall"]) == (0, 2, None, 1.0)


def test_sequence_match_max_gap_window(spark):
    from sneldb_spark.plans.sequence import sequence_match

    rows = [
        # link, ts, id, side — u1 converts in-window, u2 out-of-window,
        # u3's FIRST B is out-of-window (no fallback to a later in-window
        # B for an earlier A? there is none earlier; closest-B semantics)
        ("u1", 0, 1, 0), ("u1", 5, 2, 1),
        ("u2", 0, 3, 0), ("u2", 100, 4, 1),
        ("u3", 0, 5, 0), ("u3", 50, 6, 1), ("u3", 7, 7, 1),
    ]
    df = spark.createDataFrame(rows, "link string, timestamp long, event_id long, side int")
    a = df.where(F.col("side") == 0).drop("side")
    b = df.where(F.col("side") == 1).drop("side")
    got = {
        (r["a_event_id"], r["b_event_id"])
        for r in sequence_match(a, b, "link", FOLLOWED_BY, max_gap_s=10).collect()
    }
    # u3's closest B is id=7 at ts=7 (within window) — order by ts, not id
    assert got == {(1, 2), (5, 7)}


def test_funnel_report_with_window(spark):
    from sneldb_spark.plans.sequence import funnel_report

    rows = [
        ("u1", 0, 1, 0), ("u1", 2, 2, 1), ("u1", 4, 3, 2),     # all in window
        ("u2", 0, 4, 0), ("u2", 50, 5, 1),                      # step1 gap 50
        ("u3", 0, 6, 0), ("u3", 3, 7, 1), ("u3", 90, 8, 2),     # step2 gap 87
    ]
    df = spark.createDataFrame(rows, "link string, timestamp long, event_id long, side int")
    frames = [df.where(F.col("side") == s).drop("side") for s in range(3)]
    out = {r["step"]: r["reached"]
           for r in funnel_report(frames, "link", max_gap_s=10).collect()}
    assert out == {0: 3, 1: 2, 2: 1}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    groups=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=40,
    ),
    split=st.integers(min_value=0, max_value=39),
    frac_pct=st.sampled_from([5, 25, 50, 90, 99]),
)
def test_percentile_partial_merge_equals_direct(spark, groups, split, frac_pct):
    """Mergeable percentile state: splitting the rows at ANY point,
    aggregating each half to partial state, merging, and finalizing is
    bit-equal to the direct percentile aggregate over all rows (the
    materializer's incremental-refresh invariant)."""
    from sneldb_spark.commands.ast import AggSpec
    from sneldb_spark.plans.aggregates import (
        apply_aggregation,
        apply_partial_aggregation,
        finalize_partial_state,
        merge_partial_states,
    )

    split = min(split, len(groups))
    specs = [
        AggSpec(op=f"p{frac_pct}", field="v"),
        AggSpec(op="median", field="v"),
    ]
    df = spark.createDataFrame(groups, "g string, v long")

    def resolve(f):
        return F.col(f), None

    parts = []
    for half in (groups[:split], groups[split:]):
        if not half:
            continue
        h = spark.createDataFrame(half, "g string, v long")
        state, keys = apply_partial_aggregation(h, specs, ["g"], resolve)
        parts.append(state)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    merged = merge_partial_states(merged, specs, ["g"])
    got = {
        (r["g"], r[specs[0].output_name], r[specs[1].output_name])
        for r in finalize_partial_state(merged, specs, ["g"]).collect()
    }
    want = {
        (r["g"], r[specs[0].output_name], r[specs[1].output_name])
        for r in apply_aggregation(df, specs, ["g"], resolve).collect()
    }
    assert got == want  # bit-equal, no tolerance


# -- BPE encode: greedy lowest-rank == sequential merge replay -------------


def _bpe_replay(word, merges):
    """Reference encoder: apply the TRAINED merge list in training order,
    all occurrences per step — by construction the segmentation training
    itself reached for this word."""
    syms = list(word)
    for l, r in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            # tiny alphabet + short words force dense merge interactions
            st.text(alphabet="abcd", min_size=1, max_size=6),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    ),
    num_merges=st.integers(min_value=0, max_value=10),
)
def test_bpe_encode_equals_replay_on_trained_merges(spark, docs, num_merges):
    """For merges PRODUCED BY TRAINING (each merged symbol created by an
    earlier merge), the greedy lowest-rank encoder equals replaying the
    merge list in order — and token concatenation always reconstructs
    the word stream. (For arbitrary ill-formed merge lists the two can
    differ; bpe_encode's contract is trained lists.)"""
    from sneldb_spark.pipeline.text import bpe_encode, bpe_train

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, num_merges=num_merges)
    got = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, merges).collect()}
    for i, words in enumerate(docs):
        want = [t for w in words for t in _bpe_replay(w, merges)]
        assert got[i] == want
        assert "".join(got[i]) == "".join(words)


def _split_commands_reference(body: str) -> list[str]:
    """Per-character top-level splitter — the semantic oracle for the
    regex-scan implementation in commands/parser.py. Inside strings,
    JSON escapes neutralize the next character (so \\" stays in the
    string); outside strings a backslash is ordinary text."""
    parts, depth, in_str, start, i = [], 0, False, 0, 0
    while i < len(body):
        c = body[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c in "{[":
            depth += 1
        elif c in "}]":
            depth -= 1
        elif c == ";" and depth == 0:
            parts.append(body[start:i])
            start = i + 1
        i += 1
    parts.append(body[start:])
    return [p.strip() for p in parts if p.strip()]


@given(
    body=st.text(
        alphabet=st.sampled_from(list('abc ;"{}[]:,0\\\n')), max_size=200
    )
)
@settings(max_examples=500, deadline=None)
def test_split_commands_matches_reference(body):
    from sneldb_spark.commands.parser import _split_commands

    assert _split_commands(body) == _split_commands_reference(body)


def test_split_commands_escaped_quote_in_payload():
    """The store_many injection shape: payload strings containing an
    escaped quote followed by '] ;' must NOT split the batch body."""
    from sneldb_spark.commands.parser import _split_commands

    cmd1 = 'STORE t FOR c1 PAYLOAD {"msg": "a\\" ] ;x"}'
    cmd2 = 'STORE t FOR c2 PAYLOAD {"n": 1}'
    assert _split_commands(f"{cmd1}; {cmd2}") == [cmd1, cmd2]
