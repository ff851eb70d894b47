"""Command AST.

Mirrors the reference's `Command` / `Expr` / `AggSpec` shapes
(reference: src/command/types.rs:17-75, 246-279) as plain dataclasses. The
AST is the contract between the parser and the DataFrame compiler.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

# ---------------------------------------------------------------------------
# WHERE expression tree
# ---------------------------------------------------------------------------

Value = Union[str, int, float, bool, None]


@dataclass(frozen=True)
class Compare:
    field: str
    op: str  # one of = != > >= < <=
    value: Value


@dataclass(frozen=True)
class In:
    field: str
    values: tuple


@dataclass(frozen=True)
class And:
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Or:
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Not:
    expr: "Expr"


Expr = Union[Compare, In, And, Or, Not]


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AggSpec:
    """op in {count, count_field, count_unique, total, avg, min, max,
    median, p<NN>} — median/p<NN> (P50..P99 surface syntax) are an
    extension beyond the reference's aggregate set; exact interpolated
    percentiles, output columns median_<f> / p<NN>_<f>."""

    op: str
    field: Optional[str] = None

    @property
    def output_name(self) -> str:
        # Output naming per reference (SURVEY §2.4 A11).
        if self.op == "count":
            return "count"
        if self.op == "count_field":
            return f"count_{self.field}"
        if self.op == "count_unique":
            return f"count_unique_{self.field}"
        return f"{self.op}_{self.field}"


# ---------------------------------------------------------------------------
# Sequences
# ---------------------------------------------------------------------------

FOLLOWED_BY = "followed_by"
PRECEDED_BY = "preceded_by"


@dataclass(frozen=True)
class EventSequence:
    head: str
    links: tuple = ()  # tuple[(kind, event_type), ...]

    @property
    def is_sequence(self) -> bool:
        return bool(self.links)

    @property
    def event_types(self) -> list[str]:
        return [self.head] + [ev for _, ev in self.links]


# ---------------------------------------------------------------------------
# Commands
# ---------------------------------------------------------------------------


@dataclass
class QueryCommand:
    sequence: EventSequence
    context_id: Optional[str] = None
    since: Optional[str] = None
    # UNTIL (extension): exclusive upper time bound — [SINCE, UNTIL)
    until: Optional[str] = None
    where: Optional[Expr] = None
    return_fields: Optional[list[str]] = None  # None = all; [] = all (parity)
    link_field: Optional[str] = None
    aggs: list[AggSpec] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    time_bucket: Optional[str] = None  # hour|day|week|month|year
    # USING <f>: the query time field — SINCE bounds and PER buckets
    # (reference using_field, src/command/parser/commands/query.rs:111-113,317).
    time_field: Optional[str] = None
    # USING TIME <f>: the sequence-match time field only — orders the
    # FOLLOWED BY / PRECEDED BY comparison, defaulting to "timestamp"
    # (reference sequence_time_field, query.rs:106-109,318;
    # handlers/query/orchestrator.rs:78-81). Distinct from time_field:
    # a query can bucket on one field and sequence-match on another.
    sequence_time_field: Optional[str] = None
    # WITHIN <seconds> (extension — no reference analogue): conversion
    # window on sequence matches; a pair counts only when the matched
    # event lands within this many seconds of the head.
    sequence_within: Optional[int] = None
    order_by: Optional[tuple[str, bool]] = None  # (field, desc)
    # additional sort keys (extension — the reference orders by one key);
    # ties on order_by break by these, left to right
    order_by_rest: tuple = ()  # tuple[tuple[str, bool], ...]
    limit: Optional[int] = None
    offset: Optional[int] = None

    @property
    def event_type(self) -> str:
        return self.sequence.head

    @property
    def is_aggregate(self) -> bool:
        return bool(self.aggs)

    @property
    def is_sequence(self) -> bool:
        # A sequence executes as one ONLY when a link field is present —
        # without LINKED BY the reference runs a plain query on the head
        # event type (reference: src/command/handlers/query/orchestrator.rs:40-48;
        # PlotQL funnels always have link_field = None, plotql.rs:571).
        return self.sequence.is_sequence and self.link_field is not None


@dataclass
class DefineCommand:
    event_type: str
    fields: dict  # raw specs (str | list)
    version: Optional[int] = None


@dataclass
class StoreCommand:
    event_type: str
    context_id: str
    payload: dict


@dataclass
class ReplayCommand:
    context_id: str
    event_type: Optional[str] = None  # None = all types
    since: Optional[str] = None
    until: Optional[str] = None  # extension, exclusive — [SINCE, UNTIL)
    time_field: Optional[str] = None
    return_fields: Optional[list[str]] = None


@dataclass
class CompareCommand:
    queries: list[QueryCommand]
    labels: Optional[list[str]] = None


@dataclass
class RememberCommand:
    name: str
    query: QueryCommand


@dataclass
class ShowCommand:
    name: str
    # bounded service read (extension): cap the returned rows at the
    # sink — SHOW's refresh/serve semantics are unchanged
    limit: int | None = None


@dataclass
class ForgetCommand:
    """Drop a materialization (extension — the reference has no explicit
    drop; a managed store needs one)."""

    name: str


@dataclass
class ExplainCommand:
    """EXPLAIN <read command> (extension): return the Spark physical plan
    for a QUERY/REPLAY/COMPARE/PLOT instead of running it — the operator's
    window into pushdown, pruning, and exchanges."""

    inner: object  # QueryCommand | ReplayCommand | CompareCommand


@dataclass
class FlushCommand:
    pass


@dataclass
class PingCommand:
    pass


@dataclass
class BatchCommand:
    commands: list


# -- user / permission management (reference: src/command/types.rs:54-75) --


@dataclass
class CreateUserCommand:
    user_id: str
    secret_key: Optional[str] = None
    roles: Optional[list[str]] = None


@dataclass
class RevokeKeyCommand:
    user_id: str


@dataclass
class ListUsersCommand:
    pass


@dataclass
class GrantPermissionCommand:
    permissions: list[str]  # subset of ["read", "write"]
    event_types: list[str]
    user_id: str


@dataclass
class RevokePermissionCommand:
    permissions: list[str]  # empty = revoke all
    event_types: list[str]
    user_id: str


@dataclass
class ShowPermissionsCommand:
    user_id: str


Command = Union[
    QueryCommand,
    DefineCommand,
    StoreCommand,
    ReplayCommand,
    CompareCommand,
    RememberCommand,
    ShowCommand,
    ForgetCommand,
    FlushCommand,
    PingCommand,
    BatchCommand,
    CreateUserCommand,
    RevokeKeyCommand,
    ListUsersCommand,
    GrantPermissionCommand,
    RevokePermissionCommand,
    ShowPermissionsCommand,
]
