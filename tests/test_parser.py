import pytest

from sneldb_spark.commands import ast
from sneldb_spark.commands.parser import parse_command
from sneldb_spark.errors import ParseError


def test_define_basic():
    cmd = parse_command(
        'DEFINE orders FIELDS { "amount": "int", "country": "string" }'
    )
    assert isinstance(cmd, ast.DefineCommand)
    assert cmd.event_type == "orders"
    assert cmd.fields == {"amount": "int", "country": "string"}
    assert cmd.version is None


def test_define_versioned_enum():
    cmd = parse_command('DEFINE subscription AS 2 FIELDS { "plan": ["pro", "basic"] }')
    assert cmd.version == 2
    assert cmd.fields["plan"] == ["pro", "basic"]


def test_store():
    cmd = parse_command('STORE orders FOR ctx1 PAYLOAD { "amount": 10, "country": "NL" }')
    assert isinstance(cmd, ast.StoreCommand)
    assert cmd.event_type == "orders"
    assert cmd.context_id == "ctx1"
    assert cmd.payload == {"amount": 10, "country": "NL"}


def test_store_quoted_context():
    cmd = parse_command('STORE orders FOR "user 1" PAYLOAD { "amount": 1, "country": "NL" }')
    assert cmd.context_id == "user 1"


def test_query_where_since_limit():
    cmd = parse_command(
        'QUERY orders SINCE "2024-01-01" WHERE amount >= 500 AND country != "NL" LIMIT 100'
    )
    assert isinstance(cmd, ast.QueryCommand)
    assert cmd.event_type == "orders"
    assert cmd.since == "2024-01-01"
    assert cmd.limit == 100
    w = cmd.where
    assert isinstance(w, ast.And)
    assert w.left == ast.Compare("amount", ">=", 500)
    assert w.right == ast.Compare("country", "!=", "NL")


def test_query_in_parens_not():
    cmd = parse_command(
        'QUERY products WHERE (category IN ("a", "b") OR NOT price > 10) AND in_stock'
    )
    w = cmd.where
    assert isinstance(w, ast.And)
    assert isinstance(w.left, ast.Or)
    assert w.left.left == ast.In("category", ("a", "b"))
    assert isinstance(w.left.right, ast.Not)
    assert w.right == ast.Compare("in_stock", "=", True)


def test_query_aggregates():
    cmd = parse_command("QUERY orders COUNT, TOTAL amount, AVG amount PER DAY BY country, plan")
    assert [a.op for a in cmd.aggs] == ["count", "total", "avg"]
    assert cmd.aggs[1].field == "amount"
    assert cmd.time_bucket == "day"
    assert cmd.group_by == ["country", "plan"]


def test_count_unique_and_count_by_disambiguation():
    cmd = parse_command("QUERY orders COUNT UNIQUE plan BY country")
    assert cmd.aggs == [ast.AggSpec("count_unique", "plan")]
    assert cmd.group_by == ["country"]
    cmd2 = parse_command("QUERY orders COUNT BY country")
    assert cmd2.aggs == [ast.AggSpec("count")]
    assert cmd2.group_by == ["country"]


def test_sequence():
    cmd = parse_command(
        'QUERY page_view FOLLOWED BY order_created LINKED BY user_id '
        'WHERE page_view.page = "/checkout"'
    )
    assert cmd.sequence.head == "page_view"
    assert cmd.sequence.links == ((ast.FOLLOWED_BY, "order_created"),)
    assert cmd.link_field == "user_id"


def test_order_limit_offset():
    cmd = parse_command("QUERY t ORDER BY value DESC LIMIT 10 OFFSET 5")
    assert cmd.order_by == ("value", True)
    assert cmd.limit == 10
    assert cmd.offset == 5


def test_per_using():
    cmd = parse_command("QUERY clicks COUNT PER WEEK USING created_at")
    assert cmd.time_bucket == "week"
    assert cmd.time_field == "created_at"


def test_replay():
    cmd = parse_command("REPLAY product FOR user-1 RETURN [name]")
    assert isinstance(cmd, ast.ReplayCommand)
    assert cmd.event_type == "product"
    assert cmd.context_id == "user-1"
    assert cmd.return_fields == ["name"]
    wildcard = parse_command("REPLAY FOR user-1")
    assert wildcard.event_type is None


def test_remember_show():
    cmd = parse_command("REMEMBER QUERY orders COUNT BY country AS daily_orders")
    assert isinstance(cmd, ast.RememberCommand)
    assert cmd.name == "daily_orders"
    assert cmd.query.aggs == [ast.AggSpec("count")]
    show = parse_command("SHOW daily_orders")
    assert isinstance(show, ast.ShowCommand)


def test_plot_vs():
    cmd = parse_command(
        'PLOT COUNT OF purchase VS COUNT OF click BREAKDOWN BY country OVER day(timestamp)'
    )
    assert isinstance(cmd, ast.CompareCommand)
    assert len(cmd.queries) == 2
    assert cmd.queries[0].group_by == ["country"]
    assert cmd.queries[0].time_bucket == "day"


def test_parse_errors():
    for bad in [
        "",
        "FROBNICATE x",
        "QUERY",
        "STORE orders PAYLOAD {}",
        'DEFINE orders FIELDS { }',
        "QUERY t WHERE amount >",
        "SHOW",
    ]:
        with pytest.raises(ParseError):
            parse_command(bad)


def test_bare_word_value_is_string():
    cmd = parse_command("QUERY t WHERE status = active")
    assert cmd.where == ast.Compare("status", "=", "active")


def test_batch_bracketed_form_and_embedded_semicolons():
    from sneldb_spark.commands import ast
    from sneldb_spark.commands.parser import parse_command

    b = parse_command('BATCH [ STORE ev FOR c1 PAYLOAD { "s": "a;b" }; PING ]')
    assert [type(c) for c in b.commands] == [ast.StoreCommand, ast.PingCommand]
    assert b.commands[0].payload == {"s": "a;b"}
    import pytest

    from sneldb_spark.errors import ParseError

    with pytest.raises(ParseError):
        parse_command("BATCH [ PING")  # unclosed bracket


def test_using_vs_using_time_distinct():
    # Reference keeps Clause::Using (SINCE/bucket time) and
    # Clause::UsingTime (sequence-match time) separate (query.rs:106-113).
    cmd = parse_command("QUERY a FOLLOWED BY b LINKED BY ctx USING TIME created_at")
    assert cmd.sequence_time_field == "created_at"
    assert cmd.time_field is None
    cmd = parse_command("QUERY a FOLLOWED BY b LINKED BY ctx USING created_at")
    assert cmd.time_field == "created_at"
    assert cmd.sequence_time_field is None
    both = parse_command(
        "QUERY a FOLLOWED BY b LINKED BY ctx USING created_at USING TIME closed_at"
    )
    assert both.time_field == "created_at"
    assert both.sequence_time_field == "closed_at"


def test_using_field_named_time():
    # USING time (no trailing ident) binds the query time field to a field
    # literally named "time" — USING TIME needs a following field.
    cmd = parse_command("QUERY t COUNT PER DAY USING time")
    assert cmd.time_field == "time"
    assert cmd.sequence_time_field is None


def test_within_without_sequence_rejected():
    # WITHIN is a conversion window on sequence matches; on a plain query
    # it would be silently ignored, so the parser rejects it (ADVICE r4).
    import pytest

    from sneldb_spark.errors import ParseError

    with pytest.raises(ParseError):
        parse_command("QUERY purchase WITHIN 60")
    with pytest.raises(ParseError):
        parse_command('QUERY purchase WHERE amount > 3 WITHIN 60 LIMIT 5')
    # ... but stays valid on single links and chains
    cmd = parse_command("QUERY a FOLLOWED BY b LINKED BY ctx WITHIN 60")
    assert cmd.sequence_within == 60
    cmd = parse_command(
        "QUERY a FOLLOWED BY b FOLLOWED BY c LINKED BY ctx WITHIN 60"
    )
    assert cmd.sequence_within == 60


def test_show_limit_extension():
    """SHOW <name> LIMIT n — bounded service read (extension)."""
    cmd = parse_command("SHOW board LIMIT 100")
    assert isinstance(cmd, ast.ShowCommand)
    assert cmd.name == "board" and cmd.limit == 100
    assert parse_command("SHOW board").limit is None
    assert parse_command("SHOW board LIMIT 0").limit == 0
    with pytest.raises(ParseError):
        parse_command("SHOW board LIMIT x")
    with pytest.raises(ParseError):
        parse_command("SHOW board LIMIT -1")
    with pytest.raises(ParseError):
        parse_command("SHOW board LIMIT 1 2")
