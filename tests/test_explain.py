"""EXPLAIN command (extension): the operator's window into the Spark
physical plan — pushdown, pruning, exchanges — without running the query."""

import pytest

from sneldb_spark.commands.parser import parse_command
from sneldb_spark.errors import ParseError


def test_parse_explain_wraps_read_commands():
    from sneldb_spark.commands import ast

    c = parse_command("EXPLAIN QUERY t WHERE a = 1")
    assert isinstance(c, ast.ExplainCommand) and isinstance(c.inner, ast.QueryCommand)
    c = parse_command("EXPLAIN REPLAY FOR c1")
    assert isinstance(c.inner, ast.ReplayCommand)
    c = parse_command("EXPLAIN PLOT COUNT OF a VS COUNT OF b")
    assert isinstance(c.inner, ast.CompareCommand)
    with pytest.raises(ParseError):
        parse_command("EXPLAIN")
    with pytest.raises(ParseError):
        parse_command('EXPLAIN STORE t FOR c PAYLOAD {"a": 1}')
    with pytest.raises(ParseError):
        parse_command("EXPLAIN FLUSH")


def test_explain_shows_pushdown(engine):
    engine.execute('DEFINE t FIELDS { "a": "int", "s": "string" }')
    for i in range(5):
        engine.execute(f'STORE t FOR c{i} PAYLOAD {{"a": {i}, "s": "x{i}"}}')
    engine.execute("FLUSH")
    r = engine.execute('EXPLAIN QUERY t WHERE a > 2')
    assert r.ok and r.df is None
    # a formatted plan with the filter pushed into the Parquet scan
    assert "Scan parquet" in r.message
    assert "PushedFilters" in r.message and "GreaterThan(a,2)" in r.message
    # aggregates explain too
    r = engine.execute("EXPLAIN QUERY t MEDIAN a BY s")
    assert r.ok and "HashAggregate" in r.message


def test_explain_respects_read_permissions(spark, tmp_path):
    from sneldb_spark.auth import AuthConfig, AuthError, AuthManager
    from sneldb_spark.engine import SnelDB

    auth = AuthManager(
        path=str(tmp_path / "auth.json"),
        config=AuthConfig(initial_admin_user="admin", initial_admin_key="k"),
    )
    db = SnelDB(spark, str(tmp_path / "db"), auth=auth)
    db.execute('DEFINE t FIELDS { "a": "int" }', user_id="admin")
    db.execute('CREATE USER bob WITH KEY "bk"', user_id="admin")
    with pytest.raises(AuthError):
        db.execute("EXPLAIN QUERY t", user_id="bob")
    db.execute("GRANT READ ON t TO bob", user_id="admin")
    r = db.execute("EXPLAIN QUERY t", user_id="bob")
    assert r.ok and "Scan" in r.message
