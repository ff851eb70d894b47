"""STARTS WITH / ENDS WITH / CONTAINS string predicates (extension):
parse, typed-eval semantics, NOT composition, and STARTS WITH staying
sargable (StringStartsWith in PushedFilters)."""

import pytest

from sneldb_spark.commands.parser import parse_command


def test_parse_string_predicates():
    q = parse_command(
        'QUERY t WHERE url STARTS WITH "https://" AND path CONTAINS "/api/" '
        'AND name ENDS WITH ".md"'
    )
    ops = []

    def walk(e):
        from sneldb_spark.commands import ast

        if isinstance(e, ast.And):
            walk(e.left); walk(e.right)
        else:
            ops.append((e.field, e.op, e.value))

    walk(q.where)
    assert ops == [
        ("url", "starts_with", "https://"),
        ("path", "contains", "/api/"),
        ("name", "ends_with", ".md"),
    ]
    # field names that merely look like the keywords still parse as fields
    ops.clear()
    walk(parse_command("QUERY t WHERE starts = 1 AND contains = 2").where)
    assert ops == [("starts", "=", 1), ("contains", "=", 2)]


@pytest.fixture()
def str_engine(engine):
    engine.execute('DEFINE doc FIELDS { "url": "string", "n": "int" }')
    urls = [
        "https://a.example/api/x",
        "https://b.example/web/y",
        "http://c.example/api/z.md",
        "ftp://d.example/z.md",
    ]
    for i, u in enumerate(urls):
        engine.execute(f'STORE doc FOR c{i} PAYLOAD {{"url": "{u}", "n": {i}}}')
    engine.execute("FLUSH")
    return engine


def test_string_predicate_semantics(str_engine):
    q = lambda s: sorted(r["n"] for r in str_engine.query(s).collect())
    assert q('QUERY doc WHERE url STARTS WITH "https://"') == [0, 1]
    assert q('QUERY doc WHERE url CONTAINS "/api/"') == [0, 2]
    assert q('QUERY doc WHERE url ENDS WITH ".md"') == [2, 3]
    assert q('QUERY doc WHERE NOT url STARTS WITH "https://"') == [2, 3]
    assert q('QUERY doc WHERE url STARTS WITH "https://" AND url CONTAINS "/api/"') == [0]
    # typed eval: a string predicate on an int field matches nothing
    assert q('QUERY doc WHERE n STARTS WITH "1"') == []


def test_starts_with_is_pushed_down(str_engine):
    r = str_engine.execute('EXPLAIN QUERY doc WHERE url STARTS WITH "https://"')
    assert "StringStartsWith(url,https://)" in r.message
