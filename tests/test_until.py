"""UNTIL upper time bound (extension): half-open [SINCE, UNTIL) on the
query time column, same USING/unparsable semantics as SINCE, REPLAY too."""

import pytest

from sneldb_spark.commands.parser import parse_command


def test_parse_until():
    q = parse_command('QUERY t SINCE "2024-01-01" UNTIL "2024-02-01" COUNT')
    assert q.since == "2024-01-01" and q.until == "2024-02-01"
    r = parse_command('REPLAY t FOR c1 UNTIL 1700000500')
    assert r.until == "1700000500"
    # UNTIL is a clause keyword, not a field operand
    q2 = parse_command("QUERY t TOTAL amount UNTIL 123")
    assert q2.until == "123" and q2.aggs[0].field == "amount"


@pytest.fixture()
def until_engine(engine):
    engine.execute('DEFINE ev FIELDS { "at": "datetime", "v": "int" }')
    base = 1_700_000_000
    for i in range(10):
        engine.execute(
            f'STORE ev FOR c PAYLOAD {{"at": {base + i * 100}, "v": {i}}}'
        )
    engine.execute("FLUSH")
    return engine, base


def test_until_half_open_range(until_engine):
    engine, base = until_engine
    # server timestamps are the test clock; bound on the payload field
    rows = engine.query(
        f"QUERY ev SINCE {base + 200} UNTIL {base + 500} USING at"
    ).collect()
    assert sorted(r["v"] for r in rows) == [2, 3, 4]  # 500 exclusive
    # UNTIL alone
    rows = engine.query(f"QUERY ev UNTIL {base + 300} USING at").collect()
    assert sorted(r["v"] for r in rows) == [0, 1, 2]
    # unparsable UNTIL ignored, SINCE still applies (reference SINCE parity)
    rows = engine.query(f'QUERY ev SINCE {base + 700} UNTIL "garbage" USING at').collect()
    assert sorted(r["v"] for r in rows) == [7, 8, 9]


def test_until_on_replay(until_engine):
    engine, base = until_engine
    rows = engine.query(f"REPLAY ev FOR c UNTIL {base + 400} USING at").collect()
    assert [r["v"] for r in rows] == [0, 1, 2, 3]


def test_until_disables_topk_prune(until_engine):
    engine, base = until_engine
    q = parse_command(f"QUERY ev ORDER BY v DESC LIMIT 2 UNTIL {base + 400}")
    assert engine.compiler._topk_frame(q) is None


def test_until_aggregates(until_engine):
    engine, base = until_engine
    rows = engine.query(
        f"QUERY ev UNTIL {base + 500} USING at COUNT, TOTAL v"
    ).collect()
    assert rows[0]["count"] == 5 and rows[0]["total_v"] == 10
