"""Multi-key ORDER BY (extension — the reference orders by one key):
parse, compile, tie-breaking, and the top-k prune guard."""

from sneldb_spark.commands.parser import parse_command


def test_parse_multi_key_order():
    q = parse_command("QUERY t ORDER BY a DESC, b, c ASC LIMIT 5")
    assert q.order_by == ("a", True)
    assert q.order_by_rest == (("b", False), ("c", False))
    # single key keeps the old shape (and an empty rest)
    q1 = parse_command("QUERY t ORDER BY a")
    assert q1.order_by == ("a", False) and q1.order_by_rest == ()


def test_serde_round_trip_and_legacy_manifests():
    from sneldb_spark.commands.serde import query_from_json, query_to_json

    q = parse_command("QUERY t ORDER BY a DESC, b LIMIT 3")
    j = query_to_json(q)
    assert j["order_by_rest"] == [["b", False]]
    assert query_from_json(j).order_by_rest == (("b", False),)
    # manifests written before multi-key ORDER BY have no key at all
    del j["order_by_rest"]
    assert query_from_json(j).order_by_rest == ()


def test_multi_key_ordering_breaks_ties(engine):
    engine.execute('DEFINE t FIELDS { "grp": "int", "v": "int" }')
    rows = [(1, 30), (1, 10), (2, 20), (2, 40), (1, 20)]
    for i, (g, v) in enumerate(rows):
        engine.execute(f'STORE t FOR c{i} PAYLOAD {{"grp": {g}, "v": {v}}}')
    engine.execute("FLUSH")
    got = [
        (r["grp"], r["v"])
        for r in engine.query("QUERY t ORDER BY grp ASC, v DESC").collect()
    ]
    assert got == [(1, 30), (1, 20), (1, 10), (2, 40), (2, 20)]
    # LIMIT takes the deterministic multi-key prefix
    got = [
        (r["grp"], r["v"])
        for r in engine.query("QUERY t ORDER BY grp ASC, v DESC LIMIT 2").collect()
    ]
    assert got == [(1, 30), (1, 20)]


def test_topk_prune_disabled_with_secondary_keys(engine):
    # the footer-stat prune is keyed on ONE column; a tie at the kept-file
    # boundary could be re-ranked by a tie-breaker, so the pruned source
    # must not be used
    q = parse_command("QUERY t ORDER BY a DESC, b LIMIT 5")
    assert engine.compiler._topk_frame(q) is None


def test_multi_key_on_aggregate_output(engine):
    engine.execute('DEFINE s FIELDS { "c": "string", "v": "int" }')
    data = [("x", 1), ("x", 2), ("y", 3), ("z", 3)]
    for i, (c, v) in enumerate(data):
        engine.execute(f'STORE s FOR k{i} PAYLOAD {{"c": "{c}", "v": {v}}}')
    engine.execute("FLUSH")
    got = [
        (r["max_v"], r["c"])
        for r in engine.query("QUERY s MAX v BY c ORDER BY max_v DESC, c ASC").collect()
    ]
    assert got == [(3, "y"), (3, "z"), (2, "x")]
