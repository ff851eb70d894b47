"""Retail showcase tool (tools/retail_showcase.py — reference
retail_showcase.rs parity): deterministic session funnel generation,
concurrent ingest through a real frontend, demo queries run clean."""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.fixture()
def tcp_server(engine):
    from sneldb_spark.server import SnelDBServer

    server = SnelDBServer(engine).start()
    yield server
    server.stop()


def test_session_generator_funnel_shape():
    from retail_showcase import generate_session

    rng = random.Random(7)
    sessions = [generate_session(rng, i, 1_700_000_000, 1_700_600_000) for i in range(300)]
    # every session starts with a page view; timestamps are monotone
    for ev in sessions:
        assert ev[0][0] == "page_view"
        ts = [p["created_at"] for _, _, p in ev]
        assert ts == sorted(ts)
        # dropout is ordered: an order implies a payment, implies checkout
        types = [t for t, _, _ in ev]
        if "order_created" in types:
            assert "payment_succeeded" in types and "checkout_started" in types
        if "review_submitted" in types:
            assert "order_delivered" in types
    # dropout rates land near the configured funnel (wide tolerance)
    n = len(sessions)
    carts = sum(1 for ev in sessions if any(t == "add_to_cart" for t, _, _ in ev))
    orders = sum(1 for ev in sessions if any(t == "order_created" for t, _, _ in ev))
    assert 0.6 * n < carts < 0.95 * n
    assert 0.3 * n < orders < 0.75 * n
    # deterministic for a fixed seed
    rng2 = random.Random(7)
    again = [generate_session(rng2, i, 1_700_000_000, 1_700_600_000) for i in range(300)]
    assert again == sessions


def test_showcase_ingest_and_demo_queries(tcp_server, engine):
    from retail_showcase import run_showcase

    host, port = tcp_server.address
    summary = run_showcase(
        f"tcp://{host}:{port}",
        sessions=40,
        concurrency=4,
        seed=11,
        demo_queries=True,
        progress=False,
    )
    assert summary["errors"] == 0
    assert summary["events"] >= 40  # at least one event per session
    # demo queries all executed and returned rows
    assert len(summary["demo_queries"]) == 5
    assert all(n >= 0 for n in summary["demo_queries"].values())
    # engine-side sanity: funnel count matches a direct engine query
    funnel = engine.query(
        "QUERY page_view FOLLOWED BY order_created LINKED BY customer_id COUNT"
    ).collect()
    assert funnel[0]["count"] >= 1
