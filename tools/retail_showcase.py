"""Retail demo workload — the counterpart of the reference's
`retail_showcase` binary (src/bin/retail_showcase.rs): generate realistic
customer shopping sessions (page view -> add to cart -> checkout ->
payment -> order -> shipment -> delivery -> review, with dropout at each
step), stream them at a running server, and report ingest throughput.

On top of the reference tool (which only ingests), `--demo-queries` runs
a handful of showcase queries over the data just loaded — conversion
funnel, revenue per day, courier breakdown, rating averages — and prints
the results, so one command shows the whole engine end to end.

Usage:
  python tools/retail_showcase.py tcp://127.0.0.1:7070 [--sessions 1000]
      [--days 7] [--concurrency 8] [--demo-queries] [--seed 42]

With auth enabled on the server, set SNELDB_ADMIN_USER / SNELDB_ADMIN_KEY.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sneldb_spark.client import SnelDBClient

# Demo catalog (prices in cents, original data — the workload SHAPE is
# what mirrors the reference, not its constants)
PRODUCTS = [
    ("p_001", "Trail Runners", 8499, "EUR"),
    ("p_002", "Noise-Cancel Buds", 11999, "EUR"),
    ("p_003", "Commuter Pack", 5499, "EUR"),
    ("p_004", "GPS Watch", 22999, "EUR"),
    ("p_005", "Cork Yoga Mat", 3499, "EUR"),
    ("p_006", "Steel Flask", 2299, "EUR"),
    ("p_007", "HR Band", 7999, "EUR"),
    ("p_008", "Duffel 40L", 4299, "EUR"),
    ("p_009", "Shaker 700ml", 1299, "EUR"),
    ("p_010", "Band Set Pro", 2799, "EUR"),
    ("p_011", "Street Ball", 2999, "EUR"),
    ("p_012", "Graphite Racket", 9499, "EUR"),
    ("p_013", "Road Helmet", 6499, "EUR"),
    ("p_014", "Ridge Boots", 12999, "EUR"),
    ("p_015", "Swim Set", 1899, "EUR"),
    ("p_016", "Speed Rope", 1499, "EUR"),
    ("p_017", "Hex Dumbbells", 8999, "EUR"),
    ("p_018", "Massage Roller", 2199, "EUR"),
    ("p_019", "Pilates Band", 1799, "EUR"),
    ("p_020", "Balance Ball", 2599, "EUR"),
]
COURIERS = ["DHL", "UPS", "FedEx", "DPD", "PostNL"]
REGIONS = ["NL", "DE", "BE", "FR", "UK", "ES", "IT"]
SOURCES = ["web", "mobile_app", "email", "social", "search"]

SCHEMAS = {
    "page_view": '{ "customer_id": "string", "product_id": "string", "product_name": "string", "price": "u64", "currency": "string", "quantity": "u64", "source": "string", "created_at": "datetime" }',
    "add_to_cart": '{ "customer_id": "string", "product_id": "string", "product_name": "string", "price": "u64", "currency": "string", "quantity": "u64", "created_at": "datetime" }',
    "checkout_started": '{ "customer_id": "string", "created_at": "datetime" }',
    "payment_succeeded": '{ "customer_id": "string", "product_id": "string", "price": "u64", "currency": "string", "created_at": "datetime" }',
    "order_created": '{ "customer_id": "string", "product_id": "string", "status": "string", "created_at": "datetime" }',
    "shipment_dispatched": '{ "courier": "string", "region": "string", "created_at": "datetime" }',
    "order_delivered": '{ "customer_id": "string", "region": "string", "created_at": "datetime" }',
    "review_submitted": '{ "customer_id": "string", "product_id": "string", "rating": "u64", "created_at": "datetime" }',
}


def generate_session(rng: random.Random, idx: int, ts_lo: int, ts_hi: int) -> list[tuple[str, str, dict]]:
    """One customer session as [(event_type, context_id, payload)], with
    the reference's dropout funnel: 80% cart, 70% checkout, 90% payment,
    100% order, 95% shipment, 98% delivery, 30% review."""
    ctx = f"sess_{idx + 1000}"
    customer = f"cust_{rng.randint(500, 599)}"
    pid, pname, price, cur = PRODUCTS[rng.randrange(len(PRODUCTS))]
    source = SOURCES[rng.randrange(len(SOURCES))]
    region = REGIONS[rng.randrange(len(REGIONS))]
    courier = COURIERS[rng.randrange(len(COURIERS))]
    t = rng.randint(ts_lo, ts_hi)

    base = {"customer_id": customer, "created_at": t}
    ev = [
        (
            "page_view",
            ctx,
            base
            | {
                "product_id": pid,
                "product_name": pname,
                "price": price,
                "currency": cur,
                "quantity": 1,
                "source": source,
            },
        )
    ]

    def later(lo, hi):
        nonlocal t
        t += rng.randint(lo, hi)
        return t

    if rng.random() < 0.8:
        ev.append(
            (
                "add_to_cart",
                ctx,
                {
                    "customer_id": customer,
                    "product_id": pid,
                    "product_name": pname,
                    "price": price,
                    "currency": cur,
                    "quantity": 1,
                    "created_at": later(120, 300),
                },
            )
        )
        if rng.random() < 0.7:
            ev.append(("checkout_started", ctx, {"customer_id": customer, "created_at": later(60, 180)}))
            if rng.random() < 0.9:
                ev.append(
                    (
                        "payment_succeeded",
                        ctx,
                        {
                            "customer_id": customer,
                            "product_id": pid,
                            "price": price,
                            "currency": cur,
                            "created_at": later(10, 30),
                        },
                    )
                )
                ev.append(
                    (
                        "order_created",
                        ctx,
                        {
                            "customer_id": customer,
                            "product_id": pid,
                            "status": "confirmed",
                            "created_at": later(30, 60),
                        },
                    )
                )
                if rng.random() < 0.95:
                    ev.append(
                        (
                            "shipment_dispatched",
                            ctx,
                            {"courier": courier, "region": region, "created_at": later(7200, 21600)},
                        )
                    )
                    if rng.random() < 0.98:
                        ev.append(
                            (
                                "order_delivered",
                                ctx,
                                {"customer_id": customer, "region": region, "created_at": later(86400, 259200)},
                            )
                        )
                        if rng.random() < 0.3:
                            ev.append(
                                (
                                    "review_submitted",
                                    ctx,
                                    {
                                        "customer_id": customer,
                                        "product_id": pid,
                                        "rating": rng.randint(3, 5),
                                        "created_at": later(0, 604800),
                                    },
                                )
                            )
    return ev


DEMO_QUERIES = [
    ("Conversion funnel: viewed then ordered (per customer)",
     "QUERY page_view FOLLOWED BY order_created LINKED BY customer_id COUNT"),
    ("Orders per day",
     "QUERY order_created COUNT PER DAY USING created_at"),
    ("Shipments by courier",
     "QUERY shipment_dispatched COUNT BY courier"),
    ("Average rating by product",
     "QUERY review_submitted AVG rating BY product_id ORDER BY product_id LIMIT 5"),
    ("Revenue (cents) by source-of-visit pages",
     "QUERY page_view TOTAL price BY source"),
]


def run_showcase(
    endpoint: str,
    *,
    sessions: int = 1_000,
    days: int = 7,
    concurrency: int = 8,
    seed: int = 42,
    admin: tuple[str, str] | None = None,
    demo_queries: bool = False,
    progress: bool = True,
    now: int | None = None,
) -> dict:
    now = now or int(time.time())
    # leave headroom: a session's tail (delivery + review) can run ~10d past start
    ts_lo, ts_hi = now - days * 86_400 - 1_100_000, now - 1_100_000

    def connect():
        return SnelDBClient(endpoint, *(admin or (None, None)), timeout=60.0)

    control = connect()
    try:
        for t, fields in SCHEMAS.items():
            control.execute(f"DEFINE {t} FIELDS {fields}")

        rng = random.Random(seed)
        all_events: list[tuple[str, str, dict]] = []
        for i in range(sessions):
            all_events.extend(generate_session(rng, i, ts_lo, ts_hi))

        sent = [0] * concurrency
        errors = [0] * concurrency

        def worker(w: int):
            c = connect()
            try:
                for j in range(w, len(all_events), concurrency):
                    t, ctx, payload = all_events[j]
                    r = c.try_execute(f"STORE {t} FOR {ctx} PAYLOAD {json.dumps(payload)}")
                    (sent if r.ok else errors)[w] += 1
            finally:
                c.close()

        start = time.time()
        threads = [threading.Thread(target=worker, args=(w,)) for w in range(concurrency)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        elapsed = time.time() - start
        total = sum(sent)
        if progress:
            print(
                f"Ingested {total} events from {sessions} sessions in "
                f"{elapsed:.2f}s ({total / max(elapsed, 1e-9):.0f} ev/s)"
            )
        control.execute("FLUSH")

        demo: dict[str, list[dict]] = {}
        if demo_queries:
            for title, q in DEMO_QUERIES:
                rows = control.query(q)
                demo[title] = rows
                if progress:
                    print(f"\n== {title}\n   {q}")
                    for r in rows[:10]:
                        print(f"   {r}")
        return {
            "endpoint": endpoint,
            "sessions": sessions,
            "events": total,
            "errors": sum(errors),
            "elapsed_s": round(elapsed, 3),
            "events_per_sec": round(total / max(elapsed, 1e-9), 1),
            "demo_queries": {k: len(v) for k, v in demo.items()},
        }
    finally:
        control.close()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("endpoint")
    p.add_argument("--sessions", type=int, default=1_000)
    p.add_argument("--days", type=int, default=7)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--demo-queries", action="store_true")
    args = p.parse_args(argv)
    admin = None
    if os.environ.get("SNELDB_ADMIN_USER"):
        admin = (os.environ["SNELDB_ADMIN_USER"], os.environ.get("SNELDB_ADMIN_KEY", ""))
    summary = run_showcase(
        args.endpoint,
        sessions=args.sessions,
        days=args.days,
        concurrency=args.concurrency,
        seed=args.seed,
        admin=admin,
        demo_queries=args.demo_queries,
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
