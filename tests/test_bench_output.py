"""The driver keeps only the last 2000 chars of bench.py stdout — the JSON
line it parses must fit that window no matter how large the suite grows."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _result(n_queries: int, name_len: int = 24):
    queries = {f"q{'x' * name_len}_{i:03d}": round(0.017 * i, 3) for i in range(n_queries)}
    return {
        "metric": "total wall seconds over headline query suite",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }


def test_small_suite_passes_through_unmodified():
    r = _result(10)
    line = bench._fit_stdout_line(r)
    assert len(line) <= bench._STDOUT_BUDGET
    d = json.loads(line)
    assert d["queries"] == r["queries"]
    assert "omitted" not in d
    assert d["value"] == r["value"]


def test_oversized_suite_fits_budget_and_keeps_total():
    r = _result(150)
    line = bench._fit_stdout_line(r)
    assert len(line) <= bench._STDOUT_BUDGET
    d = json.loads(line)
    assert d["value"] == r["value"]  # total unchanged by omission
    assert d["omitted"] == 150 - len(d["queries"])
    assert d["full"] == "bench_full.json"
    # unlisted names drop smallest-value first, so the kept ones are the largest
    kept = set(d["queries"])
    cutoff = min(d["queries"].values())
    dropped = [k for k in r["queries"] if k not in kept]
    assert all(r["queries"][k] <= cutoff for k in dropped)


def test_omission_is_deterministic_and_priority_ordered():
    """Round 12: the omitted set must not shift run-to-run (phantom
    'dropped_from_bench' rows), and every name in the fixed keep-priority
    list must survive before any unlisted name does."""
    full = {n: 1.0 for n in bench._STDOUT_KEEP_PRIORITY}
    r = {
        "metric": "total wall seconds over headline query suite",
        "value": 999.0,
        "unit": "sec",
        "queries": dict(full),
        "sf": 0.1,
        "host": {"scratch": "disk", "load_start": [1, 1, 1], "load_end": [1, 1, 1],
                 "bench_wall_sec": 400.0, "steal_pct": 0.5},
    }
    import random

    rng = random.Random(7)
    for trial in range(5):
        perturbed = {k: round(v * rng.uniform(0.1, 40.0), 3) for k, v in full.items()}
        d = json.loads(bench._fit_stdout_line(dict(r, queries=perturbed)))
        kept = set(d["queries"])
        # omission is always a suffix of the fixed priority list — never a
        # value-dependent subset (the round-11 phantom-drop bug)
        assert kept == set(bench._STDOUT_KEEP_PRIORITY[: len(kept)])
        # the round-11 driver-visible prefix (first 70 names) always survives
        assert set(bench._STDOUT_KEEP_PRIORITY[:70]) <= kept


def test_all_failures_still_emit_parseable_line():
    queries = {n: None for n in bench._STDOUT_KEEP_PRIORITY}
    r = {
        "metric": "total wall seconds over headline query suite",
        "value": 0.0,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }
    line = bench._fit_stdout_line(r)
    assert len(line) <= bench._STDOUT_BUDGET
    json.loads(line)


def test_failed_queries_survive_omission():
    r = _result(150)
    failed = sorted(r["queries"])[0]
    r["queries"][failed] = None  # encoded failure
    line = bench._fit_stdout_line(r)
    d = json.loads(line)
    assert failed in d["queries"] and d["queries"][failed] is None


def test_current_suite_would_fit():
    # the real suite: every BENCH_QUERIES name plus the streaming ingest row
    queries = {n: 99.999 for n in bench.BENCH_QUERIES}
    queries["streaming_ingest_50k"] = 99.999
    r = {
        "metric": "total wall seconds over headline query suite",
        "value": 9999.999,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }
    line = bench._fit_stdout_line(r)
    assert len(line) <= bench._STDOUT_BUDGET
    json.loads(line)
