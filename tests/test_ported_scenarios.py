"""Declarative scenario ports: run the reference's integration scenarios
through this engine and apply the reference's matcher semantics.

Runner model (reference: tests/integration/runner.rs + matcher.rs): execute
every command in order against one engine, concatenate ALL responses —
read results rendered as JSON frames (sneldb_spark.response.json_frames,
the same wire shape as the reference's batch frames: rows as value arrays
in column order), write/error messages as text — then check substring
matchers (include / include_all / include_none) against the whole output.

The scenario table in _ported_scenarios.py covers the query_in_operator_*,
since_* and created_at_* families (53 scenarios), which pin IN-operator
two-valued logic, SINCE/USING time normalization (ISO-8601, ms/us/ns
epochs, timezone offsets, date fields), and bucket boundaries. Scenarios
that STORE then QUERY without FLUSH exercise the memtable-visible read
path for real, exactly as in the reference.
"""

import pytest

from sneldb_spark.response import json_frames
from tests._ported_scenarios import SCENARIOS


def _run(engine, commands) -> str:
    chunks = []
    for cmd in commands:
        word = cmd.split()[0].upper()
        if word == "SLEEP":
            continue  # the test clock already ticks per store
        res = engine.try_execute(cmd)
        if res.df is not None:
            chunks.extend(json_frames(res.df))
        elif res.message:
            chunks.append(res.message)
    return "\n".join(chunks)


@pytest.mark.parametrize(
    "name,commands,matchers", SCENARIOS, ids=[s[0] for s in SCENARIOS]
)
def test_ported_scenario(engine, name, commands, matchers):
    out = _run(engine, commands)
    for kind, value in matchers:
        if kind == "include":
            assert value in out, f"{name}: expected {value!r} in output"
        elif kind == "include_all":
            for frag in value:
                assert frag in out, f"{name}: expected {frag!r} in output"
        elif kind == "include_none":
            for frag in value:
                assert frag not in out, f"{name}: did not expect {frag!r}"
        else:  # pragma: no cover - table only carries the three kinds
            raise AssertionError(f"unknown matcher kind {kind}")
