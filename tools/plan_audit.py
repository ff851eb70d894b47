"""Plan audit over every queries() gate: capture the physical plan and
flag the anti-patterns that kill 100 TB runs.

Flags:
- CartesianProduct / BroadcastNestedLoopJoin — row-multiplying joins.
  (A BNL whose build side is a single-row aggregate — the scalar-subquery
  attach pattern — is reported as `bnl-1row` info, not a failure.)
- BatchEvalPython / PythonUDF outside Arrow — row-at-a-time Python.
- Exchange count — shuffles; not a failure, but the trend line matters.

Usage: python tools/plan_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sneldb_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    bad = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"ERROR {name}: {e}")
            continue
        exchanges = plan.count("Exchange")
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            # single-row build (scalar attach) is the plan Spark itself
            # emits for scalar subqueries; anything else is a real smell
            if re.search(r"BroadcastNestedLoopJoin BuildRight, Cross", plan) and (
                "HashAggregate" in plan
            ):
                flags.append("bnl-1row")
            else:
                flags.append("BNL")
        if "BatchEvalPython" in plan:
            flags.append("ROW_PYTHON")
        hard = [f for f in flags if f.isupper()]
        if hard:
            bad.append(name)
        print(
            f"{'FLAG ' if hard else 'ok   '}{name}: exchanges={exchanges}"
            + (f" [{','.join(flags)}]" if flags else "")
        )
    print()
    if bad:
        print("FLAGGED:", ", ".join(bad))
        sys.exit(1)
    print("ALL CLEAN")


if __name__ == "__main__":
    main()
